"""TSV output formatting, byte-compatible with the reference
(sylph src/contain.rs:18-94, 461-480).

Python's fixed-precision float formatting performs the same
correctly-rounded decimal conversion as Rust's ``{:.N}``, so rows format
identically for identical f64 inputs.
"""

from typing import Optional, TextIO

from ..core.types import AdjustKind, AniResult


def print_header(pseudotax: bool, out: TextIO, estimate_unknown: bool):
    if not pseudotax:
        out.write(
            "Sample_file\tGenome_file\tAdjusted_ANI\tEff_cov\t"
            "ANI_5-95_percentile\tEff_lambda\tLambda_5-95_percentile\t"
            "Median_cov\tMean_cov_geq1\tContainment_ind\tNaive_ANI\t"
            "Contig_name\n")
    else:
        cov_head = "True_cov" if estimate_unknown else "Eff_cov"
        out.write(
            "Sample_file\tGenome_file\tTaxonomic_abundance\t"
            "Sequence_abundance\tAdjusted_ANI\t" + cov_head +
            "\tANI_5-95_percentile\tEff_lambda\tLambda_5-95_percentile\t"
            "Median_cov\tMean_cov_geq1\tContainment_ind\tNaive_ANI\t"
            "kmers_reassigned\tContig_name\n")


def _fmt_ci(lo: Optional[float], hi: Optional[float],
            scale: float) -> str:
    if lo is None or hi is None:
        return "NA-NA"
    return f"{lo * scale:.2f}-{hi * scale:.2f}"


def print_ani_result(r: AniResult, pseudotax: bool, out: TextIO):
    final_ani = f"{min(r.final_est_ani * 100.0, 100.0):.2f}"
    if r.lam.kind == AdjustKind.LAMBDA:
        lambda_print = f"{r.lam.value:.3f}"
    elif r.lam.kind == AdjustKind.HIGH:
        lambda_print = "HIGH"
    else:
        lambda_print = "LOW"
    ci_ani = _fmt_ci(r.ani_ci[0], r.ani_ci[1], 100.0)
    ci_lambda = _fmt_ci(r.lambda_ci[0], r.lambda_ci[1], 1.0)

    if not pseudotax:
        out.write(
            f"{r.seq_name}\t{r.gn_name}\t{final_ani}\t"
            f"{r.final_est_cov:.3f}\t{ci_ani}\t{lambda_print}\t{ci_lambda}\t"
            f"{r.median_cov:.0f}\t{r.mean_cov:.3f}\t"
            f"{r.containment_index[0]}/{r.containment_index[1]}\t"
            f"{r.naive_ani * 100.0:.2f}\t{r.contig_name}\n")
    else:
        out.write(
            f"{r.seq_name}\t{r.gn_name}\t{r.rel_abund:.4f}\t"
            f"{r.seq_abund:.4f}\t{final_ani}\t{r.final_est_cov:.3f}\t"
            f"{ci_ani}\t{lambda_print}\t{ci_lambda}\t{r.median_cov:.0f}\t"
            f"{r.mean_cov:.3f}\t"
            f"{r.containment_index[0]}/{r.containment_index[1]}\t"
            f"{r.naive_ani * 100.0:.2f}\t{r.kmers_lost}\t{r.contig_name}\n")
