"""Scientific behavior: zero-truncated-Poisson ANI correction at low coverage.

The reference's headline statistical feature is accurate containment-ANI
down to ~0.1x coverage (sylph README.md:30): naive ANI collapses because
most k-mers are unsampled, and the lambda correction recovers it. This test
verifies the end-to-end math on simulated data.
"""

import io

import numpy as np
import pytest

from sylph_tpu.engine.runner import ContainOptions, contain
from sylph_tpu.engine.sketch_cmd import SketchOptions, sketch

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _make_world(tmp_path, coverage, glen=2_000_000, read_len=150, seed=1):
    tmp_path.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, size=glen).astype(np.uint8)
    g = tmp_path / "g.fa"
    g.write_bytes(b">g\n" + BASES[genome].tobytes() + b"\n")
    n_reads = int(glen * coverage / read_len)
    starts = rng.integers(0, glen - read_len, size=n_reads)
    r = tmp_path / "r.fq"
    with open(r, "wb") as f:
        qual = b"I" * read_len
        for i, s in enumerate(starts):
            f.write(b"@r%d\n" % i)
            f.write(BASES[genome[s:s + read_len]].tobytes() + b"\n+\n")
            f.write(qual + b"\n")
    sketch(SketchOptions(files=[], genomes=[str(g)], reads=[str(r)],
                         db_out_name=str(tmp_path / "db"),
                         sample_output_dir=str(tmp_path), c=100, k=31))
    out = io.StringIO()
    contain(ContainOptions(files=[str(tmp_path / "db.syldb"),
                                  str(tmp_path / "r.fq.sylsp")],
                           minimum_ani=80.0),
            pseudotax=False, out=out)
    rows = [ln.split("\t") for ln in out.getvalue().strip().splitlines()[1:]]
    assert len(rows) == 1
    # query columns: Sample Genome Adjusted_ANI Eff_cov ANI_CI Eff_lambda
    # Lambda_CI Median Mean_geq1 Containment Naive_ANI Contig
    adj_ani = float(rows[0][2])
    eff_lambda = rows[0][5]
    naive_ani = float(rows[0][10])
    return adj_ani, eff_lambda, naive_ani


@pytest.mark.parametrize("coverage", [0.1, 0.2, 0.5])
def test_lambda_correction_recovers_ani(tmp_path, coverage):
    adj, lam, naive = _make_world(tmp_path / f"c{coverage}", coverage)
    # effective coverage: reads of length L cover L-k+1 windows per L bases
    eff = coverage * (150 - 31 + 1) / 150
    # naive ANI collapses: (1 - e^-eff)^(1/31)
    expect_naive = 100.0 * (1.0 - np.exp(-eff)) ** (1.0 / 31.0)
    assert naive == pytest.approx(expect_naive, abs=1.0)
    assert naive < 98.0
    # the corrected estimate recovers ~100% identity
    assert adj >= 99.5
    # and the reported lambda tracks the true effective coverage (the
    # ratio estimator's sampling error at 0.1x is ~15-20% relative)
    assert float(lam) == pytest.approx(eff, rel=0.35)
