"""Profiling pipeline pieces: winner table, dereplication, abundances,
unknown-sequence estimation.

Behavioral spec: sylph src/contain.rs:296-459 and :901-951.
"""

import logging
import math
from typing import Dict, List, Optional

import numpy as np

from ..constants import MED_KMER_FOR_ID_EST
from ..core.types import AniResult, SequencesSketch
from .containment import WinnerTable

log = logging.getLogger("sylph")


def assign_groups(results: List[AniResult]) -> List[int]:
    """Group ids collapsing value-identical genome sketches (the reference
    compares GenomeSketch by value in winner_map / derep lookups)."""
    key_to_group: Dict[tuple, int] = {}
    groups = []
    for r in results:
        key = r.genome_sketch.content_key()
        groups.append(key_to_group.setdefault(key, len(key_to_group)))
    return groups


def winner_table(results: List[AniResult],
                 log_reassign: bool = False) -> WinnerTable:
    """argmax-ANI ownership per k-mer over genome_kmers + tracked k-mers
    (src/contain.rs:410-459). Ties keep the earliest-inserted result
    (strict '>' update), i.e. result order."""
    groups = assign_groups(results)
    kmer_arrays, ani_arrays, order_arrays, group_arrays = [], [], [], []
    for order, r in enumerate(results):
        g = r.genome_sketch
        arrs = [g.genome_kmers]
        if g.pseudotax_tracked_nonused_kmers is not None:
            arrs.append(g.pseudotax_tracked_nonused_kmers)
        for a in arrs:
            kmer_arrays.append(a)
            ani_arrays.append(np.full(a.size, r.final_est_ani))
            order_arrays.append(np.full(a.size, order, dtype=np.int64))
            group_arrays.append(np.full(a.size, groups[order],
                                        dtype=np.int64))
    if not kmer_arrays:
        return WinnerTable(np.empty(0, np.uint64), np.empty(0, np.int64))
    kmers = np.concatenate(kmer_arrays)
    anis = np.concatenate(ani_arrays)
    orders = np.concatenate(order_arrays)
    grps = np.concatenate(group_arrays)
    # winner per kmer: max ANI, ties -> earliest result order. A duplicate
    # group inserting the same kmer twice is idempotent (same ani/group),
    # matching the or_insert-no-update semantics.
    sel = np.lexsort((orders, -anis, kmers))  # kmer asc, ani desc, order asc
    kmers_s = kmers[sel]
    first = np.ones(kmers_s.size, dtype=bool)
    first[1:] = kmers_s[1:] != kmers_s[:-1]
    if log_reassign:
        _log_reassignments(results, WinnerTable(kmers_s[first],
                                                grps[sel][first]), groups)
    return WinnerTable(kmers_s[first], grps[sel][first])


def _log_reassignments(results, table: WinnerTable, groups):
    """--log-reassignments output (src/contain.rs:432-456)."""
    log.info("------------- Logging k-mer reassignments -----------------")
    for i, r in enumerate(results):
        log.info("Index\t%d\t%s\t%s", i, r.genome_sketch.file_name,
                 r.genome_sketch.first_contig_name)
    group_to_first_index = {}
    for i, g in enumerate(groups):
        group_to_first_index.setdefault(g, i)
    for i, r in enumerate(results):
        owners = table.owner_groups(r.genome_sketch.genome_kmers)
        moved = owners[(owners >= 0) & (owners != groups[i])]
        if moved.size:
            vals, cnts = np.unique(moved, return_counts=True)
            for v, cnt in zip(vals.tolist(), cnts.tolist()):
                if cnt > 10:
                    log.info("%d->%d\t%d\tkmers reassigned",
                             group_to_first_index[v], i, cnt)


def derep_if_reassign_threshold(results_old: List[AniResult],
                                results_new: List[AniResult],
                                ani_thresh: float, k: int
                                ) -> List[AniResult]:
    """Drop genomes whose reassigned-kmer count crosses the redundancy
    threshold (src/contain.rs:353-375)."""
    ani_thresh = ani_thresh / 100.0
    old_by_key = {}
    for r in results_old:
        old_by_key[r.genome_sketch.content_key()] = r
    threshold = math.pow(ani_thresh, float(k))
    out = []
    for r in results_new:
        old = old_by_key[r.genome_sketch.content_key()]
        num_reassign = float(old.containment_index[0]
                             - r.containment_index[0])
        reass_thresh = threshold * float(r.containment_index[1])
        if num_reassign < reass_thresh:
            out.append(r)
        else:
            log.debug(
                "genome %s had num k-mers reassigned = %s, threshold was "
                "%s, removing.", r.gn_name, num_reassign, reass_thresh)
    return out


def estimate_true_cov(results: List[AniResult], kmer_id_opt: Optional[float],
                      estimate_unknown: bool, read_length: float, k: int):
    """src/contain.rs:377-389."""
    multiplier = 1.0
    if estimate_unknown:
        multiplier = read_length / (read_length - float(k) + 1.0)
    if estimate_unknown and kmer_id_opt is not None:
        for r in results:
            r.final_est_cov = r.final_est_cov / kmer_id_opt * multiplier


def estimate_covered_bases(results: List[AniResult],
                           sample: SequencesSketch, read_length: float,
                           k: int) -> float:
    """src/contain.rs:391-408."""
    multiplier = read_length / (read_length - float(k) + 1.0)
    num_covered = 0.0
    for r in results:
        num_covered += float(r.genome_sketch.gn_size) * r.final_est_cov
    num_total_counts = int(sample.counts.sum(dtype=np.uint64))
    num_tentative = float(sample.c * num_total_counts) * multiplier
    if num_tentative == 0.0:
        return 0.0
    return min(num_covered / num_tentative, 1.0)


def get_kmer_identity(sample: SequencesSketch,
                      estimate_unknown: bool) -> Optional[float]:
    """k-mer identity epsilon for --estimate-unknown
    (src/contain.rs:901-951).

    Divergence (documented): the streaming-median gate iterates the count
    map in hashmap order in the reference; we iterate in insertion/file
    order. Only the <3-median short-read fallback decision can differ, and
    only near its boundary."""
    if not estimate_unknown:
        return None
    counts = sample.counts
    gt1 = counts[counts > 1]
    median = 0
    mov_avg = 0.0
    n = 1.0
    for cnt in gt1.tolist():
        if cnt > median:
            median += 1
        else:
            median -= 1
        mov_avg += float(median)
        n += 1.0
    mov_avg /= n
    log.debug("Estimated continuous median k-mer count for %s is %.3f",
              sample.file_name, mov_avg)
    num_1s = int(np.count_nonzero(counts == 1))
    num_not1s = int(counts[counts != 1].sum(dtype=np.uint64))
    eps = num_not1s / (num_not1s + num_1s + 0.1)
    if mov_avg < MED_KMER_FOR_ID_EST and sample.mean_read_length < 400.0:
        log.info(
            "%s short-read sample has high diversity compared to sequencing "
            "depth (approx. avg depth < 3). Using 99.5%% as read accuracy "
            "estimate instead of automatic detection for --estimate-unknown.",
            sample.file_name)
        return math.pow(0.995, float(sample.k))
    return eps if eps < 1.0 else 1.0
