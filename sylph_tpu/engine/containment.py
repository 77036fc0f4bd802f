"""Containment probing: genome sketch k-mers vs a sample's counted k-mers.

Reference loop: per genome, probe each genome k-mer into the sample hashmap
and collect multiplicities (sylph src/contain.rs:624-652). Here the sample
is a sorted (kmers, counts) pair and the probe is a batched binary search —
the same access pattern the device kernel implements against a sharded index.
"""

from typing import Optional, Tuple

import numpy as np

from ..core.types import GenomeSketch, SequencesSketch


class WinnerTable:
    """kmer -> winning genome group, for profile's second pass.

    group ids collapse value-identical GenomeSketches, matching the
    reference's by-value winner_map comparisons (src/contain.rs:639)."""

    def __init__(self, kmers_sorted: np.ndarray, groups: np.ndarray):
        self.kmers = kmers_sorted
        self.groups = groups

    def owner_groups(self, kmers: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(self.kmers, kmers)
        idx = np.minimum(idx, max(self.kmers.size - 1, 0))
        if self.kmers.size == 0:
            return np.full(kmers.shape, -1, dtype=np.int64)
        out = self.groups[idx]
        out = np.where(self.kmers[idx] == kmers, out, -1)
        return out


def genome_covs_batch(genomes, sample: SequencesSketch,
                      winner: Optional[WinnerTable] = None,
                      self_groups=None):
    """[(covs, kmers_lost)] for many genomes via ONE batched probe.

    Concatenates every genome's k-mers, runs a single searchsorted into
    the sample (and one winner lookup), then splits — bit-identical to
    per-genome genome_covs, but ~n_genomes fewer passes over the sorted
    sample's cache-cold pages. Pass-1/pass-2 of the profile pipeline
    call this for the candidate set (src/contain.rs:624-652 probes a
    hashmap per genome; batching is free with the sorted layout)."""
    sk, sc = sample.sorted_view()
    sizes = [int(g.genome_kmers.size) for g in genomes]
    bounds = np.cumsum([0] + sizes)
    if not genomes or bounds[-1] == 0 or sk.size == 0:
        return [(np.empty(0, np.uint32), 0) for _ in genomes]
    all_k = np.concatenate([g.genome_kmers for g in genomes])
    idx = np.searchsorted(sk, all_k)
    idxc = np.minimum(idx, sk.size - 1)
    found = (sk[idxc] == all_k) & (idx < sk.size)
    counts = sc[idxc]
    hit = found & (counts > 0)
    owners = winner.owner_groups(all_k) if winner is not None else None
    out = []
    for i in range(len(genomes)):
        s, e = bounds[i], bounds[i + 1]
        h = hit[s:e]
        kmers_lost = 0
        if owners is not None:
            owned = owners[s:e] == self_groups[i]
            kmers_lost = int(np.count_nonzero(h & ~owned))
            h = h & owned
        covs = counts[s:e][h]
        covs.sort()
        out.append((covs.astype(np.uint32, copy=False), kmers_lost))
    return out


def genome_covs(genome: GenomeSketch, sample: SequencesSketch,
                winner: Optional[WinnerTable] = None,
                self_group: int = -1) -> Tuple[np.ndarray, int]:
    """(sorted multiplicity vector of contained k-mers, kmers_lost).

    kmers_lost counts contained k-mers owned by a different genome in the
    winner table (src/contain.rs:637-646)."""
    sk, sc = sample.sorted_view()
    g = genome.genome_kmers
    if g.size == 0 or sk.size == 0:
        return np.empty(0, np.uint32), 0
    idx = np.searchsorted(sk, g)
    idxc = np.minimum(idx, sk.size - 1)
    found = (sk[idxc] == g) & (idx < sk.size)
    counts = sc[idxc]
    hit = found & (counts > 0)
    kmers_lost = 0
    if winner is not None:
        owners = winner.owner_groups(g)
        owned = owners == self_group
        kmers_lost = int(np.count_nonzero(hit & ~owned))
        hit = hit & owned
    covs = counts[hit]
    covs.sort()
    return covs, kmers_lost
