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
