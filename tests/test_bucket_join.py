"""Bucketed compare-join vs exact counts (both backends)."""

import numpy as np
import pytest

from sylph_tpu.tpu.bucket_join import (build_bucketed_index,
                                       bucket_join_counts, sample_cs)
from sylph_tpu.tpu.u64 import from_u64_np


def _world(seed, M, T, c):
    rng = np.random.default_rng(seed)
    thr = ((1 << 64) - 1) // c
    idx_kmers = rng.integers(0, thr, size=M, dtype=np.uint64)
    smp = np.unique(np.concatenate([
        rng.choice(idx_kmers, size=T // 2),
        rng.integers(0, thr, size=T // 2, dtype=np.uint64)]))
    wts = rng.integers(1, 7, size=smp.size).astype(np.int32)
    order = np.argsort(smp)
    smp, wts = smp[order], wts[order]
    pad = (-smp.size) % 512
    shi, slo = from_u64_np(smp)
    shi = np.concatenate([shi, np.full(pad, 0xFFFFFFFF, np.uint32)])
    slo = np.concatenate([slo, np.full(pad, 0xFFFFFFFF, np.uint32)])
    sw = np.concatenate([wts, np.zeros(pad, np.int32)])
    want = np.array([dict(zip(smp.tolist(), wts.tolist())).get(int(k), 0)
                     for k in idx_kmers], np.int32)
    return idx_kmers, shi, slo, sw, smp.size, want


@pytest.mark.parametrize("seed,M,T,c", [(0, 30000, 3000, 50),
                                        (1, 5000, 4000, 10),
                                        (2, 100000, 500, 200)])
def test_bucket_join_xla(seed, M, T, c):
    idx_kmers, shi, slo, sw, t_real, want = _world(seed, M, T, c)
    ihi, ilo = from_u64_np(idx_kmers)
    bidx = build_bucketed_index(ihi, ilo, c)
    got = bucket_join_counts(bidx, shi, slo, sw, t_real, force_xla=True)
    assert (got == want).all()


def test_bucket_join_pallas_interpret():
    idx_kmers, shi, slo, sw, t_real, want = _world(3, 20000, 2000, 50)
    ihi, ilo = from_u64_np(idx_kmers)
    bidx = build_bucketed_index(ihi, ilo, 50)
    got = bucket_join_counts(bidx, shi, slo, sw, t_real, interpret=True)
    assert (got == want).all()


def test_capacity_is_exact_on_index_side():
    # index bucketing must never drop entries — CI is data-exact
    rng = np.random.default_rng(4)
    c = 20
    thr = ((1 << 64) - 1) // c
    # adversarial: cluster many hashes into one bucket range
    idx_kmers = np.concatenate([
        rng.integers(0, thr // 1000, size=5000, dtype=np.uint64),
        rng.integers(0, thr, size=5000, dtype=np.uint64)])
    ihi, ilo = from_u64_np(idx_kmers)
    bidx = build_bucketed_index(ihi, ilo, c)
    assert int((bidx.pos >= 0).sum()) == idx_kmers.size
