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


def test_bucket_join_hist_matches_merge_join():
    import jax.numpy as jnp

    from sylph_tpu.tpu.bucket_join import (build_gid_grid,
                                           bucket_join_hist)
    from sylph_tpu.tpu.containment import merge_join_hist
    from sylph_tpu.tpu.pipeline import build_host_index
    rng = np.random.default_rng(5)
    c, G, H = 50, 7, 32
    thr = ((1 << 64) - 1) // c
    pool = rng.integers(0, thr, size=4000, dtype=np.uint64)
    genomes = [rng.choice(pool, size=400, replace=False).astype(np.uint64)
               for _ in range(G)]
    idx = build_host_index(genomes, pad_multiple=64)
    occ = np.sort(np.concatenate([
        rng.choice(pool, size=3000),
        rng.integers(0, thr, size=500, dtype=np.uint64)]))
    shi, slo = from_u64_np(occ)
    pad = (-occ.size) % 512
    sent = np.uint32(0xFFFFFFFF)
    shi = np.concatenate([shi, np.full(pad, sent, np.uint32)])
    slo = np.concatenate([slo, np.full(pad, sent, np.uint32)])
    sw = (shi != sent).astype(np.int32)
    want = np.asarray(merge_join_hist(
        jnp.asarray(idx.hi), jnp.asarray(idx.lo),
        jnp.asarray(idx.genome_ids), jnp.asarray(shi), jnp.asarray(slo),
        n_genomes=G, n_buckets=H))
    bidx = build_bucketed_index(idx.hi, idx.lo, c)
    gidg = build_gid_grid(bidx, idx.genome_ids, G)
    got = np.asarray(bucket_join_hist(
        jnp.asarray(bidx.hi), jnp.asarray(bidx.lo), jnp.asarray(gidg),
        jnp.asarray(shi), jnp.asarray(slo), jnp.asarray(sw),
        width=bidx.width, B=bidx.n_buckets,
        CS=sample_cs(occ.size, bidx.n_buckets), n_genomes=G, n_buckets=H,
        force_xla=True))
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
