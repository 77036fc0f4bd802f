"""Butterfly bucket-grid fill (tpu/bucket_fill.py) vs the XLA scatter
oracle (bucket_join._sample_to_buckets), in interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sylph_tpu.tpu import grange
from sylph_tpu.tpu.bucket_fill import bucket_fill_pallas, fill_geometry
from sylph_tpu.tpu.bucket_join import _sample_to_buckets

SENT = np.uint32(0xFFFFFFFF)


def _case(seed, P, B, width, base, dup_frac=0.3, zero_frac=0.2,
          oor_frac=0.1):
    """Sorted (hi, lo, w) slice with duplicates, folded zero-weights and
    out-of-range entries, sentinel-padded to P."""
    rng = np.random.default_rng(seed)
    span = B * width
    n = int(P * 0.8)
    his = (base + rng.integers(-int(oor_frac * span), span,
                               size=n)).astype(np.int64)
    his = np.clip(his, 0, 2**31 - 1).astype(np.uint32)
    ndup = int(n * dup_frac)
    if ndup:
        his[rng.integers(0, n, ndup)] = his[rng.integers(0, n, ndup)]
    los = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    order = np.lexsort((los, his))
    his, los = his[order], los[order]
    w = rng.integers(1, 5, size=n).astype(np.int32)
    w[rng.random(n) < zero_frac] = 0
    shi = np.full(P, SENT, np.uint32)
    slo = np.full(P, SENT, np.uint32)
    sw = np.zeros(P, np.int32)
    shi[:n], slo[:n], sw[:n] = his, los, w
    return shi, slo, sw


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("P,B,CS,width", [
    (4096, 512, 8, 16),       # GTDB-like CS
    (4096, 256, 16, 32),      # wider buckets
    (2048, 128, 24, 64),      # non-pow2 window (TBK=64, W_out=1536)
])
def test_fill_matches_scatter(seed, P, B, CS, width):
    base = np.uint32(1000 + seed * 37)
    assert fill_geometry(B, CS) is not None
    shi, slo, sw = _case(seed, P, B, width, int(base))
    ref = _sample_to_buckets(jnp.asarray(shi), jnp.asarray(slo),
                             jnp.asarray(sw), width=width, B=B, CS=CS,
                             base=int(base))
    got = bucket_fill_pallas(jnp.asarray(shi), jnp.asarray(slo),
                             jnp.asarray(sw), jnp.uint32(base),
                             width=width, B=B, CS=CS, interpret=True)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("pattern", [
    "one_bucket_each_end",   # max rightward expand displacement
    "every_bucket_full",     # zero-padding grid, max occupancy
    "alternating_empty",     # every other bucket empty
    "first_half_dense",      # dense then nothing
])
def test_fill_adversarial_patterns(pattern):
    B, CS, width = 512, 8, 16
    base = 4096
    rng = np.random.default_rng(7)
    if pattern == "one_bucket_each_end":
        his = np.array([base, base + (B - 1) * width], np.uint32)
    elif pattern == "every_bucket_full":
        his = (base + np.repeat(np.arange(B), CS) * width).astype(
            np.uint32)
    elif pattern == "alternating_empty":
        his = (base + np.repeat(np.arange(0, B, 2), 3) * width).astype(
            np.uint32)
    else:
        his = (base + np.sort(rng.integers(0, B // 2, size=600))
               * width).astype(np.uint32)
    n = his.size
    los = np.sort(rng.integers(0, 2**32, size=n).astype(np.uint32))
    P = max(2048, 1 << int(np.ceil(np.log2(n + 1))))
    shi = np.full(P, SENT, np.uint32)
    slo = np.full(P, SENT, np.uint32)
    sw = np.zeros(P, np.int32)
    shi[:n], slo[:n], sw[:n] = his, los, 1
    ref = _sample_to_buckets(jnp.asarray(shi), jnp.asarray(slo),
                             jnp.asarray(sw), width=width, B=B, CS=CS,
                             base=base)
    got = bucket_fill_pallas(jnp.asarray(shi), jnp.asarray(slo),
                             jnp.asarray(sw), jnp.uint32(base),
                             width=width, B=B, CS=CS, interpret=True)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fill_window_overflow_drops_cleanly():
    """Entries beyond a window's two fetched blocks are dropped, never
    corrupted — and the weight conservation check sees the loss (the
    grange fallback trigger)."""
    B, CS, width = 512, 8, 16
    TBK, W_out = fill_geometry(B, CS)
    P, n = 8 * W_out, 3 * W_out             # 3 blocks of entries, window 0
    rng = np.random.default_rng(0)
    his = (1000 + rng.integers(0, TBK * width, size=n)).astype(np.uint32)
    los = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    order = np.lexsort((los, his))
    his, los = his[order], los[order]
    shi = np.full(P, SENT, np.uint32)
    slo = np.full(P, SENT, np.uint32)
    sw = np.zeros(P, np.int32)
    shi[:n], slo[:n], sw[:n] = his, los, 1
    ref = _sample_to_buckets(jnp.asarray(shi), jnp.asarray(slo),
                             jnp.asarray(sw), width=width, B=B, CS=CS,
                             base=1000)
    got = bucket_fill_pallas(jnp.asarray(shi), jnp.asarray(slo),
                             jnp.asarray(sw), jnp.uint32(1000),
                             width=width, B=B, CS=CS, interpret=True)
    assert np.asarray(got[2]).sum() < np.asarray(ref[2]).sum()
    live = np.asarray(got[2]) > 0
    assert (np.asarray(got[0])[live] == np.asarray(ref[0])[live]).all()


def test_fill_geometry_support():
    tbk, w_out = fill_geometry(32768, 8)
    assert 32768 % tbk == 0 and w_out == tbk * 8 and w_out <= 4096
    # B without a large pow2 divisor still supported (TBK shrinks to fit)
    tbk, w_out = fill_geometry(100, 8)
    assert 100 % tbk == 0 and w_out == tbk * 8
    assert fill_geometry(101, 8) == (1, 8)        # odd B -> TBK=1
    # non-pow2 CS (granularity-8 grange capacities) must be supported:
    # battery3 found CS=1280 rejected by Mosaic under the old geometry
    tbk, w_out = fill_geometry(1024, 1280)
    assert tbk == 2 and w_out == 2560
    assert fill_geometry(32768, 8192) is None     # CS too large


def test_grange_engine_batched_fill(monkeypatch):
    """hists_batched under the butterfly fill (interpret) is bit-identical
    to the scatter engine across a small cohort."""
    rng = np.random.default_rng(11)
    G, KPG, c = 25, 300, 20
    thr = (1 << 64) // c
    kmers = rng.integers(0, thr, size=G * KPG, dtype=np.uint64)
    gids = np.repeat(np.arange(G, dtype=np.int32), KPG)
    gidx = grange.build_grange_index(kmers, gids, G, chunk_slots=2048,
                                     target_mean=8)
    tables = []
    for s in range(3):
        sk = np.unique(np.concatenate([
            rng.choice(kmers, size=400),
            rng.integers(0, thr, size=400, dtype=np.uint64)]))
        sc = rng.integers(1, 9, size=sk.size).astype(np.uint32)
        tables.append((sk, sc))
    dev = [jax.devices()[0]]
    base = grange.GRangeEngine(gidx, devices=dev).hists_batched(tables)
    monkeypatch.setattr(grange, "_USE_BUCKET_FILL", True)
    monkeypatch.setattr(grange, "_FILL_INTERPRET", True)
    got = grange.GRangeEngine(gidx, devices=dev).hists_batched(tables)
    np.testing.assert_array_equal(base, got)


def test_grange_engine_uses_fill(monkeypatch):
    """hist_device_stream with the butterfly fill (interpret mode on CPU)
    is bit-identical to the scatter engine and the numpy oracle."""
    from tests.test_grange import _oracle_hists  # local import, same suite
    rng = np.random.default_rng(5)
    G, KPG, c = 40, 200, 20
    thr = (1 << 64) // c
    kmers = rng.integers(0, thr, size=G * KPG, dtype=np.uint64)
    gids = np.repeat(np.arange(G, dtype=np.int32), KPG)
    gidx = grange.build_grange_index(kmers, gids, G, chunk_slots=2048,
                                     target_mean=8)
    skmers = np.sort(rng.choice(kmers, size=1500, replace=True))
    scounts = rng.integers(1, 6, size=1500).astype(np.uint32)
    # deduplicate (hists expects a unique sorted table)
    skmers, idx = np.unique(skmers, return_index=True)
    scounts = scounts[idx]

    eng = grange.GRangeEngine(gidx)
    base = eng.hists(skmers, scounts)

    monkeypatch.setattr(grange, "_USE_BUCKET_FILL", True)
    monkeypatch.setattr(grange, "_FILL_INTERPRET", True)
    eng2 = grange.GRangeEngine(gidx)
    got = eng2.hists(skmers, scounts)
    np.testing.assert_array_equal(base, got)
    np.testing.assert_array_equal(
        got, _oracle_hists(kmers, gids, G, skmers, scounts))
