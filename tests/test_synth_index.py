"""Device-synthesized benchmark index (tpu/synth_index.py).

The gtdb bench config can materialize its synthetic index directly on the
accelerator (no host build, no wire upload); these tests pin (a) the
device generator against its host numpy replay bit-for-bit, (b) that the
grange engine serves the synthesized index with histograms identical to a
host-BUILT grange index over the same extracted (kmer, gid) population,
and (c) that the host plant extractor returns only live, invertible index
entries (the planted-read machinery depends on it).
"""

import numpy as np
import pytest

import jax

from sylph_tpu.kmer.hashing import inv_mm_hash64_np, mm_hash64_np
from sylph_tpu.tpu.grange import GRangeEngine, build_grange_index
from sylph_tpu.tpu.synth_index import (_geometry, synth_chunks_host,
                                       synth_index_device,
                                       synth_plants_host)

G, KPG, C = 97, 3000, 50
SENT = np.uint32(0xFFFFFFFF)


@pytest.fixture(scope="module")
def small_synth():
    # chunk_slots small enough to force several chunks at test scale;
    # nt=1 pinned (this fixture pins the FLAT layout's invariants — the
    # auto default is tiled; tiled replay parity is tested separately)
    kw = dict(chunk_slots=1 << 16, target_mean=64)
    gidx = synth_index_device(G, KPG, C, devices=[jax.devices("cpu")[0]],
                              nt=1, **kw)
    host = synth_chunks_host(G, KPG, C, nt=1, **kw)
    return gidx, host, kw


def test_device_matches_host_replay(small_synth):
    gidx, host, _ = small_synth
    assert len(gidx.chunk_hi) == len(host) >= 3
    for (dh, dl, dg), (hh, hl, hg) in zip(
            zip(gidx.chunk_hi, gidx.chunk_lo, gidx.chunk_gid), host):
        np.testing.assert_array_equal(np.asarray(dh), hh)
        np.testing.assert_array_equal(np.asarray(dl), hl)
        np.testing.assert_array_equal(np.asarray(dg), hg)


def test_layout_invariants(small_synth):
    gidx, host, kw = small_synth
    M, n_chunks, B, CI, width, mean, spread = _geometry(G, KPG, C, **kw)
    thr = ((1 << 64) - 1) // C
    total_live = 0
    for ci, (hh, hl, hg) in enumerate(host):
        live = hh.reshape(-1) != SENT
        total_live += int(live.sum())
        h64 = ((hh.reshape(-1)[live].astype(np.uint64) << np.uint64(32))
               | hl.reshape(-1)[live].astype(np.uint64))
        assert (h64 < thr).all()
        assert (h64 >= gidx.edges_u64[ci, 0]).all()
        assert (h64 <= gidx.edges_u64[ci, 1]).all()
        # every value lies inside its bucket's hash_hi range
        j = np.repeat(np.arange(B), CI)[live]
        hi32 = (h64 >> np.uint64(32)).astype(np.int64)
        assert ((hi32 - int(gidx.bases[ci])) // width == j).all()
        g = hg.reshape(-1)[live]
        assert g.min() >= 0 and g.max() < G
    assert total_live == gidx.m
    assert abs(total_live - M) / M < 0.05      # mean-preserving counts


def test_engine_histogram_matches_host_built_index(small_synth):
    gidx, host, kw = small_synth
    # extract the full (kmer, gid) population and build the host grange
    ks, gs = [], []
    for hh, hl, hg in host:
        live = hh.reshape(-1) != SENT
        ks.append(((hh.reshape(-1)[live].astype(np.uint64)
                    << np.uint64(32))
                   | hl.reshape(-1)[live].astype(np.uint64)))
        gs.append(hg.reshape(-1)[live])
    kmers = np.concatenate(ks)
    gids = np.concatenate(gs).astype(np.int32)
    order = np.argsort(kmers, kind="stable")
    built = build_grange_index(kmers[order], gids[order], G,
                               chunk_slots=1 << 15, target_mean=32,
                               presorted=True)

    # sample stream: half planted index entries (strided), half random
    rng = np.random.default_rng(0)
    plants = kmers[:: max(1, kmers.size // 4096)][:4096]
    noise = rng.integers(0, (1 << 63), size=4096, dtype=np.uint64) \
        % np.uint64(((1 << 64) - 1) // C)
    sample = np.sort(np.concatenate([plants, noise, plants[:777]]))
    shi = jax.numpy.asarray((sample >> np.uint64(32)).astype(np.uint32))
    slo = jax.numpy.asarray(sample.astype(np.uint32))

    dev = [jax.devices("cpu")[0]]
    e_synth = GRangeEngine(gidx, devices=dev)
    e_built = GRangeEngine(built, devices=dev)
    h1, ok1 = e_synth.hist_device_stream(shi, slo, n_live=sample.size)
    h2, ok2 = e_built.hist_device_stream(shi, slo, n_live=sample.size)
    assert ok1() and ok2()
    # the trailing bin is the miss/padding bucket and depends on layout
    # geometry; the [G, H] histogram the stats layer consumes must match
    np.testing.assert_array_equal(np.asarray(h1)[: G * 64],
                                  np.asarray(h2)[: G * 64])
    assert int(np.asarray(h1)[: G * 64].sum()) >= plants.size


def test_plants_are_live_invertible_entries(small_synth):
    gidx, host, kw = small_synth
    from bench import _rc31_np

    plants, gids = synth_plants_host(G, KPG, C, per_chunk=256, nt=1,
                                     **kw)
    assert plants.size >= 256
    v = inv_mm_hash64_np(plants)
    assert (v < np.uint64(1) << np.uint64(62)).all()
    assert (v <= _rc31_np(v)).all()
    np.testing.assert_array_equal(mm_hash64_np(v), plants)
    # membership: every plant exists in the materialized index
    all_k = set()
    for hh, hl, _hg in host:
        live = hh.reshape(-1) != SENT
        all_k.update(((hh.reshape(-1)[live].astype(np.uint64)
                       << np.uint64(32))
                      | hl.reshape(-1)[live].astype(np.uint64)).tolist())
    assert all(int(p) in all_k for p in plants.tolist())

    pa, ga = synth_plants_host(G, KPG, C, per_chunk=256, gid_max=13, **kw)
    assert pa.size and (ga < 13).all()


# ---- hash-tiled layout (nt > 1) ----

@pytest.fixture(scope="module")
def small_synth_t():
    kw = dict(chunk_slots=1 << 16, target_mean=64)
    gidx = synth_index_device(G, KPG, C, devices=[jax.devices("cpu")[0]],
                              nt=4, **kw)
    host = synth_chunks_host(G, KPG, C, nt=4, **kw)
    return gidx, host, kw


def test_tiled_device_matches_host_replay(small_synth_t):
    gidx, host, _ = small_synth_t
    assert gidx.nt == 4 and gidx.ov > 0
    assert len(gidx.chunk_hi) == len(host) >= 3
    for (dh, dl, dg), (hh, hl, hg) in zip(
            zip(gidx.chunk_hi, gidx.chunk_lo, gidx.chunk_gid), host):
        np.testing.assert_array_equal(np.asarray(dh), hh)
        np.testing.assert_array_equal(np.asarray(dl), hl)
        np.testing.assert_array_equal(np.asarray(dg), hg)


def test_tiled_layout_invariants(small_synth_t):
    """Every live slot's hash lies inside its tile's hash sub-range (the
    compare kernel's correctness precondition), overflow slots included;
    total live count matches gidx.m."""
    gidx, host, kw = small_synth_t
    nt, tile, ov = gidx.nt, gidx.tile, gidx.ov
    subw = gidx.subwidth
    width = gidx.width
    total_live = 0
    for ci, (hh, hl, hg) in enumerate(host):
        B, CI = hh.shape
        assert CI == nt * tile + ov
        live = hh != SENT
        total_live += int(live.sum())
        j, s = np.nonzero(live)
        within = (hh[live].astype(np.int64) - int(gidx.bases[ci])
                  - j * width)
        assert (within >= 0).all() and (within < width).all()
        sub = np.minimum(within // subw, nt - 1)
        t_col = s // tile                   # tile slots only
        in_tile = s < nt * tile
        assert (sub[in_tile] == t_col[in_tile]).all()
    assert total_live == gidx.m


def test_tiled_engine_matches_untiled_engine(small_synth_t, small_synth):
    """Same sample stream against nt=4 and nt=1 SYNTH indexes: not the
    same k-mer population (layout changes the counters), so assert via
    each engine's own host-built oracle instead."""
    gidx, host, kw = small_synth_t
    ks, gs = [], []
    for hh, hl, hg in host:
        live = hh.reshape(-1) != SENT
        ks.append(((hh.reshape(-1)[live].astype(np.uint64)
                    << np.uint64(32))
                   | hl.reshape(-1)[live].astype(np.uint64)))
        gs.append(hg.reshape(-1)[live])
    kmers = np.concatenate(ks)
    gids = np.concatenate(gs).astype(np.int32)
    order = np.argsort(kmers, kind="stable")
    built = build_grange_index(kmers[order], gids[order], G,
                               chunk_slots=1 << 15, target_mean=32,
                               presorted=True)
    rng = np.random.default_rng(1)
    plants = kmers[:: max(1, kmers.size // 4096)][:4096]
    noise = rng.integers(0, (1 << 63), size=4096, dtype=np.uint64) \
        % np.uint64(((1 << 64) - 1) // C)
    sample = np.sort(np.concatenate([plants, noise, plants[:777]]))
    shi = jax.numpy.asarray((sample >> np.uint64(32)).astype(np.uint32))
    slo = jax.numpy.asarray(sample.astype(np.uint32))
    dev = [jax.devices("cpu")[0]]
    h1, ok1 = GRangeEngine(gidx, devices=dev).hist_device_stream(
        shi, slo, n_live=sample.size)
    h2, ok2 = GRangeEngine(built, devices=dev).hist_device_stream(
        shi, slo, n_live=sample.size)
    assert ok1() and ok2()
    np.testing.assert_array_equal(np.asarray(h1)[: G * 64],
                                  np.asarray(h2)[: G * 64])
    assert int(np.asarray(h1)[: G * 64].sum()) >= plants.size


def test_tiled_plants_are_live_members(small_synth_t):
    gidx, host, kw = small_synth_t
    from bench import _rc31_np

    plants, gids = synth_plants_host(G, KPG, C, per_chunk=256, nt=4,
                                     **kw)
    assert plants.size >= 256
    v = inv_mm_hash64_np(plants)
    assert (v <= _rc31_np(v)).all()
    np.testing.assert_array_equal(mm_hash64_np(v), plants)
    all_k = set()
    for hh, hl, _hg in host:
        live = hh.reshape(-1) != SENT
        all_k.update(((hh.reshape(-1)[live].astype(np.uint64)
                       << np.uint64(32))
                      | hl.reshape(-1)[live].astype(np.uint64)).tolist())
    assert all(int(p) in all_k for p in plants.tolist())
    pa, ga = synth_plants_host(G, KPG, C, per_chunk=256, gid_max=13,
                               nt=4, **kw)
    assert pa.size and (ga < 13).all()


def test_dup_synth_oracle_and_device_expansion():
    """Duplication-skewed synthetic index: device chunks == host replay;
    engine histograms (host CSR path AND device stream + on-device
    marker expansion) == a brute-force oracle over the fully-expanded
    logical (kmer, gid) table."""
    import jax.numpy as jnp

    from sylph_tpu.tpu.grange import HIST_H
    from sylph_tpu.tpu.synth_index import (DupSpec, expand_markers_device,
                                           heavy_gids_np, heavy_lengths_np,
                                           measure_marker_hits)

    G2, KPG2, C2 = 60, 2000, 50
    spec = DupSpec(hf=0.5, r=4, lbase=20, lmod=16)
    kw = dict(chunk_slots=1 << 15, target_mean=256)
    cpu = jax.devices("cpu")[0]
    gidx = synth_index_device(G2, KPG2, C2, devices=[cpu], nt=4,
                              dup=spec, csr_host=True, **kw)
    assert spec.q is not None and gidx.n_heavy > 0
    host = synth_chunks_host(G2, KPG2, C2, nt=4, dup=spec, **kw)
    assert len(host) == len(gidx.chunk_hi) >= 2
    for (dh, dl, dg), (hh, hl, hg) in zip(
            zip(gidx.chunk_hi, gidx.chunk_lo, gidx.chunk_gid), host):
        np.testing.assert_array_equal(np.asarray(dh), hh)
        np.testing.assert_array_equal(np.asarray(dl), hl)
        np.testing.assert_array_equal(np.asarray(dg), hg)

    # logical table: non-marker grid slots + CSR expansion of markers
    ks, gs = [], []
    n_short_runs = 0
    for hh, hl, hg in host:
        live = hh.reshape(-1) != SENT
        v = ((hh.reshape(-1)[live].astype(np.uint64) << np.uint64(32))
             | hl.reshape(-1)[live].astype(np.uint64))
        g = hg.reshape(-1)[live]
        mk = g >= G2
        ks.append(v[~mk])
        gs.append(g[~mk])
        n_short_runs += int(np.unique(v[~mk]).size)
        rr = (g[mk] - G2).astype(np.int64)
        lens = heavy_lengths_np(gidx.n_heavy, spec.lbase,
                                spec.lmod)[rr]
        i = (np.arange(int(lens.sum()), dtype=np.int64)
             - np.repeat(np.concatenate([[0], np.cumsum(lens)[:-1]]),
                         lens))
        ks.append(np.repeat(v[mk], lens))
        gs.append(heavy_gids_np(np.repeat(rr, lens), i, G2))
    kmers = np.concatenate(ks)
    gids = np.concatenate(gs).astype(np.int32)
    # CSR parity: replayed expansion matches the materialized csr_host
    np.testing.assert_array_equal(
        gidx.heavy_ptr,
        np.concatenate([[0], np.cumsum(heavy_lengths_np(
            gidx.n_heavy, spec.lbase, spec.lmod))]))
    assert gidx.m == kmers.size
    # short runs really exist (d > 1 classes populated)
    assert n_short_runs < np.count_nonzero(
        np.concatenate([(h != SENT).reshape(-1) for h, _, _ in host]))

    # sample: grid values + marker values + noise
    rng = np.random.default_rng(5)
    uniq = np.unique(kmers)
    hit = rng.choice(uniq, size=min(3000, uniq.size), replace=False)
    noise = rng.integers(0, ((1 << 64) - 1) // C2, size=2000,
                         dtype=np.uint64)
    sk = np.unique(np.concatenate([hit, noise]))
    sc = rng.integers(1, 6, size=sk.size).astype(np.uint32)

    from tests.test_grange import _oracle_hists
    want = _oracle_hists(kmers, gids, G2, sk, sc)

    eng = GRangeEngine(gidx, devices=[cpu])
    got = eng.hists(sk, sc)                      # host CSR expansion
    np.testing.assert_array_equal(got, want)
    assert want.sum() > 0

    # device-stream path + on-device hash-regenerated expansion
    occ = np.repeat(sk, sc)
    T = 1 << int(np.ceil(np.log2(occ.size)))
    shi = np.full(T, 0xFFFFFFFF, np.uint32)
    slo = np.full(T, 0xFFFFFFFF, np.uint32)
    shi[:occ.size] = (occ >> np.uint64(32)).astype(np.uint32)
    slo[:occ.size] = occ.astype(np.uint32)
    hist, check = eng.hist_device_stream(jnp.asarray(shi),
                                         jnp.asarray(slo),
                                         n_live=occ.size,
                                         n_unique=sk.size)
    assert check()
    n_rows, n_entries = measure_marker_hits(
        hist, G=G2, n_heavy=gidx.n_heavy, lbase=spec.lbase,
        lmod=spec.lmod)
    n_rows, n_entries = int(n_rows), int(n_entries)
    assert n_rows > 0
    exp, ok = expand_markers_device(
        hist, G=G2, n_heavy=gidx.n_heavy, runs_cap=n_rows + 8,
        entries_cap=n_entries + 64, lbase=spec.lbase, lmod=spec.lmod)
    assert bool(ok)
    np.testing.assert_array_equal(
        np.asarray(exp).reshape(G2, HIST_H), want)

    # under-capacity must be DETECTED, never silent
    _, ok2 = expand_markers_device(
        hist, G=G2, n_heavy=gidx.n_heavy, runs_cap=max(1, n_rows // 2),
        entries_cap=n_entries + 64, lbase=spec.lbase, lmod=spec.lmod)
    assert not bool(ok2)
