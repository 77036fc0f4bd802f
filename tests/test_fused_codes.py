"""Fused compare+code-emission kernel, single-array repack and the
bounded histogram scatter (interpret mode on CPU) vs the two-step path.

Covers the round-3 join rework: bucket_join._join_codes_kernel wired via
grange._codes_from_buckets (fused=True), pallas_seeding.repack1_pallas in
grange._compact_codes, and containment._bincount's runs_cap bound."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sylph_tpu.tpu import grange
from sylph_tpu.tpu.containment import _bincount
from sylph_tpu.tpu.pallas_seeding import repack1_pallas, repack_pallas

SENT = np.uint32(0xFFFFFFFF)


@pytest.mark.parametrize("seed,n,row,cap", [
    (0, 5000, 512, 128), (1, 70000, 1024, 256), (2, 4096, 256, 256)])
def test_repack1_matches_pair_repack(seed, n, row, cap):
    rng = np.random.default_rng(seed)
    v = rng.integers(0, 2**31, size=n, dtype=np.uint32)
    v[rng.random(n) < 0.9] = SENT
    got = repack1_pallas(jnp.asarray(v), row=row, cap=cap, interpret=True)
    ref_hi, _ = repack_pallas(jnp.asarray(v), jnp.zeros(n, jnp.uint32),
                              row=row, cap=cap, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref_hi))


@pytest.mark.parametrize("seed,n,row,cap,dens", [
    (0, 100_000, 4096, 512, 0.02), (1, 33_000, 1024, 256, 0.1),
    (2, 70_000, 8192, 256, 0.004)])
def test_repack1_flat_matches_oracle(seed, n, row, cap, dens):
    from sylph_tpu.tpu.bucket_fill import repack1_flat
    rng = np.random.default_rng(seed)
    v = rng.integers(0, 2**31, size=n, dtype=np.uint32)
    v[rng.random(n) > dens] = SENT
    got = np.asarray(repack1_flat(jnp.asarray(v), row=row, cap=cap,
                                  interpret=True))
    nwin = 8 * (-(-n // (row * 8)))          # padded to 8-window blocks
    pad = np.full(nwin * row - n, SENT, np.uint32)
    vin = np.concatenate([v, pad]).reshape(nwin, row)
    want = np.full((nwin, cap), SENT, np.uint32)
    for w in range(nwin):
        live = vin[w][vin[w] != SENT]
        k = min(live.size, cap)
        want[w, :k] = live[:k]           # order preserved, overflow drops
    np.testing.assert_array_equal(got.reshape(nwin, cap), want)


def _chunk_world(seed, B=64, CI=16, CS=8, G=9, width=32):
    """Index grids + a sorted, folded sample slice for _chunk_codes."""
    rng = np.random.default_rng(seed)
    base = 1000
    # index: random live slots, hashes within each bucket's range
    ihi = np.full((B, CI), SENT, np.uint32)
    ilo = np.full((B, CI), SENT, np.uint32)
    gid = np.full((B, CI), G, np.int32)
    for b in range(B):
        occ = int(rng.integers(0, CI))
        h = np.sort(rng.integers(base + b * width, base + (b + 1) * width,
                                 size=occ).astype(np.uint32))
        ihi[b, :occ] = h
        ilo[b, :occ] = rng.integers(0, 2**32, size=occ, dtype=np.uint32)
        gid[b, :occ] = rng.integers(0, G, size=occ)
    # sample: half drawn from index slots (guaranteed matches)
    n = 300
    pick = rng.integers(0, B * CI, size=n // 2)
    shi = np.concatenate([
        ihi.reshape(-1)[pick],
        rng.integers(base, base + B * width, size=n - n // 2,
                     dtype=np.uint32).astype(np.uint32)])
    slo = np.concatenate([
        ilo.reshape(-1)[pick],
        rng.integers(0, 2**32, size=n - n // 2, dtype=np.uint32)])
    keep = shi != SENT
    shi, slo = shi[keep], slo[keep]
    order = np.lexsort((slo, shi))
    shi, slo = shi[order], slo[order]
    w = rng.integers(1, 5, size=shi.size).astype(np.int32)
    P = 512
    ph = np.full(P, SENT, np.uint32)
    pl_ = np.full(P, SENT, np.uint32)
    pw = np.zeros(P, np.int32)
    ph[:shi.size], pl_[:shi.size], pw[:shi.size] = shi, slo, w
    return (jnp.asarray(ihi), jnp.asarray(ilo), jnp.asarray(gid),
            jnp.asarray(ph), jnp.asarray(pl_), jnp.asarray(pw),
            jnp.uint32(base), width, B, CS, G)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fused_chunk_codes_matches_twostep(seed, monkeypatch):
    monkeypatch.setattr(grange, "_CODES_INTERPRET", True)
    ihi, ilo, gid, sh, sl, sw, base, width, B, CS, G = _chunk_world(seed)
    kw = dict(width=width, B=B, CS=CS, n_genomes=G, density=1.0,
              use_pallas=False, use_fill=False)
    ref_c, ref_nl, ref_nc, ref_wl = grange._chunk_codes(
        ihi, ilo, gid, sh, sl, sw, base, fused=False, **kw)
    got_c, got_nl, got_nc, got_wl = grange._chunk_codes(
        ihi, ilo, gid, sh, sl, sw, base, fused=True, **kw)
    assert int(ref_wl) == 0 and int(got_wl) == 0
    assert int(got_nl) == int(ref_nl) == int(got_nc) == int(ref_nc)
    # same multiset of codes (fused path emits identical slot order)
    np.testing.assert_array_equal(np.sort(np.asarray(got_c)),
                                  np.sort(np.asarray(ref_c)))


def test_fused_chunk_codes_batched_matches(monkeypatch):
    monkeypatch.setattr(grange, "_CODES_INTERPRET", True)
    worlds = [_chunk_world(s, B=32, CI=16, CS=24, G=7) for s in (3, 4)]
    ihi, ilo, gid = worlds[0][:3]
    base, width, B, CS, G = worlds[0][6:]
    sh = jnp.stack([w[3] for w in worlds])
    sl = jnp.stack([w[4] for w in worlds])
    sw = jnp.stack([w[5] for w in worlds])
    kw = dict(width=width, B=B, CS=CS, n_genomes=G, density=1.0,
              use_pallas=False, use_fill=False)
    ref_c, ref_nl, _, ref_wl = grange._chunk_codes_batched(
        ihi, ilo, gid, sh, sl, sw, base, fused=False, **kw)
    got_c, got_nl, got_nc, got_wl = grange._chunk_codes_batched(
        ihi, ilo, gid, sh, sl, sw, base, fused=True, **kw)
    assert int(ref_wl) == 0 and int(got_wl) == 0
    assert int(got_nl) == int(ref_nl) == int(got_nc)
    np.testing.assert_array_equal(np.sort(np.asarray(got_c)),
                                  np.sort(np.asarray(ref_c)))


@pytest.mark.parametrize("seed,capr", [(0, 8), (5, 16)])
def test_kcompact_kernel_matches_twostep(seed, capr, monkeypatch):
    """In-kernel column compaction: same code multiset + live count as
    the uncompacted fused path (interpret mode)."""
    monkeypatch.setattr(grange, "_CODES_INTERPRET", True)
    ihi, ilo, gid, sh, sl, sw, base, width, B, CS, G = _chunk_world(
        seed, B=128, CI=16, CS=8, G=9)
    kw = dict(width=width, B=B, CS=CS, n_genomes=G, density=1.0,
              use_pallas=False, use_fill=False)
    ref_c, ref_nl, ref_nc, ref_wl = grange._chunk_codes(
        ihi, ilo, gid, sh, sl, sw, base, fused=True, kcompact=False, **kw)
    from sylph_tpu.tpu.bucket_join import _sample_to_buckets
    dh, dl, dw = _sample_to_buckets(sh, sl, sw, width=width, B=B, CS=CS,
                                    base=int(base))
    got_c, got_nl = grange._codes_from_buckets_compact(
        ihi, ilo, gid, dh, dl, dw, G=G, H=grange.HIST_H, CAPR=capr)
    assert int(got_nl) == int(ref_nl)
    got = np.sort(np.asarray(got_c).reshape(-1))
    ref = np.sort(np.asarray(ref_c).reshape(-1))
    # all live codes present (capacity holds in this world), pads dropped
    np.testing.assert_array_equal(got[got != SENT], ref[ref != SENT])
    assert (got != SENT).sum() == int(ref_nl)


def test_kcompact_overflow_detected(monkeypatch):
    """A column deeper than CAPR must show up as n_live != n_comp."""
    monkeypatch.setattr(grange, "_CODES_INTERPRET", True)
    B, CI, G = 8, 16, 3
    width = 32
    base = np.uint32(100)
    # every slot of column 0..CI live in bucket 0: 8-row columns all live
    ihi = np.full((B, CI), SENT, np.uint32)
    ilo = np.full((B, CI), SENT, np.uint32)
    gid = np.full((B, CI), G, np.int32)
    ihi[:, :] = np.uint32(100)       # same hash everywhere (all buckets)
    for b in range(B):
        ihi[b, :] = np.uint32(100 + b * width)
    ilo[:, :] = 7
    gid[:, :] = 1
    # sample hits every bucket's hash -> all 8 rows of every column live
    sh = np.full(64, SENT, np.uint32)
    sl = np.full(64, SENT, np.uint32)
    sw = np.zeros(64, np.int32)
    sh[:B] = ihi[:, 0]
    sl[:B] = 7
    sw[:B] = 1
    from sylph_tpu.tpu.bucket_join import _sample_to_buckets
    dh, dl, dw = _sample_to_buckets(
        jnp.asarray(sh), jnp.asarray(sl), jnp.asarray(sw), width=width,
        B=B, CS=4, base=int(base))
    # CAPR = TB = 8 covers every column: lossless
    got_c, got_nl = grange._codes_from_buckets_compact(
        jnp.asarray(ihi), jnp.asarray(ilo), jnp.asarray(gid), dh, dl, dw,
        G=G, H=grange.HIST_H, CAPR=8)
    assert int(got_nl) == B * CI              # every slot matched
    assert int((np.asarray(got_c) != SENT).sum()) == int(got_nl)
    # CAPR = 4 < occupancy 8: the drop must be visible as n_comp < n_live
    got_c2, got_nl2 = grange._codes_from_buckets_compact(
        jnp.asarray(ihi), jnp.asarray(ilo), jnp.asarray(gid), dh, dl, dw,
        G=G, H=grange.HIST_H, CAPR=4)
    assert int(got_nl2) == B * CI
    assert int((np.asarray(got_c2) != SENT).sum()) == B * CI // 2


def test_grange_engine_fused_interpret(monkeypatch):
    """Full engine (hists + hist_device_stream) with the fused kernel and
    repack1 compaction in interpret mode == plain engine == oracle."""
    from tests.test_grange import _oracle_hists
    rng = np.random.default_rng(11)
    G, KPG, c = 30, 300, 20
    thr = (1 << 64) // c
    kmers = rng.integers(0, thr, size=G * KPG, dtype=np.uint64)
    gids = np.repeat(np.arange(G, dtype=np.int32), KPG)
    gidx = grange.build_grange_index(kmers, gids, G, chunk_slots=4096,
                                     target_mean=16)
    skmers = np.unique(rng.choice(kmers, size=1200, replace=True))
    scounts = rng.integers(1, 6, size=skmers.size).astype(np.uint32)

    base = grange.GRangeEngine(gidx).hists(skmers, scounts)

    monkeypatch.setattr(grange, "_USE_FUSED_CODES", True)
    monkeypatch.setattr(grange, "_CODES_INTERPRET", True)
    eng = grange.GRangeEngine(gidx, devices=[jax.devices()[0]])
    assert eng._fused
    got = eng.hists(skmers, scounts)
    np.testing.assert_array_equal(base, got)
    np.testing.assert_array_equal(
        got, _oracle_hists(kmers, gids, G, skmers, scounts))

    from sylph_tpu.tpu import u64
    occ = np.repeat(skmers, scounts.astype(np.int64))
    hi, lo = u64.from_u64_np(occ)
    shi, slo = jax.lax.sort((jnp.asarray(hi), jnp.asarray(lo)),
                            num_keys=2)
    h, check = eng.hist_device_stream(shi, slo, n_live=occ.size,
                                      n_unique=skmers.size)
    assert check()
    got2 = np.asarray(h)[:G * 64].reshape(G, 64)
    if not gidx.spill_kmers.size:
        np.testing.assert_array_equal(got2, base)


@pytest.mark.parametrize("cap,expect_exact", [(64, True), (4, False)])
def test_bincount_runs_cap(cap, expect_exact):
    rng = np.random.default_rng(0)
    # >=2^20 elements but few distinct bins: the capped path must be
    # exact whenever the cap covers the run count, and must REPORT the
    # overflow when it does not
    seg = jnp.asarray(rng.integers(0, 16, size=1 << 20).astype(np.int32))
    from sylph_tpu.tpu import containment
    # force the sort path on CPU
    old = containment._FORCE_SORT_BINCOUNT
    containment._FORCE_SORT_BINCOUNT = True
    try:
        want = np.bincount(np.asarray(seg), minlength=40)[:40]
        got, runs = _bincount(seg, 40, runs_cap=cap)
        m = min(41, cap, seg.size)
        if expect_exact:
            assert int(runs) <= m
            np.testing.assert_array_equal(np.asarray(got), want)
        else:
            assert int(runs) > m      # overflow is detected
    finally:
        containment._FORCE_SORT_BINCOUNT = old


def test_hist_from_codes_runs_cap_matches():
    rng = np.random.default_rng(3)
    G = 50
    codes = rng.integers(0, G * grange.HIST_H, size=40000,
                         dtype=np.uint32)
    codes[rng.random(codes.size) < 0.5] = SENT
    ref = grange.hist_from_codes(jnp.asarray(codes), n_genomes=G)
    got, runs = grange.hist_from_codes(jnp.asarray(codes), n_genomes=G,
                                       runs_cap=1 << 20)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def _tiled_world(seed, B=32, nt=4, tile=8, ov=8, CS=8, G=9, width=64):
    """Tiled index grids + sorted sample for _chunk_codes (nt > 1)."""
    rng = np.random.default_rng(seed)
    base = 2048
    CI = nt * tile + ov
    subw = -(-width // nt)
    ihi = np.full((B, CI), SENT, np.uint32)
    ilo = np.full((B, CI), SENT, np.uint32)
    gid = np.full((B, CI), G, np.int32)
    for b in range(B):
        ovr = 0
        for t in range(nt):
            span = min(subw, width - t * subw)
            ct = int(rng.integers(0, tile + 3))
            h = (base + b * width + t * subw
                 + rng.integers(0, span, size=ct)).astype(np.uint32)
            k = min(ct, tile)
            ihi[b, t * tile:t * tile + k] = h[:k]
            ilo[b, t * tile:t * tile + k] = rng.integers(
                0, 2**32, size=k, dtype=np.uint32)
            for x in h[k:]:
                if ovr < ov:
                    ihi[b, nt * tile + ovr] = x
                    ilo[b, nt * tile + ovr] = rng.integers(0, 2**32)
                    ovr += 1
        live = ihi[b] != SENT
        gid[b, live] = rng.integers(0, G, size=live.sum())
    # sample: half real slots, half random in range
    n = 220
    pick = rng.integers(0, B * CI, size=n // 2)
    shi = np.concatenate([
        ihi.reshape(-1)[pick],
        rng.integers(base, base + B * width, size=n - n // 2,
                     dtype=np.uint32).astype(np.uint32)])
    slo = np.concatenate([
        ilo.reshape(-1)[pick],
        rng.integers(0, 2**32, size=n - n // 2, dtype=np.uint32)])
    keep = shi != SENT
    shi, slo = shi[keep], slo[keep]
    order = np.lexsort((slo, shi))
    shi, slo = shi[order], slo[order]
    w = rng.integers(1, 5, size=shi.size).astype(np.int32)
    P = 256
    ph = np.full(P, SENT, np.uint32)
    pl_ = np.full(P, SENT, np.uint32)
    pw = np.zeros(P, np.int32)
    ph[:shi.size], pl_[:shi.size], pw[:shi.size] = shi, slo, w
    return (jnp.asarray(ihi), jnp.asarray(ilo), jnp.asarray(gid),
            jnp.asarray(ph), jnp.asarray(pl_), jnp.asarray(pw),
            jnp.uint32(base), width, B, CS, G, nt, subw, ov)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("kcompact", [False, True])
def test_tiled_pallas_chunk_codes_interpret(seed, kcompact, monkeypatch):
    """Tiled fused kernel (+fill, +kcompact) in interpret mode vs the
    XLA-fallback two-step path — the exact program the TPU runs."""
    monkeypatch.setattr(grange, "_CODES_INTERPRET", True)
    monkeypatch.setattr(grange, "_FILL_INTERPRET", True)
    (ihi, ilo, gid, sh, sl, sw, base, width, B, CS, G, nt, subw,
     ov) = _tiled_world(seed)
    kw = dict(width=width, B=B, CS=CS, n_genomes=G, density=1.0,
              nt=nt, subwidth=subw, ov=ov)
    ref_c, ref_nl, ref_nc, ref_wl = grange._chunk_codes(
        ihi, ilo, gid, sh, sl, sw, base, fused=False, use_pallas=False,
        use_fill=False, **kw)
    assert int(ref_wl) == 0 and int(ref_nl) == int(ref_nc)
    got_c, got_nl, got_nc, got_wl = grange._chunk_codes(
        ihi, ilo, gid, sh, sl, sw, base, fused=True, use_pallas=False,
        use_fill=True, kcompact=kcompact, **kw)
    assert int(got_wl) == 0, "fill lost weight"
    assert int(got_nl) == int(ref_nl), "live count diverges"
    assert int(got_nc) == int(got_nl), "compaction lost codes"
    np.testing.assert_array_equal(
        np.sort(np.asarray(got_c))[-int(ref_nl):],
        np.sort(np.asarray(ref_c))[-int(ref_nl):])


@pytest.mark.parametrize("seed,n,row,cap,dens", [
    (0, 90_000, 2048, 512, 0.15), (1, 40_000, 8192, 1792, 0.16)])
def test_repack2_flat_matches_oracle(seed, n, row, cap, dens):
    from sylph_tpu.tpu.bucket_fill import repack2_flat
    rng = np.random.default_rng(seed)
    hi = rng.integers(0, 2**31, size=n, dtype=np.uint32)
    lo = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    dead = rng.random(n) > dens
    hi[dead] = SENT
    gh, gl = repack2_flat(jnp.asarray(hi), jnp.asarray(lo), row=row,
                          cap=cap, interpret=True)
    gh, gl = np.asarray(gh), np.asarray(gl)
    nwin = 8 * (-(-n // (row * 8)))
    ph = np.concatenate([hi, np.full(nwin * row - n, SENT, np.uint32)])
    plo = np.concatenate([lo, np.full(nwin * row - n, SENT, np.uint32)])
    for w in range(nwin):
        m = ph[w * row:(w + 1) * row] != SENT
        live_h = ph[w * row:(w + 1) * row][m]
        live_l = plo[w * row:(w + 1) * row][m]
        k = min(live_h.size, cap)
        np.testing.assert_array_equal(gh[w * cap:w * cap + k], live_h[:k])
        np.testing.assert_array_equal(gl[w * cap:w * cap + k], live_l[:k])
        assert (gh[w * cap + k:(w + 1) * cap] == SENT).all()
