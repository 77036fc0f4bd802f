"""Global-range bucketed join (tpu/grange.py) vs a numpy oracle."""

import numpy as np
import pytest

from sylph_tpu.tpu.grange import (HIST_H, GRangeEngine, build_grange_index,
                                  slice_sample)


def _oracle_hists(kmers, gids, G, skmers, scounts):
    hist = np.zeros((G, HIST_H), np.int64)
    idx = np.searchsorted(skmers, kmers)
    idxc = np.minimum(idx, max(skmers.size - 1, 0))
    found = (idx < skmers.size)
    if skmers.size:
        found &= skmers[idxc] == kmers
    cts = np.where(found, scounts[idxc] if scounts.size else 0, 0)
    live = cts > 0
    np.add.at(hist, (gids[live], np.minimum(cts[live], HIST_H - 1)), 1)
    return hist


def _world(seed, m=200_000, G=50, t=5_000, c=20, dup_frac=0.1):
    rng = np.random.default_rng(seed)
    thr = ((1 << 64) - 1) // c
    kmers = rng.integers(0, thr, size=m, dtype=np.uint64)
    # duplicate a slab of k-mers across many genomes (GTDB-style strains)
    ndup = int(m * dup_frac)
    kmers[:ndup] = rng.choice(kmers[ndup:ndup * 2], size=ndup)
    gids = rng.integers(0, G, size=m).astype(np.int32)
    # sample overlaps the index for ~half its table
    sk = np.unique(np.concatenate([
        rng.choice(kmers, size=t // 2),
        rng.integers(0, thr, size=t // 2, dtype=np.uint64)]))
    sc = rng.integers(1, 100, size=sk.size).astype(np.uint32)
    return kmers, gids, sk, sc


@pytest.mark.parametrize("seed,chunk_slots,target_mean", [
    (0, 1 << 16, 64), (1, 1 << 15, 512), (2, 1 << 18, 128)])
def test_grange_hist_matches_oracle(seed, chunk_slots, target_mean):
    kmers, gids, sk, sc = _world(seed)
    G = 50
    gidx = build_grange_index(kmers, gids, G, chunk_slots=chunk_slots,
                              target_mean=target_mean)
    eng = GRangeEngine(gidx)
    got = eng.hists(sk, sc)
    want = _oracle_hists(kmers, gids, G, sk, sc)
    assert (got == want).all()


@pytest.mark.parametrize("seed,nt,ov,target_mean", [
    (0, 4, 128, 512), (1, 2, 128, 1024), (3, 4, 128, 2048)])
def test_grange_tiled_hist_matches_oracle(seed, nt, ov, target_mean):
    """Hash-tiled layout (nt > 1): exact vs the same numpy oracle, heavy
    duplication included (runs never straddle sub-ranges by value)."""
    kmers, gids, sk, sc = _world(seed, dup_frac=0.3)
    G = 50
    gidx = build_grange_index(kmers, gids, G, chunk_slots=1 << 16,
                              target_mean=target_mean, nt=nt, ov=ov)
    assert gidx.nt == nt and gidx.ov > 0
    assert gidx.CI == nt * gidx.tile + gidx.ov
    eng = GRangeEngine(gidx)
    got = eng.hists(sk, sc)
    want = _oracle_hists(kmers, gids, G, sk, sc)
    assert (got == want).all()


def test_grange_auto_layout_pick():
    """Default (no nt/target_mean): the build picks the measured-best
    layout from the REAL per-bucket mean — tiled (nt=4) at bench-class
    geometry, flat when buckets are sparse — and stays oracle-exact."""
    G = 50
    # full chunk at the auto target mean (1024): chunk_slots/B = 1024
    kmers, gids, sk, sc = _world(0, m=1 << 17, G=G, dup_frac=0.2)
    gidx = build_grange_index(kmers, gids, G, chunk_slots=1 << 17)
    assert gidx.nt == 4 and gidx.tile == 256 and gidx.ov > 0
    got = GRangeEngine(gidx).hists(sk, sc)
    assert (got == _oracle_hists(kmers, gids, G, sk, sc)).all()

    # sparse fill (real mean ~128 despite the same target): flat layout
    sparse = build_grange_index(kmers[:1 << 14], gids[:1 << 14], G,
                                chunk_slots=1 << 17)
    assert sparse.nt == 1

    # explicit SYLPH_NT still overrides the auto rule
    import os
    old = os.environ.get("SYLPH_NT")
    os.environ["SYLPH_NT"] = "1"
    try:
        forced = build_grange_index(kmers, gids, G, chunk_slots=1 << 17)
        assert forced.nt == 1
    finally:
        if old is None:
            os.environ.pop("SYLPH_NT", None)
        else:
            os.environ["SYLPH_NT"] = old


def test_grange_tiled_stream_matches_untiled():
    """hist_device_stream over a tiled index == untiled index exactly."""
    import jax
    import jax.numpy as jnp

    from sylph_tpu.tpu import u64

    kmers, gids, sk, sc = _world(8, m=120_000, t=4_000)
    order = np.argsort(kmers, kind="stable")
    kws = dict(chunk_slots=1 << 15, target_mean=256, presorted=True)
    g1 = build_grange_index(kmers[order], gids[order], 50, **kws)
    g4 = build_grange_index(kmers[order], gids[order], 50, nt=4, **kws)
    dev = [jax.devices()[0]]
    sc_small = np.minimum(sc, 3)
    occ = np.repeat(sk, sc_small)
    hi, lo = u64.from_u64_np(occ)
    shi, slo = jax.lax.sort((jnp.asarray(hi), jnp.asarray(lo)),
                            num_keys=2)
    h1, c1 = GRangeEngine(g1, devices=dev).hist_device_stream(
        shi, slo, n_live=occ.size, n_unique=sk.size)
    h4, c4 = GRangeEngine(g4, devices=dev).hist_device_stream(
        shi, slo, n_live=occ.size, n_unique=sk.size)
    assert c1() and c4()
    # tiled index may spill differently; compare only when neither spills
    if not g1.spill_kmers.size and not g4.spill_kmers.size:
        GH = 50 * 64           # last bin counts sentinels (layout-sized)
        assert np.array_equal(np.asarray(h1)[:GH], np.asarray(h4)[:GH])


def test_grange_spill_forced():
    # tiny ci_cap forces heavy spill; result must still be exact
    kmers, gids, sk, sc = _world(3, m=50_000, dup_frac=0.4)
    G = 50
    gidx = build_grange_index(kmers, gids, G, chunk_slots=1 << 14,
                              target_mean=256, ci_cap=8)
    assert gidx.spill_kmers.size > 0
    eng = GRangeEngine(gidx)
    got = eng.hists(sk, sc)
    want = _oracle_hists(kmers, gids, G, sk, sc)
    assert (got == want).all()


def test_grange_boundary_duplicates():
    # the same k-mer value repeated enough to straddle chunk boundaries
    rng = np.random.default_rng(4)
    c = 20
    thr = ((1 << 64) - 1) // c
    base = rng.integers(0, thr, size=1000, dtype=np.uint64)
    kmers = np.repeat(base, 40)             # 40k k-mers, runs of 40
    gids = np.arange(kmers.size, dtype=np.int32) % 7
    G = 7
    sk = np.unique(base[::3])
    sc = rng.integers(1, 5, size=sk.size).astype(np.uint32)
    gidx = build_grange_index(kmers, gids, G, chunk_slots=1 << 10,
                              target_mean=64)
    # with 1024-slot chunks and 40-long runs, some run MUST straddle
    eng = GRangeEngine(gidx)
    got = eng.hists(sk, sc)
    want = _oracle_hists(kmers, gids, G, sk, sc)
    assert (got == want).all()


def test_grange_empty_sample():
    kmers, gids, _sk, _sc = _world(5, m=10_000, t=10)
    gidx = build_grange_index(kmers, gids, 50, chunk_slots=1 << 12)
    eng = GRangeEngine(gidx)
    got = eng.hists(np.empty(0, np.uint64), np.empty(0, np.uint32))
    assert got.sum() == 0


def test_slice_sample_covers_all_matches():
    kmers, gids, sk, sc = _world(6, m=100_000)
    gidx = build_grange_index(kmers, gids, 50, chunk_slots=1 << 14)
    slices = slice_sample(gidx, sk)
    covered = np.zeros(sk.size, bool)
    for s, e in slices:
        covered[s:e] = True
    # every sample k-mer that exists in the index must appear in a slice
    in_index = np.isin(sk, kmers)
    assert covered[in_index].all()


def test_grange_cli_parity(tmp_path, monkeypatch):
    """profile --tpu with the grange engine forced: byte-identical TSV."""
    import gzip
    import io

    from sylph_tpu.engine.device_exec import DeviceContainment
    from sylph_tpu.engine.runner import ContainOptions, contain
    from sylph_tpu.engine.sketch_cmd import SketchOptions, sketch

    rng = np.random.default_rng(21)
    BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
    n_genomes, glen = 80, 20_000
    genomes, paths = [], []
    for g in range(n_genomes):
        seq = rng.integers(0, 4, size=glen).astype(np.uint8)
        genomes.append(seq)
        p = tmp_path / f"g{g:03d}.fa.gz"
        with gzip.open(p, "wb") as f:
            f.write(b">genome%03d\n" % g + BASES[seq].tobytes() + b"\n")
        paths.append(str(p))
    reads = []
    for t, cov in [(3, 2.0), (40, 0.35), (77, 6.0)]:
        src = genomes[t]
        for s in rng.integers(0, glen - 150,
                              size=int(glen * cov / 150)):
            reads.append(src[s:s + 150].copy())
    rf = tmp_path / "sample.fq"
    with open(rf, "wb") as f:
        for i in rng.permutation(len(reads)):
            f.write(b"@r%d\n" % i + BASES[reads[i]].tobytes()
                    + b"\n+\n" + b"I" * 150 + b"\n")
    sketch(SketchOptions(files=[], genomes=paths, reads=[str(rf)],
                         db_out_name=str(tmp_path / "db"),
                         sample_output_dir=str(tmp_path), c=25, k=31,
                         threads=4))

    def run(tpu):
        out = io.StringIO()
        contain(ContainOptions(
            files=[str(tmp_path / "db.syldb"),
                   str(tmp_path / "sample.fq.sylsp")], tpu=tpu),
            pseudotax=True, out=out)
        return out.getvalue()

    host = run(tpu=False)
    monkeypatch.setattr(DeviceContainment, "GRANGE_MIN", 0)
    dev = run(tpu=True)
    assert dev == host
    assert len(host.strip().splitlines()) > 1


def test_hist_device_stream_matches_oracle():
    import jax
    import jax.numpy as jnp

    from sylph_tpu.tpu import u64
    from sylph_tpu.tpu.grange import SENT

    kmers, gids, sk, sc = _world(9, m=150_000, t=4_000)
    G = 50
    gidx = build_grange_index(kmers, gids, G, chunk_slots=1 << 15,
                              target_mean=128)
    eng = GRangeEngine(gidx, devices=[jax.devices()[0]])
    # occurrence stream: each kmer repeated count times (counts clamped
    # small to keep the stream manageable), sentinel-padded, sorted
    sc_small = np.minimum(sc, 3)
    occ = np.repeat(sk, sc_small)
    hi, lo = u64.from_u64_np(occ)
    pad = (1 << int(np.ceil(np.log2(occ.size + 1)))) - occ.size
    hi = np.concatenate([hi, np.full(pad, SENT, np.uint32)])
    lo = np.concatenate([lo, np.full(pad, SENT, np.uint32)])
    shi, slo = jax.lax.sort((jnp.asarray(hi), jnp.asarray(lo)), num_keys=2)
    hist, check = eng.hist_device_stream(shi, slo)
    assert check()
    got = np.asarray(hist)[:G * 64].reshape(G, 64).astype(np.int64)
    # device path has no spill handling on-device; fold it in like hists()
    want = _oracle_hists(kmers, gids, G, sk, sc_small.astype(np.uint32))
    if gidx.spill_kmers.size:
        pytest.skip("spill present; device-stream path excludes spill")
    assert (got == want).all()


@pytest.mark.parametrize("max_resident", [0, 1, 3])
def test_grange_bounded_residency_matches(max_resident):
    """max_resident_chunks (HBM-overflow streaming mode) is output-
    identical to the fully resident engine in both entry points."""
    kmers, gids, sk, sc = _world(7, m=120_000, G=40, t=4_000)
    order = np.argsort(kmers, kind="stable")
    gidx = build_grange_index(kmers[order], gids[order], 40,
                              chunk_slots=1 << 15, target_mean=128,
                              presorted=True)
    assert len(gidx.chunk_hi) > 3
    full = GRangeEngine(gidx)
    part = GRangeEngine(gidx, max_resident_chunks=max_resident)
    assert np.array_equal(full.hists(sk, sc), part.hists(sk, sc))

    import jax
    import jax.numpy as jnp

    from sylph_tpu.tpu import u64

    # the stream entry point is single-device by contract
    dev = [jax.devices()[0]]
    full1 = GRangeEngine(gidx, devices=dev)
    part1 = GRangeEngine(gidx, devices=dev,
                         max_resident_chunks=max_resident)
    shi, slo = u64.from_u64_np(np.repeat(sk, sc.astype(np.int64)))
    shi, slo = jax.lax.sort((jnp.asarray(shi), jnp.asarray(slo)),
                            num_keys=2)
    h1, c1 = full1.hist_device_stream(shi, slo, n_live=int(sc.sum()),
                                      n_unique=sk.size)
    h2, c2 = part1.hist_device_stream(shi, slo, n_live=int(sc.sum()),
                                      n_unique=sk.size)
    assert c1() and c2()
    assert np.array_equal(np.asarray(h1), np.asarray(h2))


def test_hist_device_stream_batched_matches_serial():
    """S-sample batched joins == per-sample hist_device_stream exactly."""
    import jax
    import jax.numpy as jnp

    from sylph_tpu.tpu import u64

    kmers, gids, _, _ = _world(13, m=150_000, G=30)
    order = np.argsort(kmers, kind="stable")
    gidx = build_grange_index(kmers[order], gids[order], 30,
                              chunk_slots=1 << 15, target_mean=128,
                              presorted=True)
    eng = GRangeEngine(gidx, devices=[jax.devices()[0]])
    rng = np.random.default_rng(4)
    S, T = 5, 8192
    streams = []
    max_live = max_uniq = 0
    for s in range(S):
        t_s = int(rng.integers(T // 2, T))
        half = rng.choice(kmers, size=t_s // 2)
        rest = rng.integers(0, ((1 << 64) - 1) // 20, size=t_s - half.size,
                            dtype=np.uint64)
        occ = np.sort(np.concatenate([half, rest]))
        max_live = max(max_live, occ.size)
        max_uniq = max(max_uniq, np.unique(occ).size)
        hi, lo = u64.from_u64_np(occ)
        ph = np.full(T, 0xFFFFFFFF, np.uint32)
        pl_ = np.full(T, 0xFFFFFFFF, np.uint32)
        ph[:occ.size] = hi
        pl_[:occ.size] = lo
        streams.append((ph, pl_))
    shi_s = jnp.asarray(np.stack([a for a, _ in streams]))
    slo_s = jnp.asarray(np.stack([b for _, b in streams]))
    hb, cb = eng.hist_device_stream_batched(shi_s, slo_s,
                                            n_live=max_live,
                                            n_unique=max_uniq)
    assert cb()
    hb = np.asarray(hb)
    for s in range(S):
        h1, c1 = eng.hist_device_stream(shi_s[s], slo_s[s],
                                        n_live=max_live,
                                        n_unique=max_uniq)
        assert c1()
        assert np.array_equal(np.asarray(h1)[:hb.shape[1]], hb[s]), s


def test_hists_batched_matches_serial_including_spill():
    import jax

    kmers, gids, _, _ = _world(17, m=80_000, G=25, dup_frac=0.4)
    gidx = build_grange_index(kmers, gids, 25, chunk_slots=1 << 14,
                              target_mean=256, ci_cap=8)
    assert gidx.spill_kmers.size > 0
    eng = GRangeEngine(gidx, devices=[jax.devices()[0]])
    rng = np.random.default_rng(2)
    tables = []
    for s in range(4):
        t_s = int(rng.integers(500, 3000))
        sk = np.unique(np.concatenate([
            rng.choice(kmers, size=t_s),
            rng.integers(0, ((1 << 64) - 1) // 20, size=t_s,
                         dtype=np.uint64)]))
        sc = rng.integers(1, 90, size=sk.size).astype(np.uint32)
        tables.append((sk, sc))
    hb = eng.hists_batched(tables)
    for s, (sk, sc) in enumerate(tables):
        assert np.array_equal(hb[s], eng.hists(sk, sc)), s


def test_grange_cli_multisample_parity(tmp_path, monkeypatch):
    """profile --tpu, grange forced, >1 sample: batched prefetch TSVs
    byte-identical to the host engine."""
    import gzip
    import io

    from sylph_tpu.engine.device_exec import DeviceContainment
    from sylph_tpu.engine.runner import ContainOptions, contain
    from sylph_tpu.engine.sketch_cmd import SketchOptions, sketch

    rng = np.random.default_rng(31)
    BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
    n_genomes, glen = 40, 12_000
    genomes, paths = [], []
    for g in range(n_genomes):
        seq = rng.integers(0, 4, size=glen).astype(np.uint8)
        genomes.append(seq)
        p = tmp_path / f"g{g:03d}.fa.gz"
        with gzip.open(p, "wb") as f:
            f.write(b">genome%03d\n" % g + BASES[seq].tobytes() + b"\n")
        paths.append(str(p))
    rfs = []
    for si, picks in enumerate([(2, 9), (17, 30), (9, 35)]):
        reads = []
        for t in picks:
            src = genomes[t]
            for s in rng.integers(0, glen - 150, size=160):
                reads.append(src[s:s + 150].copy())
        rf = tmp_path / f"sample{si}.fq"
        with open(rf, "wb") as f:
            for i in rng.permutation(len(reads)):
                f.write(b"@r%d\n" % i + BASES[reads[i]].tobytes()
                        + b"\n+\n" + b"I" * 150 + b"\n")
        rfs.append(str(rf))
    sketch(SketchOptions(files=[], genomes=paths, reads=rfs,
                         db_out_name=str(tmp_path / "db"),
                         sample_output_dir=str(tmp_path), c=25, k=31,
                         threads=4))
    sylsps = [str(tmp_path / f"sample{si}.fq.sylsp") for si in range(3)]

    def run(tpu):
        out = io.StringIO()
        contain(ContainOptions(
            files=[str(tmp_path / "db.syldb")] + sylsps, tpu=tpu),
            pseudotax=True, out=out)
        return out.getvalue()

    host = run(tpu=False)
    monkeypatch.setattr(DeviceContainment, "GRANGE_MIN", 0)
    # single device engages the batched grange prefetch (hists_batched)
    monkeypatch.setenv("SYLPH_TPU_DEVICES", "1")
    dev = run(tpu=True)
    assert dev == host
    assert len(host.strip().splitlines()) > 3
    monkeypatch.setenv("SYLPH_TPU_DEVICES", "8")
    dev8 = run(tpu=True)                 # serial multi-device path
    assert dev8 == host


def _zipf_world(seed, n_unique=40_000, G=60, alpha=1.6, dmax=600, t=4_000):
    """Index with zipf cross-genome duplication (deep conserved runs)."""
    rng = np.random.default_rng(seed)
    thr = ((1 << 64) - 1) // 20
    uniq = np.unique(rng.integers(0, thr, size=n_unique, dtype=np.uint64))
    dv = np.arange(1, dmax + 1, dtype=np.float64)
    p = dv ** (-alpha)
    d = rng.choice(np.arange(1, dmax + 1), size=uniq.size, p=p / p.sum())
    d = np.minimum(d, G)
    kmers = np.repeat(uniq, d)
    base_g = rng.integers(0, G, size=uniq.size)
    off = np.concatenate([np.arange(x) for x in d])
    gids = ((np.repeat(base_g, d) + off) % G).astype(np.int32)
    sk = np.unique(np.concatenate([
        rng.choice(uniq, size=t // 2),
        rng.integers(0, thr, size=t // 2, dtype=np.uint64)]))
    sc = rng.integers(1, 100, size=sk.size).astype(np.uint32)
    return kmers, gids, sk, sc


@pytest.mark.parametrize("seed,nt,heavy_run", [
    (0, 1, 16), (1, 4, 16), (2, 4, 4), (3, 4, 0)])
def test_grange_heavy_runs_match_oracle(seed, nt, heavy_run):
    """Deep duplication runs (zipf, up to 600 genomes per hash) are
    extracted to the heavy CSR and expanded exactly; heavy_run=0
    disables extraction and must also stay exact (spill path)."""
    kmers, gids, sk, sc = _zipf_world(seed)
    G = 60
    gidx = build_grange_index(kmers, gids, G, chunk_slots=1 << 15,
                              target_mean=512, nt=nt,
                              heavy_run=heavy_run)
    if heavy_run:
        assert gidx.n_heavy > 0
        assert gidx.heavy_gids.size >= gidx.n_heavy * heavy_run
        # extraction removes the duplication tail from the grid: spill
        # stays a small residue (run clumping below the threshold) even
        # under the tiled layout
        assert gidx.spill_kmers.size < kmers.size * 0.01
    eng = GRangeEngine(gidx)
    got = eng.hists(sk, sc)
    want = _oracle_hists(kmers, gids, G, sk, sc)
    assert (got == want).all()


def test_grange_heavy_marker_spill_expands():
    """A spilled MARKER slot must expand to its run's real gids in the
    spill list (forced with a tiny ci_cap)."""
    kmers, gids, sk, sc = _zipf_world(5, n_unique=8_000, alpha=1.2,
                                      dmax=50)
    G = 60
    # nt=1 pinned: ci_cap only bounds the flat layout's buckets (the
    # auto rule would pick the tiled layout at this geometry)
    gidx = build_grange_index(kmers, gids, G, chunk_slots=1 << 13,
                              target_mean=1024, ci_cap=8, heavy_run=8,
                              nt=1)
    assert gidx.n_heavy > 0 and gidx.spill_kmers.size > 0
    assert (gidx.spill_gids < G).all()      # no markers leak to spill
    eng = GRangeEngine(gidx)
    got = eng.hists(sk, sc)
    want = _oracle_hists(kmers, gids, G, sk, sc)
    assert (got == want).all()


def test_grange_heavy_batched_matches_serial():
    kmers, gids, _, _ = _zipf_world(7, n_unique=20_000, G=40)
    gidx = build_grange_index(kmers, gids, 40, chunk_slots=1 << 14,
                              target_mean=512, nt=4, heavy_run=8)
    assert gidx.n_heavy > 0
    import jax
    eng = GRangeEngine(gidx, devices=[jax.devices()[0]])
    rng = np.random.default_rng(11)
    tables = []
    for _s in range(3):
        sk = np.unique(np.concatenate([
            rng.choice(kmers, size=1500),
            rng.integers(0, ((1 << 64) - 1) // 20, size=1500,
                         dtype=np.uint64)]))
        sc = rng.integers(1, 70, size=sk.size).astype(np.uint32)
        tables.append((sk, sc))
    hb = eng.hists_batched(tables)
    for s, (sk, sc) in enumerate(tables):
        assert np.array_equal(hb[s], eng.hists(sk, sc)), s
        assert np.array_equal(
            hb[s], _oracle_hists(kmers, gids, 40, sk, sc)), s


def test_grange_heavy_preserves_caller_arrays():
    """presorted=True must not mutate the caller's gid array when heavy
    runs get marker gids."""
    kmers, gids, _, _ = _zipf_world(9, n_unique=5_000)
    order = np.argsort(kmers, kind="stable")
    km_s = kmers[order]
    gg_s = gids[order].copy()
    keep = gg_s.copy()
    gidx = build_grange_index(km_s, gg_s, 60, chunk_slots=1 << 14,
                              presorted=True, heavy_run=8)
    assert gidx.n_heavy > 0
    assert np.array_equal(gg_s, keep)


def test_heavy_stream_all_kernel_paths(monkeypatch):
    """Duplication-heavy OCCURRENCE stream through hist_device_stream
    with the production TPU kernels in interpret mode (butterfly fill +
    fused codes + kcompact): conservation must hold and the histogram
    must match the oracle exactly. Regression for two found bugs: fill
    input-coverage sized from unique counts while zero-weight folded
    duplicates occupy slice positions (fixed by occurrence-based
    ``cover``), and the outer code repack overflowing on kcompact's
    top-packed rows (fixed by column-major flattening)."""
    monkeypatch.setenv("SYLPH_BUCKET_FILL", "interpret")
    monkeypatch.setenv("SYLPH_FUSED_CODES", "interpret")
    import importlib

    import sylph_tpu.tpu.grange as gr
    importlib.reload(gr)
    try:
        import jax
        import jax.numpy as jnp

        from sylph_tpu.tpu import u64 as u64mod

        kmers, gids, sk, sc = _zipf_world(3, n_unique=30_000, G=60)
        G = 60
        gidx = gr.build_grange_index(kmers, gids, G, chunk_slots=1 << 15,
                                     target_mean=512, heavy_run=16)
        assert gidx.n_heavy > 0
        eng = gr.GRangeEngine(gidx, devices=[jax.devices()[0]])
        sc_small = np.minimum(sc, 5).astype(np.uint32)
        occ = np.repeat(sk, sc_small)
        T = 1 << int(np.ceil(np.log2(occ.size)))
        shi = np.full(T, 0xFFFFFFFF, np.uint32)
        slo = np.full(T, 0xFFFFFFFF, np.uint32)
        shi[:occ.size], slo[:occ.size] = u64mod.from_u64_np(occ)
        hd, check = eng.hist_device_stream(
            jnp.asarray(shi), jnp.asarray(slo), n_live=occ.size,
            n_unique=sk.size)
        assert check()
        hG = eng._fold_heavy(np.asarray(hd))
        if gidx.spill_kmers.size:
            hG += eng._spill_hist(sk, sc_small)
        want = _oracle_hists(kmers, gids, G, sk, sc_small)
        assert (hG == want).all()
    finally:
        monkeypatch.undo()
        importlib.reload(gr)


def test_grange_device_mask_with_spill_superset():
    """hists(mask_fn=...) returns a grid-only device mask; OR-ing genomes
    with ANY spill hit (device_exec.candidates_mask's contract) must be a
    superset of the host candidate_mask over the FULL histogram."""
    import jax.numpy as jnp

    from sylph_tpu.engine.prefilter import (candidate_mask,
                                            candidate_mask_device)

    kmers, gids, sk, sc = _world(3)
    G = 50
    # tiny ci_cap forces a real spill list (flat layout)
    gidx = build_grange_index(kmers, gids, G, chunk_slots=1 << 15,
                              target_mean=512, ci_cap=384, nt=1)
    assert gidx.spill_kmers.size > 0
    import jax
    eng = GRangeEngine(gidx, devices=[jax.devices()[0]])
    full = eng.hists(sk, sc)                      # exact, incl. spill

    n_kmers = np.bincount(gids, minlength=G).astype(np.int64)
    kw = dict(k=31, min_ani=0.5, min_number_kmers=50.0,
              min_count_correct=3.0, no_adj=False)
    host_keep = candidate_mask(full.astype(np.int64), n_kmers, **kw)

    def mask_fn(hist_dev):
        return candidate_mask_device(hist_dev, jnp.asarray(
            n_kmers.astype(np.int32)), **kw)

    out = eng.hists(sk, sc, mask_fn=mask_fn)
    assert out.ndim == 1 and out.dtype == bool
    spill_hit = eng._spill_hist(sk, sc)[:, 1:].sum(axis=1) > 0
    dev_keep = out | spill_hit
    dropped = host_keep & ~dev_keep
    assert not dropped.any(), np.flatnonzero(dropped)
    assert host_keep.sum() > 0


def test_grange_device_view_matches_host_upload():
    """The streamed device-resident sample path (DeviceSampleStream ->
    device sort -> device chunk slicing) produces bit-identical
    histograms AND candidate masks to the host pad+upload path."""
    import jax
    import jax.numpy as jnp

    from sylph_tpu.engine.device_sketch import DeviceSampleStream
    from sylph_tpu.engine.prefilter import (candidate_mask,
                                            candidate_mask_device)

    kmers, gids, sk, sc = _world(7)
    G = 50
    gidx = build_grange_index(kmers, gids, G, chunk_slots=1 << 16,
                              target_mean=128)
    dev = jax.devices()[0]
    eng = GRangeEngine(gidx, devices=[dev])
    host = eng.hists(sk, sc)

    # stream the sample in UNSORTED first-insertion-like order, in
    # uneven segments (the view must sort on device)
    rng = np.random.default_rng(3)
    perm = rng.permutation(sk.size)
    uk, uc = sk[perm], sc[perm]
    st = DeviceSampleStream(dev)
    pos = 0
    while pos < uk.size:
        step = int(rng.integers(1, uk.size // 3 + 2))
        st.push(uk[pos:pos + step])
        pos += step
    view = st.finalize(uk, uc)
    assert view is not None and view.n == sk.size

    dv = eng.hists(sk, sc, device_view=view)
    np.testing.assert_array_equal(dv, host)

    # mask path through the device view
    n_kmers = np.bincount(gids, minlength=G).astype(np.int64)
    kw = dict(k=31, min_ani=0.5, min_number_kmers=50.0,
              min_count_correct=3.0, no_adj=False)
    host_keep = candidate_mask(host.astype(np.int64), n_kmers, **kw)

    def mask_fn(hist_dev):
        return candidate_mask_device(hist_dev, jnp.asarray(
            n_kmers.astype(np.int32)), **kw)

    out = eng.hists(sk, sc, mask_fn=mask_fn, device_view=view)
    assert out.ndim == 1
    spill_hit = (eng._spill_hist(sk, sc)[:, 1:].sum(axis=1) > 0
                 if gidx.spill_kmers.size else np.zeros(G, bool))
    dev_keep = out | spill_hit
    assert not (host_keep & ~dev_keep).any()

    # single-dispatch stream sweep (the serving mask path): same mask as
    # the per-chunk device path, plus the measured match total; the
    # match-count hint must not change the mask (conservation-verified)
    ms = eng.candidate_mask_stream(view, mask_fn)
    assert ms is not None
    mask_s, n_matches = ms
    assert mask_s.dtype == bool
    np.testing.assert_array_equal(mask_s, out)
    grid_hist = host - (eng._spill_hist(sk, sc)
                        if gidx.spill_kmers.size else 0)
    assert n_matches == int(grid_hist.sum())
    ms2 = eng.candidate_mask_stream(view, mask_fn,
                                    n_matches=int(n_matches * 1.5) + 8)
    assert ms2 is not None
    np.testing.assert_array_equal(ms2[0], out)
    assert ms2[1] == n_matches


def test_grange_final_stream_recompact(monkeypatch):
    """The measured-density re-compaction of the concatenated code
    stream (engaged when the conservative per-chunk capacities leave the
    stream mostly padding) must not change the histogram or the mask."""
    import importlib

    import sylph_tpu.tpu.grange as gr

    kmers, gids, sk, sc = _world(9)
    G = 50
    gidx = build_grange_index(kmers, gids, G, chunk_slots=1 << 16,
                              target_mean=128)
    eng = GRangeEngine(gidx, devices=None)
    base = eng.hists(sk, sc)
    monkeypatch.setattr(gr, "_RECOMPACT_MIN", 1)
    monkeypatch.setattr(gr, "_CODES_INTERPRET", True)
    engaged = {"n": 0}
    orig = gr._compact_codes

    def spy(codes, density, interpret=False):
        engaged["n"] += 1
        return orig(codes, density, interpret=interpret)

    monkeypatch.setattr(gr, "_compact_codes", spy)
    eng2 = GRangeEngine(gidx, devices=None)
    pre = engaged["n"]
    out = eng2.hists(sk, sc)
    # the recompact chain ran at least once beyond the per-chunk calls
    np.testing.assert_array_equal(out, base)
    assert engaged["n"] > pre


def test_grange_device_view_sparse_weights():
    """Counts that are almost all 1 ship as an exception list and build
    the weight array on device — histograms must still match exactly."""
    import jax

    from sylph_tpu.engine.device_sketch import DeviceSampleStream

    kmers, gids, sk, sc = _world(12)
    sc = np.ones_like(sc)
    rng = np.random.default_rng(4)
    hot = rng.choice(sk.size, size=max(3, sk.size // 200), replace=False)
    sc[hot] = rng.integers(2, 90, hot.size)
    G = 50
    gidx = build_grange_index(kmers, gids, G, chunk_slots=1 << 16,
                              target_mean=128)
    dev = jax.devices()[0]
    eng = GRangeEngine(gidx, devices=[dev])
    host = eng.hists(sk, sc)

    perm = rng.permutation(sk.size)
    st = DeviceSampleStream(dev)
    st.push(sk[perm])
    view = st.finalize(sk[perm], sc[perm])
    assert view is not None and view.w_spec[0] == "sparse"
    dv = eng.hists(sk, sc, device_view=view)
    np.testing.assert_array_equal(dv, host)


def test_grange_cli_parity_raw_reads(tmp_path, monkeypatch):
    """profile --tpu on RAW fastq (single and paired): the device-view
    streamer engages during ingest and the TSV stays byte-identical to
    the host engine."""
    import gzip
    import io

    from sylph_tpu.engine.device_exec import DeviceContainment
    from sylph_tpu.engine.runner import ContainOptions, contain
    from sylph_tpu.engine.sketch_cmd import SketchOptions, sketch

    rng = np.random.default_rng(33)
    BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
    n_genomes, glen = 70, 12_000
    genomes, paths = [], []
    for g in range(n_genomes):
        seq = rng.integers(0, 4, size=glen).astype(np.uint8)
        genomes.append(seq)
        p = tmp_path / f"g{g:03d}.fa.gz"
        with gzip.open(p, "wb") as f:
            f.write(b">genome%03d\n" % g + BASES[seq].tobytes() + b"\n")
        paths.append(str(p))
    reads = []
    for t, cov in [(5, 3.0), (33, 5.0)]:
        src = genomes[t]
        for s in rng.integers(0, glen - 150, size=int(glen * cov / 150)):
            reads.append(src[s:s + 150].copy())
    perm = rng.permutation(len(reads))
    with open(tmp_path / "s.fq", "wb") as f:
        for i in perm:
            f.write(b"@r%d\n" % i + BASES[reads[i]].tobytes()
                    + b"\n+\n" + b"I" * 150 + b"\n")
    with open(tmp_path / "r1.fq", "wb") as f1, \
            open(tmp_path / "r2.fq", "wb") as f2:
        for i in perm:
            f1.write(b"@p%d\n" % i + BASES[reads[i][:75]].tobytes()
                     + b"\n+\n" + b"I" * 75 + b"\n")
            f2.write(b"@p%d\n" % i + BASES[reads[i][75:]].tobytes()
                     + b"\n+\n" + b"I" * 75 + b"\n")
    sketch(SketchOptions(files=[], genomes=paths, reads=[],
                         db_out_name=str(tmp_path / "db"),
                         sample_output_dir=str(tmp_path), c=25, k=31,
                         threads=4))

    def run(tpu, paired):
        out = io.StringIO()
        opts = ContainOptions(files=[str(tmp_path / "db.syldb")], tpu=tpu,
                              c=25)
        if paired:
            opts.first_pair = [str(tmp_path / "r1.fq")]
            opts.second_pair = [str(tmp_path / "r2.fq")]
        else:
            opts.files.append(str(tmp_path / "s.fq"))
        contain(opts, pseudotax=True, out=out)
        return out.getvalue()

    monkeypatch.setattr(DeviceContainment, "GRANGE_MIN", 0)
    # single device so the DeviceSampleStream serving path engages
    monkeypatch.setenv("SYLPH_TPU_DEVICES", "1")
    import sylph_tpu.engine.device_sketch as ds
    seen = {"n": 0}
    orig_fin = ds.DeviceSampleStream.finalize

    def spy(self, kmers, counts):
        view = orig_fin(self, kmers, counts)
        if view is not None:
            seen["n"] += 1
        return view

    monkeypatch.setattr(ds.DeviceSampleStream, "finalize", spy)
    for paired in (False, True):
        host = run(tpu=False, paired=paired)
        pre = seen["n"]
        dev = run(tpu=True, paired=paired)
        assert seen["n"] > pre, f"streamer did not engage (paired={paired})"
        assert dev == host, f"paired={paired}"
        assert len(host.strip().splitlines()) > 1, f"paired={paired}"


def test_device_sample_stream_out_of_sync_falls_back():
    """A streamer that saw fewer k-mers than the finished sketch (or
    none at all) must return None from finalize -> callers take the
    host upload path."""
    import jax

    from sylph_tpu.engine.device_sketch import DeviceSampleStream

    dev = jax.devices()[0]
    st = DeviceSampleStream(dev)
    assert st.finalize(np.arange(4, dtype=np.uint64),
                       np.ones(4, np.uint32)) is None    # nothing pushed
    st2 = DeviceSampleStream(dev)
    st2.push(np.arange(3, dtype=np.uint64))
    assert st2.finalize(np.arange(4, dtype=np.uint64),
                        np.ones(4, np.uint32)) is None   # partial stream
