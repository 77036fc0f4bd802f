"""Headline benchmark: end-to-end device profiling throughput (Gbp/s).

Measures the flagship pipeline on the attached accelerator: streaming
FracMinHash sketch extraction over 2-bit packed read batches (c=200, k=31),
then one containment pass of a multi-genome sketch index (whole-sample
multiplicity counting via sort-merge join -> per-genome histograms ->
batched ANI/lambda stats), i.e. everything `sylph profile` does downstream
of FASTX parsing.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference README claims ~1 Gbp profiled against an 85k-genome
database "in a few seconds" (/root/reference/README.md:16-28); we take
3 s => 0.33 Gbp/s as the sylph multithreaded end-to-end figure the >=10x
target in BASELINE.json is measured against.

Timing notes for this dev environment: the TPU is reached through a relay
with ~30 ms/dispatch latency and minutes-long remote compiles, so the bench
uses a persistent compilation cache, keeps batches device-resident (real
hosts stream 2-bit packed reads at 0.25 B/base over PCIe, >60 Gbp/s), and
forces completion with a scalar fetch (block_until_ready does not sync
through the relay).
"""

import json
import os
import sys
import time

# this dev VM is snapshot-restored: freed-then-refaulted pages cost
# ~0.5 ms each, so keep big numpy buffers on the heap for reuse
# (size_t-parsed env vars; must be set before the process starts)
if __name__ == "__main__" and os.environ.get("MALLOC_MMAP_THRESHOLD_") \
        is None:
    env = dict(os.environ, MALLOC_MMAP_THRESHOLD_="17179869184",
               MALLOC_TRIM_THRESHOLD_="-1", MALLOC_ARENA_MAX="1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

# hash-tiled bucket layout for the bench index (measured ~6% faster at
# GTDB scale, 2026-08-19 battery); SYLPH_NT=1 restores the flat layout.
# build_grange_index's auto rule picks the same layout from the real
# per-bucket mean (the CLI path); the bench pins nt=4 so the disk-cached
# index/plant artifacts keep deterministic names.
if __name__ == "__main__":
    os.environ.setdefault("SYLPH_NT", "4")

import numpy as np

BASELINE_GBPS = 0.33

C, K = 200, 31
READ_LEN = 256                   # Pallas lane-aligned
BATCH_READS = 65536              # ~16.8 Mbp per batch
N_GENOMES = 1024
KMERS_PER_GENOME = 4096          # ~4.2M index k-mers (~0.8 Gbp of genomes)
N_BUCKETS = 256
N_BATCHES = 64                   # ~1.07 Gbp streamed per timed run


def _timed_median(run, reps, label, unit="s", nd=3):
    """Median-of-``reps`` aggregation (repo methodology: run-to-run noise
    on this box is 2-3x, so medians, never single runs or min). Prints
    every rep plus the median/min so min remains visible as a secondary
    figure."""
    import time as _t
    times = []
    for _ in range(reps):
        t0 = _t.perf_counter()
        run()
        times.append(_t.perf_counter() - t0)
    med = float(np.median(times))
    print(f"# {label} timed runs: {[round(x, nd) for x in times]} "
          f"(median {med:.{nd}f}{unit}, min {min(times):.{nd}f}{unit})",
          flush=True)
    return med


def _bench_sketch_only(jax, jnp, sketch_batch, bases, lengths):
    """BASELINE.json config 3: sketch-only FracMinHash extraction rate."""
    import time as _t
    n_batches = 64
    for _ in range(4):
        chi, clo, n = sketch_batch(bases, lengths, c=C, k=K)
    _ = float(np.asarray(n))
    t0 = _t.perf_counter()
    outs = []
    for _ in range(n_batches):
        chi, clo, n = sketch_batch(bases, lengths, c=C, k=K)
        outs.append(chi)
    _ = float(np.asarray(outs[-1][:1, :1].astype(jnp.int32).sum()))
    dt = _t.perf_counter() - t0
    return n_batches * bases.shape[0] * READ_LEN / dt / 1e9


def _bench_multisample(jax, jnp, args, idx_dev):
    """BASELINE.json config 4: S samples batched through one vmapped join."""
    import time as _t

    from sylph_tpu.tpu.pipeline import finish_profile_batched, sketch_batch
    bases, lengths = args
    S = 8
    smp_hi, smp_lo = [], []
    for s in range(S):
        chi, clo, _n = sketch_batch(bases, lengths, c=C, k=K)
        smp_hi.append(chi.reshape(-1))
        smp_lo.append(clo.reshape(-1))
    sh = jnp.stack(smp_hi)
    sl = jnp.stack(smp_lo)
    hist, st = finish_profile_batched(sh, sl, *idx_dev, k=K,
                                      n_genomes=N_GENOMES,
                                      n_buckets=N_BUCKETS, min_ani=0.5)
    _ = float(np.asarray(hist.sum()))
    t0 = _t.perf_counter()
    hist, st = finish_profile_batched(sh, sl, *idx_dev, k=K,
                                      n_genomes=N_GENOMES,
                                      n_buckets=N_BUCKETS, min_ani=0.5)
    _ = float(np.asarray(hist.sum()))
    dt = _t.perf_counter() - t0
    return S / dt        # samples/s through the containment stage


def _synth_sorted_index(M, G, c, seed=1):
    """(sorted uniform u64 hashes below 2^64/c, random genome ids).

    Direct generation of ORDER STATISTICS via exponential spacings —
    O(M) with no 10-minute global argsort; genome ids are i.i.d. so the
    per-chunk gid mix matches a real interleaved database."""
    rng = np.random.default_rng(seed)
    thr = float((1 << 64) // c)
    d = rng.exponential(size=M + 1)
    cum = np.cumsum(d)
    kmers = (cum[:-1] * (thr / cum[-1])).astype(np.uint64)
    # pow2-range draw + modulo: no rejection sampling (30x faster at 7e8;
    # the ~2^-16 modulo bias is irrelevant for a throughput benchmark)
    gids = (rng.integers(0, 1 << 31, size=M, dtype=np.int32)
            % np.int32(G)).astype(np.int32)
    return kmers, gids


def load_gtdb_index(G: int, KPG: int):
    """Disk-cached synthetic GTDB-class grange index (shared with
    scripts/gbench.py): G genomes x KPG k-mers, c=200 hash range."""

    from sylph_tpu.tpu.grange import build_grange_index
    from sylph_tpu.tpu.synth_index import _default_nt

    nt = _default_nt()
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_data",
                         f"gtdb_{G}_{KPG}" + (f"_nt{nt}" if nt > 1
                                              else ""))
    if os.path.exists(os.path.join(cache, "meta.npz")):
        import sylph_tpu.tpu.grange as gr
        meta = np.load(os.path.join(cache, "meta.npz"))
        n_chunks = int(meta["n_chunks"])
        return gr.GRangeIndex(
            [np.load(os.path.join(cache, f"hi{i}.npy"))
             for i in range(n_chunks)],
            [np.load(os.path.join(cache, f"lo{i}.npy"))
             for i in range(n_chunks)],
            [np.load(os.path.join(cache, f"gid{i}.npy"))
             for i in range(n_chunks)],
            meta["bases"], meta["edges"], int(meta["width"]),
            int(meta["B"]), int(meta["CI"]), meta["spill_kmers"],
            meta["spill_gids"], int(meta["m"]), G,
            nt=int(meta["nt"]) if "nt" in meta.files else 1,
            ov=int(meta["ov"]) if "ov" in meta.files else 0)
    kmers, gids = _synth_sorted_index(G * KPG, G, C, seed=1)
    gidx = build_grange_index(kmers, gids, G, target_mean=1024,
                              presorted=True)
    del kmers, gids
    os.makedirs(cache, exist_ok=True)
    np.savez(os.path.join(cache, "meta.npz"),
             n_chunks=len(gidx.chunk_hi), bases=gidx.bases,
             edges=gidx.edges_u64, width=gidx.width, B=gidx.B,
             CI=gidx.CI, spill_kmers=gidx.spill_kmers,
             spill_gids=gidx.spill_gids, m=gidx.m, nt=gidx.nt,
             ov=gidx.ov)
    for i in range(len(gidx.chunk_hi)):
        np.save(os.path.join(cache, f"hi{i}.npy"), gidx.chunk_hi[i])
        np.save(os.path.join(cache, f"lo{i}.npy"), gidx.chunk_lo[i])
        np.save(os.path.join(cache, f"gid{i}.npy"), gidx.chunk_gid[i])
    return gidx


def _rc31_np(v: np.ndarray) -> np.ndarray:
    """Reverse complement of 31-mers packed 2-bit MSB-first in uint64."""
    u = np.uint64
    rc = np.zeros_like(v)
    x = v.copy()
    for _ in range(31):
        rc = (rc << u(2)) | (u(3) - (x & u(3)))
        x >>= u(2)
    return rc


def _usable_plants(gidx, per_chunk: int, gid_max=None):
    """(kmer u64, gid) pairs from the index whose hash INVERTS to a valid
    canonical 31-mer (~1/8 of slots: the synthetic index is random numbers,
    so only some correspond to plantable k-mers). Strided-samples
    ``per_chunk`` live slots per chunk for uniform chunk coverage;
    ``gid_max`` restricts to the first genomes (the "abundant taxa" pool).
    """
    from sylph_tpu.kmer.hashing import inv_mm_hash64_np
    ks, gs = [], []
    for hi, lo, gid in zip(gidx.chunk_hi, gidx.chunk_lo, gidx.chunk_gid):
        h = hi.reshape(-1)
        m = h != np.uint32(0xFFFFFFFF)
        if gid_max is not None:
            m &= gid.reshape(-1) < gid_max
        idx = np.flatnonzero(m)
        if idx.size > per_chunk:
            idx = idx[:: idx.size // per_chunk][:per_chunk]
        ks.append((h[idx].astype(np.uint64) << np.uint64(32))
                  | lo.reshape(-1)[idx].astype(np.uint64))
        gs.append(gid.reshape(-1)[idx])
    k = np.concatenate(ks)
    g = np.concatenate(gs)
    v = inv_mm_hash64_np(k)
    ok = (v < np.uint64(1) << np.uint64(62)) & (v <= _rc31_np(v))
    return k[ok], g[ok]


def _plant_pool(gidx, total, n_abundant=512, abundant_mult=3, synth=None,
                dup=None):
    """Host-side plant list [total] of index k-mer hashes (unshuffled).

    ``n_abundant`` genomes contribute their full usable k-mer set repeated
    ``abundant_mult``x (deep coverage); the rest of the reads carry
    singleton background plants spread over all genomes. ``synth``
    = (G, KPG) regenerates plants from the device-synthesized index's
    counter formulas (tpu/synth_index.py) instead of reading chunk
    arrays (which would be a D2H fetch of the whole index)."""
    if synth is not None:
        from sylph_tpu.tpu.synth_index import synth_plants_host
        sg, skpg = synth
        # disk-cache the (deterministic) plant pools: the bugged-hash
        # inversion sweep costs minutes of single-core host time per run
        from sylph_tpu.tpu.synth_index import _default_nt
        dk = f"_dup{dup.key()}" if dup is not None else ""
        # cache key carries the RESOLVED layout (auto -> 4): the plant
        # counter scheme differs between tiled and flat synth indexes
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".bench_data",
                             f"plants_v2_{sg}_{skpg}_{total}_{n_abundant}"
                             f"_{abundant_mult}_c{C}"
                             f"_nt{_default_nt()}{dk}.npz")
        if os.path.exists(cache):
            z = np.load(cache)
            ab_k, bg_k = z["ab_k"], z["bg_k"]
        else:
            ab_k, _ = synth_plants_host(sg, skpg, C, per_chunk=1 << 22,
                                        gid_max=n_abundant, dup=dup)
            bg_k, _ = synth_plants_host(sg, skpg, C, per_chunk=max(
                1024, int((total - ab_k.size * abundant_mult) * 1.3 * 8
                          // len(gidx.chunk_hi))), dup=dup)
            os.makedirs(os.path.dirname(cache), exist_ok=True)
            np.savez(cache, ab_k=ab_k, bg_k=bg_k)
        ab = np.repeat(ab_k, abundant_mult)
    else:
        ab_k, _ = _usable_plants(gidx, per_chunk=1 << 22,
                                 gid_max=n_abundant)
        ab = np.repeat(ab_k, abundant_mult)
        bg_k, _ = _usable_plants(gidx, per_chunk=max(
            1024, int((total - ab.size) * 1.3 * 8 // len(gidx.chunk_hi))))
    # the extractors emit plants in (chunk, bucket) order, so truncating
    # either pool untouched would concentrate every match in the first
    # hash-range chunks — 4x the per-chunk slice/bucket loads there and
    # starving the rest (found as a conservation-check failure on chip:
    # bg_k[:n_bg] kept only chunks 0-2). Shuffle BEFORE any cut.
    rng = np.random.default_rng(11)
    n_bg = max(0, total - ab.size)
    if bg_k.size < n_bg:        # repeat background if the pool runs short
        bg = np.tile(bg_k, -(-n_bg // max(1, bg_k.size)))[:n_bg]
    else:
        rng.shuffle(bg_k)
        bg = bg_k[:n_bg]
    if ab.size > total:
        rng.shuffle(ab)
    plants = np.concatenate([ab, bg])[:total]
    return plants, int(ab_k.size)


def _plant_payload(jax, plants, n_batches, R, seed):
    """Shuffle + invert a plant list to device (hi, lo) [n_batches, R]."""
    from sylph_tpu.kmer.hashing import inv_mm_hash64_np
    p = plants.copy()
    np.random.default_rng(seed).shuffle(p)
    # the read must carry the k-mer BASES whose sketch hash is the index
    # entry: invert the (bugged) hash back to the canonical 31-mer
    vmer = inv_mm_hash64_np(p)
    phi = jax.device_put((vmer >> np.uint64(32)).astype(np.uint32)
                         .reshape(n_batches, R))
    plo = jax.device_put((vmer & np.uint64(0xFFFFFFFF))
                         .astype(np.uint32).reshape(n_batches, R))
    return phi, plo


def _make_overlay(jax, jnp, R, L):
    """Jitted device overlay: write one 31-mer into each read row at a
    key-derived offset (decode from (hi, lo) by per-lane variable shifts)."""
    @jax.jit
    def overlay(b8, hi, lo, key):
        off = jax.random.randint(key, (R, 1), 0, L - 31 + 1, jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
        j = lane - off
        in_plant = (j >= 0) & (j < 31)
        sh = jnp.clip(2 * (30 - j), 0, 62).astype(jnp.uint32)
        shl = jnp.where(sh < 32, sh, 0)
        shh = jnp.where(sh >= 32, sh - 32, 0)
        lo_sh = (lo[:, None] >> shl) | jnp.where(
            shl > 0, hi[:, None] << (jnp.uint32(32) - shl), 0)
        val = jnp.where(sh < 32, lo_sh, hi[:, None] >> shh) & jnp.uint32(3)
        return jnp.where(in_plant, val.astype(jnp.uint8), b8)
    return overlay


def _plant_reads(jax, jnp, bases8, gidx, seed=7, n_abundant=512,
                 abundant_mult=3, synth=None, dup=None):
    """Overlay one index-derived 31-mer per read (device-side, eager).

    Models the reference's headline workload (mouse-gut reads vs GTDB,
    README.md:16-28): every read carries a k-mer whose sketch hash exists
    in the database, so the join produces realistic hit densities and the
    stats layer sees nonzero histograms. Plant payload crosses the relay
    as (hi, lo) pairs (~8 B/read); decode + overlay run on device."""
    n_batches, R, L = bases8.shape
    plants, n_ab = _plant_pool(gidx, n_batches * R, n_abundant,
                               abundant_mult, synth=synth, dup=dup)
    phi, plo = _plant_payload(jax, plants, n_batches, R, seed)
    overlay = _make_overlay(jax, jnp, R, L)
    kb = jax.random.split(jax.random.PRNGKey(seed), n_batches)
    planted = jnp.stack([overlay(bases8[i], phi[i], plo[i], kb[i])
                         for i in range(n_batches)])
    return planted, n_ab, int(np.unique(plants).size)


def _bench_gtdb(jax, jnp, n_genomes=100_000, kmers_per_genome=7168,
                n_batches=N_BATCHES, n_samples=1, match=True,
                index_mode="device", dup=None):
    """Database-scale config: 1.07 Gbp profiled against a GTDB-class index
    (100k genomes, ~7.2e8 k-mers) resident in HBM via the global-range
    bucketed layout (tpu/grange.py). End-to-end on device: seeding ->
    compaction -> sort -> range-chunked join -> per-genome histograms ->
    batched ANI/lambda stats; one scalar fetch forces completion.

    ``index_mode='device'`` (default) materializes the synthetic index
    on-chip (tpu/synth_index.py: same geometry, occupancy and hash
    population as the host build, zero wire upload — this box's relay
    moves the 10 GB index at ~8 MB/s, i.e. ~20 min/process);
    ``index_mode='host'`` builds/loads the host index and uploads it."""
    import time as _t

    from sylph_tpu.tpu.grange import GRangeEngine
    from sylph_tpu.tpu.pipeline import condense_stream, sketch_batch
    from sylph_tpu.tpu.stats import stats_from_histograms

    G, KPG = n_genomes, kmers_per_genome
    t_build = _t.perf_counter()
    dev = jax.devices()[0]
    synth = None
    if index_mode == "device":
        from sylph_tpu.tpu.synth_index import synth_index_device
        gidx = synth_index_device(G, KPG, C, devices=[dev], dup=dup)
        synth = (G, KPG)
    else:
        assert dup is None, "--dup requires the device-synth index"
        gidx = load_gtdb_index(G, KPG)
    print(f"# index build/load [{index_mode}]: "
          f"{_t.perf_counter() - t_build:.1f}s "
          f"({len(gidx.chunk_hi)} chunks of [{gidx.B}, {gidx.CI}], "
          f"{gidx.spill_kmers.size} spilled"
          + (f", {gidx.n_heavy} heavy runs q={dup.q} "
             f"csr={int(gidx.heavy_ptr[-1])}" if dup is not None else "")
          + ")", flush=True)

    t_up = _t.perf_counter()
    eng = GRangeEngine(gidx, devices=[dev])
    n_kmers_dev = jax.device_put(np.full(G, KPG, np.int32), dev)
    # 64 DISTINCT device-generated read batches (threefry on device: no
    # relay upload) — every timed run streams 1.07 Gbp of distinct reads,
    # like a real sample; identical batches would let the duplicate fold
    # collapse the join's sample side 64x and flatter the compare kernel.
    key = jax.random.PRNGKey(0)
    bases8 = jax.device_put(
        jax.random.randint(key, (n_batches, BATCH_READS, READ_LEN), 0, 4,
                           dtype=jnp.uint8), dev)
    payloads = overlay = None
    if match:
        # realistic profiling shape: every read carries one index k-mer
        if n_samples > 1:
            # per-sample payload permutations (rotation would garble an
            # eagerly-planted 31-mer, so plant inside the seed loop)
            pool, n_ab = _plant_pool(gidx, n_batches * BATCH_READS,
                                     synth=synth, dup=dup)
            payloads = [_plant_payload(jax, pool, n_batches, BATCH_READS,
                                       seed=1000 + s)
                        for s in range(n_samples)]
            overlay = _make_overlay(jax, jnp, BATCH_READS, READ_LEN)
            n_up = int(np.unique(pool).size)
        else:
            bases8, n_ab, n_up = _plant_reads(jax, jnp, bases8, gidx,
                                              synth=synth, dup=dup)
        print(f"# planted index 31-mers: {n_up} unique "
              f"({n_ab} deep-coverage over 512 genomes)", flush=True)
    lengths = jax.device_put(np.full(BATCH_READS, READ_LEN, np.int32), dev)
    # force residency before timing
    _ = float(np.asarray(eng._dev_chunks[max(eng._dev_chunks)][0][:1, :1].astype(jnp.int32)
                         .sum()))
    _ = float(np.asarray(bases8[-1, -1, -1].astype(jnp.int32)))
    print(f"# upload: {_t.perf_counter() - t_up:.1f}s", flush=True)

    live_frac = None                  # measured below; plants ~double the
                                      # expectation-based estimate and an
                                      # under-estimate makes condense_stream
                                      # TRUNCATE (row capacities clip)

    def seed_raw(sample_rot=0):
        chunks_hi, chunks_lo = [], []
        for i in range(n_batches):
            b8 = bases8[i]
            if sample_rot:
                b8 = (b8 + jnp.uint8(sample_rot)) & jnp.uint8(3)
            if payloads is not None:
                phi_s, plo_s = payloads[sample_rot]
                okey = jax.random.fold_in(key, sample_rot * 4096 + i)
                b8 = overlay(b8, phi_s[i], plo_s[i], okey)
            chi, clo, _n = sketch_batch(b8, lengths, c=C, k=K)
            chunks_hi.append(chi.reshape(-1))
            chunks_lo.append(clo.reshape(-1))
        return jnp.concatenate(chunks_hi), jnp.concatenate(chunks_lo)

    def seed_all(sample_rot=0):
        all_hi, all_lo = seed_raw(sample_rot)
        all_hi, all_lo = condense_stream(all_hi, all_lo, live_frac)
        # condense_stream returns row-major [rows, cap]; the grange engine
        # wants ONE flat globally sorted stream (sentinels sort to the tail)
        return jax.lax.sort((all_hi.reshape(-1), all_lo.reshape(-1)),
                            num_keys=2)

    # exact live/unique survivor counts (one untimed pre-pass + scalar
    # fetches): they size the condense capacities, the per-chunk slice P,
    # the compaction density, and the per-bucket sample capacity CS — the
    # sentinel-padded stream length over-estimates all four.
    _ah, _ = seed_raw()
    live_frac = float(np.asarray(jnp.mean(
        (_ah != jnp.uint32(0xFFFFFFFF)).astype(jnp.float32))))
    del _ah
    print(f"# live fraction (measured): {live_frac:.5f}", flush=True)
    _shi, _slo = seed_all()
    _live1 = _shi != jnp.uint32(0xFFFFFFFF)
    n_live = int(np.asarray(jnp.sum(_live1.astype(jnp.int32))))
    _firsts = ((_shi[1:] != _shi[:-1]) | (_slo[1:] != _slo[:-1]))
    n_unique = int(np.asarray(jnp.sum(
        (_firsts & _live1[1:]).astype(jnp.int32))
        + _live1[0].astype(jnp.int32)))
    # measured whole-sample hit count: sizes the code-compaction chain
    # for the ACTUAL match rate (the 2x-unique worst case would leave a
    # ~unique-sized padded code stream whose bincount sort dominates);
    # timed runs stay exact — the conservation check verifies every run.
    _h, _ = eng.hist_device_stream(_shi, _slo, n_live=n_live,
                                   n_unique=n_unique)
    n_matches = int(np.asarray(_h[:-1].sum()))
    exp_caps = None
    if dup is not None:
        # marker expansion caps from the measured warmup hit profile
        from sylph_tpu.tpu.synth_index import measure_marker_hits
        _nr, _ne = measure_marker_hits(_h, G=G, n_heavy=gidx.n_heavy,
                                       lbase=dup.lbase, lmod=dup.lmod)
        _nr, _ne = int(np.asarray(_nr)), int(np.asarray(_ne))
        rc = 1 << int(np.ceil(np.log2(max(_nr * 1.3 + 64, 128))))
        ec = 1 << int(np.ceil(np.log2(max(_ne * 1.3 + 1024, 4096))))
        exp_caps = (min(rc, gidx.n_heavy), ec)
        print(f"# marker hits (measured): {_nr} runs, {_ne} CSR entries "
              f"-> caps {exp_caps}", flush=True)
    del _shi, _slo, _firsts, _live1, _h

    # per-cell capacity: start at the engine's automatic sizing; a rare
    # conservation failure in warmup (capacity tail) bumps it by 8 and
    # re-warms — timed runs always use the settled, verified capacity
    cs_arg = {"cs": None}

    def run_dispatch():
        """Enqueue one full run (seed -> condense -> sort -> join ->
        stats) and the fused result+probe vector WITHOUT fetching —
        everything here is async device dispatch."""
        shi, slo = seed_all()
        hist, check = eng.hist_device_stream(shi, slo, n_live=n_live,
                                             n_unique=n_unique,
                                             n_matches=n_matches,
                                             cs=cs_arg["cs"])
        okx = None
        if dup is not None:
            # heavy-run marker expansion ON DEVICE (hash-regenerated CSR)
            # inside the timed region — the strain-rich serving path
            from sylph_tpu.tpu.synth_index import expand_markers_device
            hist, okx = expand_markers_device(
                hist, G=G, n_heavy=gidx.n_heavy, runs_cap=exp_caps[0],
                entries_cap=exp_caps[1], lbase=dup.lbase, lmod=dup.lmod)
        hist2 = hist[:G * 64].reshape(G, 64)
        st = stats_from_histograms(hist2, n_kmers_dev, k=K, min_ani=0.5)
        # ONE fused fetch: result + conservation probe (+ expansion flag)
        # — each separate np.asarray is a serial ~27 ms relay round trip
        parts = [st.contained.sum().reshape(1).astype(jnp.float32),
                 check.probe.astype(jnp.float32)]
        if okx is not None:
            parts.append(okx.astype(jnp.float32).reshape(1))
        return jnp.concatenate(parts), check, okx is not None

    def run_fetch(state):
        v_dev, check, has_okx = state
        v = np.asarray(v_dev)
        np_ = 1 + int(check.probe.shape[0])
        ok = check(v[1:np_].astype(np.int64))
        if has_okx:
            ok = ok and bool(v[np_])
        return float(v[0]), ok

    def run_once():
        return run_fetch(run_dispatch())

    def _auto_cs():
        from sylph_tpu.tpu.bucket_join import cell_cs, sample_cs
        n_chunks = len(gidx.chunk_hi)
        if gidx.nt > 1:
            return cell_cs(max(1, n_unique // n_chunks),
                           gidx.B * gidx.nt)
        return sample_cs(max(1, n_unique // n_chunks), gidx.B,
                         granularity=8)

    if n_samples > 1:
        # cohort shape: S distinct samples (device-derived base rotations
        # give distinct hash streams), ONE batched index sweep via
        # hist_device_stream_batched — per-chunk dispatch and index HBM
        # reads amortize S-fold.
        S = n_samples
        # sub-cohort size: the index (~10 GB at 100k genomes) plus read
        # batches leave ~4 GB HBM on a 16 GB v5e; 8 full sorted streams +
        # their fold/stack transients OOM'd (battery3), so sweep the
        # cohort in groups — dispatch still amortizes SUB-fold per sweep
        SUB = int(os.environ.get("SYLPH_COHORT_SUB", "4"))

        def run_once_batched():
            tot = 0.0
            ok = True
            for g0 in range(0, S, SUB):
                gs = list(range(g0, min(g0 + SUB, S)))
                streams = [seed_all(sample_rot=s) for s in gs]
                shi_s = jnp.stack([a for a, _ in streams])
                slo_s = jnp.stack([b for _, b in streams])
                del streams
                hist, check = eng.hist_device_stream_batched(
                    shi_s, slo_s, n_live=n_live, n_unique=n_unique,
                    n_matches=n_matches, cs=cs_arg["cs"])
                del shi_s, slo_s
                okx = None
                if dup is not None:
                    from sylph_tpu.tpu.synth_index import \
                        expand_markers_device_batched
                    hist, okx = expand_markers_device_batched(
                        hist, G=G, n_heavy=gidx.n_heavy,
                        runs_cap=exp_caps[0], entries_cap=exp_caps[1],
                        lbase=dup.lbase, lmod=dup.lmod)
                st = stats_from_histograms(
                    hist.reshape(len(gs) * G, 64),
                    jnp.tile(n_kmers_dev, len(gs)), k=K, min_ani=0.5)
                parts = [st.contained.sum().reshape(1).astype(
                    jnp.float32), check.probe.astype(jnp.float32)]
                if okx is not None:
                    parts.append(okx.astype(jnp.float32).reshape(1))
                v = np.asarray(jnp.concatenate(parts))
                np_ = 1 + int(check.probe.shape[0])
                tot += float(v[0])
                ok = check(v[1:np_].astype(np.int64)) and ok
                if okx is not None:
                    ok = ok and bool(v[np_])
            return tot, ok

        t0 = _t.perf_counter()
        _, ok = run_once_batched()
        print(f"# batched warmup ({S} samples): "
              f"{_t.perf_counter() - t0:.1f}s exact={ok}", flush=True)
        for _bump in range(2):
            if ok:
                break
            cs_arg["cs"] = (cs_arg["cs"] or _auto_cs()) + 8
            print(f"# conservation miss: retrying with CS="
                  f"{cs_arg['cs']}", flush=True)
            _, ok = run_once_batched()
        def timed():
            _, ok2 = run_once_batched()
            assert ok2, "grange conservation check failed"

        med = _timed_median(timed, 5, f"batched ({S} samples/run)")
        total = S * n_batches * BATCH_READS * READ_LEN
        return total / med / 1e9

    print(f"# n_live={n_live} n_unique={n_unique} n_matches={n_matches} "
          "warmup begin", flush=True)
    t0 = _t.perf_counter()
    _, ok = run_once()        # compile + warm (cache-persistent)
    print(f"# warmup: {_t.perf_counter() - t0:.1f}s exact={ok}", flush=True)
    for _bump in range(2):
        if ok:
            break
        cs_arg["cs"] = (cs_arg["cs"] or _auto_cs()) + 8
        print(f"# conservation miss: retrying with CS={cs_arg['cs']}",
              flush=True)
        _, ok = run_once()

    if "--stages" in sys.argv:
        # sync-chained stage split. UNRELIABLE through the axon relay:
        # partial-pipeline syncs have measured LONGER than the full run
        # (first-use sync programs + relay round trips dominate) — treat
        # these as qualitative only; the timed runs below are the truth.
        def sync(x):
            return float(np.asarray(x.reshape(-1)[:1].astype(jnp.int32)
                                    .sum()))
        for name, stop in (("seed+cond+sort", 2), ("join+hist", 3)):
            t0 = _t.perf_counter()
            shi, slo = seed_all()
            if stop >= 3:
                hist, check = eng.hist_device_stream(
                    shi, slo, n_live=n_live, n_unique=n_unique)
                sync(hist)
            else:
                sync(shi)
            print(f"# stage through {name}: "
                  f"{_t.perf_counter() - t0:.3f}s", flush=True)
    def timed():
        _, ok2 = run_once()
        assert ok2, "grange conservation check failed"

    timed()     # second untimed warm run: run-1 of a pass is routinely
    #             the slowest (relay spin-up) across recorded batteries
    if os.environ.get("SYLPH_BENCH_AB"):
        _timed_median(timed, 7, "gtdb serial (A/B)")
    if os.environ.get("SYLPH_BENCH_PIPELINE", "0") != "0":
        # NEGATIVE RESULT (2026-08-20, kept opt-in): dispatching run i+1
        # before fetching run i's fused result measured WORSE through
        # the axon relay (median 0.826 s vs 0.456 s serial in the same
        # window, noisy 0.47-1.32) — the queued dispatch traffic delays
        # the fetch round trip instead of hiding it. On a direct-attach
        # TPU this is the standard overlap; here serial runs are the
        # production mode. Per-iteration time = dispatch(i+1) +
        # fetch(i); every run's conservation check still verifies.
        reps = 7
        times = []
        st = run_dispatch()
        for _i in range(reps):
            t0 = _t.perf_counter()
            nxt = run_dispatch()
            _, ok2 = run_fetch(st)
            assert ok2, "grange conservation check failed"
            st = nxt
            times.append(_t.perf_counter() - t0)
        _, ok2 = run_fetch(st)
        assert ok2, "grange conservation check failed"
        med = float(np.median(times))
        print(f"# gtdb pipelined timed runs: "
              f"{[round(x, 3) for x in times]} (median {med:.3f}s, "
              f"min {min(times):.3f}s)", flush=True)
    else:
        med = _timed_median(timed, 7, "gtdb")
    total_bases = n_batches * BATCH_READS * READ_LEN
    return total_bases / med / 1e9


def _bench_e2e(jax, paired=False):
    """True end-to-end: gzip fastq file(s) -> profile TSV through the real
    engine (parse + seed + dedup + containment + stats + formatting),
    1.07 Gbp against the 64-genome fixture db. Requires
    scripts/gen_e2e_fixture.py to have been run once (--paired for the
    mate-pair fixture, which additionally drives the pair-fingerprint
    bloom dedup)."""
    import io as _io
    import time as _t

    from sylph_tpu.engine.runner import ContainOptions, contain

    root = os.path.dirname(os.path.abspath(__file__))
    db = os.path.join(root, ".bench_data", "e2e", "db.syldb")
    reads = os.path.join(root, ".bench_data", "e2e", "reads.fastq.gz")
    r1 = os.path.join(root, ".bench_data", "e2e", "reads_R1.fastq.gz")
    r2 = os.path.join(root, ".bench_data", "e2e", "reads_R2.fastq.gz")
    need = [db, r1, r2] if paired else [db, reads]
    if not all(os.path.exists(p) for p in need):
        raise SystemExit("run scripts/gen_e2e_fixture.py"
                         + (" --paired" if paired else "") + " first")
    total_bp = (2 * (1_073_741_824 // 300) * 150 if paired
                else 1_073_741_700)

    def run():
        out = _io.StringIO()
        t0 = _t.perf_counter()
        if paired:
            contain(ContainOptions(files=[db], first_pair=[r1],
                                   second_pair=[r2], tpu=True, threads=4),
                    pseudotax=True, out=out)
        else:
            contain(ContainOptions(files=[db, reads], tpu=True,
                                   threads=4), pseudotax=True, out=out)
        dt = _t.perf_counter() - t0
        tsv = out.getvalue()
        assert len(tsv.strip().splitlines()) >= 4, tsv  # header + hits
        return dt

    warm = run()                    # compiles cached across processes
    print(f"# e2e warm-up run: {warm:.1f}s", flush=True)
    times = [run() for _ in range(5)]
    med = float(np.median(times))

    # host-I/O floor: decode-only pass over the file (page-warm, after
    # the timed runs so it doesn't perturb nor flatter them)
    from sylph_tpu.io.fastx import stream_blocks
    t0 = _t.perf_counter()
    nbytes = sum(len(b) for b in stream_blocks(r1 if paired else reads))
    t_io = _t.perf_counter() - t0
    print(f"# e2e timed runs: {[round(x, 1) for x in times]} "
          f"(median {med:.1f}s, min {min(times):.1f}s; decode-only floor "
          f"{t_io:.1f}s, {nbytes / t_io / 1e6:.0f} MB/s text)", flush=True)
    return total_bp / med / 1e9


def _bench_gtdb_cli(jax):
    """GTDB scale through the ACTUAL CLI: `sylph profile --tpu` of a
    1.07 Gbp planted fastq.gz against a real 100k-genome / 7.2e8-k-mer
    .syldb — gzip decode, FASTX parse, sketch, dedup, grange containment,
    lambda statistics, TSV. The one-time syldb load + grange build is
    reported separately (the reference pays an analogous 13 GB load,
    README.md:42-48). Requires scripts/gen_gtdb_cli_fixture.py."""
    import io as _io
    import time as _t

    from sylph_tpu.engine.runner import ContainOptions, contain

    root = os.path.dirname(os.path.abspath(__file__))
    db = os.path.join(root, ".bench_data", "gtdb_cli", "db.syldb")
    reads = os.path.join(root, ".bench_data", "gtdb_cli",
                         "reads.fastq.gz")
    if not (os.path.exists(db) and os.path.exists(reads)):
        raise SystemExit("run scripts/gen_gtdb_cli_fixture.py first")
    # serving shape: timed runs reuse the resident device index (the
    # warm-up pays the one-time syldb load + grange build + upload, as
    # the reference amortizes its 13 GB load over a session); the built
    # layout disk-caches so later processes skip the 10-20 min rebuild
    os.environ["SYLPH_TPU_CACHE_INDEX"] = "1"
    os.environ.setdefault("SYLPH_GRANGE_CACHE",
                          os.path.join(root, ".bench_data", "gtdb_cli"))
    total_bp = (1_073_741_824 // 150) * 150

    def run():
        out = _io.StringIO()
        t0 = _t.perf_counter()
        contain(ContainOptions(files=[db, reads], tpu=True, threads=4),
                pseudotax=True, out=out)
        dt = _t.perf_counter() - t0
        rows = out.getvalue().strip().splitlines()
        assert len(rows) >= 33, f"expected ~64 abundant genomes:\n" \
            + "\n".join(rows[:5])
        return dt

    warm = run()            # includes one-time syldb load + grange build
    print(f"# gtdb_cli warm-up run (incl. db load): {warm:.1f}s",
          flush=True)
    warm2 = run()           # second untimed warm run: first post-load run
    #                         pays residual compiles/caches and is
    #                         routinely the slowest of a pass
    print(f"# gtdb_cli warm-up run 2: {warm2:.1f}s", flush=True)
    times = [run() for _ in range(5)]
    med = float(np.median(times))
    print(f"# gtdb_cli timed runs: {[round(x, 1) for x in times]} "
          f"(median {med:.1f}s, min {min(times):.1f}s)", flush=True)
    if "--stages" in sys.argv:
        # one extra debug-logged run: stage timers attribute the wall
        # time (ingest phases, grange sweep, stats) to stderr
        import logging
        lg = logging.getLogger("sylph")
        old_level = lg.level
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter("%(message)s"))
        lg.addHandler(h)
        lg.setLevel(logging.DEBUG)
        try:
            dt = run()
            print(f"# gtdb_cli stage-logged run: {dt:.1f}s", flush=True)
        finally:
            lg.setLevel(old_level)
            lg.removeHandler(h)
    return total_bp / med / 1e9


def _bench_sketchdb():
    """Database build: `sylph sketch` over ~1.07 Gbp of genome fasta
    (107 x 10 Mbp synthetic) -> .syldb, timed end-to-end on the host
    (parse + striped SIMD seeding + dup-drop + spacing + bincode write).
    The reference counterpart is sketching a GTDB slice."""
    import shutil
    import time as _t

    from sylph_tpu.engine.sketch_cmd import SketchOptions, sketch

    root = os.path.dirname(os.path.abspath(__file__))
    gdir = os.path.join(root, ".bench_data", "sketchdb")
    os.makedirs(gdir, exist_ok=True)
    NG, GLEN = 107, 10_000_000
    BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
    rng = np.random.default_rng(3)
    paths = []
    t0 = _t.perf_counter()
    for g in range(NG):
        p = os.path.join(gdir, f"g{g:03d}.fa")
        paths.append(p)
        if not os.path.exists(p) or os.path.getsize(p) < GLEN:
            with open(p, "wb") as f:
                f.write(b">g%03d\n" % g)
                f.write(BASES[rng.integers(0, 4, GLEN,
                                           dtype=np.uint8)].tobytes())
                f.write(b"\n")
    print(f"# genome fixture: {_t.perf_counter() - t0:.0f}s "
          f"({NG * GLEN / 1e9:.2f} Gbp)", flush=True)

    times = []
    for rep in range(3):
        out = os.path.join(gdir, "bench_db")
        if os.path.exists(out + ".syldb"):
            os.unlink(out + ".syldb")
        t0 = _t.perf_counter()
        sketch(SketchOptions(files=[], genomes=paths, db_out_name=out,
                             threads=4))
        times.append(_t.perf_counter() - t0)
        print(f"# sketch run {rep}: {times[-1]:.1f}s", flush=True)
    return NG * GLEN / float(np.median(times)) / 1e9


def _require_backend(timeout_s: float):
    """Bounded accelerator discovery: the axon relay can hang backend init
    indefinitely when down; fail loudly instead of wedging the caller."""
    import threading

    import jax
    done = threading.Event()
    devs = []

    def probe():
        try:
            devs.extend(jax.devices())
        finally:
            done.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        print(f"# FATAL: no accelerator after {timeout_s:.0f}s "
              "(relay down?) — no benchmark result", file=sys.stderr,
              flush=True)
        os._exit(3)
    return devs


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _require_backend(float(os.environ.get("SYLPH_BENCH_INIT_TIMEOUT",
                                          "900")))

    import jax.numpy as jnp

    from sylph_tpu.tpu.pipeline import (build_host_index, condense_stream,
                                        finish_profile, sketch_batch)

    rng = np.random.default_rng(0)
    bases_per_batch = BATCH_READS * READ_LEN

    bases = jax.device_put(rng.integers(
        0, 4, size=(BATCH_READS, READ_LEN), dtype=np.uint8).astype(np.uint32))
    lengths = jax.device_put(np.full(BATCH_READS, READ_LEN, np.int32))
    thr = ((1 << 64) - 1) // C
    genomes = [rng.integers(0, thr, size=KMERS_PER_GENOME, dtype=np.uint64)
               for _ in range(N_GENOMES)]
    idx = build_host_index(genomes)
    idx_dev = jax.device_put((idx.hi, idx.lo, idx.genome_ids, idx.n_kmers))

    def run_once(n_batches):
        chunks_hi, chunks_lo = [], []
        for _ in range(n_batches):
            chi, clo, _n = sketch_batch(bases, lengths, c=C, k=K)
            chunks_hi.append(chi.reshape(-1))
            chunks_lo.append(clo.reshape(-1))
        all_hi = jnp.concatenate(chunks_hi)
        all_lo = jnp.concatenate(chunks_lo)
        # the per-read packed stream is ~9% dense; butterfly-repack it so
        # the containment sort pays only for live hashes
        live = (READ_LEN - K + 1) / C / (all_hi.size / (N_BATCHES
                                                        * BATCH_READS))
        all_hi, all_lo = condense_stream(all_hi, all_lo, live)
        hist, st = finish_profile(
            all_hi, all_lo, *idx_dev, k=K, n_genomes=N_GENOMES,
            n_buckets=N_BUCKETS, min_ani=0.5)
        # scalar D2H fetch forces completion of the whole chain
        return float(np.asarray(hist.sum()))

    import sys
    # default config is the DATABASE-SCALE workload (100k genomes,
    # 7.2e8 index k-mers, every read planted with a real index 31-mer) —
    # the scale of the reference's headline GTDB-R220 claim. The round-1
    # 1024-genome toy config remains as --config profile.
    config = (sys.argv[sys.argv.index("--config") + 1]
              if "--config" in sys.argv else "gtdb")
    if config == "sketch":
        gbps = _bench_sketch_only(jax, jnp, sketch_batch, bases, lengths)
        print(json.dumps({"metric": "sketch_throughput",
                          "value": round(gbps, 4), "unit": "Gbp/s",
                          "vs_baseline": round(gbps / BASELINE_GBPS, 2)}))
        return
    if config == "gtdb":
        ng = (int(sys.argv[sys.argv.index("--genomes") + 1])
              if "--genomes" in sys.argv else 100_000)
        ns = (int(sys.argv[sys.argv.index("--samples") + 1])
              if "--samples" in sys.argv else 1)
        mt = (sys.argv[sys.argv.index("--match") + 1] != "0"
              if "--match" in sys.argv else True)
        im = (sys.argv[sys.argv.index("--index") + 1]
              if "--index" in sys.argv else "device")
        dup = None
        if "--dup" in sys.argv:
            # strain-rich database shape: ~half the occurrence mass in
            # extracted heavy duplication runs (zipf(2.0)/d~1000-class),
            # short runs (d<=16) inside the grid cells
            from sylph_tpu.tpu.synth_index import DupSpec
            dup = DupSpec()
        gbps = _bench_gtdb(jax, jnp, n_genomes=ng, n_samples=ns, match=mt,
                           index_mode=im, dup=dup)
        if dup is None and ns == 1 and ng == 100_000:
            # last-recorded secondary-config medians (docs/BENCHMARKS.md
            # "Round-5 battery results") so the driver artifact's tail
            # carries round-over-round comparability beyond the default
            # config; values are quiet-window medians, not this run's.
            for line in (
                "# recorded r5 medians (docs/BENCHMARKS.md): "
                "gtdb --dup 1.07-1.14 Gbp/s; --samples 8 "
                "1.12-1.58 Gbp/s/sample",
                "# recorded r5: e2e 0.30 Gbp/s (0.91x, decode-bound); "
                "gtdb_cli 5.78 s best-window (0.185 Gbp/s); "
                "--serve x8 5.91 s/req; sketchdb build 1.28 Gbp/s",
            ):
                print(line, flush=True)
        print(json.dumps({"metric": "gtdb_profile_throughput"
                          + ("_dupskew" if dup is not None else ""),
                          "value": round(gbps, 4), "unit": "Gbp/s",
                          "vs_baseline": round(gbps / BASELINE_GBPS, 2)}))
        return
    if config == "gtdb_cli":
        gbps = _bench_gtdb_cli(jax)
        print(json.dumps({"metric": "gtdb_cli_file_to_tsv_throughput",
                          "value": round(gbps, 4), "unit": "Gbp/s",
                          "vs_baseline": round(gbps / BASELINE_GBPS, 2)}))
        return
    if config in ("e2e", "e2e_paired"):
        gbps = _bench_e2e(jax, paired=config == "e2e_paired")
        print(json.dumps({"metric": f"{config}_file_to_tsv_throughput",
                          "value": round(gbps, 4), "unit": "Gbp/s",
                          "vs_baseline": round(gbps / BASELINE_GBPS, 2)}))
        return
    if config == "sketchdb":
        gbps = _bench_sketchdb()
        print(json.dumps({"metric": "sketch_db_build_throughput",
                          "value": round(gbps, 4), "unit": "Gbp/s",
                          "vs_baseline": None}))
        return
    if config == "multisample":
        sps = _bench_multisample(jax, jnp, (bases, lengths), idx_dev)
        print(json.dumps({"metric": "multisample_containment",
                          "value": round(sps, 3), "unit": "samples/s",
                          "vs_baseline": None}))
        return

    run_once(N_BATCHES)           # compile + warm up (cache-persistent)
    times = []
    for _ in range(5):            # median-of-5: host scheduler noise ~15%
        t0 = time.perf_counter()
        run_once(N_BATCHES)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    print(f"# timed runs: {[round(x, 3) for x in sorted(times)]} "
          f"(median {dt:.3f}s, spread "
          f"{(max(times) - min(times)) / dt * 100:.0f}%)",
          file=sys.stderr, flush=True)

    total_bases = N_BATCHES * bases_per_batch
    gbps = total_bases / dt / 1e9
    print(json.dumps({
        "metric": "profile_throughput",
        "value": round(gbps, 4),
        "unit": "Gbp/s",
        "vs_baseline": round(gbps / BASELINE_GBPS, 2),
    }))


def _is_transient_backend_error(e: BaseException) -> bool:
    s = f"{type(e).__name__}: {e}"
    return any(t in s for t in (
        "UNAVAILABLE", "Unavailable", "Socket closed", "DEADLINE_EXCEEDED",
        "Connection reset", "INTERNAL: ", "backend setup/compile error"))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        # the axon relay drops mid-run for minutes at a time (measured
        # multi-hour outages); one fresh-process retry after a pause
        # saves the round artifact when the blip is transient. The
        # backend client can't recover in-process, hence the re-exec.
        tries = int(os.environ.get("SYLPH_BENCH_RETRY", "0"))
        if tries >= 2 or not _is_transient_backend_error(e):
            raise
        print(f"# transient backend failure ({type(e).__name__}); "
              f"retry {tries + 1}/2 in 120s", file=sys.stderr, flush=True)
        time.sleep(120)
        env = dict(os.environ, SYLPH_BENCH_RETRY=str(tries + 1))
        os.execve(sys.executable, [sys.executable] + sys.argv, env)
