"""GTDB-config stage attribution + optimization variants (dev tool).

The axon relay makes intra-pipeline sync probes unreliable (first-use sync
programs + 30 ms round trips can exceed the probed stage), so this times
PIPELINE PREFIXES end-to-end — seed-only, +condense, +sort, full — each
with ONE final scalar sync, min-of-reps, and attributes stages by
differencing. Variants toggle the candidate optimizations:

  prefix            seed / +condense / +sort / full
  seed_t            full pipeline with the transposed fused kernel
  fused<F>          seed dispatched as F-batch stacks (fewer, bigger calls)
  joinonly          pre-built sorted stream, grange sweep alone

Usage: python scripts/gbench.py [--genomes 100000] [--reps 3]
       [variants...] (default: prefix joinonly seed_t)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

if os.environ.get("MALLOC_MMAP_THRESHOLD_") is None:
    env = dict(os.environ, MALLOC_MMAP_THRESHOLD_="17179869184",
               MALLOC_TRIM_THRESHOLD_="-1", MALLOC_ARENA_MAX="1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import numpy as np

import jax
if os.environ.get("SYLPH_GBENCH_CPU") == "1":     # smoke-test escape
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

import bench
from bench import C, K, READ_LEN, load_gtdb_index
from sylph_tpu.tpu.grange import GRangeEngine
from sylph_tpu.tpu.pipeline import condense_stream, sketch_batch
from sylph_tpu.tpu.stats import stats_from_histograms


def sync(x):
    return float(np.asarray(x.reshape(-1)[:1].astype(jnp.int32).sum()))


def timeit(fn, reps):
    fn()                        # warm (compiles persist via cache)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), ts


def main():
    argv = sys.argv[1:]

    def opt(name, default):
        return (int(argv[argv.index(name) + 1]) if name in argv
                else default)

    G = opt("--genomes", 100_000)
    reps = opt("--reps", 3)
    N_BATCHES = opt("--batches", bench.N_BATCHES)
    BATCH_READS = opt("--reads", bench.BATCH_READS)
    KPG = opt("--kpg", 7168)
    index_mode = (argv[argv.index("--index") + 1] if "--index" in argv
                  else "device")
    plant = opt("--plant", 1)
    variants = [a for a in argv if not a.startswith("--")
                and not a.isdigit()] or ["prefix", "joinonly", "seed_t"]

    dev = jax.devices()[0]
    bases8 = jax.device_put(jax.random.randint(          # distinct batches
        jax.random.PRNGKey(0), (N_BATCHES, BATCH_READS, READ_LEN), 0, 4,
        dtype=jnp.uint8), dev)
    lengths = jax.device_put(np.full(BATCH_READS, READ_LEN, np.int32),
                             dev)
    total_bp = N_BATCHES * BATCH_READS * READ_LEN

    synth = None
    if index_mode == "device":
        from sylph_tpu.tpu.synth_index import synth_index_device
        gidx = synth_index_device(G, KPG, C, devices=[dev])
        synth = (G, KPG)
    else:
        gidx = load_gtdb_index(G, KPG)
    if plant and synth is not None:
        # realistic hit density: every read carries one index 31-mer
        bases8, n_ab, n_up = bench._plant_reads(jax, jnp, bases8, gidx,
                                                synth=synth)
        print(f"# planted {n_up} unique index 31-mers "
              f"({n_ab} deep-coverage)", flush=True)
    eng = GRangeEngine(gidx, devices=[dev])
    n_kmers_dev = jax.device_put(np.full(G, KPG, np.int32), dev)
    _ = sync(eng._dev_chunks[max(eng._dev_chunks)][0][:1, :1])
    print(f"# index resident: {len(gidx.chunk_hi)} chunks "
          f"[{gidx.B}, {gidx.CI}]", flush=True)

    def seed_chunks():
        hs, ls = [], []
        for i in range(N_BATCHES):
            a, b, _ = sketch_batch(bases8[i].astype(jnp.uint32), lengths,
                                   c=C, k=K)
            hs.append(a.reshape(-1))
            ls.append(b.reshape(-1))
        return jnp.concatenate(hs), jnp.concatenate(ls)

    # measured raw live fraction (one untimed pre-pass): planted reads
    # nearly double the expectation-based estimate, and an under-estimate
    # makes condense_stream TRUNCATE the stream (row capacities clip)
    _ah, _ = seed_chunks()
    live = float(np.asarray(jnp.mean(
        (_ah != jnp.uint32(0xFFFFFFFF)).astype(jnp.float32))))
    del _ah
    print(f"# live fraction (measured): {live:.5f}", flush=True)

    def condensed():
        all_hi, all_lo = seed_chunks()
        return condense_stream(all_hi, all_lo, live)

    def sorted_stream():
        hi, lo = condensed()
        return jax.lax.sort((hi.reshape(-1), lo.reshape(-1)), num_keys=2)

    # exact live/unique/match counts (untimed pre-pass)
    shi1, slo1 = sorted_stream()
    lv = shi1 != jnp.uint32(0xFFFFFFFF)
    n_live = int(np.asarray(jnp.sum(lv.astype(jnp.int32))))
    f1 = (shi1[1:] != shi1[:-1]) | (slo1[1:] != slo1[:-1])
    n_unique = int(np.asarray(jnp.sum((f1 & lv[1:]).astype(jnp.int32))
                              + lv[0].astype(jnp.int32)))
    h1, _ = eng.hist_device_stream(shi1, slo1, n_live=n_live,
                                   n_unique=n_unique)
    n_matches = int(np.asarray(h1[:G * 64].sum()))
    del shi1, slo1, lv, f1, h1
    print(f"# n_live={n_live} n_unique={n_unique} n_matches={n_matches}",
          flush=True)

    def full():
        shi, slo = sorted_stream()
        hist, check = eng.hist_device_stream(shi, slo, n_live=n_live,
                                             n_unique=n_unique,
                                             n_matches=n_matches)
        h2 = hist[:G * 64].reshape(G, 64)
        st = stats_from_histograms(h2, n_kmers_dev, k=K, min_ani=0.5)
        assert check()
        return st.contained

    def report(name, fn):
        best, ts = timeit(fn, reps)
        print(f"{name:18s} {best*1e3:9.1f} ms  "
              f"({total_bp/best/1e9:5.2f} Gbp/s)  "
              f"runs={[round(t*1e3) for t in ts]}", flush=True)
        return best

    if "prefix" in variants:
        t_seed = report("seed", lambda: sync(seed_chunks()[0][:1]))
        t_cond = report("seed+condense", lambda: sync(condensed()[0][:1]))
        t_sort = report("seed+cond+sort",
                        lambda: sync(sorted_stream()[0][:1]))
        t_full = report("full", lambda: sync(full()))
        print(f"# deltas: condense {1e3*(t_cond-t_seed):.1f} ms, "
              f"sort {1e3*(t_sort-t_cond):.1f} ms, "
              f"join+stats {1e3*(t_full-t_sort):.1f} ms", flush=True)

    if "joinonly" in variants:
        shi, slo = sorted_stream()
        _ = sync(shi[:1])

        def join_only():
            hist, check = eng.hist_device_stream(shi, slo, n_live=n_live,
                                                 n_unique=n_unique,
                                                 n_matches=n_matches)
            return sync(hist)
        report("joinonly", join_only)

    if "joinstages" in variants:
        # attribute the join's INTERNAL stages by prefix differencing:
        # fill-only, +compare (grid sum), +codes+compact, full (via
        # joinonly above). Uses the engine's private pieces directly.
        import sylph_tpu.tpu.grange as gr
        shi_s, slo_s = sorted_stream()
        _ = sync(shi_s[:1])
        gx = eng.gidx
        G2 = gx.n_genomes
        n_chunks = len(gx.chunk_hi)
        mean = n_live / n_chunks
        P = gr._quantize_p(1.3 * mean + 6.0 * np.sqrt(mean) + 64,
                           int(shi_s.shape[0]))
        from sylph_tpu.tpu.bucket_join import cell_cs, sample_cs
        if gx.nt > 1:
            CS = cell_cs(max(1, n_unique // n_chunks), gx.B * gx.nt)
        else:
            CS = sample_cs(max(1, n_unique // n_chunks), gx.B,
                           granularity=8)
        cover = int(np.ceil((n_live / n_chunks)
                            / (gx.B * gx.nt))) + 1
        use_fill = ((eng._use_pallas or gr._FILL_INTERPRET)
                    and gr._fill_supported(gx.B * gx.nt, CS, cover))
        est = 1.25 * n_matches / n_chunks
        density = min(1.0, max(est, 512.0) / max(1, gx.B * gx.CI))
        print(f"# joinstages: P={P} CS={CS} fill={use_fill} "
              f"fused={eng._fused} density={density:.4f}", flush=True)

        def _prep():
            lh, ll, hh, hl = eng._edges_dev
            starts, _ml = gr._device_slices(shi_s, slo_s, lh, ll, hh, hl,
                                            P=P)
            fhi, flo, fw = gr._fold_weights(shi_s, slo_s)
            return starts, fhi, flo, fw

        tile = gx.tile if gx.nt > 1 else 0

        @jax.jit
        def _fill_one(ihi, ilo, ch, cl, cw, base):
            dh, dl, dw = gr._fill_or_scatter(ch, cl, cw, base,
                                             width=gx.width, B=gx.B,
                                             CS=CS, use_fill=use_fill,
                                             nt=gx.nt,
                                             subwidth=gx.subwidth,
                                             cover=cover)
            return dh[0, 0].astype(jnp.int32) + dw.sum()

        @jax.jit
        def _grid_one(ihi, ilo, ch, cl, cw, base):
            dh, dl, dw = gr._fill_or_scatter(ch, cl, cw, base,
                                             width=gx.width, B=gx.B,
                                             CS=CS, use_fill=use_fill,
                                             nt=gx.nt,
                                             subwidth=gx.subwidth,
                                             cover=cover)
            if gx.nt > 1:
                dh = dh.reshape(gx.B, gx.nt * CS)
                dl = dl.reshape(gx.B, gx.nt * CS)
                dw = dw.reshape(gx.B, gx.nt * CS)
            grid = gr._grid_from_buckets(ihi, ilo, dh, dl, dw,
                                         use_pallas=True, nt=gx.nt,
                                         tile=tile)
            return grid.sum()

        def _codes_one(ihi, ilo, gidg, ch, cl, cw, base):
            cod, nl, nc, wl = gr._chunk_codes(
                ihi, ilo, gidg, ch, cl, cw, base, width=gx.width,
                B=gx.B, CS=CS, n_genomes=G2, density=density,
                use_pallas=eng._use_pallas, use_fill=use_fill,
                fused=eng._fused, kcompact=eng._kcompact,
                nt=gx.nt, subwidth=gx.subwidth, ov=gx.ov,
                cover=cover)
            return nc + wl

        def _sweep(one, gid=False):
            starts, fhi, flo, fw = _prep()
            acc = []
            for i in range(n_chunks):
                ihi, ilo, gidg = eng._chunk_dev(i)
                s = starts[i]
                ch = jax.lax.dynamic_slice_in_dim(fhi, s, P)
                cl = jax.lax.dynamic_slice_in_dim(flo, s, P)
                cw = jax.lax.dynamic_slice_in_dim(fw, s, P)
                args = (ihi, ilo) + ((gidg,) if gid else ()) + (
                    ch, cl, cw, jnp.uint32(gx.bases[i]))
                acc.append(one(*args))
            return sync(jnp.stack(acc))

        def _prep_only():
            starts, fhi, flo, fw = _prep()
            return sync(starts) + sync(fw[:1])

        report("join:prep", _prep_only)
        report("join:fill", lambda: _sweep(_fill_one))
        report("join:+compare", lambda: _sweep(_grid_one))
        report("join:+codes", lambda: _sweep(_codes_one, gid=True))

        def _codes():
            hist, check = eng.hist_device_stream(shi_s, slo_s,
                                                 n_live=n_live,
                                                 n_unique=n_unique,
                                                 n_matches=n_matches)
            return sync(hist)
        report("join:full", _codes)

    for v in variants:
        if v.startswith("dense"):
            td = float(v[len("dense"):] or 75) / 100

            def sorted_dense():
                all_hi, all_lo = seed_chunks()
                live = (READ_LEN - K + 1) / C / (
                    all_hi.size / (N_BATCHES * BATCH_READS))
                hi, lo = condense_stream(all_hi, all_lo, live,
                                         target_density=td)
                return jax.lax.sort((hi.reshape(-1), lo.reshape(-1)),
                                    num_keys=2)

            def full_dense():
                shi, slo = sorted_dense()
                hist, check = eng.hist_device_stream(
                    shi, slo, n_live=n_live, n_unique=n_unique,
                    n_matches=n_matches)
                assert check()
                return sync(hist)

            report(f"sort(d{td:.2f})",
                   lambda: sync(sorted_dense()[0][:1]))
            report(f"full(d{td:.2f})", full_dense)

    if "fill" in variants:
        import sylph_tpu.tpu.grange as gr_mod
        old = gr_mod._USE_BUCKET_FILL
        gr_mod._USE_BUCKET_FILL = True
        try:
            shi, slo = sorted_stream()
            _ = sync(shi[:1])

            def join_fill():
                hist, check = eng.hist_device_stream(
                    shi, slo, n_live=n_live, n_unique=n_unique,
                    n_matches=n_matches)
                return sync(hist)
            report("joinonly(fill)", join_fill)
            report("full(fill)", lambda: sync(full()))
        finally:
            gr_mod._USE_BUCKET_FILL = old

    if "seed_t" in variants:
        import sylph_tpu.tpu.pipeline as pl_mod
        old = pl_mod._USE_TRANSPOSED_SEED
        pl_mod._USE_TRANSPOSED_SEED = True
        try:
            report("full(seed_t)", lambda: sync(full()))
            report("seed(seed_t)", lambda: sync(seed_chunks()[0][:1]))
        finally:
            pl_mod._USE_TRANSPOSED_SEED = old

    for v in variants:
        if v.startswith("fused"):
            F = int(v[len("fused"):] or 8)
            lengths_f = jnp.tile(lengths, F)
            _ = sync(lengths_f[:1])

            def seed_fused():
                hs, ls = [], []
                for i in range(N_BATCHES // F):
                    bf = bases8[i * F:(i + 1) * F].reshape(
                        F * BATCH_READS, READ_LEN).astype(jnp.uint32)
                    a, b, _ = sketch_batch(bf, lengths_f, c=C, k=K)
                    hs.append(a.reshape(-1))
                    ls.append(b.reshape(-1))
                return jnp.concatenate(hs), jnp.concatenate(ls)

            def full_fused():
                all_hi, all_lo = seed_fused()
                live = (READ_LEN - K + 1) / C / (
                    all_hi.size / (N_BATCHES * BATCH_READS))
                hi, lo = condense_stream(all_hi, all_lo, live)
                shi, slo = jax.lax.sort(
                    (hi.reshape(-1), lo.reshape(-1)), num_keys=2)
                hist, check = eng.hist_device_stream(
                    shi, slo, n_live=n_live, n_unique=n_unique,
                    n_matches=n_matches)
                assert check()
                return sync(hist)

            report(f"seed(x{F})", lambda: sync(seed_fused()[0][:1]))
            report(f"full(x{F})", full_fused)


if __name__ == "__main__":
    main()
