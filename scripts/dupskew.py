"""Duplication-skew characterization for the hash-tiled grange layout.

Real databases duplicate k-mers ACROSS genomes: a conserved 31-mer shared
by d genomes occupies d index slots at the SAME hash value — one bucket,
and under the tiled layout (nt>1) one hash sub-range tile. Tiles are
sized at the sub-range mean, so duplication runs eat tile + shared
overflow capacity and then spill to the host-probed overflow list; nt=1
buckets absorb the same runs until ci_cap. This script quantifies the
tradeoff that gates the CLI's nt default:

  for each duplication profile (zipf exponent x max-dup cap):
    build nt=1 and nt=4 layouts over the same (kmer, gid) index and
    report spill fraction, CI, per-lane compare work (nt=1: CI,
    nt=4: tile+ov), HBM bytes, and host-vs-layout hist parity on a
    planted sample.

Spill behavior at fixed target_mean is scale-invariant in the index
size, so a single-chunk (~3e7 k-mer) index characterizes GTDB-scale
(22-chunk) layouts. Run with --chip to also time the join on the
attached accelerator.

Usage: python scripts/dupskew.py [--unique 3e7] [--genomes 25000]
       [--profiles a2.0:d1000,a1.5:d100,uniform] [--chip] [--nt 1,4]
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

C = 200
K = 31


def gen_dup_index(n_unique: int, n_genomes: int, alpha: float,
                  max_dup: int, seed: int = 0):
    """(kmers_u64 [m], gids [m]) with zipf-distributed cross-genome
    duplication: hash i appears in d_i distinct genomes,
    P(d) ~ d^-alpha on [1, max_dup]. alpha<=0 -> no duplication."""
    rng = np.random.default_rng(seed)
    thr = (1 << 64) // C
    uniq = rng.integers(0, thr, size=n_unique, dtype=np.uint64)
    uniq = np.unique(uniq)
    if alpha <= 0:
        gids = rng.integers(0, n_genomes, size=uniq.size).astype(np.int32)
        return uniq, gids, np.ones(uniq.size, np.int64)
    d_vals = np.arange(1, max_dup + 1, dtype=np.float64)
    p = d_vals ** (-alpha)
    p /= p.sum()
    d = rng.choice(np.arange(1, max_dup + 1), size=uniq.size, p=p)
    km = np.repeat(uniq, d)
    # distinct genomes per duplicated hash: offset strides are enough for
    # layout statistics (the layout only sees gid != gid, not identity)
    base_g = rng.integers(0, n_genomes, size=uniq.size)
    off = np.concatenate([np.arange(x) for x in d]) if d.size else d
    gids = ((np.repeat(base_g, d) + off) % n_genomes).astype(np.int32)
    order = np.argsort(km, kind="stable")
    return km[order], gids[order], d


def layout_stats(kmers, gids, n_genomes, nt):
    from sylph_tpu.tpu.grange import build_grange_index
    t0 = time.perf_counter()
    gidx = build_grange_index(kmers, gids, n_genomes, presorted=True,
                              nt=nt)
    dt = time.perf_counter() - t0
    m = kmers.size
    spill = int(gidx.spill_kmers.size)
    lane_work = (gidx.tile + gidx.ov) if gidx.nt > 1 else gidx.CI
    hbm = sum(h.nbytes for h in gidx.chunk_hi) * 3
    return gidx, dict(nt=gidx.nt, CI=gidx.CI, tile=gidx.tile,
                      ov=gidx.ov, spill=spill,
                      spill_frac=spill / max(m, 1), lane=lane_work,
                      hbm_gb=hbm / 1e9, build_s=dt)


def host_hist(kmers, gids, n_genomes, skm, sct, H=64):
    """Brute-force [G, H] oracle."""
    idx = np.searchsorted(skm, kmers)
    idxc = np.minimum(idx, max(skm.size - 1, 0))
    found = (idx < skm.size) & (skm[idxc] == kmers)
    cts = np.where(found, sct[idxc], 0).astype(np.int64)
    live = cts > 0
    seg = gids[live].astype(np.int64) * H + np.minimum(cts[live], H - 1)
    return np.bincount(seg, minlength=n_genomes * H).reshape(n_genomes, H)


def main():
    argv = sys.argv[1:]

    def opt(name, default, cast=float):
        return (cast(argv[argv.index(name) + 1]) if name in argv
                else default)

    n_unique = int(opt("--unique", 3e7))
    n_genomes = int(opt("--genomes", 25000))
    profiles = opt("--profiles", "uniform,a2.0:d1000,a1.5:d100,a1.2:d5000",
                   str).split(",")
    nts = [int(x) for x in opt("--nt", "1,4", str).split(",")]
    on_chip = "--chip" in argv
    sample_n = int(opt("--sample", 2e6))

    import jax
    if not on_chip:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")

    rng = np.random.default_rng(7)
    for prof in profiles:
        if prof == "uniform":
            alpha, dmax = 0.0, 1
        else:
            a, d = prof.split(":")
            alpha, dmax = float(a[1:]), int(d[1:])
        km, gg, d = gen_dup_index(n_unique, n_genomes, alpha, dmax)
        print(f"\n== profile {prof}: m={km.size} unique={np.unique(km).size}"
              f" mean_dup={km.size / max(np.unique(km).size, 1):.2f}"
              f" max_dup={int(d.max())}", flush=True)

        # planted sample: half hits (unique index hashes), half misses
        hit = rng.choice(np.unique(km), size=sample_n // 2, replace=False) \
            if np.unique(km).size >= sample_n // 2 else np.unique(km)
        miss = rng.integers(0, (1 << 64) // C, size=sample_n // 2,
                            dtype=np.uint64)
        skm = np.unique(np.concatenate([hit, miss]))
        sct = rng.integers(1, 8, size=skm.size).astype(np.uint32)
        oracle = host_hist(km, gg, n_genomes, skm, sct)

        for nt in nts:
            gidx, st = layout_stats(km, gg, n_genomes, nt)
            line = (f"  nt={st['nt']}: CI={st['CI']} tile={st['tile']} "
                    f"ov={st['ov']} lane={st['lane']} "
                    f"spill={st['spill']} ({100 * st['spill_frac']:.3f}%) "
                    f"hbm={st['hbm_gb']:.2f}GB build={st['build_s']:.1f}s")
            from sylph_tpu.tpu.grange import GRangeEngine
            eng = GRangeEngine(gidx)
            t0 = time.perf_counter()
            h = eng.hists(skm, sct)
            dt = time.perf_counter() - t0
            ok = (h == oracle).all()
            line += f" join={dt * 1e3:.0f}ms parity={'OK' if ok else 'FAIL'}"
            if on_chip:
                # warm + timed reps of the device-stream path
                from sylph_tpu.tpu import u64 as u64mod
                import jax.numpy as jnp
                occ = np.repeat(skm, sct)        # occurrence stream
                T = 1 << int(np.ceil(np.log2(occ.size)))
                shi = np.full(T, 0xFFFFFFFF, np.uint32)
                slo = np.full(T, 0xFFFFFFFF, np.uint32)
                shi[:occ.size], slo[:occ.size] = u64mod.from_u64_np(occ)
                shi_d = jax.device_put(jnp.asarray(shi))
                slo_d = jax.device_put(jnp.asarray(slo))
                n_match = int(oracle.sum())

                def run():
                    hd, check = eng.hist_device_stream(
                        shi_d, slo_d, n_live=occ.size, n_unique=skm.size,
                        n_matches=n_match)
                    s = float(np.asarray(hd.sum()))
                    return hd, check, s
                hd, check, _ = run()
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    _, _, _s = run()
                    ts.append(time.perf_counter() - t0)
                hG = eng._fold_heavy(np.asarray(hd))   # markers expanded
                if gidx.spill_kmers.size:
                    hG += eng._spill_hist(skm, sct)
                okd = check() and (hG == oracle).all()
                line += (f" chip={min(ts) * 1e3:.0f}ms "
                         f"runs={[round(t * 1e3) for t in ts]} "
                         f"dparity={'OK' if okd else 'FAIL'}")
            print(line, flush=True)


if __name__ == "__main__":
    main()
