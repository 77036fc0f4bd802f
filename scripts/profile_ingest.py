"""Phase profiler for the --tpu read-ingest path (dev tool).

Runs the streaming single-end sketch phases over the first N blocks of a
fastq.gz and prints per-phase wall time: decode, parse, batch build
(numpy gather), H2D+seed dispatch, D2H fetch, fingerprints, fold.
Usage: python scripts/profile_ingest.py [reads.fastq.gz] [n_blocks]
"""
import os
import sys
import time

if "MALLOC_TRIM_THRESHOLD_" not in os.environ and __name__ == "__main__":
    os.environ["MALLOC_MMAP_THRESHOLD_"] = "17179869184"
    os.environ["MALLOC_TRIM_THRESHOLD_"] = "-1"
    os.execv(sys.executable, [sys.executable] + sys.argv)

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
READS = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    ROOT, ".bench_data", "e2e", "reads.fastq.gz")
N_BLOCKS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
C, K = 200, 31

from sylph_tpu.io.fastx import parse_block, stream_blocks
from sylph_tpu.core.native_core import StreamingFold
from sylph_tpu.core.sketch_reads import _fp_single_arrays
from sylph_tpu.engine import device_sketch as ds

T = {}


def tick(name, t0):
    T[name] = T.get(name, 0.0) + (time.perf_counter() - t0)


def main():
    blocks = []
    t0 = time.perf_counter()
    for i, b in enumerate(stream_blocks(READS)):
        blocks.append(b)
        if i + 1 >= N_BLOCKS:
            break
    tick("decode", t0)
    nbytes = sum(len(b) for b in blocks)

    pxs = []
    t0 = time.perf_counter()
    for b in blocks:
        pxs.append(parse_block(b, READS, skip_names=True))
    tick("parse", t0)
    nbases = sum(int(px.codes.size) for px in pxs)

    # replicate read_survivor_arrays with phase splits
    from sylph_tpu.tpu.containment import SENTINEL
    from sylph_tpu.tpu.u64 import to_u64_np
    fold = StreamingFold(False, 4)
    warm = [False]
    for rep in range(2):           # rep 0 warms compiles + pages
        for key in list(T):
            if rep == 1 and key not in ("decode", "parse"):
                T[key] = 0.0
        for px in pxs:
            lengths = px.lengths
            pending = []
            max_b = ds._BUCKETS[-1]
            short = np.flatnonzero((lengths >= K) & (lengths <= max_b))
            bucket_of = np.searchsorted(np.asarray(ds._BUCKETS),
                                        lengths[short], side="left")
            for bi, b in enumerate(ds._BUCKETS):
                sel = short[bucket_of == bi]
                for s in range(0, sel.size, ds._MAX_BATCH):
                    rids = sel[s:s + ds._MAX_BATCH]
                    if rids.size == 0:
                        continue
                    t0 = time.perf_counter()
                    bases, blens = ds.build_batch_profiled(
                        px, lengths, b, rids) \
                        if hasattr(ds, "build_batch_profiled") else \
                        _build_batch(px, lengths, b, rids)
                    tick("build_batch", t0)
                    t0 = time.perf_counter()
                    packed = ds._pack16_rows(bases)
                    tick("pack16", t0)
                    W = b - K + 1
                    cap = min(W, 8 * W // C + 24)
                    t0 = time.perf_counter()
                    shi, slo, nr = ds._seed_packed_jit()(
                        jax.numpy.asarray(packed),
                        jax.numpy.asarray(blens), c=C, k=K, cap=cap)
                    tick("h2d+dispatch", t0)
                    pending.append((b, rids, shi, slo, nr))
            t0 = time.perf_counter()
            parts_r, parts_h = [], []
            for b, rids, shi, slo, nr in pending:
                nr_h = np.asarray(nr)[:rids.size].astype(np.int64)
                hi = np.asarray(shi)
                lo = np.asarray(slo)
                live = hi != SENTINEL[0]
                assert int(live.sum()) == int(nr_h.sum())
                parts_r.append(np.repeat(rids, nr_h))
                parts_h.append(to_u64_np(hi[live], lo[live]))
            tick("d2h+mask", t0)
            t0 = time.perf_counter()
            rids_all = np.concatenate(parts_r)
            hashes_all = np.concatenate(parts_h)
            order = np.argsort(rids_all, kind="stable")
            rids_g, hashes = rids_all[order], hashes_all[order]
            tick("reorder", t0)
            t0 = time.perf_counter()
            boundaries = np.flatnonzero(np.diff(rids_g)) + 1
            seg_starts = np.concatenate([[0], boundaries]).astype(np.int64)
            seg_rids = rids_g[seg_starts]
            fps, valid = _fp_single_arrays(px, seg_rids)
            tick("fingerprints", t0)
            if rep == 1:
                t0 = time.perf_counter()
                fold.push(hashes, seg_starts, fps, valid, None)
                tick("fold", t0)
    ks, cs, ndup = fold.finish()
    fold.close()
    gbp = nbases / 1e9
    print(f"\n{N_BLOCKS} blocks, {nbytes / 1e6:.0f} MB text, "
          f"{gbp:.3f} Gbp, {ks.size} uniq kmers (warm pass):")
    tot = sum(v for k, v in T.items() if k not in ("decode", "parse"))
    for k, v in sorted(T.items(), key=lambda x: -x[1]):
        rate = f"  ({gbp / v:.2f} Gbp/s)" if v > 0 else ""
        print(f"  {k:14s} {v:7.3f} s{rate}")
    print(f"  {'TOTAL (warm)':14s} {tot:7.3f} s  ({gbp / tot:.3f} Gbp/s)"
          f"  [+decode {T['decode']:.1f}s +parse {T['parse']:.1f}s cold]")


def _build_batch(px, lengths, bucket_len, rids):
    nb = rids.size
    pad_n = -(-nb // 8) * 8
    lens = lengths[rids].astype(np.int64)
    idx = px.starts[rids][:, None] + np.arange(bucket_len)[None, :]
    col_ok = np.arange(bucket_len)[None, :] < lens[:, None]
    gat = px.codes[np.minimum(idx, px.codes.size - 1)]
    bases = np.zeros((pad_n, bucket_len), np.uint8)
    bases[:nb] = np.where(col_ok, gat, 0)
    blens = np.zeros(pad_n, np.int32)
    blens[:nb] = lens
    return bases, blens


if __name__ == "__main__":
    main()
