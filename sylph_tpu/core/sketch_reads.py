"""Read sketching: FracMinHash counting with PCR-duplicate removal.

Behavioral spec:
  - single-end: sylph src/sketch.rs:897-959 (dedup fingerprints only for
    reads <= 400 bp, consulted only while a k-mer's count < MAX_DEDUP_COUNT)
  - paired-end: src/sketch.rs:771-895 (fingerprint from both mates; R2
    k-mers already seen in the same pair's R1 are skipped)
  - dedup cell: dup_removal_lsh_full_exact src/sketch.rs:690-731 — an
    occurrence is dropped iff one of its two (kmer, fingerprint) keys was
    already seen AND the k-mer's count is nonzero; unseen keys are inserted.

Paired-end dedup honors --fpr like the reference (src/sketch.rs:800-804):
fpr == 0 selects the exact pair set; fpr > 0 (default 1e-4) a memory-bounded
scalable blocked-bloom filter (core/pair_filter.py; the reference uses a
scalable cuckoo filter — same role, bounded total FP probability, so the
expected divergence from exact is <= fpr of dedup decisions). The native C
fold and the Python fallback make bit-identical decisions in both modes.

Extraction and fingerprints are vectorized; only the order-dependent dedup
fold runs per-survivor (~1/c of bases).
"""

import logging
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..constants import MAX_DEDUP_COUNT
from ..io.fastx import FastxParseError, ParsedFastx, parse_fastx
from ..kmer.seeding import fmh_seeds_concat_np
from .types import SequencesSketch

log = logging.getLogger("sylph")

_FP_K = 16  # fingerprint k-mer length: size_of::<u32>() * 4 (src/sketch.rs:625)


def _ingest_workers() -> int:
    """Parse+seed worker threads for the streaming ingest (tunable).

    Measured on a 4-core host: 2 parse+seed + 2 inflate workers saturate;
    oversubscribing (3+3) degrades ~2x (cache thrash + first-touch fault
    contention). Defaults scale with the core count, capped by the CLI's
    -t budget (utils/threads)."""
    import os

    from ..utils.threads import cap_workers
    env = os.environ.get("SYLPH_INGEST_WORKERS")
    if env:
        return int(env)
    return cap_workers(max(2, min(12, (os.cpu_count() or 4) // 2)))


def _mean_fold(lengths: np.ndarray) -> float:
    """Sequential running mean, bit-exact with the reference's f64 fold
    (src/sketch.rs:824-826, 941-943)."""
    if lengths.size == 0:
        return 0.0
    if np.all(lengths == lengths[0]):
        return float(lengths[0])  # the fold is exact when all equal
    from .native_core import mean_fold_native
    native = mean_fold_native(lengths)
    if native is not None:
        return native
    mean = 0.0
    counter = 0.0
    for ln in lengths.tolist():
        counter += 1.0
        mean = mean + (float(ln) - mean) / counter
    return mean


def _pack16(cols: List[np.ndarray]) -> np.ndarray:
    """Pack 16 per-read 2-bit codes MSB-first into a uint32 vector."""
    f = np.zeros(cols[0].shape[0], dtype=np.uint32)
    for c in cols:
        f = (f << np.uint32(2)) | c.astype(np.uint32)
    return f


def _gather_cols(codes, base_idx, offsets):
    return [codes[base_idx + o] for o in offsets]


def _fp_single(px: ParsedFastx, rids: np.ndarray):
    """pair_kmer_single fingerprints (src/sketch.rs:624-656) for the given
    read ids; None when len < 66 or len > 400 (gate src/sketch.rs:922-927).

    Returns dict rid -> ((f, r), (g, t)) for eligible reads."""
    lens = px.lengths[rids]
    ok = (lens >= 4 * _FP_K + 2) & (lens <= 400)
    rr = rids[ok]
    if rr.size == 0:
        return {}
    starts = px.starts[rr]
    half = px.lengths[rr] // 2
    ev = [2 * i for i in range(_FP_K)]
    f = _pack16(_gather_cols(px.codes, starts, ev))
    r = _pack16(_gather_cols(px.codes, starts + half, ev))
    g = _pack16(_gather_cols(px.codes, starts + 1, ev))
    t = _pack16(_gather_cols(px.codes, starts + 1 + half, ev))
    return {int(rid): ((int(a), int(b)), (int(cc), int(dd)))
            for rid, a, b, cc, dd in zip(rr.tolist(), f.tolist(), r.tolist(),
                                         g.tolist(), t.tolist())}


def _fp_paired(px1: ParsedFastx, px2: ParsedFastx, rids: np.ndarray):
    """pair_kmer fingerprints (src/sketch.rs:658-688): None if either mate
    is shorter than 33 bp."""
    ok = (px1.lengths[rids] >= 2 * _FP_K + 1) & \
         (px2.lengths[rids] >= 2 * _FP_K + 1)
    rr = rids[ok]
    if rr.size == 0:
        return {}
    ev = [2 * i for i in range(_FP_K)]
    f = _pack16(_gather_cols(px1.codes, px1.starts[rr], ev))
    r = _pack16(_gather_cols(px2.codes, px2.starts[rr], ev))
    g = _pack16(_gather_cols(px1.codes, px1.starts[rr] + 1, ev))
    t = _pack16(_gather_cols(px2.codes, px2.starts[rr] + 1, ev))
    return {int(rid): ((int(a), int(b)), (int(cc), int(dd)))
            for rid, a, b, cc, dd in zip(rr.tolist(), f.tolist(), r.tolist(),
                                         g.tolist(), t.tolist())}


def _fp_single_arrays(px: ParsedFastx, seg_rids: np.ndarray):
    """Array form of _fp_single: ([n_segs, 4] u64 fps, [n_segs] u8 valid),
    aligned to seg_rids."""
    from .native_core import fp_single_native
    native = fp_single_native(px.codes, px.starts, px.lengths, seg_rids)
    if native is not None:
        return native
    n = seg_rids.size
    fps = np.zeros((max(n, 1), 4), np.uint64)
    valid = np.zeros(max(n, 1), np.uint8)
    lens = px.lengths[seg_rids]
    ok = (lens >= 4 * _FP_K + 2) & (lens <= 400)
    rr = seg_rids[ok]
    if rr.size:
        starts = px.starts[rr]
        half = px.lengths[rr] // 2
        ev = [2 * i for i in range(_FP_K)]
        fps[ok, 0] = _pack16(_gather_cols(px.codes, starts, ev))
        fps[ok, 1] = _pack16(_gather_cols(px.codes, starts + half, ev))
        fps[ok, 2] = _pack16(_gather_cols(px.codes, starts + 1, ev))
        fps[ok, 3] = _pack16(_gather_cols(px.codes, starts + 1 + half, ev))
        valid[ok] = 1
    return fps, valid


def _sketch_single_streaming(read_file: str, c: int, k: int,
                             sample_name, no_dedup: bool, device: bool,
                             on_segment=None):
    """Streaming array-native single-end sketch, pipelined three ways:
    a producer thread decodes gzip blocks (zlib releases the GIL), a small
    worker pool parses + seeds + fingerprints each block concurrently
    (native C, GIL released), and the main thread folds results in file
    order (the dedup fold is order-dependent). Memory stays bounded at a
    few blocks regardless of sample size; no per-read Python objects
    exist anywhere. Native C lib required (callers fall back to the
    dict/segment oracle path).
    """
    import queue
    import threading
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    from ..io.fastx import parse_block, stream_blocks
    from .native_core import make_streaming_fold

    use_device = False
    if device:
        from ..engine.device_sketch import device_available, ingest_on_device
        use_device = ingest_on_device()
        if not use_device and not device_available():
            log.warning("--tpu requested but no JAX device available; "
                        "using the host seeding path.")
        elif not use_device and device:
            log.info("Read seeding on host (slow host->device wire); "
                     "containment still runs on the device.")
    if use_device:
        from ..engine.device_sketch import read_survivor_arrays

    from ..utils.timing import PhaseAcc
    acc = PhaseAcc() if log.isEnabledFor(logging.DEBUG) else None
    t_wall = __import__("time").perf_counter

    q: "queue.Queue" = queue.Queue(maxsize=3)
    err = []

    def producer():
        try:
            it = stream_blocks(read_file)
            while True:
                t0 = t_wall()
                block = next(it, None)
                if acc:
                    acc.add("decode", t_wall() - t0)
                if block is None:
                    break
                t0 = t_wall()
                q.put(block)
                if acc:
                    acc.add("decode_stall", t_wall() - t0)
        except Exception as e:      # re-raised on the consumer side
            err.append(e)
        finally:
            q.put(None)

    def prepare(block: bytes):
        """block -> (lengths, hashes, seg_starts, fps, valid); parse +
        seed + fingerprint, all GIL-releasing (runs in the pool)."""
        t0 = t_wall()
        px = parse_block(block, read_file, skip_names=True)
        if acc:
            acc.add("parse", t_wall() - t0)
            t0 = t_wall()
        if use_device:
            rids, hashes = read_survivor_arrays(px, c, k)
        else:
            from .native_core import seed_concat_native
            seeded = seed_concat_native(px.codes, px.starts, px.ends,
                                        c, k)
            if seeded is None:
                seeded = fmh_seeds_concat_np(px.codes, px.starts,
                                             px.ends, c, k)
            rids, hashes = seeded
        if acc:
            acc.add("seed", t_wall() - t0)
            t0 = t_wall()
        if rids.size == 0:
            return px.lengths, hashes, None, None, None
        boundaries = np.flatnonzero(np.diff(rids)) + 1
        seg_starts = np.concatenate([[0], boundaries]).astype(np.int64)
        seg_rids = rids[seg_starts]
        if no_dedup:
            fps = np.zeros((seg_starts.size, 4), np.uint64)
            valid = np.zeros(seg_starts.size, np.uint8)
        else:
            fps, valid = _fp_single_arrays(px, seg_rids)
        if acc:
            acc.add("fp", t_wall() - t0)
        return px.lengths, hashes, seg_starts, fps, valid

    t_start = t_wall()
    t = threading.Thread(target=producer, daemon=True)
    t.start()
    fold = make_streaming_fold(no_dedup, MAX_DEDUP_COUNT)
    lens_parts = []
    # fold-table presize: extrapolate the first block's survivor rate
    # over the whole file (compressed size x a typical fastq gzip ratio)
    # so the hash tables take one rehash instead of a doubling cascade
    fsize = os.path.getsize(read_file)
    est_total_text = fsize * (3.3 if read_file.endswith((".gz", ".bgz"))
                              else 1.0)
    text_seen, occ_seen, reserved = 0, 0, False
    try:
        nw = _ingest_workers()
        # the fold (and the device key streamer) run on a DEDICATED
        # thread consuming prepared blocks in file order: the fold is
        # the longest serial chain (~2 s at GTDB scale) and keeping it
        # off the submission loop lets decode/parse/seed of later
        # blocks overlap it fully instead of serializing behind it
        import queue as _queue
        fold_q: "_queue.Queue" = _queue.Queue(maxsize=nw + 2)
        fold_err = []

        def fold_worker():
            nonlocal text_seen, occ_seen, reserved
            try:
                while True:
                    item = fold_q.get()
                    if item is None:
                        return
                    fut, blen = item
                    t0 = t_wall()
                    (lengths, hashes, seg_starts, fps,
                     valid) = fut.result()
                    if acc:
                        acc.add("wait", t_wall() - t0)
                    lens_parts.append(lengths)
                    if seg_starts is None:
                        continue
                    t0 = t_wall()
                    text_seen += blen
                    occ_seen += hashes.size
                    if not reserved and text_seen > 0:
                        reserved = True
                        if est_total_text > text_seen:
                            fold.reserve(int(occ_seen * est_total_text
                                             / text_seen * 1.25))
                    fold.push(hashes, seg_starts, fps, valid, None)
                    if on_segment is not None:
                        on_segment(fold.new_keys())
                    if acc:
                        acc.add("fold", t_wall() - t0)
            except Exception as e:
                fold_err.append(e)
                while True:          # drain so the producer can't block
                    if fold_q.get() is None:
                        return

        # dedicated fold thread measured NEUTRAL-to-marginally-worse on
        # the 4-core dev box (ingest 4.09 vs 4.02 s; e2e 0.28 vs 0.30
        # Gbp/s interleaved medians) — the cores are saturated either
        # way. In-loop is the default; SYLPH_FOLD_THREAD=1 frees the
        # main thread on boxes with spare cores.
        use_ft = os.environ.get("SYLPH_FOLD_THREAD", "0") == "1"
        with ThreadPoolExecutor(max_workers=nw) as pool:
            if use_ft:
                ft = threading.Thread(target=fold_worker, daemon=True)
                ft.start()
                while True:
                    block = q.get()
                    if block is None:
                        break
                    fold_q.put((pool.submit(prepare, block),
                                len(block)))
                fold_q.put(None)
                ft.join()
            else:                    # in-loop fold (A/B: the main thread
                #                      folds between submissions)
                futs = deque()
                done = False
                while futs or not done:
                    while not done and len(futs) < nw + 1:
                        block = q.get()
                        if block is None:
                            done = True
                            break
                        futs.append((pool.submit(prepare, block),
                                     len(block)))
                    if not futs:
                        break
                    fold_q.put(futs.popleft())
                    fold_q.put(None)
                    fold_worker()
        t.join()
        if err:
            raise err[0]
        if fold_err:
            raise fold_err[0]
        if not lens_parts:
            raise FastxParseError(f"{read_file}: empty file")
        t0 = t_wall()
        ks, cs, ndup = fold.finish()
        if acc:
            acc.add("finish", t_wall() - t0)
            acc.log_summary(read_file, t_wall() - t_start)
    finally:
        fold.close()
    total = int(cs.sum()) + ndup
    if total:
        log.debug("Dedup removed %d sketched k-mers for %s (%.2f%%)",
                  ndup, read_file, 100.0 * ndup / total)
    mean_len = _mean_fold(np.concatenate(lens_parts))
    return SequencesSketch(kmers=ks, counts=cs, c=c, k=k,
                           file_name=read_file, sample_name=sample_name,
                           paired=False, mean_read_length=mean_len)


def _segments_by_read(rids: np.ndarray, hashes: np.ndarray):
    """Split survivor hashes into per-read lists (rids is ascending)."""
    if rids.size == 0:
        return {}
    boundaries = np.flatnonzero(np.diff(rids)) + 1
    segs = np.split(hashes, boundaries)
    seg_rids = rids[np.concatenate([[0], boundaries])]
    return {int(r): s.tolist() for r, s in zip(seg_rids.tolist(), segs)}


def _extract_segs(px: ParsedFastx, c: int, k: int, device: bool):
    """{read_id: [survivor hash, ...]} — device seeding when requested."""
    if device:
        from ..engine.device_sketch import (device_available,
                                            ingest_on_device,
                                            read_survivor_hashes)
        if ingest_on_device():
            return read_survivor_hashes(px, c, k)
        if not device_available():
            log.warning("--tpu requested but no JAX device available; "
                        "using the host seeding path.")
    rids, hashes = fmh_seeds_concat_np(px.codes, px.starts, px.ends, c, k)
    return _segments_by_read(rids, hashes)


def _dedup_fold(segments_iter, counts: Dict[int, int], pair_filter,
                no_dedup: bool, threshold: Optional[int]) -> int:
    """The dedup fold (src/sketch.rs:690-731). segments_iter yields
    (kmer_list, fingerprint_or_None); ``pair_filter`` provides
    check_insert(km, packed_pair) — exact set or scalable bloom
    (core/pair_filter.py). Returns #occurrences removed."""
    thr = threshold if threshold is not None else (1 << 32) - 1
    ndup = 0
    for kms, fp in segments_iter:
        if fp is not None:
            p0 = (fp[0][0] << 32) | fp[0][1]
            p1 = (fp[1][0] << 32) | fp[1][1]
        for km in kms:
            c = counts.get(km, 0)
            if not no_dedup and c < thr and fp is not None:
                ret = False
                if pair_filter.check_insert(km, p0) and c > 0:
                    ret = True
                if pair_filter.check_insert(km, p1) and c > 0:
                    ret = True
                if ret:
                    ndup += 1
                    continue
            counts[km] = c + 1
    return ndup


def _finish(counts: Dict[int, int], file_name, c, k, paired, sample_name,
            mean_read_length) -> SequencesSketch:
    kmers = np.fromiter(counts.keys(), dtype=np.uint64, count=len(counts))
    cnts = np.fromiter(counts.values(), dtype=np.uint32, count=len(counts))
    return SequencesSketch(kmers=kmers, counts=cnts, c=c, k=k,
                           file_name=file_name, sample_name=sample_name,
                           paired=paired, mean_read_length=mean_read_length)


def _fold_native(seg_kmer_lists, seg_fps, filter_prev, no_dedup, threshold,
                 fpr: float = 0.0):
    """Run the fold through native sk_dedup_fold; None if unavailable.

    seg_kmer_lists: list of k-mer lists; seg_fps: per-segment fingerprint
    ((f,r),(g,t)) or None; filter_prev: per-segment bool or None; fpr > 0
    selects the memory-bounded approximate pair filter.
    """
    from .native_core import dedup_fold_native
    n_segs = len(seg_kmer_lists)
    kmers = (np.concatenate([np.asarray(s, np.uint64)
                             for s in seg_kmer_lists])
             if n_segs else np.empty(0, np.uint64))
    lens = np.array([len(s) for s in seg_kmer_lists], np.int64)
    seg_starts = np.concatenate([[0], np.cumsum(lens)[:-1]]) if n_segs \
        else np.empty(0, np.int64)
    fps = np.zeros((max(n_segs, 1), 4), np.uint64)
    fp_valid = np.zeros(max(n_segs, 1), np.uint8)
    for i, fp in enumerate(seg_fps):
        if fp is not None:
            (f, r), (g, t) = fp
            fps[i] = (f, r, g, t)
            fp_valid[i] = 1
    fprev = (np.asarray(filter_prev, np.uint8)
             if filter_prev is not None else None)
    return dedup_fold_native(kmers, seg_starts, fps, fp_valid, fprev,
                             no_dedup, threshold, fpr)


def sketch_sequences(read_file: str, c: int, k: int,
                     sample_name: Optional[str] = None,
                     no_dedup: bool = False,
                     device: bool = False,
                     on_segment=None) -> Optional[SequencesSketch]:
    """Single-end read sketch (sylph src/sketch.rs:897-959).

    ``on_segment(kmers_u64)``, if given, receives the newly-inserted
    distinct k-mers after each pushed block, in first-insertion order
    (their concatenation equals the returned sketch's ``kmers``) — the
    device engine streams them to the accelerator during the ingest."""
    from .native_core import get_lib
    if get_lib() is not None:
        try:
            return _sketch_single_streaming(read_file, c, k, sample_name,
                                            no_dedup, device,
                                            on_segment=on_segment)
        except (FastxParseError, OSError):
            log.warning("%s is not a valid fasta/fastq file; skipping.",
                        read_file)
            return None
    try:
        px = parse_fastx(read_file, skip_names=True)
    except (FastxParseError, OSError):
        log.warning("%s is not a valid fasta/fastq file; skipping.",
                    read_file)
        return None
    from .pair_filter import ExactPairSet
    segs = _extract_segs(px, c, k, device)
    fps = {} if no_dedup else _fp_single(
        px, np.fromiter(segs.keys(), dtype=np.int64, count=len(segs)))
    counts: Dict[int, int] = {}
    ndup = _dedup_fold(
        ((kms, fps.get(rid)) for rid, kms in segs.items()),
        counts, ExactPairSet(), no_dedup, MAX_DEDUP_COUNT)
    total = sum(counts.values()) + ndup
    if total:
        log.debug("Dedup removed %d sketched k-mers for %s (%.2f%%)",
                  ndup, read_file, 100.0 * ndup / total)
    mean_len = _mean_fold(px.lengths)
    return _finish(counts, read_file, c, k, False, sample_name, mean_len)


def _fp_paired_arrays(px1: ParsedFastx, px2: ParsedFastx,
                      rids: np.ndarray):
    """Array form of _fp_paired for the given pair ids."""
    from .native_core import fp_paired_native
    native = fp_paired_native(px1.codes, px1.starts, px1.lengths,
                              px2.codes, px2.starts, px2.lengths, rids)
    if native is not None:
        return native
    n = rids.size
    fps = np.zeros((max(n, 1), 4), np.uint64)
    valid = np.zeros(max(n, 1), np.uint8)
    ok = (px1.lengths[rids] >= 2 * _FP_K + 1) & \
         (px2.lengths[rids] >= 2 * _FP_K + 1)
    rr = rids[ok]
    if rr.size:
        ev = [2 * i for i in range(_FP_K)]
        fps[ok, 0] = _pack16(_gather_cols(px1.codes, px1.starts[rr], ev))
        fps[ok, 1] = _pack16(_gather_cols(px2.codes, px2.starts[rr], ev))
        fps[ok, 2] = _pack16(_gather_cols(px1.codes, px1.starts[rr] + 1,
                                          ev))
        fps[ok, 3] = _pack16(_gather_cols(px2.codes, px2.starts[rr] + 1,
                                          ev))
        valid[ok] = 1
    return fps, valid


def _paired_fold_arrays(px1, px2, rids1, h1, rids2, h2, no_dedup):
    """Interleave per-pair R1/R2 survivor segments into the flat arrays
    the fold consumes: (kmers, seg_starts, fps, valid, filter_prev).
    Segment order is rid-ascending with [R1, R2] per pair; R2 carries
    filter_prev (skip k-mers present in the same pair's R1), matching
    the reference's loop (src/sketch.rs:851-876)."""
    n = px1.n_records
    c1 = np.bincount(rids1, minlength=n).astype(np.int64)
    c2 = np.bincount(rids2, minlength=n).astype(np.int64)
    act = np.flatnonzero((c1 > 0) | (c2 > 0))
    if act.size == 0:
        return None
    inv = np.full(n, -1, np.int64)
    inv[act] = np.arange(act.size)
    s1 = c1[act]
    s2 = c2[act]
    t = s1 + s2
    base = np.concatenate([[0], np.cumsum(t)[:-1]])
    out = np.empty(int(t.sum()), np.uint64)
    if rids1.size:
        first1 = np.concatenate([[0], np.cumsum(c1)[:-1]])
        loc1 = np.arange(rids1.size) - first1[rids1]
        out[base[inv[rids1]] + loc1] = h1
    if rids2.size:
        first2 = np.concatenate([[0], np.cumsum(c2)[:-1]])
        loc2 = np.arange(rids2.size) - first2[rids2]
        a2 = inv[rids2]
        out[base[a2] + s1[a2] + loc2] = h2
    seg_starts = np.empty(2 * act.size, np.int64)
    seg_starts[0::2] = base
    seg_starts[1::2] = base + s1
    if no_dedup:
        fps2 = np.zeros((2 * act.size, 4), np.uint64)
        valid2 = np.zeros(2 * act.size, np.uint8)
    else:
        fps, valid = _fp_paired_arrays(px1, px2, act)
        fps2 = np.repeat(fps, 2, axis=0)
        valid2 = np.repeat(valid, 2)
    fprev = np.zeros(2 * act.size, np.uint8)
    fprev[1::2] = 1
    return out, seg_starts, fps2, valid2, fprev


def _sketch_pair_streaming(read_file1: str, read_file2: str, c: int,
                           k: int, sample_name, no_dedup: bool,
                           fpr: float, device: bool, on_segment=None):
    """Streaming array-native paired-end sketch: both mate files decode
    and parse in record-aligned chunks (memory bounded), segments
    interleave vectorized, and the stateful C fold (exact set or bloom
    per fpr) runs in pair order. Native C lib required."""
    from ..io.fastx import stream_fastx_pairs
    from .native_core import make_streaming_fold, seed_concat_native

    use_device = False
    if device:
        from ..engine.device_sketch import device_available, ingest_on_device
        use_device = ingest_on_device()
        if not use_device and not device_available():
            log.warning("--tpu requested but no JAX device available; "
                        "using the host seeding path.")
        elif not use_device and device:
            log.info("Read seeding on host (slow host->device wire); "
                     "containment still runs on the device.")
    if use_device:
        from ..engine.device_sketch import read_survivor_arrays

    def seed(px):
        if use_device:
            return read_survivor_arrays(px, c, k)
        got = seed_concat_native(px.codes, px.starts, px.ends, c, k)
        if got is None:
            got = fmh_seeds_concat_np(px.codes, px.starts, px.ends, c, k)
        return got

    import queue
    import threading
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    q: "queue.Queue" = queue.Queue(maxsize=3)
    err = []

    def producer():                  # decode + parse both mates, in order
        try:
            for pair in stream_fastx_pairs(read_file1, read_file2):
                q.put(pair)
        except Exception as e:
            err.append(e)
        finally:
            q.put(None)

    def prepare(pair):               # seed + interleave (GIL-releasing)
        px1, px2 = pair
        rids1, h1 = seed(px1)
        rids2, h2 = seed(px2)
        return px1.lengths, _paired_fold_arrays(px1, px2, rids1, h1,
                                                rids2, h2, no_dedup)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    fold = make_streaming_fold(no_dedup, None,
                               fpr=0.0 if no_dedup else fpr)
    lens1 = []
    try:
        nw = _ingest_workers()
        with ThreadPoolExecutor(max_workers=nw) as pool:
            futs = deque()
            done = False
            while futs or not done:
                while not done and len(futs) < nw + 1:
                    pair = q.get()
                    if pair is None:
                        done = True
                        break
                    futs.append(pool.submit(prepare, pair))
                if not futs:
                    break
                lengths, built = futs.popleft().result()
                lens1.append(lengths)
                if built is not None:
                    fold.push(built[0], built[1], built[2], built[3],
                              built[4])
                    if on_segment is not None:
                        on_segment(fold.new_keys())
        t.join()
        if err:
            raise err[0]
        ks, cs, ndup = fold.finish()
    finally:
        fold.close()
    total = int(cs.sum()) + ndup
    if total:
        log.debug(
            "Number of sketched k-mers removed due to read duplication for "
            "%s: %d. Percentage: %.2f%%", read_file1, ndup,
            100.0 * ndup / total)
    mean_len = _mean_fold(np.concatenate(lens1) if lens1
                          else np.empty(0, np.int64))
    return SequencesSketch(kmers=ks, counts=cs, c=c, k=k,
                           file_name=read_file1, sample_name=sample_name,
                           paired=True, mean_read_length=mean_len)


def sketch_pair_sequences(read_file1: str, read_file2: str, c: int, k: int,
                          sample_name: Optional[str] = None,
                          no_dedup: bool = False,
                          fpr: float = 0.0,
                          device: bool = False,
                          on_segment=None) -> Optional[SequencesSketch]:
    """Paired-end read sketch (sylph src/sketch.rs:771-895).

    ``fpr == 0`` dedups with an exact pair set; ``fpr > 0`` (the CLI
    default, 1e-4) with the memory-bounded scalable bloom filter
    (core/pair_filter.py) — the reference's ScalableCuckooFilter role."""
    from .native_core import get_lib
    if get_lib() is not None:
        try:
            return _sketch_pair_streaming(read_file1, read_file2, c, k,
                                          sample_name, no_dedup, fpr,
                                          device, on_segment=on_segment)
        except (FastxParseError, OSError):
            log.error("Paired end reading failed for '%s' and '%s'.",
                      read_file1, read_file2)
            raise SystemExit(1)
    try:
        px1 = parse_fastx(read_file1, skip_names=True)
        px2 = parse_fastx(read_file2, skip_names=True)
    except (FastxParseError, OSError):
        log.error("Paired end reading failed for '%s' and '%s'.",
                  read_file1, read_file2)
        raise SystemExit(1)

    n_pairs = min(px1.n_records, px2.n_records)
    segs1 = {r: s for r, s in _extract_segs(px1, c, k, device).items()
             if r < n_pairs}
    segs2 = {r: s for r, s in _extract_segs(px2, c, k, device).items()
             if r < n_pairs}
    pair_rids = np.fromiter(sorted(set(segs1) | set(segs2)), dtype=np.int64)
    fps = {} if no_dedup else _fp_paired(px1, px2, pair_rids)

    seg_lists, seg_fps, fprev = [], [], []
    for rid in pair_rids.tolist():
        fp = fps.get(rid)
        seg_lists.append(segs1.get(rid, []))
        seg_fps.append(fp)
        fprev.append(False)
        seg_lists.append(segs2.get(rid, []))
        seg_fps.append(fp)
        fprev.append(True)          # R2 skips k-mers in same-pair R1

    native = _fold_native(seg_lists, seg_fps, fprev, no_dedup, None,
                          fpr=0.0 if no_dedup else fpr)
    if native is not None:
        ks, cs, ndup = native
        counts = None
        total = int(cs.sum()) + ndup
    else:
        from .pair_filter import make_pair_filter
        counts: Dict[int, int] = {}
        pair_filter = make_pair_filter(0.0 if no_dedup else fpr)

        def gen():
            for rid in pair_rids.tolist():
                fp = fps.get(rid)
                s1 = segs1.get(rid, [])
                if s1:
                    yield s1, fp
                s2 = segs2.get(rid)
                if s2:
                    s1set = set(s1)
                    s2f = [km for km in s2 if km not in s1set]
                    if s2f:
                        yield s2f, fp

        ndup = _dedup_fold(gen(), counts, pair_filter, no_dedup, None)
        total = sum(counts.values()) + ndup
    if total:
        log.debug(
            "Number of sketched k-mers removed due to read duplication for "
            "%s: %d. Percentage: %.2f%%", read_file1, ndup,
            100.0 * ndup / total)
    mean_len = _mean_fold(px1.lengths[:n_pairs])
    if counts is None:
        return SequencesSketch(kmers=ks, counts=cs, c=c, k=k,
                               file_name=read_file1, sample_name=sample_name,
                               paired=True, mean_read_length=mean_len)
    return _finish(counts, read_file1, c, k, True, sample_name, mean_len)
