"""Device (TPU) read-seeding for `sylph sketch --tpu`.

The per-base rolling-hash loop is the sketching hot path (sylph's AVX2
kernel, src/avx2_seeding.rs). Here reads are packed into fixed-length 2-bit
batches, the Pallas/XLA seeding kernel emits survivor hashes per read
(position order preserved), and the host-side dedup fold (native C) then
runs unchanged — so sketches are bit-identical to the host engine.

Reads longer than the largest bucket fall back to the numpy path; results
merge by read id, preserving file order.
"""


import functools as _ft
import logging
from typing import Dict, List

import numpy as np

from ..io.fastx import ParsedFastx
from ..kmer.seeding import fmh_seeds_np

log = logging.getLogger("sylph")

_BUCKETS = (128, 256, 512)     # padded lengths (Pallas wants L % 128 == 0)
_MAX_BATCH = 1 << 16           # reads per device call

_COMPACT_JIT = None
_SEED_PACKED_JIT = None


def _compact_jit():
    """Module-cached jit of _compact_by_position (one trace per process)."""
    global _COMPACT_JIT
    if _COMPACT_JIT is None:
        import jax
        _COMPACT_JIT = jax.jit(_compact_by_position, static_argnums=(3, 4))
    return _COMPACT_JIT


def _seed_packed_jit():
    """Read-seeding for the e2e ingest hot path, wire-optimized both ways:
    H2D is the 2-bit packed format (0.25 B/base); D2H is per-read survivor
    COUNTS plus an order-preserving condensed hash stream (~10-20x smaller
    than the [R, cap] compaction grid). Returns
    (stream_hi, stream_lo, n_per_read u16)."""
    global _SEED_PACKED_JIT
    if _SEED_PACKED_JIT is None:
        import functools

        import jax
        import jax.numpy as jnp

        from ..tpu.pipeline import _seed, condense_stream, unpack_bases

        @functools.partial(jax.jit, static_argnames=("c", "k", "cap"))
        def fn(packed, lengths, *, c, k, cap):
            bases = unpack_bases(packed)
            hhi, hlo, keep = _seed(bases, lengths, c=c, k=k)
            W = bases.shape[1] - k + 1
            hhi, hlo, keep = hhi[:, :W], hlo[:, :W], keep[:, :W]
            chi, clo = _compact_by_position(hhi, hlo, keep, cap, False)
            live = chi != jnp.uint32(0xFFFFFFFF)
            n_r = jnp.sum(live, axis=1).astype(jnp.uint16)
            # flatten rows (read-major, position order kept) and butterfly-
            # condense: drops only sentinels, preserves order
            exp = (W / c) / cap
            shi, slo = condense_stream(chi.reshape(-1), clo.reshape(-1),
                                       exp)
            return shi, slo, n_r
        _SEED_PACKED_JIT = fn
    return _SEED_PACKED_JIT


def _pack16_rows(codes_u8: np.ndarray) -> np.ndarray:
    """[N, L] uint8 codes -> [N, L/16] uint32 words (LSB-first), host side."""
    N, L = codes_u8.shape
    w = codes_u8.reshape(N, L // 16, 16).astype(np.uint32)
    out = np.zeros((N, L // 16), np.uint32)
    for j in range(16):
        out |= w[:, :, j] << np.uint32(2 * j)
    return out


def _compact_by_position(hhi, hlo, keep, cap, want_lanes=False):
    """Per-row compaction that PRESERVES position order (compact_rows sorts
    by hash value — fine for the containment join, wrong for the
    order-dependent dedup fold). Key = window lane for survivors; with
    want_lanes=True the surviving lane indices come back too (genome
    sketching needs positions for the spacing filter)."""
    import jax
    import jax.numpy as jnp
    R, W = hhi.shape
    lanes = jax.lax.broadcasted_iota(jnp.uint32, (R, W), 1)
    key = jnp.where(keep, lanes, jnp.uint32(0xFFFFFFFF))
    sk, shi, slo = jax.lax.sort((key, hhi, hlo), dimension=1, num_keys=1)
    live = sk[:, :cap] != jnp.uint32(0xFFFFFFFF)
    sent = jnp.uint32(0xFFFFFFFF)
    out = (jnp.where(live, shi[:, :cap], sent),
           jnp.where(live, slo[:, :cap], sent))
    if want_lanes:
        return out + (jnp.where(live, sk[:, :cap], sent),)
    return out


def device_available() -> bool:
    try:
        import jax
        return len(jax.devices()) > 0
    except Exception:
        return False


_H2D_MBPS = None


def h2d_bandwidth_mbps() -> float:
    """Measured host->device bandwidth (MB/s), cached per process.

    One 4 MB probe (~milliseconds on PCIe-attached chips). Overridable
    via SYLPH_H2D_MBPS for tests and known deployments.
    """
    global _H2D_MBPS
    if _H2D_MBPS is None:
        import os
        import time
        env = os.environ.get("SYLPH_H2D_MBPS")
        if env:
            _H2D_MBPS = float(env)
            return _H2D_MBPS
        import jax
        buf = np.zeros(4 << 20, np.uint8)
        dev = jax.device_put(buf)
        _ = np.asarray(dev[:1])           # settle the path
        t0 = time.perf_counter()
        dev = jax.device_put(buf)
        _ = np.asarray(dev[:1])           # forces transfer completion
        dt = max(time.perf_counter() - t0, 1e-6)
        _H2D_MBPS = buf.nbytes / dt / 1e6
        log.debug("H2D probe: %.0f MB/s", _H2D_MBPS)
    return _H2D_MBPS


def ingest_on_device() -> bool:
    """Should --tpu read ingest seed on the device?

    Read seeding ships 2 bits/base up the wire (0.25 B/base); at PCIe
    rates the device kernel wins by an order of magnitude, but behind a
    slow relay/DCN link the upload alone caps throughput below the native
    host seeder (measured: 17 MB/s H2D -> 0.07 Gbp/s ceiling while the C
    seeder sustains ~0.35 Gbp/s/core). Gate on measured bandwidth;
    override with SYLPH_DEVICE_INGEST=0/1.
    """
    import os
    env = os.environ.get("SYLPH_DEVICE_INGEST")
    if env is not None:
        return env not in ("0", "false", "no")
    if not device_available():
        return False
    return h2d_bandwidth_mbps() >= 500.0


def read_survivor_hashes(px: ParsedFastx, c: int, k: int) -> Dict[int, list]:
    """{read_id: [u64 hash, ...]} of FracMinHash survivors, position order.

    Equivalent to running fmh_seeds per read (sylph src/seeding.rs:86-146);
    the extraction runs on the JAX device in length-bucketed batches.
    """
    import jax

    from ..tpu.containment import SENTINEL
    from ..tpu.pipeline import _seed
    from ..tpu.u64 import to_u64_np

    lengths = px.lengths
    n = px.n_records
    out: Dict[int, list] = {}

    def flush(bucket_len: int, rids: List[int]):
        if not rids:
            return
        nb = len(rids)
        pad_n = -(-nb // 8) * 8
        bases = np.zeros((pad_n, bucket_len), np.uint32)
        lens = np.zeros(pad_n, np.int32)
        for row, rid in enumerate(rids):
            s, e = px.starts[rid], px.ends[rid]
            bases[row, :e - s] = px.codes[s:e]
            lens[row] = e - s
        hhi, hlo, keep = _seed(jax.numpy.asarray(bases),
                               jax.numpy.asarray(lens), c=c, k=k)
        W = bases.shape[1] - k + 1
        hhi, hlo, keep = hhi[:, :W], hlo[:, :W], keep[:, :W]
        # per-READ compaction so read boundaries survive the transfer;
        # 8x-expectation capacity so parity loss is astronomically unlikely
        cap = min(W, 8 * W // c + 24)
        chi, clo = _compact_jit()(hhi, hlo, keep, cap, False)
        chi = np.asarray(chi)
        clo = np.asarray(clo)
        for row, rid in enumerate(rids):
            live = chi[row] != SENTINEL[0]
            if live.any():
                out[rid] = to_u64_np(chi[row][live], clo[row][live]).tolist()

    pending: Dict[int, List[int]] = {b: [] for b in _BUCKETS}
    for rid in range(n):
        ln = int(lengths[rid])
        if ln < k:
            continue
        for b in _BUCKETS:
            if ln <= b:
                pending[b].append(rid)
                if len(pending[b]) >= _MAX_BATCH:
                    flush(b, pending[b])
                    pending[b] = []
                break
        else:
            # long read: host path (genome-style blocked scan)
            h = fmh_seeds_np(px.record_codes(rid), c, k)
            if h.size:
                out[rid] = h.tolist()
    for b in _BUCKETS:
        flush(b, pending[b])
        pending[b] = []
    # the dedup fold's decision sequence is order-dependent: restore file
    # order (buckets emit out of order)
    return dict(sorted(out.items()))


def read_survivor_arrays(px: ParsedFastx, c: int, k: int):
    """(read_ids, hashes) flat u64 survivor arrays in (read, position)
    order — the array-native equivalent of read_survivor_hashes with no
    per-read Python objects (the e2e hot path at millions of reads).

    All batches dispatch asynchronously (packed 0.25 B/base up, condensed
    stream + per-read counts down), then fetch in a second pass so device
    compute and transfers pipeline across batches.
    """
    import jax

    from ..tpu.containment import SENTINEL
    from ..tpu.u64 import to_u64_np

    lengths = px.lengths
    parts_r: List[np.ndarray] = []
    parts_h: List[np.ndarray] = []
    pending = []

    def build_batch(bucket_len: int, rids: np.ndarray):
        nb = rids.size
        pad_n = -(-nb // 8) * 8
        lens = lengths[rids].astype(np.int64)
        # one vectorized gather builds the whole batch (no per-read loop)
        idx = px.starts[rids][:, None] + np.arange(bucket_len)[None, :]
        col_ok = np.arange(bucket_len)[None, :] < lens[:, None]
        gat = px.codes[np.minimum(idx, px.codes.size - 1)]
        bases = np.zeros((pad_n, bucket_len), np.uint8)
        bases[:nb] = np.where(col_ok, gat, 0)
        blens = np.zeros(pad_n, np.int32)
        blens[:nb] = lens
        return bases, blens

    def dispatch(bucket_len: int, rids: np.ndarray):
        if rids.size == 0:
            return
        bases, blens = build_batch(bucket_len, rids)
        W = bucket_len - k + 1
        cap = min(W, 8 * W // c + 24)
        shi, slo, nr = _seed_packed_jit()(
            jax.numpy.asarray(_pack16_rows(bases)),
            jax.numpy.asarray(blens), c=c, k=k, cap=cap)
        pending.append((bucket_len, rids, shi, slo, nr))

    max_b = _BUCKETS[-1]
    short = np.flatnonzero((lengths >= k) & (lengths <= max_b))
    if short.size:
        bucket_of = np.searchsorted(np.asarray(_BUCKETS),
                                    lengths[short], side="left")
        for bi, b in enumerate(_BUCKETS):
            sel = short[bucket_of == bi]
            for s in range(0, sel.size, _MAX_BATCH):
                dispatch(b, sel[s:s + _MAX_BATCH])

    for bucket_len, rids, shi, slo, nr in pending:
        nr_h = np.asarray(nr)[:rids.size].astype(np.int64)
        hi = np.asarray(shi)
        lo = np.asarray(slo)
        live = hi != SENTINEL[0]
        if int(live.sum()) != int(nr_h.sum()):
            # condensation overflow dropped survivors (expectation+6-sigma
            # capacity: astronomically rare) — redo losslessly
            from ..tpu.pipeline import _seed
            bases, blens = build_batch(bucket_len, rids)
            hhi, hlo, keep = _seed(jax.numpy.asarray(bases.astype(
                np.uint32)), jax.numpy.asarray(blens), c=c, k=k)
            W = bucket_len - k + 1
            cap = min(W, 8 * W // c + 24)
            chi, clo = _compact_jit()(hhi[:, :W], hlo[:, :W], keep[:, :W],
                                      cap, False)
            chi = np.asarray(chi)[:rids.size]
            clo = np.asarray(clo)[:rids.size]
            lv = chi != SENTINEL[0]
            rr = np.broadcast_to(rids[:, None], chi.shape)[lv]
            parts_r.append(rr.astype(np.int64))
            parts_h.append(to_u64_np(chi[lv], clo[lv]))
            continue
        parts_r.append(np.repeat(rids, nr_h))
        parts_h.append(to_u64_np(hi[live], lo[live]))

    long_rids = np.flatnonzero(lengths > max_b)
    for rid in long_rids.tolist():
        h = fmh_seeds_np(px.record_codes(rid), c, k)
        if h.size:
            parts_r.append(np.full(h.size, rid, np.int64))
            parts_h.append(h)
    if not parts_h:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    rids_all = np.concatenate(parts_r)
    hashes_all = np.concatenate(parts_h)
    # restore global (read, position) order; stable sort keeps the
    # within-read position order each batch row preserved
    order = np.argsort(rids_all, kind="stable")
    return rids_all[order], hashes_all[order]


_GBLOCK = 4096      # genome scan row length (bases)


def genome_survivor_positions(px: ParsedFastx, c: int, k: int):
    """(contigs, end_positions, hashes) of FracMinHash survivors over all
    contigs, in (contig, position) order — the device equivalent of
    fmh_seeds_positions per record (sylph src/seeding.rs:182-208), feeding
    the duplicate/spacing filter.

    Contigs scan in blocked rows of _GBLOCK bases with a (k-1)-base halo —
    the same seam-overlap trick the reference's AVX2 lanes use
    (src/avx2_seeding.rs:37-41), across rows instead of lanes.
    """
    import jax
    import jax.numpy as jnp

    from ..tpu.pipeline import _seed
    from ..tpu.u64 import to_u64_np

    step = _GBLOCK - (k - 1)           # fresh windows per row
    rows_bases = []
    rows_meta = []                     # (contig_id, base_offset)
    lens = []
    for cid in range(px.n_records):
        codes = px.record_codes(cid)
        n = codes.shape[0]
        if n < k:
            continue
        for off in range(0, n - k + 1, step):
            end = min(off + _GBLOCK, n)
            rows_bases.append((cid, off, end))
            lens.append(end - off)

    out_c, out_p, out_h = [], [], []
    B = 2048                           # rows per device call
    sent = np.uint32(0xFFFFFFFF)
    for lo_i in range(0, len(rows_bases), B):
        batch = rows_bases[lo_i:lo_i + B]
        nb = len(batch)
        pad_n = -(-nb // 8) * 8
        bases = np.zeros((pad_n, _GBLOCK), np.uint32)
        blens = np.zeros(pad_n, np.int32)
        for row, (cid, off, end) in enumerate(batch):
            codes = px.record_codes(cid)
            bases[row, :end - off] = codes[off:end]
            blens[row] = end - off
        hhi, hlo, keep = _seed(jnp.asarray(bases), jnp.asarray(blens),
                               c=c, k=k)
        W = _GBLOCK - k + 1
        hhi, hlo, keep = hhi[:, :W], hlo[:, :W], keep[:, :W]
        cap = min(W, 8 * W // c + 24)
        chi, clo, clanes = _compact_jit()(hhi, hlo, keep, cap, True)
        chi = np.asarray(chi)
        clo = np.asarray(clo)
        clanes = np.asarray(clanes)
        for row, (cid, off, end) in enumerate(batch):
            live = chi[row] != sent
            if not live.any():
                continue
            lanes_r = clanes[row][live].astype(np.int64)
            out_c.append(np.full(lanes_r.size, cid, np.int64))
            # end position of the window, like fmh_seeds_positions
            out_p.append(off + lanes_r + (k - 1))
            out_h.append(to_u64_np(chi[row][live], clo[row][live]))
    if not out_h:
        e = np.empty(0, np.int64)
        return e, e, np.empty(0, np.uint64)
    return (np.concatenate(out_c), np.concatenate(out_p),
            np.concatenate(out_h))


# ---------------------------------------------------------------------------
# streamed device-resident sample (grange serving path)
#
# The grange sweep's sample upload (~100 MB padded at GTDB scale) rides a
# relay whose H2D throughput swings 3x run-to-run; paid synchronously it
# is the largest and noisiest slice of the prefilter wall. The dedup
# fold's first-insertion order is append-only, so the k-mer stream can
# ship to the accelerator WHILE later blocks are still decoding: fixed
# 1 Mi-entry buffers flush as they fill (async device_put), and finalize
# uploads only the counts (u8) plus the tail. The device then sorts and
# slices the sample itself (tpu/grange.py device-view path) — compile
# shapes stay stable because buffers are fixed-size and the buffer count
# pads to a power of two.

SEG_ENTRIES = 1 << 20


class DeviceSampleStream:
    """Accumulates first-insertion-order k-mers into fixed device
    buffers during the host ingest. push() is called from ONE thread
    (the ingest's fold chain is order-dependent); the device_put happens
    on an internal uploader thread so a slow relay transfer never blocks
    the fold."""

    def __init__(self, device):
        import queue
        import threading
        self.device = device
        self._hi_bufs: List = []
        self._lo_bufs: List = []
        self._pend_hi = np.full(SEG_ENTRIES, 0xFFFFFFFF, np.uint32)
        self._pend_lo = np.full(SEG_ENTRIES, 0xFFFFFFFF, np.uint32)
        self._fill = 0
        self.total = 0
        # uploads run on a side thread: device_put through a slow relay
        # can block for the transfer, and push() is called from the
        # ingest's fold chain — the critical path. Order is the queue's.
        self._q: "queue.Queue" = queue.Queue(maxsize=4)
        self._worker = threading.Thread(target=self._drain, daemon=True)
        self._worker.start()

    def _drain(self):
        import jax
        while True:
            item = self._q.get()
            if item is None:
                return
            hi, lo = item
            self._hi_bufs.append(jax.device_put(hi, self.device))
            self._lo_bufs.append(jax.device_put(lo, self.device))

    def push(self, kmers_u64: np.ndarray) -> None:
        if kmers_u64.size == 0:
            return
        hi = (kmers_u64 >> np.uint64(32)).astype(np.uint32)
        lo = (kmers_u64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        self.total += int(kmers_u64.size)
        pos = 0
        while pos < hi.size:
            take = min(SEG_ENTRIES - self._fill, hi.size - pos)
            self._pend_hi[self._fill:self._fill + take] = hi[pos:pos + take]
            self._pend_lo[self._fill:self._fill + take] = lo[pos:pos + take]
            self._fill += take
            pos += take
            if self._fill == SEG_ENTRIES:
                self._q.put((self._pend_hi, self._pend_lo))
                self._pend_hi = np.full(SEG_ENTRIES, 0xFFFFFFFF, np.uint32)
                self._pend_lo = np.full(SEG_ENTRIES, 0xFFFFFFFF, np.uint32)
                self._fill = 0

    def close(self) -> None:
        """Stop the uploader thread without finalizing (abandoned
        streams — failed sketches — must not leak a thread per sample
        in a long serving session)."""
        if self._worker.is_alive():
            self._q.put(None)
            self._worker.join()

    def finalize(self, kmers: np.ndarray, counts: np.ndarray):
        """-> DeviceSampleView, or None if the stream went out of sync
        with the finished sketch (callers then use the host path)."""
        import jax
        if self.total == 0:
            self._q.put(None)
            self._worker.join()
            return None          # nothing streamed (fallback sketcher)
        if self.total != kmers.size:
            log.warning("device sample stream out of sync (%d streamed vs "
                        "%d sketched); host path", self.total, kmers.size)
            self._q.put(None)
            self._worker.join()
            return None
        if self._fill:
            self._pend_hi[self._fill:] = 0xFFFFFFFF
            self._pend_lo[self._fill:] = 0xFFFFFFFF
            self._q.put((self._pend_hi, self._pend_lo))
            self._fill = 0
        self._q.put(None)
        self._worker.join()      # all buffers resident before slicing
        nseg = len(self._hi_bufs)
        wq = np.minimum(counts, 63).astype(np.uint8)
        exc = np.flatnonzero(wq != 1)
        if exc.size <= max(1024, self.total // 8):
            # almost every k-mer has multiplicity 1: ship only the
            # exceptions (~KBs) and build the weight array on device.
            # The finalize-time counts upload cannot hide under the
            # ingest, and the relay's bad states put 12 MB at ~3 s.
            w_spec = ("sparse", exc.astype(np.int32),
                      wq[exc].copy())
        else:
            w = np.zeros(nseg * SEG_ENTRIES, np.uint8)
            w[:self.total] = wq
            w_spec = ("dense", [
                jax.device_put(w[i * SEG_ENTRIES:(i + 1) * SEG_ENTRIES],
                               self.device) for i in range(nseg)])
        return DeviceSampleView(self.device, self._hi_bufs, self._lo_bufs,
                                w_spec, self.total)


class DeviceSampleView:
    """Device-resident unsorted sample: fixed [SEG_ENTRIES] key buffers
    in first-insertion order, sentinel-padded, plus a weight spec
    (sparse exception list or dense u8 buffers); consumed by
    GRangeEngine.hists(device_view=...)."""

    def __init__(self, device, hi_bufs, lo_bufs, w_spec, n: int):
        self.device = device
        self.hi_bufs = hi_bufs
        self.lo_bufs = lo_bufs
        self.w_spec = w_spec
        self.n = n

    def padded_to_pow2(self):
        """(hi_bufs, lo_bufs, w_full) with the key-buffer count padded to
        a power of two via shared sentinel buffers (stable concat+sort
        shapes) and the weights materialized on device as ONE
        [p2 * SEG_ENTRIES] u8 array.

        Weight semantics at padding/tail positions don't matter: their
        keys are sentinels, which sort past the live region and are
        excluded by the n-clipped chunk offsets."""
        import functools

        import jax
        import jax.numpy as jnp

        nseg = len(self.hi_bufs)
        p2 = 1
        while p2 < nseg:
            p2 *= 2
        hi, lo = self.hi_bufs, self.lo_bufs
        if p2 != nseg:
            sent = jax.device_put(
                np.full(SEG_ENTRIES, 0xFFFFFFFF, np.uint32), self.device)
            pad = p2 - nseg
            hi = hi + [sent] * pad
            lo = lo + [sent] * pad
        N = p2 * SEG_ENTRIES
        kind = self.w_spec[0]
        if kind == "sparse":
            _, idx, vals = self.w_spec
            E = 1 << max(10, int(np.ceil(np.log2(max(idx.size, 1)))))
            idx_p = np.full(E, N, np.int32)      # N = out of range: drop
            idx_p[:idx.size] = idx
            w_p = np.zeros(E, np.uint8)
            w_p[:vals.size] = vals
            w_full = _w_build_jit(N, E)(
                jax.device_put(idx_p, self.device),
                jax.device_put(w_p, self.device))
        else:
            bufs = list(self.w_spec[1])
            if len(bufs) < p2:
                zw = jax.device_put(np.zeros(SEG_ENTRIES, np.uint8),
                                    self.device)
                bufs = bufs + [zw] * (p2 - len(bufs))
            w_full = _w_concat_jit(len(bufs))(bufs)
        return hi, lo, w_full


@_ft.lru_cache(maxsize=None)
def _w_build_jit(N: int, E: int):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(idx, vals):
        w = jnp.ones(N, jnp.uint8)
        return w.at[idx].set(vals, mode="drop")
    return f


@_ft.lru_cache(maxsize=None)
def _w_concat_jit(nseg: int):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(bufs):
        return jnp.concatenate(bufs)
    return f
