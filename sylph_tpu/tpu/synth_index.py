"""Device-generated synthetic GTDB-class grange index (benchmark support).

The database-scale benchmark (`bench.py --config gtdb`) needs a
GTDB-R220-shaped index — ~10^8-10^9 uniform FracMinHash k-mers over 10^5
genomes laid out in the grange [B, CI] bucket chunks
(/root/reference/README.md:28,42-48 is the reference workload). Building
that on the host and shipping it through this dev box's relay costs ~20
minutes of wire time per process; this module instead MATERIALIZES the
chunks on the device with pure XLA ops, from a counter-based generator
that the host can replay exactly:

    value(slot)  = mm_hash64(counter ^ SALT_V)      (the bugged Wang mix —
                   already bit-exact on device as u32 pairs and on host in
                   numpy, sylph_tpu.tpu.u64 / sylph_tpu.kmer.hashing)
    hash_hi      = chunk_base + bucket*width + value_hi % width
    hash_lo      = value_lo
    gid(slot)    = mm_hash64(counter ^ SALT_G)_lo % G
    count(bucket)= mean-SPREAD + mm_hash64(bucket ^ SALT_C)_lo % (2*SPREAD+1)

Every quantity is a pure function of the global slot counter, so
`synth_plants_host` regenerates any subset on the host in numpy — the
benchmark's planted-read machinery (inverting index hashes back to
31-mers) needs no D2H fetch of the index. Nothing here feeds the CLI or
the profiling engine; real databases go through build_grange_index.

Layout semantics mirror build_grange_index: hash space [0, (2^64-1)/c)
split into n_chunks contiguous ranges of B buckets x width; values are
uniform within their bucket, so the per-chunk join sees the same
occupancy and densities as the host-built index. Per-bucket counts are
uniform in mean +/- SPREAD rather than Poisson — the compare kernel's
work is fixed at B*CI*CS per chunk regardless of occupancy, so only the
total live count m (exact, returned) matters downstream.
"""

import functools
import math
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..kmer.hashing import inv_mm_hash64_np, mm_hash64_np
from . import u64
from .grange import GRangeIndex

SALT_V = np.uint64(0x9E3779B97F4A7C15)
SALT_G = np.uint64(0xC2B2AE3D27D4EB4F)
SALT_C = np.uint64(0x165667B19E3779F9)

SYNTH_OV = 128                # overflow columns for the tiled layout


def _default_nt() -> int:
    """SYLPH_NT, or the build_grange_index auto rule at the synthetic
    index's own geometry (target_mean 1024 -> tiled)."""
    env = os.environ.get("SYLPH_NT", "auto")
    return 4 if env == "auto" else int(env)


def _tgeom(B: int, CI: int, width: int, mean: float, spread: int,
           nt: int):
    """Tiled-layout derived geometry: per-cell mean/spread, tile width,
    per-tile overflow share, counter stride and hash sub-range width.

    Per-cell counts are uniform in [mean_t - spread_t, mean_t + spread_t]
    CAPPED at tile + ovpt so a bucket's total overflow always fits the
    shared region (the synthetic index has no spill list)."""
    mean_t = mean / nt
    spread_t = max(1, int(3.5 * math.sqrt(mean_t)))
    tile = 128 * max(1, int(round(mean_t / 128 + 0.25)))
    ovpt = SYNTH_OV // nt
    stride = tile + ovpt
    subwidth = -(-width // nt)
    cbase = max(0, int(mean_t) - spread_t)
    cmod = 2 * spread_t + 1
    return mean_t, spread_t, tile, ovpt, stride, subwidth, cbase, cmod


def _geometry(G: int, KPG: int, c: int, chunk_slots: int = 1 << 25,
              target_mean: int = 1024):
    """Chunk/bucket geometry for M = G*KPG k-mers (host ints)."""
    M = G * KPG
    n_chunks = max(1, -(-M // chunk_slots))
    slots = -(-M // n_chunks)                 # live slots per chunk
    B = 1 << max(0, int(math.ceil(math.log2(max(1, slots // target_mean)))))
    mean = slots / B
    spread = max(1, int(3.5 * math.sqrt(mean)))
    # CI covers the max possible count; round to the fill/compare tile
    CI = -(-int(mean + spread) // 128) * 128
    thr_hi = int((((1 << 64) - 1) // c) >> 32)
    width = max(1, thr_hi // (n_chunks * B))  # all hashes stay below thr
    return M, n_chunks, B, CI, width, mean, spread


def _counts_np(chunk: int, B: int, mean: float, spread: int) -> np.ndarray:
    """Per-bucket live counts for one chunk (host replay of the device)."""
    j = np.arange(B, dtype=np.uint64) + np.uint64(chunk * B)
    r = mm_hash64_np(j ^ SALT_C).astype(np.uint64)
    base = max(0, int(mean) - spread)
    return (base + (r & np.uint64(0xFFFFFFFF))
            % np.uint64(2 * spread + 1)).astype(np.int64)


def _slot_values_np(counter: np.ndarray, chunk: int, B: int, CI: int,
                    width: int, G: int
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """(hash u64, gid) for global slot counters (host replay)."""
    v = mm_hash64_np(counter.astype(np.uint64) ^ SALT_V)
    g = mm_hash64_np(counter.astype(np.uint64) ^ SALT_G)
    j = (counter // CI) % (B)                 # bucket within chunk
    base = np.uint64(chunk) * np.uint64(B) * np.uint64(width)
    hi = (base + j.astype(np.uint64) * np.uint64(width)
          + (v >> np.uint64(32)) % np.uint64(width))
    h = (hi << np.uint64(32)) | (v & np.uint64(0xFFFFFFFF))
    gid = ((g & np.uint64(0xFFFFFFFF)) % np.uint64(G)).astype(np.int32)
    return h, gid


@functools.partial(jax.jit, static_argnames=("B", "CI", "width", "G",
                                             "cbase", "cmod"))
def _gen_chunk(chunk_u32, *, B: int, CI: int, width: int, G: int,
               cbase: int, cmod: int):
    """[B, CI] (hi, lo, gid) for traced chunk id — ONE compile serves every
    chunk (remote XLA compiles cost minutes on this dev box)."""
    j = jax.lax.broadcasted_iota(jnp.uint32, (B, CI), 0)
    s = jax.lax.broadcasted_iota(jnp.uint32, (B, CI), 1)
    jg = j + chunk_u32 * jnp.uint32(B)        # global bucket id
    counter = jg * jnp.uint32(CI) + s         # global slot id (< 2^32)

    def mix(ctr, salt):
        sh, sl = u64.const(int(salt))
        return u64.mm_hash64((ctr[0] ^ sh, ctr[1] ^ sl))

    zero = jnp.zeros_like(counter)
    vhi, vlo = mix((zero, counter), SALT_V)
    _, glo = mix((zero, counter), SALT_G)
    _, clo = mix((zero, jg[:, :1]), SALT_C)

    cnt = jnp.uint32(cbase) + clo % jnp.uint32(cmod)
    live = s < cnt

    hi = (chunk_u32 * jnp.uint32(B * width) + j * jnp.uint32(width)
          + vhi % jnp.uint32(width))
    sent = jnp.uint32(0xFFFFFFFF)
    out_hi = jnp.where(live, hi, sent)
    out_lo = jnp.where(live, vlo, sent)
    gid = jnp.where(live, (glo % jnp.uint32(G)).astype(jnp.int32),
                    jnp.int32(G))
    return out_hi, out_lo, gid


def _counts_np_tiled(chunk: int, B: int, nt: int, cbase: int, cmod: int,
                     cap: int) -> np.ndarray:
    """[B*nt] per-CELL live counts for one chunk (host replay)."""
    gcell = np.arange(B * nt, dtype=np.uint64) + np.uint64(chunk * B * nt)
    r = mm_hash64_np(gcell ^ SALT_C).astype(np.uint64)
    ct = (cbase + (r & np.uint64(0xFFFFFFFF)) % np.uint64(cmod))
    return np.minimum(ct, cap).astype(np.int64)


def _slot_values_np_tiled(counter: np.ndarray, *, B: int, nt: int,
                          stride: int, subwidth: int, width: int, G: int
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """(hash u64, gid) for tiled-layout slot counters (host replay)."""
    counter = counter.astype(np.uint64)
    gcell = counter // np.uint64(stride)
    t = (gcell % np.uint64(nt)).astype(np.int64)
    j = ((gcell // np.uint64(nt)) % np.uint64(B)).astype(np.int64)
    chunk = (gcell // np.uint64(B * nt)).astype(np.int64)
    span = np.maximum(1, np.minimum(subwidth, width - t * subwidth))
    v = mm_hash64_np(counter ^ SALT_V)
    g = mm_hash64_np(counter ^ SALT_G)
    hi = (chunk * (B * width) + j * width + t * subwidth
          + ((v >> np.uint64(32)).astype(np.int64) % span)).astype(
              np.uint64)
    h = (hi << np.uint64(32)) | (v & np.uint64(0xFFFFFFFF))
    gid = ((g & np.uint64(0xFFFFFFFF)) % np.uint64(G)).astype(np.int32)
    return h, gid


@functools.partial(jax.jit, static_argnames=(
    "B", "CI", "width", "G", "nt", "tile", "ovpt", "cbase", "cmod",
    "subwidth"))
def _gen_chunk_tiled(chunk_u32, *, B: int, CI: int, width: int, G: int,
                     nt: int, tile: int, ovpt: int, cbase: int,
                     cmod: int, subwidth: int):
    """[B, CI] (hi, lo, gid) in the hash-tiled layout: columns
    [t*tile, (t+1)*tile) hold sub-range t's first ``tile`` entries, the
    trailing SYNTH_OV columns hold the per-bucket overflow (entries
    tile..ct of each over-full cell, packed in tile order)."""
    stride = tile + ovpt
    j = jax.lax.broadcasted_iota(jnp.uint32, (B, CI), 0)
    s = jax.lax.broadcasted_iota(jnp.int32, (B, CI), 1)
    jg = j + chunk_u32 * jnp.uint32(B)

    def mix(ctr, salt):
        sh, sl = u64.const(int(salt))
        return u64.mm_hash64((ctr[0] ^ sh, ctr[1] ^ sl))

    # per-tile counts/overflows for the row's bucket: [B, 1] each
    cts, ots, cums = [], [], [jnp.zeros((B, 1), jnp.int32)]
    for t in range(nt):
        gcell_t = jg[:, :1] * jnp.uint32(nt) + jnp.uint32(t)
        _, clo = mix((jnp.zeros_like(gcell_t), gcell_t), SALT_C)
        ct = jnp.minimum(jnp.int32(cbase)
                         + (clo % jnp.uint32(cmod)).astype(jnp.int32),
                         stride)
        cts.append(ct)
        ots.append(jnp.maximum(ct - tile, 0))
        cums.append(cums[-1] + ots[-1])

    in_tiles = s < nt * tile
    t_of_s = jnp.minimum(s // tile, nt - 1)
    ct_sel = sum(jnp.where(t_of_s == t, cts[t], 0) for t in range(nt))
    live_tile = in_tiles & ((s % tile) < jnp.minimum(ct_sel, tile))

    k = s - nt * tile
    tau = sum((k >= cums[t]).astype(jnp.int32) for t in range(1, nt))
    cum_tau = sum(jnp.where(tau == t, cums[t], 0) for t in range(nt))
    live_ov = (~in_tiles) & (k < cums[nt])

    live = live_tile | live_ov
    tt = jnp.where(in_tiles, t_of_s, tau)
    s_local = jnp.where(in_tiles, s % tile, tile + (k - cum_tau))
    gcell = jg * jnp.uint32(nt) + tt.astype(jnp.uint32)
    counter = gcell * jnp.uint32(stride) + s_local.astype(jnp.uint32)

    zero = jnp.zeros_like(counter)
    vhi, vlo = mix((zero, counter), SALT_V)
    _, glo = mix((zero, counter), SALT_G)
    span = jnp.maximum(1, jnp.minimum(subwidth, width - tt * subwidth)
                       ).astype(jnp.uint32)
    hi = (chunk_u32 * jnp.uint32(B * width) + j * jnp.uint32(width)
          + tt.astype(jnp.uint32) * jnp.uint32(subwidth) + vhi % span)
    sent = jnp.uint32(0xFFFFFFFF)
    out_hi = jnp.where(live, hi, sent)
    out_lo = jnp.where(live, vlo, sent)
    gid = jnp.where(live, (glo % jnp.uint32(G)).astype(jnp.int32),
                    jnp.int32(G))
    return out_hi, out_lo, gid


def _chunk_device(chunk: int, *, B: int, CI: int, width: int, G: int,
                  mean: float, spread: int, device, nt: int = 1):
    """One [B, CI] (hi, lo, gid) chunk materialized on ``device``."""
    with jax.default_device(device):
        if nt > 1:
            _mt, _st, tile, ovpt, _stride, subw, cbase, cmod = _tgeom(
                B, CI, width, mean, spread, nt)
            return _gen_chunk_tiled(
                jnp.uint32(chunk), B=B, CI=nt * tile + SYNTH_OV,
                width=width, G=G, nt=nt, tile=tile, ovpt=ovpt,
                cbase=cbase, cmod=cmod, subwidth=subw)
        return _gen_chunk(jnp.uint32(chunk), B=B, CI=CI, width=width,
                          G=G, cbase=max(0, int(mean) - spread),
                          cmod=2 * spread + 1)


def synth_index_device(G: int, KPG: int, c: int = 200,
                       devices: Optional[List] = None,
                       chunk_slots: int = 1 << 25,
                       target_mean: int = 1024,
                       nt: Optional[int] = None) -> GRangeIndex:
    """GRangeIndex whose chunk arrays are device-resident jax arrays.

    GRangeEngine device_puts chunks it is handed; for already-committed
    arrays that is a no-op, so the engine serves this index with zero
    host->device index traffic. ``nt`` (default env SYLPH_NT) > 1
    generates the hash-tiled layout.
    """
    devs = devices if devices is not None else jax.devices()
    if nt is None:
        nt = _default_nt()
    M, n_chunks, B, CI, width, mean, spread = _geometry(
        G, KPG, c, chunk_slots, target_mean)
    ov = 0
    if nt > 1:
        _mt, _st, tile, ovpt, stride, _sw, cbase, cmod = _tgeom(
            B, CI, width, mean, spread, nt)
        CI = nt * tile + SYNTH_OV
        ov = SYNTH_OV
    chunk_hi, chunk_lo, chunk_gid = [], [], []
    m = 0
    bases = np.zeros(n_chunks, np.uint32)
    edges = np.zeros((n_chunks, 2), np.uint64)
    for i in range(n_chunks):
        h, l, g = _chunk_device(i, B=B, CI=CI, width=width, G=G,
                                mean=mean, spread=spread,
                                device=devs[i % len(devs)], nt=nt)
        chunk_hi.append(h)
        chunk_lo.append(l)
        chunk_gid.append(g)
        if nt > 1:
            m += int(_counts_np_tiled(i, B, nt, cbase, cmod,
                                      stride).sum())
        else:
            m += int(_counts_np(i, B, mean, spread).sum())
        lo_edge = np.uint64(i * B * width) << np.uint64(32)
        hi_edge = (np.uint64((i + 1) * B * width) << np.uint64(32)) \
            - np.uint64(1)
        bases[i] = np.uint32(i * B * width)
        edges[i] = (lo_edge, hi_edge)
    return GRangeIndex(chunk_hi, chunk_lo, chunk_gid, bases, edges,
                       width, B, CI, np.empty(0, np.uint64),
                       np.empty(0, np.int32), m, G,
                       nt=nt if nt > 1 else 1, ov=ov)


def _enum_cells_np(counts: np.ndarray, stride: int, first: np.ndarray,
                   n_each: np.ndarray):
    """Ragged per-cell counter enumeration: for each selected cell i,
    counters first[i] + [0, n_each[i])."""
    total = int(n_each.sum())
    starts = np.concatenate([[0], np.cumsum(n_each)[:-1]])
    r = np.arange(total, dtype=np.int64) - np.repeat(starts, n_each)
    return np.repeat(first, n_each) + r


def synth_chunks_host(G: int, KPG: int, c: int = 200,
                      chunk_slots: int = 1 << 25,
                      target_mean: int = 1024,
                      nt: Optional[int] = None):
    """Host numpy replay of every chunk (tests / small sizes only)."""
    if nt is None:
        nt = _default_nt()
    M, n_chunks, B, CI, width, mean, spread = _geometry(
        G, KPG, c, chunk_slots, target_mean)
    if nt > 1:
        return _synth_chunks_host_tiled(G, n_chunks, B, CI, width, mean,
                                        spread, nt)
    out = []
    for i in range(n_chunks):
        cnt = _counts_np(i, B, mean, spread)
        j = np.repeat(np.arange(B, dtype=np.int64), CI)
        s = np.tile(np.arange(CI, dtype=np.int64), B)
        counter = (np.int64(i * B) + j) * CI + s
        h, gid = _slot_values_np(counter, i, B, CI, width, G)
        live = s < cnt[j]
        sent = np.uint32(0xFFFFFFFF)
        hi = np.where(live, (h >> np.uint64(32)).astype(np.uint32), sent)
        lo = np.where(live, h.astype(np.uint32), sent)
        g = np.where(live, gid, np.int32(G))
        out.append((hi.reshape(B, CI), lo.reshape(B, CI),
                    g.reshape(B, CI).astype(np.int32)))
    return out


def _synth_chunks_host_tiled(G, n_chunks, B, CI, width, mean, spread,
                             nt):
    """Host numpy replay of _gen_chunk_tiled (tests / small sizes)."""
    _mt, _st, tile, ovpt, stride, subw, cbase, cmod = _tgeom(
        B, CI, width, mean, spread, nt)
    CI = nt * tile + SYNTH_OV
    sent = np.uint32(0xFFFFFFFF)
    out = []
    for i in range(n_chunks):
        cts = _counts_np_tiled(i, B, nt, cbase, cmod, stride).reshape(
            B, nt)
        hh = np.full((B, CI), sent, np.uint32)
        hl = np.full((B, CI), sent, np.uint32)
        hg = np.full((B, CI), np.int32(G), np.int32)
        # enumerate every live slot: (cell, s_local) pairs
        nct = cts.reshape(-1)
        first = ((np.arange(B * nt, dtype=np.int64)
                  + np.int64(i) * B * nt) * stride)
        counters = _enum_cells_np(nct, stride, first, nct)
        h, gid = _slot_values_np_tiled(counters, B=B, nt=nt,
                                       stride=stride, subwidth=subw,
                                       width=width, G=G)
        # columns: tile part at t*tile + s; overflow packed per bucket
        cell = (counters // stride).astype(np.int64) - np.int64(i) * B * nt
        s_loc = (counters % stride).astype(np.int64)
        j = cell // nt
        t = cell % nt
        in_tile = s_loc < tile
        col = np.where(in_tile, t * tile + s_loc, 0)
        ots = np.maximum(cts - tile, 0)
        cums = np.concatenate([np.zeros((B, 1), np.int64),
                               np.cumsum(ots, axis=1)], axis=1)
        ovf = ~in_tile
        col[ovf] = (nt * tile + cums[j[ovf], t[ovf]]
                    + (s_loc[ovf] - tile))
        hh[j, col] = (h >> np.uint64(32)).astype(np.uint32)
        hl[j, col] = h.astype(np.uint32)
        hg[j, col] = gid
        out.append((hh, hl, hg))
    return out


def synth_plants_host(G: int, KPG: int, c: int = 200, per_chunk: int = 4096,
                      gid_max: Optional[int] = None,
                      chunk_slots: int = 1 << 25,
                      target_mean: int = 1024,
                      nt: Optional[int] = None
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """(kmer u64, gid) plantable index entries, regenerated on the host.

    Mirrors bench._usable_plants against the device-synthesized index:
    strided-samples ``per_chunk`` live slots per chunk, keeps entries whose
    hash inverts to a valid canonical 31-mer, optionally restricted to
    gid < gid_max (the "abundant taxa" pool). No device traffic.
    """
    from bench import _rc31_np                      # local: avoids a cycle

    if nt is None:
        nt = _default_nt()
    M, n_chunks, B, CI, width, mean, spread = _geometry(
        G, KPG, c, chunk_slots, target_mean)
    if nt > 1:
        _mt, _st, _tile, _ovpt, stride, subw, cbase, cmod = _tgeom(
            B, CI, width, mean, spread, nt)
    ks, gs = [], []
    for i in range(n_chunks):
        if nt > 1:
            cnt = _counts_np_tiled(i, B, nt, cbase, cmod, stride)
            n_units, unit_mean = B * nt, mean / nt
        else:
            cnt = _counts_np(i, B, mean, spread)
            n_units, unit_mean = B, mean
        # enumeration is vectorized (ragged arange); subsample WITHIN
        # cells (slot stride) when only ~per_chunk plants are wanted —
        # a strided subset of CELLS would concentrate the pool and blow
        # the join's per-cell sample capacity (measured: conservation
        # failures at GTDB scale came exactly from that clustering)
        want = max(per_chunk, 1)
        # worst case ~7/8 rejected by invertibility + gid_max filter
        over = 8 if gid_max is None else max(8, 8 * G // max(gid_max, 1))
        total_live = max(1, int(cnt.sum()))
        step = max(1, total_live // max(1, want * over))
        jj = np.arange(0, n_units, dtype=np.int64)
        cj = -(-cnt // step)               # ceil(ct/step) slots per cell
        total = int(cj.sum())
        starts = np.concatenate([[0], np.cumsum(cj)[:-1]])
        r = np.arange(total, dtype=np.int64) - np.repeat(starts, cj)
        unit_stride = stride if nt > 1 else CI
        counter = np.repeat(
            (np.int64(i * n_units) + jj) * unit_stride, cj) + r * step
        if gid_max is not None:
            # cheap gid pass first: full-chunk scans (abundant-taxa pool)
            # only hash the ~gid_max/G survivors
            g0 = mm_hash64_np(counter.astype(np.uint64) ^ SALT_G)
            counter = counter[((g0 & np.uint64(0xFFFFFFFF))
                               % np.uint64(G)) < gid_max]
            del g0
        if nt > 1:
            h, gid = _slot_values_np_tiled(counter, B=B, nt=nt,
                                           stride=stride, subwidth=subw,
                                           width=width, G=G)
        else:
            h, gid = _slot_values_np(counter, i, B, CI, width, G)
        keep = np.ones(h.size, bool)
        if gid_max is not None:
            assert (gid < gid_max).all()
        v = inv_mm_hash64_np(h[keep])
        ok = (v < np.uint64(1) << np.uint64(62)) & (v <= _rc31_np(v))
        hk = h[keep][ok]
        gk = gid[keep][ok]
        if hk.size > per_chunk:
            sl = slice(None, None, hk.size // per_chunk)
            hk, gk = hk[sl][:per_chunk], gk[sl][:per_chunk]
        ks.append(hk)
        gs.append(gk)
    return np.concatenate(ks), np.concatenate(gs)
