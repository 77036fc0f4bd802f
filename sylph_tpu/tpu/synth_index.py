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
SALT_D = np.uint64(0x27D4EB2F165667C5)   # per-cell short-run class
SALT_L = np.uint64(0x9E3779B97F4A7C55)   # heavy run length
SALT_HG = np.uint64(0xD6E8FEB86659FD93)  # heavy CSR genome ids

SYNTH_OV = 128                # overflow columns for the tiled layout

# Short-run duplication classes d in {1, 2, 4, 8, 16}: a cell's entries
# group into runs of d equal hash values (conserved k-mers shared by d
# genomes). Class picked per cell from hash(cell)%1024 with cumulative
# thresholds putting OCCURRENCE mass ~ 1/d on each class — the pow2
# quantization of a zipf(2.0) occurrence profile conditioned on d <= 16
# (runs longer than the build's heavy_run are modeled separately as
# extracted marker cells, see DupSpec).
DUP_T = (541, 805, 937, 1003)


class DupSpec:
    """Duplication-skew parameters for the synthetic index.

    Models a strain-rich (GTDB-like) database AFTER build_grange_index's
    heavy-run extraction: normal cells hold zipf-ish short runs (d <= 16
    copies of a hash across genomes, DUP_T classes); every q-th cell is a
    heavy-marker cell holding ``r`` marker slots (gid = G + run_id), each
    representing an extracted run of lbase + hash(run)%lmod genomes whose
    CSR is hash-regenerable (SALT_HG) — so the 10^8-entry CSR never needs
    to be materialized for device-side expansion. ``hf`` is the fraction
    of total occurrence mass carried by the heavy CSR; q is calibrated
    from it at geometry time (synth_index_device)."""

    def __init__(self, hf: float = 0.5, r: int = 8, lbase: int = 369,
                 lmod: int = 256, q: Optional[int] = None):
        assert 0.0 < hf < 1.0 and r >= 1 and lbase >= 1 and lmod >= 1
        self.hf = hf
        self.r = r
        self.lbase = lbase
        self.lmod = lmod
        self.q = q                       # None: calibrated from hf

    @property
    def lmean(self) -> float:
        return self.lbase + (self.lmod - 1) / 2.0

    def key(self) -> str:
        """Cache-name tag (deterministic)."""
        return (f"hf{self.hf}_r{self.r}_l{self.lbase}.{self.lmod}"
                + (f"_q{self.q}" if self.q else ""))


def heavy_lengths_np(n_heavy: int, lbase: int, lmod: int) -> np.ndarray:
    """[n_heavy] CSR run lengths (host replay of the device formula)."""
    rr = np.arange(n_heavy, dtype=np.uint64)
    h = mm_hash64_np(rr ^ SALT_L)
    return (lbase + (h & np.uint64(0xFFFFFFFF))
            % np.uint64(lmod)).astype(np.int64)


def heavy_gids_np(rr: np.ndarray, i: np.ndarray, G: int) -> np.ndarray:
    """Genome id of CSR entry (run rr, position i) — host replay."""
    ctr = (rr.astype(np.uint64) << np.uint64(32)) | i.astype(np.uint64)
    h = mm_hash64_np(ctr ^ SALT_HG)
    return ((h & np.uint64(0xFFFFFFFF)) % np.uint64(G)).astype(np.int32)


def synth_heavy_csr_host(n_heavy: int, G: int, lbase: int, lmod: int
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """(heavy_gids, heavy_ptr) materialized on the host (tests / small
    scale — at GTDB scale the CSR is ~10^8 entries and stays virtual)."""
    lens = heavy_lengths_np(n_heavy, lbase, lmod)
    ptr = np.zeros(n_heavy + 1, np.int64)
    np.cumsum(lens, out=ptr[1:])
    rr = np.repeat(np.arange(n_heavy, dtype=np.int64), lens)
    i = np.arange(int(ptr[-1]), dtype=np.int64) - np.repeat(ptr[:-1], lens)
    return heavy_gids_np(rr, i, G), ptr


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


def _dup_class_np(gcell: np.ndarray) -> np.ndarray:
    """Per-cell short-run mask d-1 (d in {1,2,4,8,16}), host replay."""
    h = mm_hash64_np(gcell.astype(np.uint64) ^ SALT_D)
    u = (h & np.uint64(0xFFFFFFFF)) % np.uint64(1024)
    cls = sum((u >= t).astype(np.int64) for t in DUP_T)
    return (1 << cls) - 1


def _counts_np_tiled_dup(chunk: int, B: int, nt: int, cbase: int,
                         cmod: int, cap: int, q: int, r: int) -> np.ndarray:
    """[B*nt] per-CELL live counts, dup mode (heavy cells hold r markers)."""
    gcell = np.arange(B * nt, dtype=np.uint64) + np.uint64(chunk * B * nt)
    ct = _counts_np_tiled(chunk, B, nt, cbase, cmod, cap)
    return np.where((gcell % np.uint64(q)) == 0, np.int64(r), ct)


def _slot_values_np_tiled_dup(counter: np.ndarray, *, B: int, nt: int,
                              stride: int, subwidth: int, width: int,
                              G: int, q: int, r: int
                              ) -> Tuple[np.ndarray, np.ndarray]:
    """(hash u64, gid) for dup-mode tiled slot counters (host replay).

    Values within a cell group into runs of d equal hashes (the run's
    FIRST slot's counter feeds SALT_V); heavy cells (gcell % q == 0)
    hold marker slots with gid = G + (gcell//q)*r + s_local."""
    counter = counter.astype(np.uint64)
    gcell = counter // np.uint64(stride)
    s_loc = (counter % np.uint64(stride)).astype(np.int64)
    heavy = (gcell % np.uint64(q)) == 0
    dmask = np.where(heavy, 0, _dup_class_np(gcell))
    vctr = gcell * np.uint64(stride) + (s_loc & ~dmask).astype(np.uint64)
    t = (gcell % np.uint64(nt)).astype(np.int64)
    j = ((gcell // np.uint64(nt)) % np.uint64(B)).astype(np.int64)
    chunk = (gcell // np.uint64(B * nt)).astype(np.int64)
    span = np.maximum(1, np.minimum(subwidth, width - t * subwidth))
    v = mm_hash64_np(vctr ^ SALT_V)
    g = mm_hash64_np(counter ^ SALT_G)
    hi = (chunk * (B * width) + j * width + t * subwidth
          + ((v >> np.uint64(32)).astype(np.int64) % span)).astype(
              np.uint64)
    h = (hi << np.uint64(32)) | (v & np.uint64(0xFFFFFFFF))
    hrun = ((gcell // np.uint64(q)).astype(np.int64) * r + s_loc)
    gid = np.where(heavy, np.int64(G) + hrun,
                   ((g & np.uint64(0xFFFFFFFF)) % np.uint64(G))
                   .astype(np.int64)).astype(np.int32)
    return h, gid


@functools.partial(jax.jit, static_argnames=(
    "B", "CI", "width", "G", "nt", "tile", "ovpt", "cbase", "cmod",
    "subwidth", "q", "r", "n_heavy"))
def _gen_chunk_tiled_dup(chunk_u32, *, B: int, CI: int, width: int,
                         G: int, nt: int, tile: int, ovpt: int,
                         cbase: int, cmod: int, subwidth: int, q: int,
                         r: int, n_heavy: int):
    """Dup-mode _gen_chunk_tiled: short runs inside cells (d equal hash
    values with distinct gids) + heavy-marker cells every q-th cell (the
    post-extraction grid of a strain-rich database). Pad gid is
    G + n_heavy (= g_eff, matching build_grange_index)."""
    stride = tile + ovpt
    j = jax.lax.broadcasted_iota(jnp.uint32, (B, CI), 0)
    s = jax.lax.broadcasted_iota(jnp.int32, (B, CI), 1)
    jg = j + chunk_u32 * jnp.uint32(B)

    def mix(ctr, salt):
        sh, sl = u64.const(int(salt))
        return u64.mm_hash64((ctr[0] ^ sh, ctr[1] ^ sl))

    cts, dms, ots, cums = [], [], [], [jnp.zeros((B, 1), jnp.int32)]
    for t in range(nt):
        gcell_t = jg[:, :1] * jnp.uint32(nt) + jnp.uint32(t)
        zc = jnp.zeros_like(gcell_t)
        _, clo = mix((zc, gcell_t), SALT_C)
        ct = jnp.minimum(jnp.int32(cbase)
                         + (clo % jnp.uint32(cmod)).astype(jnp.int32),
                         stride)
        heavy_t = (gcell_t % jnp.uint32(q)) == 0
        ct = jnp.where(heavy_t, jnp.int32(r), ct)
        _, dlo = mix((zc, gcell_t), SALT_D)
        u = (dlo % jnp.uint32(1024)).astype(jnp.int32)
        cls = sum((u >= jnp.int32(th)).astype(jnp.int32) for th in DUP_T)
        dmask = jnp.where(heavy_t, 0, (1 << cls) - 1)
        cts.append(ct)
        dms.append(dmask)
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
    dmask_sel = sum(jnp.where(tt == t, dms[t], 0) for t in range(nt))
    gcell = jg * jnp.uint32(nt) + tt.astype(jnp.uint32)
    heavy_sel = (gcell % jnp.uint32(q)) == 0
    counter = gcell * jnp.uint32(stride) + s_local.astype(jnp.uint32)
    vctr = (gcell * jnp.uint32(stride)
            + (s_local & ~dmask_sel).astype(jnp.uint32))

    zero = jnp.zeros_like(counter)
    vhi, vlo = mix((zero, vctr), SALT_V)
    _, glo = mix((zero, counter), SALT_G)
    span = jnp.maximum(1, jnp.minimum(subwidth, width - tt * subwidth)
                       ).astype(jnp.uint32)
    hi = (chunk_u32 * jnp.uint32(B * width) + j * jnp.uint32(width)
          + tt.astype(jnp.uint32) * jnp.uint32(subwidth) + vhi % span)
    hrun = ((gcell // jnp.uint32(q)) * jnp.uint32(r)
            + s_local.astype(jnp.uint32)).astype(jnp.int32)
    gid_live = jnp.where(heavy_sel, jnp.int32(G) + hrun,
                         (glo % jnp.uint32(G)).astype(jnp.int32))
    sent = jnp.uint32(0xFFFFFFFF)
    out_hi = jnp.where(live, hi, sent)
    out_lo = jnp.where(live, vlo, sent)
    gid = jnp.where(live, gid_live, jnp.int32(G + n_heavy))
    return out_hi, out_lo, gid


def _chunk_device(chunk: int, *, B: int, CI: int, width: int, G: int,
                  mean: float, spread: int, device, nt: int = 1,
                  dup=None, n_heavy: int = 0):
    """One [B, CI] (hi, lo, gid) chunk materialized on ``device``."""
    with jax.default_device(device):
        if nt > 1:
            _mt, _st, tile, ovpt, _stride, subw, cbase, cmod = _tgeom(
                B, CI, width, mean, spread, nt)
            if dup is not None:
                return _gen_chunk_tiled_dup(
                    jnp.uint32(chunk), B=B, CI=nt * tile + SYNTH_OV,
                    width=width, G=G, nt=nt, tile=tile, ovpt=ovpt,
                    cbase=cbase, cmod=cmod, subwidth=subw, q=dup.q,
                    r=dup.r, n_heavy=n_heavy)
            return _gen_chunk_tiled(
                jnp.uint32(chunk), B=B, CI=nt * tile + SYNTH_OV,
                width=width, G=G, nt=nt, tile=tile, ovpt=ovpt,
                cbase=cbase, cmod=cmod, subwidth=subw)
        assert dup is None, "duplication mode requires the tiled layout"
        return _gen_chunk(jnp.uint32(chunk), B=B, CI=CI, width=width,
                          G=G, cbase=max(0, int(mean) - spread),
                          cmod=2 * spread + 1)


def synth_index_device(G: int, KPG: int, c: int = 200,
                       devices: Optional[List] = None,
                       chunk_slots: int = 1 << 25,
                       target_mean: int = 1024,
                       nt: Optional[int] = None,
                       dup: Optional[DupSpec] = None,
                       csr_host: bool = False) -> GRangeIndex:
    """GRangeIndex whose chunk arrays are device-resident jax arrays.

    GRangeEngine device_puts chunks it is handed; for already-committed
    arrays that is a no-op, so the engine serves this index with zero
    host->device index traffic. ``nt`` (default env SYLPH_NT) > 1
    generates the hash-tiled layout.

    ``dup`` switches to the duplication-skewed population (see DupSpec):
    the grid carries G*KPG*(1-hf) short-run occurrences and the heavy CSR
    the remaining hf mass; dup.q is calibrated here from the geometry
    when unset. With ``csr_host`` the heavy CSR is materialized so the
    host paths (GRangeEngine.hists / heavy_expand) are exact — tests and
    small scales only; the bench leaves it virtual and expands markers on
    device (expand_markers_device)."""
    devs = devices if devices is not None else jax.devices()
    if nt is None:
        nt = _default_nt()
    M_total = G * KPG
    n_heavy = 0
    if dup is not None:
        assert nt > 1, "duplication mode requires the tiled layout"
        M_grid = int(M_total * (1.0 - dup.hf))
        kpg_grid = -(-M_grid // G)
    else:
        kpg_grid = KPG
    M, n_chunks, B, CI, width, mean, spread = _geometry(
        G, kpg_grid, c, chunk_slots, target_mean)
    if dup is not None:
        n_cells = n_chunks * B * nt
        if dup.q is None:
            want_heavy = max(1.0, M_total * dup.hf / dup.lmean)
            dup.q = max(2, int(round(n_cells * dup.r / want_heavy)))
        n_heavy = -(-n_cells // dup.q) * dup.r
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
                                device=devs[i % len(devs)], nt=nt,
                                dup=dup, n_heavy=n_heavy)
        chunk_hi.append(h)
        chunk_lo.append(l)
        chunk_gid.append(g)
        if dup is not None:
            # live NON-marker grid slots (markers stand for CSR mass)
            cells = _counts_np_tiled_dup(i, B, nt, cbase, cmod, stride,
                                         dup.q, dup.r)
            gcell = (np.arange(B * nt, dtype=np.int64)
                     + np.int64(i) * B * nt)
            m += int(cells[(gcell % dup.q) != 0].sum())
        elif nt > 1:
            m += int(_counts_np_tiled(i, B, nt, cbase, cmod,
                                      stride).sum())
        else:
            m += int(_counts_np(i, B, mean, spread).sum())
        lo_edge = np.uint64(i * B * width) << np.uint64(32)
        hi_edge = (np.uint64((i + 1) * B * width) << np.uint64(32)) \
            - np.uint64(1)
        bases[i] = np.uint32(i * B * width)
        edges[i] = (lo_edge, hi_edge)
    heavy_gids = np.empty(0, np.int32)
    heavy_ptr = np.zeros(1, np.int64)
    if dup is not None:
        if csr_host:
            heavy_gids, heavy_ptr = synth_heavy_csr_host(
                n_heavy, G, dup.lbase, dup.lmod)
        else:
            # virtual CSR: ptr (small) drives g_eff and expansion sizing;
            # gids regenerate from SALT_HG on demand (device or host) —
            # heavy_expand needs csr_host=True
            lens = heavy_lengths_np(n_heavy, dup.lbase, dup.lmod)
            heavy_ptr = np.zeros(n_heavy + 1, np.int64)
            np.cumsum(lens, out=heavy_ptr[1:])
        m += int(heavy_ptr[-1])
    return GRangeIndex(chunk_hi, chunk_lo, chunk_gid, bases, edges,
                       width, B, CI, np.empty(0, np.uint64),
                       np.empty(0, np.int32), m, G,
                       nt=nt if nt > 1 else 1, ov=ov,
                       heavy_gids=heavy_gids, heavy_ptr=heavy_ptr)


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
                      nt: Optional[int] = None,
                      dup: Optional[DupSpec] = None):
    """Host numpy replay of every chunk (tests / small sizes only).

    Dup mode: ``dup.q`` must already be calibrated (run
    synth_index_device first, or set q explicitly)."""
    if nt is None:
        nt = _default_nt()
    if dup is not None:
        assert nt > 1 and dup.q is not None
        M_grid = int(G * KPG * (1.0 - dup.hf))
        kpg_grid = -(-M_grid // G)
    else:
        kpg_grid = KPG
    M, n_chunks, B, CI, width, mean, spread = _geometry(
        G, kpg_grid, c, chunk_slots, target_mean)
    if nt > 1:
        return _synth_chunks_host_tiled(G, n_chunks, B, CI, width, mean,
                                        spread, nt, dup=dup)
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
                             nt, dup=None):
    """Host numpy replay of _gen_chunk_tiled[_dup] (tests / small sizes)."""
    _mt, _st, tile, ovpt, stride, subw, cbase, cmod = _tgeom(
        B, CI, width, mean, spread, nt)
    CI = nt * tile + SYNTH_OV
    n_heavy = (-(-(n_chunks * B * nt) // dup.q) * dup.r
               if dup is not None else 0)
    sent = np.uint32(0xFFFFFFFF)
    out = []
    for i in range(n_chunks):
        if dup is not None:
            cts = _counts_np_tiled_dup(i, B, nt, cbase, cmod, stride,
                                       dup.q, dup.r).reshape(B, nt)
        else:
            cts = _counts_np_tiled(i, B, nt, cbase, cmod, stride).reshape(
                B, nt)
        hh = np.full((B, CI), sent, np.uint32)
        hl = np.full((B, CI), sent, np.uint32)
        hg = np.full((B, CI), np.int32(G + n_heavy), np.int32)
        # enumerate every live slot: (cell, s_local) pairs
        nct = cts.reshape(-1)
        first = ((np.arange(B * nt, dtype=np.int64)
                  + np.int64(i) * B * nt) * stride)
        counters = _enum_cells_np(nct, stride, first, nct)
        if dup is not None:
            h, gid = _slot_values_np_tiled_dup(
                counters, B=B, nt=nt, stride=stride, subwidth=subw,
                width=width, G=G, q=dup.q, r=dup.r)
        else:
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
                      nt: Optional[int] = None,
                      dup: Optional[DupSpec] = None
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """(kmer u64, gid) plantable index entries, regenerated on the host.

    Mirrors bench._usable_plants against the device-synthesized index:
    strided-samples ``per_chunk`` live slots per chunk, keeps entries whose
    hash inverts to a valid canonical 31-mer, optionally restricted to
    gid < gid_max (the "abundant taxa" pool). No device traffic.

    Dup mode (calibrated ``dup``): run-representative values replace the
    per-slot values, so duplicate plants from one run may repeat (the
    bench plants occurrences, harmless); heavy-marker entries carry
    gid = G + run and are excluded from gid_max pools — background pools
    include them at their natural grid frequency, which is what drives
    marker hits + device expansion in the dup benchmark.
    """
    from bench import _rc31_np                      # local: avoids a cycle

    if nt is None:
        nt = _default_nt()
    if dup is not None:
        assert nt > 1 and dup.q is not None
        kpg_grid = -(-int(G * KPG * (1.0 - dup.hf)) // G)
    else:
        kpg_grid = KPG
    M, n_chunks, B, CI, width, mean, spread = _geometry(
        G, kpg_grid, c, chunk_slots, target_mean)
    if nt > 1:
        _mt, _st, _tile, _ovpt, stride, subw, cbase, cmod = _tgeom(
            B, CI, width, mean, spread, nt)
    ks, gs = [], []
    for i in range(n_chunks):
        if dup is not None:
            cnt = _counts_np_tiled_dup(i, B, nt, cbase, cmod, stride,
                                       dup.q, dup.r)
            n_units, unit_mean = B * nt, mean / nt
        elif nt > 1:
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
        if dup is not None and gid_max is not None:
            # abundant pools hold real genomes only: drop marker cells
            # before the gid filter (their gid formula differs)
            gc = counter // unit_stride
            counter = counter[(gc % dup.q) != 0]
        if gid_max is not None:
            # cheap gid pass first: full-chunk scans (abundant-taxa pool)
            # only hash the ~gid_max/G survivors
            g0 = mm_hash64_np(counter.astype(np.uint64) ^ SALT_G)
            counter = counter[((g0 & np.uint64(0xFFFFFFFF))
                               % np.uint64(G)) < gid_max]
            del g0
        if dup is not None:
            h, gid = _slot_values_np_tiled_dup(
                counter, B=B, nt=nt, stride=stride, subwidth=subw,
                width=width, G=G, q=dup.q, r=dup.r)
        elif nt > 1:
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


@functools.partial(jax.jit, static_argnames=(
    "G", "n_heavy", "runs_cap", "entries_cap", "lbase", "lmod"))
def expand_markers_device(hist, *, G: int, n_heavy: int, runs_cap: int,
                          entries_cap: int, lbase: int, lmod: int):
    """Expand heavy-run marker bins into real-genome counts ON DEVICE.

    ``hist`` is a [g_eff*HIST_H + 1] histogram from
    GRangeEngine.hist_device_stream over a dup-mode synthetic index: bins
    past G*H are marker rows (one per extracted duplication run). Each
    hit marker row is one-hot (a run's hash appears once in the folded
    sample stream), so expansion is: for every hit run rr at multiplicity
    m, add +1 at (gid, m) for each of its L_rr CSR genomes — with the CSR
    regenerated from SALT_HG hashes instead of gathered from HBM (the
    GTDB-scale CSR is ~10^8 entries; hashes are VPU work, gathers are
    ~8 ns/element).

    Returns (expanded [G*H] i32, ok bool scalar). ``ok`` is True iff the
    compaction captured every marker hit (<= runs_cap rows, <= entries_cap
    CSR entries, all rows one-hot with count 1) — callers treat False
    like a conservation-check failure (re-run with bigger caps).

    The real-database equivalent is GRangeEngine.heavy_expand (host CSR,
    exact, used by the CLI); this device form exists so the benchmark's
    timed region includes marker expansion without a [n_heavy, H] D2H
    fetch per run (sylph profiles strain-rich databases where heavy mass
    dominates, /root/reference/README.md:42-48).
    """
    from .grange import HIST_H
    H = HIST_H
    mrows = jax.lax.dynamic_slice_in_dim(
        hist, G * H, n_heavy * H).reshape(n_heavy, H)
    rowsum = mrows.sum(axis=1)
    total_mass = rowsum.sum()
    idx = jnp.nonzero(rowsum > 0, size=runs_cap, fill_value=n_heavy)[0]
    valid = idx < n_heavy
    idxc = jnp.minimum(idx, max(n_heavy - 1, 0)).astype(jnp.int32)
    rows = mrows[idxc]                               # [runs_cap, H]
    mult = jnp.argmax(rows, axis=1).astype(jnp.int32)
    cnt = jnp.max(rows, axis=1)
    captured = jnp.sum(jnp.where(valid, rows.sum(axis=1), 0))
    onehot_ok = captured == jnp.sum(jnp.where(valid, cnt, 0))
    ones_ok = jnp.all(jnp.where(valid, cnt == 1, True))

    def mix(hi, lo, salt):
        sh, sl = u64.const(int(salt))
        return u64.mm_hash64((hi ^ sh, lo ^ sl))

    zero = jnp.zeros_like(idxc, dtype=jnp.uint32)
    _, llo = mix(zero, idxc.astype(jnp.uint32), SALT_L)
    L = jnp.where(valid,
                  (jnp.uint32(lbase) + llo % jnp.uint32(lmod))
                  .astype(jnp.int32), 0)
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(L)[:-1]])
    total_e = jnp.sum(L)
    # monotone repeats (cumsum + scatter under the hood): no big gathers
    rr_e = jnp.repeat(idxc.astype(jnp.uint32), L,
                      total_repeat_length=entries_cap)
    m_e = jnp.repeat(mult, L, total_repeat_length=entries_cap)
    st_e = jnp.repeat(starts, L, total_repeat_length=entries_cap)
    e = jnp.arange(entries_cap, dtype=jnp.int32)
    i_loc = jnp.maximum(e - st_e, 0).astype(jnp.uint32)
    _, glo = mix(rr_e, i_loc, SALT_HG)
    gid = (glo % jnp.uint32(G)).astype(jnp.int32)
    in_b = e < total_e
    code = jnp.where(in_b, gid * H + m_e, jnp.int32(G * H))
    from .containment import _bincount
    delta = _bincount(code, G * H + 1)
    out = hist[:G * H] + delta[:G * H].astype(hist.dtype)
    ok = ((captured == total_mass) & onehot_ok & ones_ok
          & (total_e <= entries_cap))
    return out, ok


def measure_marker_hits(hist, *, G: int, n_heavy: int, lbase: int,
                        lmod: int):
    """(n_hit_rows, n_csr_entries) device scalars for cap sizing: how
    many marker rows a warmup histogram hit and how many CSR entries
    their expansion touches."""
    from .grange import HIST_H
    H = HIST_H
    mrows = jax.lax.dynamic_slice_in_dim(
        hist, G * H, n_heavy * H).reshape(n_heavy, H)
    hit = mrows.sum(axis=1) > 0

    def mix(hi, lo, salt):
        sh, sl = u64.const(int(salt))
        return u64.mm_hash64((hi ^ sh, lo ^ sl))

    rr = jnp.arange(n_heavy, dtype=jnp.uint32)
    _, llo = mix(jnp.zeros_like(rr), rr, SALT_L)
    L = (jnp.uint32(lbase) + llo % jnp.uint32(lmod)).astype(jnp.int32)
    return (jnp.sum(hit.astype(jnp.int32)),
            jnp.sum(jnp.where(hit, L, 0)))


def expand_markers_device_batched(hist_s, *, G: int, n_heavy: int,
                                  runs_cap: int, entries_cap: int,
                                  lbase: int, lmod: int):
    """[S, g_eff*H] rows -> ([S, G*H] expanded, ok scalar) — the cohort
    form of expand_markers_device (caps are per-sample maxima)."""
    def one(row):
        return expand_markers_device(
            row, G=G, n_heavy=n_heavy, runs_cap=runs_cap,
            entries_cap=entries_cap, lbase=lbase, lmod=lmod)
    exp, ok = jax.vmap(one)(hist_s)
    return exp, jnp.all(ok)
