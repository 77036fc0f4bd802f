"""Pallas TPU kernel: fused FracMinHash seeding.

The XLA seeding path (seeding.py) materializes the log-doubling m-mer
pyramid in HBM (~10 round trips over the batch). This kernel fuses the
whole chain — 2-bit window composition, forward/revcomp canonicalization,
the bugged Wang hash on uint32 pairs, and the FracMinHash threshold — in
VMEM: one HBM read of the base codes, one write of (hash_hi, hash_lo,
keep). It is the TPU analog of the reference's AVX2 lane kernel
(sylph src/avx2_seeding.rs), with the same (k-1)-overlap trick at tile
seams that the AVX2 code uses between lanes (src/avx2_seeding.rs:37-41) —
but with no trailing-window drop.

Layout: the caller supplies reads as rows of a [N, L] 2-bit code matrix;
the kernel tiles rows in blocks of `BLOCK_ROWS` and computes all L-k+1
windows per row. Neighbor access along the window axis uses pltpu.roll
(lane rotation); positions past L-k are masked by the caller's length mask,
and the roll wrap-around garbage lands only there.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu



BLOCK_ROWS = 256


def _roll_l(x, m):
    """x[..., j] <- x[..., j+m] (left shift along lanes, wraps)."""
    return pltpu.roll(x, -m % x.shape[-1], axis=1)


import os

# Measured on v5e (2026-08-20 A/B, scripts/gbench.py prefix): deriving
# rc16 = revpairs(~fwd16) — mathematically sound and roll-free — made the
# seed stage 336 ms vs 195 ms for the rolled chain: Mosaic lowers the
# 4-level masked-shift butterfly worse than lane rolls at this width.
# The rolled chain stays the default; SYLPH_RC_REV=1 selects revpairs.
_RC_VIA_ROLLS = os.environ.get("SYLPH_RC_REV", "0") != "1"


def _revpairs(x):
    """Reverse the 16 2-bit groups of each u32 (lane-LOCAL butterfly —
    4 swap levels, no cross-lane traffic)."""
    m16 = np.uint32(0x0000FFFF)
    m8 = np.uint32(0x00FF00FF)
    m4 = np.uint32(0x0F0F0F0F)
    m2 = np.uint32(0x33333333)
    x = ((x & m16) << np.uint32(16)) | ((x >> np.uint32(16)) & m16)
    x = ((x & m8) << np.uint32(8)) | ((x >> np.uint32(8)) & m8)
    x = ((x & m4) << np.uint32(4)) | ((x >> np.uint32(4)) & m4)
    x = ((x & m2) << np.uint32(2)) | ((x >> np.uint32(2)) & m2)
    return x


def _mers16_tile(bases):
    """(fwd16, rc16) for every lane position of a [R, L] tile.

    fwd16[., j] = sum_{i<16} b[j+i] << 2(15-i);
    rc16[., j]  = sum_{i<16} (3-b[j+i]) << 2i.
    The forward chain takes 4 doubling levels = 4 lane-rolls (rolls are
    the expensive op on the VPU); a roll-free revcomp chain exists:
    rc16 = revpairs(~fwd16) — complementing flips each base (3-b) and the
    2-bit-group reversal turns MSB-first into LSB-first order. Measured
    on v5e the rolled rc chain is FASTER (Mosaic lowers the butterfly
    worse than lane rolls), so the rolled chain is the DEFAULT and
    SYLPH_RC_REV=1 selects the revpairs variant for A/B. Every shorter
    m-mer derives roll-free from these: fwd_m = fwd16 >> 2(16-m) keeps
    the top m bases, rc_m = rc16 & (4^m-1) keeps the low m bases.
    Positions within 15 of the row end wrap (masked by the caller).
    """
    f = bases
    if _RC_VIA_ROLLS:
        r = np.uint32(3) - bases
        for p in (1, 2, 4, 8):
            fs = _roll_l(f, p)
            rs = _roll_l(r, p)
            f = (f << np.uint32(2 * p)) | fs
            r = r | (rs << np.uint32(2 * p))
        return f, r
    for p in (1, 2, 4, 8):
        f = (f << np.uint32(2 * p)) | _roll_l(f, p)
    return f, _revpairs(~f)


def _build_mers_tile(bases, want):
    """u32 m-mer dict {m: (fwd_m, rc_m)} for m <= 16, via _mers16_tile."""
    f16, r16 = _mers16_tile(bases)
    out = {}
    for m in sorted(set(want)):
        if m == 16:
            out[m] = (f16, r16)
        else:
            out[m] = (f16 >> np.uint32(2 * (16 - m)),
                      r16 & np.uint32((1 << (2 * m)) - 1))
    return out


def _mm_hash64_tile(hi, lo):
    """Bugged Wang mix on uint32 pairs, tile-local (u64.mm_hash64 inlined
    with plain jnp ops — identical semantics, pallas-safe)."""
    def add(ahi, alo, bhi, blo):
        s = alo + blo
        return ahi + bhi + (s < alo).astype(jnp.uint32), s

    def shl(ahi, alo, s):
        if s == 0:
            return ahi, alo
        if s < 32:
            return ((ahi << np.uint32(s)) | (alo >> np.uint32(32 - s)),
                    alo << np.uint32(s))
        if s == 32:
            return alo, jnp.zeros_like(alo)
        return alo << np.uint32(s - 32), jnp.zeros_like(alo)

    def shr(ahi, alo, s):
        if s < 32:
            return (ahi >> np.uint32(s),
                    (alo >> np.uint32(s)) | (ahi << np.uint32(32 - s)))
        if s == 32:
            return jnp.zeros_like(ahi), ahi
        return jnp.zeros_like(ahi), ahi >> np.uint32(s - 32)

    thi, tlo = shl(hi, lo, 21)
    hi, lo = add(hi, lo, thi, tlo)
    hi, lo = ~hi, ~lo                                   # ~(k + (k<<21))
    thi, tlo = shr(hi, lo, 24)
    hi, lo = hi ^ thi, lo ^ tlo
    ahi, alo = shl(hi, lo, 3)
    bhi, blo = shl(hi, lo, 8)
    hi, lo = add(hi, lo, ahi, alo)
    hi, lo = add(hi, lo, bhi, blo)                      # * 265
    thi, tlo = shr(hi, lo, 14)
    hi, lo = hi ^ thi, lo ^ tlo
    ahi, alo = shl(hi, lo, 2)
    bhi, blo = shl(hi, lo, 4)
    hi, lo = add(hi, lo, ahi, alo)
    hi, lo = add(hi, lo, bhi, blo)                      # * 21
    thi, tlo = shr(hi, lo, 28)
    hi, lo = hi ^ thi, lo ^ tlo
    thi, tlo = shl(hi, lo, 31)
    hi, lo = add(hi, lo, thi, tlo)
    return hi, lo


def _seed_kernel(bases_ref, hi_ref, lo_ref, keep_ref, *, k, thr_hi, thr_lo):
    bases = bases_ref[...]
    if k <= 16:
        mers = _build_mers_tile(bases, [k])
        f, r = mers[k]
        fhi = jnp.zeros_like(f)
        flo = f
        rhi = jnp.zeros_like(f)
        rlo = r
    else:
        hi_len = k - 16
        mers = _build_mers_tile(bases, [16, hi_len])
        f16, r16 = mers[16]
        fh, rh = mers[hi_len]
        fhi = fh
        flo = _roll_l(f16, hi_len)
        rhi = _roll_l(rh, 16)
        rlo = r16
    is_fwd = (fhi < rhi) | ((fhi == rhi) & (flo < rlo))
    chi = jnp.where(is_fwd, fhi, rhi)
    clo = jnp.where(is_fwd, flo, rlo)
    hhi, hlo = _mm_hash64_tile(chi, clo)
    keep = (hhi < thr_hi) | ((hhi == thr_hi) & (hlo < thr_lo))
    hi_ref[...] = hhi
    lo_ref[...] = hlo
    keep_ref[...] = keep


CAP_LANES = 128  # compacted output width (lane-aligned)


def _seed_compact_kernel(bases_ref, len_ref, hi_ref, lo_ref, *,
                         k, thr_hi, thr_lo, cap):
    """Fused seeding + per-read compaction.

    After computing (hash_hi, hash_lo, keep) exactly like _seed_kernel, the
    survivors of each read row are extracted left-to-right by `cap` rounds
    of leftmost-survivor selection (min-reduce over lanes + one-hot pick) —
    ~6 VPU passes per round, all in VMEM. Unused output slots hold u64::MAX
    sentinels. Capacity overflow (> cap survivors in one read, ~4x the
    FracMinHash expectation) drops the rightmost extras, like compact_rows.

    Packed (wire-format) inputs are unpacked by the caller in XLA — one
    cheap HBM pass — before entering this kernel.
    """
    bases = bases_ref[...]
    R, L = bases.shape
    if k <= 16:
        mers = _build_mers_tile(bases, [k])
        f, r = mers[k]
        fhi = jnp.zeros_like(f)
        flo = f
        rhi = jnp.zeros_like(f)
        rlo = r
    else:
        hi_len = k - 16
        mers = _build_mers_tile(bases, [16, hi_len])
        f16, r16 = mers[16]
        fh, rh = mers[hi_len]
        fhi = fh
        flo = _roll_l(f16, hi_len)
        rhi = _roll_l(rh, 16)
        rlo = r16
    is_fwd = (fhi < rhi) | ((fhi == rhi) & (flo < rlo))
    chi = jnp.where(is_fwd, fhi, rhi)
    clo = jnp.where(is_fwd, flo, rlo)
    hhi, hlo = _mm_hash64_tile(chi, clo)
    keep = (hhi < thr_hi) | ((hhi == thr_hi) & (hlo < thr_lo))
    lanes = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    keep &= lanes + k <= len_ref[...]          # window inside the read

    big = jnp.int32(L + 1)
    sent = jnp.uint32(0xFFFFFFFF)
    neg = jnp.int32(-(2**31))
    # Mosaic has no unsigned reductions: select through an int32 view (the
    # one-hot picks exactly one lane, so signedness never reorders anything)
    hhi_i = hhi.astype(jnp.int32)
    hlo_i = hlo.astype(jnp.int32)
    hi_ref[...] = jnp.full((R, CAP_LANES), sent, jnp.uint32)
    lo_ref[...] = jnp.full((R, CAP_LANES), sent, jnp.uint32)
    remaining = keep
    for j in range(cap):
        cand = jnp.where(remaining, lanes, big)
        m = jnp.min(cand, axis=1, keepdims=True)          # leftmost survivor
        onehot = (cand == m) & remaining
        vh = jnp.max(jnp.where(onehot, hhi_i, neg), axis=1)
        vl = jnp.max(jnp.where(onehot, hlo_i, neg), axis=1)
        has = m[:, 0] < big
        hi_ref[:, j] = jnp.where(has, vh.astype(jnp.uint32), sent)
        lo_ref[:, j] = jnp.where(has, vl.astype(jnp.uint32), sent)
        remaining = remaining & ~onehot


def _prefix_sum_lanes(x):
    """Inclusive prefix sum along lanes via log2(L) shift-adds."""
    L = x.shape[-1]
    p = 1
    while p < L:
        sh = pltpu.roll(x, p, axis=1)          # sh[l] = x[l - p] (wraps)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        x = x + jnp.where(lane >= p, sh, 0)
        p *= 2
    return x


def _butterfly_route(vhi, vlo, keep, lanes):
    """Stable in-tile stream compaction via butterfly routing.

    Survivor at lane l must move LEFT by d = l - (rank(l)-1), which is
    non-decreasing in l — a monotone route, so bit-by-bit displacement
    (LSB first) is congestion-free (classic butterfly-network result).
    Each bit step is 4 lane-rolls + selects; no reductions, no sort.
    Returns (vhi, vlo, act) with survivors packed to the left of each row.
    """
    L = vhi.shape[-1]
    rank = _prefix_sum_lanes(keep.astype(jnp.int32))
    drem = jnp.where(keep, lanes - (rank - 1), 0)
    act = keep
    b = 1
    while b < L:
        move = act & ((drem & b) != 0)
        # Mosaic can't rotate i1 vectors: roll an i32 view of the mask
        inc = (_roll_l(move.astype(jnp.int32), b) != 0) & (lanes < L - b)
        vhi = jnp.where(inc, _roll_l(vhi, b), vhi)
        vlo = jnp.where(inc, _roll_l(vlo, b), vlo)
        drem = jnp.where(inc, _roll_l(drem, b) - b, drem)
        act = (act & ~move) | inc
        b *= 2
    return vhi, vlo, act


def _butterfly_pack_kernel(bases_ref, len_ref, hi_ref, lo_ref, *,
                           k, thr_hi, thr_lo):
    """Fused seeding + per-read butterfly compaction."""
    bases = bases_ref[...]
    if bases.dtype != jnp.uint32:
        # u8 wire format: 4x less HBM input traffic and no separate
        # upcast pass; the VPU widens on load
        bases = bases.astype(jnp.uint32)
    R, L = bases.shape
    hi_len = k - 16
    f16, r16 = _mers16_tile(bases)
    fh = f16 >> np.uint32(2 * (16 - hi_len))
    rh = r16 & np.uint32((1 << (2 * hi_len)) - 1)
    fhi = fh
    flo = _roll_l(f16, hi_len)
    rhi = _roll_l(rh, 16)
    rlo = r16
    is_fwd = (fhi < rhi) | ((fhi == rhi) & (flo < rlo))
    chi = jnp.where(is_fwd, fhi, rhi)
    clo = jnp.where(is_fwd, flo, rlo)
    vhi, vlo = _mm_hash64_tile(chi, clo)
    keep = (vhi < thr_hi) | ((vhi == thr_hi) & (vlo < thr_lo))
    lanes = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    keep &= lanes + k <= len_ref[...]

    vhi, vlo, act = _butterfly_route(vhi, vlo, keep, lanes)
    sent = jnp.uint32(0xFFFFFFFF)
    hi_ref[...] = jnp.where(act[:, :CAP_LANES], vhi[:, :CAP_LANES], sent)
    lo_ref[...] = jnp.where(act[:, :CAP_LANES], vlo[:, :CAP_LANES], sent)


def _repack_kernel(hi_in, lo_in, hi_ref, lo_ref, *, cap):
    """Condense a sentinel-padded hash stream: rows of the input tile are
    butterfly-packed and the first `cap` lanes written out."""
    vhi = hi_in[...]
    vlo = lo_in[...]
    R, L = vhi.shape
    keep = vhi != jnp.uint32(0xFFFFFFFF)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    vhi, vlo, act = _butterfly_route(vhi, vlo, keep, lanes)
    sent = jnp.uint32(0xFFFFFFFF)
    hi_ref[...] = jnp.where(act[:, :cap], vhi[:, :cap], sent)
    lo_ref[...] = jnp.where(act[:, :cap], vlo[:, :cap], sent)


def _butterfly_route1(v, keep, lanes):
    """Single-channel _butterfly_route (one payload vector, 3 rolls/step
    instead of 4 — the grange code streams have no lo word)."""
    L = v.shape[-1]
    rank = _prefix_sum_lanes(keep.astype(jnp.int32))
    drem = jnp.where(keep, lanes - (rank - 1), 0)
    act = keep
    b = 1
    while b < L:
        move = act & ((drem & b) != 0)
        inc = (_roll_l(move.astype(jnp.int32), b) != 0) & (lanes < L - b)
        v = jnp.where(inc, _roll_l(v, b), v)
        drem = jnp.where(inc, _roll_l(drem, b) - b, drem)
        act = (act & ~move) | inc
        b *= 2
    return v, act


def _repack1_kernel(v_in, v_ref, *, cap):
    """Single-channel _repack_kernel (sentinel-coded u32 stream)."""
    v = v_in[...]
    R, L = v.shape
    keep = v != jnp.uint32(0xFFFFFFFF)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    v, act = _butterfly_route1(v, keep, lanes)
    v_ref[...] = jnp.where(act[:, :cap], v[:, :cap],
                           jnp.uint32(0xFFFFFFFF))


@functools.partial(jax.jit, static_argnames=("row", "cap", "interpret"))
def repack1_pallas(v, *, row: int, cap: int, interpret: bool = False):
    """Single-array repack_pallas: condense one sentinel-padded u32
    stream by row/cap (half the HBM traffic of the pair variant; used by
    the grange code-compaction chain where the payload is one word)."""
    if cap % 128 != 0 or row % 128 != 0 or cap > row:
        raise ValueError(f"row/cap must be 128-multiples with cap <= row "
                         f"(got row={row} cap={cap})")
    flat = v.reshape(-1)
    n = flat.shape[0]
    rows = -(-n // row)
    pad = rows * row - n
    if pad:
        flat = jnp.pad(flat, (0, pad), constant_values=np.uint32(0xFFFFFFFF))
    m = flat.reshape(rows, row)
    # keep the block under ~2 MB/array: wide rows (the adaptive first
    # compaction pass) shrink the row-block so routing temporaries fit VMEM
    tr = min(min(256, max(8, (1 << 19) // row)), rows)
    if rows % tr != 0:
        extra = (-(-rows // tr) * tr) - rows
        m = jnp.pad(m, ((0, extra), (0, 0)),
                    constant_values=np.uint32(0xFFFFFFFF))
        rows += extra
    kern = functools.partial(_repack1_kernel, cap=cap)
    return pl.pallas_call(
        kern,
        grid=(rows // tr,),
        in_specs=[pl.BlockSpec((tr, row), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tr, cap), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, cap), jnp.uint32),
        interpret=interpret,
    )(m)


@functools.partial(jax.jit, static_argnames=("row", "cap", "interpret"))
def repack_pallas(hi, lo, *, row: int, cap: int, interpret: bool = False):
    """Condense a flat sentinel-padded (hi, lo) stream by row/cap.

    Reshapes to rows of `row` lanes, packs each row's live entries left,
    keeps `cap` lanes — callers size cap well above the expected row
    occupancy (overflow drops entries, so chain conservatively). Survivor
    ORDER within a row is preserved; sentinel hi values (0xFFFFFFFF) mark
    dead lanes, so real hashes must stay below (c >= 2).
    """
    if cap % 128 != 0 or row % 128 != 0 or cap > row:
        raise ValueError(f"row/cap must be 128-multiples with cap <= row "
                         f"(got row={row} cap={cap})")
    flat_hi = hi.reshape(-1)
    flat_lo = lo.reshape(-1)
    n = flat_hi.shape[0]
    rows = -(-n // row)
    pad = rows * row - n
    if pad:
        flat_hi = jnp.pad(flat_hi, (0, pad),
                          constant_values=np.uint32(0xFFFFFFFF))
        flat_lo = jnp.pad(flat_lo, (0, pad),
                          constant_values=np.uint32(0xFFFFFFFF))
    mhi = flat_hi.reshape(rows, row)
    mlo = flat_lo.reshape(rows, row)
    tr = min(256, rows)
    if rows % tr != 0:
        # pad rows so the grid tiles evenly
        extra = (-(-rows // tr) * tr) - rows
        mhi = jnp.pad(mhi, ((0, extra), (0, 0)),
                      constant_values=np.uint32(0xFFFFFFFF))
        mlo = jnp.pad(mlo, ((0, extra), (0, 0)),
                      constant_values=np.uint32(0xFFFFFFFF))
        rows += extra
    kern = functools.partial(_repack_kernel, cap=cap)
    spec_in = pl.BlockSpec((tr, row), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((tr, cap), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_hi, out_lo = pl.pallas_call(
        kern,
        grid=(rows // tr,),
        in_specs=[spec_in, spec_in],
        out_specs=(spec_out, spec_out),
        out_shape=(jax.ShapeDtypeStruct((rows, cap), jnp.uint32),
                   jax.ShapeDtypeStruct((rows, cap), jnp.uint32)),
        interpret=interpret,
    )(mhi, mlo)
    return out_hi, out_lo


def _roll_u(x, m):
    """x[j, .] <- x[j+m, .] (upward shift along rows/sublanes, wraps)."""
    return pltpu.roll(x, -m % x.shape[0], axis=0)


def _mers16_tile_t(bases):
    """Transposed _mers16_tile: [W, R] tiles, window axis along ROWS.

    Row(sublane)-axis rolls measure ~5x cheaper than 256-lane rolls on
    v5e (scripts/kbench.py), which is why this layout exists. The
    revcomp chain defaults to rolled exactly as in _mers16_tile
    (SYLPH_RC_REV=1 selects the roll-free revpairs variant)."""
    f = bases
    if _RC_VIA_ROLLS:
        r = np.uint32(3) - bases
        for p in (1, 2, 4, 8):
            fs = _roll_u(f, p)
            rs = _roll_u(r, p)
            f = (f << np.uint32(2 * p)) | fs
            r = r | (rs << np.uint32(2 * p))
        return f, r
    for p in (1, 2, 4, 8):
        f = (f << np.uint32(2 * p)) | _roll_u(f, p)
    return f, _revpairs(~f)


def _prefix_sum_rows(x):
    """Inclusive prefix sum along rows via log2(W) sublane shift-adds."""
    W = x.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    p = 1
    while p < W:
        sh = pltpu.roll(x, p, axis=0)          # sh[j] = x[j - p] (wraps)
        x = x + jnp.where(rows >= p, sh, 0)
        p *= 2
    return x


def _butterfly_route_t(vhi, vlo, keep, rows):
    """_butterfly_route along the ROW axis: survivors pack to the TOP of
    each column. Same monotone-displacement argument, sublane rolls."""
    W = vhi.shape[0]
    rank = _prefix_sum_rows(keep.astype(jnp.int32))
    drem = jnp.where(keep, rows - (rank - 1), 0)
    act = keep
    b = 1
    while b < W:
        move = act & ((drem & b) != 0)
        inc = (_roll_u(move.astype(jnp.int32), b) != 0) & (rows < W - b)
        vhi = jnp.where(inc, _roll_u(vhi, b), vhi)
        vlo = jnp.where(inc, _roll_u(vlo, b), vlo)
        drem = jnp.where(inc, _roll_u(drem, b) - b, drem)
        act = (act & ~move) | inc
        b *= 2
    return vhi, vlo, act


def _butterfly_pack_t_kernel(bases_ref, len_ref, hi_ref, lo_ref, *,
                             k, thr_hi, thr_lo, cap_rows):
    """Transposed fused seeding + butterfly compaction.

    bases_ref: [W, R] — read r is COLUMN r, window j is row j. Every
    neighbor access and the whole compaction network run along the row
    (sublane) axis, avoiding the expensive multi-vreg lane rotates of
    _butterfly_pack_kernel. Output: survivor hash pairs packed to the
    top cap_rows of each column (sentinel-padded)."""
    bases = bases_ref[...]
    W, R = bases.shape
    hi_len = k - 16
    f16, r16 = _mers16_tile_t(bases)
    fh = f16 >> np.uint32(2 * (16 - hi_len))
    rh = r16 & np.uint32((1 << (2 * hi_len)) - 1)
    fhi = fh
    flo = _roll_u(f16, hi_len)
    rhi = _roll_u(rh, 16)
    rlo = r16
    is_fwd = (fhi < rhi) | ((fhi == rhi) & (flo < rlo))
    chi = jnp.where(is_fwd, fhi, rhi)
    clo = jnp.where(is_fwd, flo, rlo)
    vhi, vlo = _mm_hash64_tile(chi, clo)
    keep = (vhi < thr_hi) | ((vhi == thr_hi) & (vlo < thr_lo))
    rows = jax.lax.broadcasted_iota(jnp.int32, (W, R), 0)
    keep &= rows + k <= len_ref[...]           # window inside the read

    vhi, vlo, act = _butterfly_route_t(vhi, vlo, keep, rows)
    sent = jnp.uint32(0xFFFFFFFF)
    hi_ref[...] = jnp.where(act[:cap_rows, :], vhi[:cap_rows, :], sent)
    lo_ref[...] = jnp.where(act[:cap_rows, :], vlo[:cap_rows, :], sent)


@functools.partial(jax.jit, static_argnames=("c", "k", "lanes", "interpret"))
def seed_pack_pallas_t(bases_t, lengths, *, c: int, k: int,
                       lanes: int = 512, interpret: bool = False):
    """Transposed fused seed + compact: [L, N] codes (read-per-COLUMN) ->
    (hi, lo) [cap_rows, N] survivors per column, window order, sentinel
    padded.

    The transposed layout turns all ~50 per-tile rolls of the lane-major
    kernel into sublane rolls (~5x cheaper on v5e, scripts/kbench.py).
    Requires 16 < k <= 31, L % 8 == 0, N % lanes == 0 (or N < lanes),
    c >= 2. Per-read capacity is ceil((4L/c + 8)/8)*8 rows; overflow
    drops the bottom-most extras like seed_pack_pallas.
    """
    L, N = bases_t.shape
    if L % 8 != 0:
        raise ValueError(f"L must be a multiple of 8, got {L}")
    if not 16 < k <= 31:
        raise ValueError(f"butterfly kernel needs 16 < k <= 31, got {k}")
    tl = min(lanes, N)
    if N % tl != 0:
        raise ValueError(f"N ({N}) must be a multiple of {tl}")
    cap_rows = min(L, -(-(4 * L // c + 8) // 8) * 8)
    thr = ((1 << 64) - 1) // c
    kern = functools.partial(_butterfly_pack_t_kernel, k=k,
                             thr_hi=np.uint32(thr >> 32),
                             thr_lo=np.uint32(thr & 0xFFFFFFFF),
                             cap_rows=cap_rows)
    grid = (N // tl,)
    in_spec = pl.BlockSpec((L, tl), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((1, tl), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((cap_rows, tl), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[in_spec, len_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((cap_rows, N), jnp.uint32),
                   jax.ShapeDtypeStruct((cap_rows, N), jnp.uint32)),
        interpret=interpret,
    )(bases_t, lengths.reshape(1, N).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("c", "k", "interpret"))
def seed_pack_pallas(bases, lengths, *, c: int, k: int,
                     interpret: bool = False):
    """Fused seed + butterfly compaction: [N, L] codes -> (hi, lo)
    [N, CAP_LANES] survivors in position order (sentinel padded).

    Per-ROW capacity is CAP_LANES over L windows; survivors beyond it are
    dropped (callers need 4L/c + 8 <= CAP_LANES). Requires 16 < k <= 31,
    L % 128 == 0, c >= 2 (sentinel disjointness).
    """
    N, L = bases.shape
    if L % 128 != 0:
        raise ValueError(f"L must be a multiple of 128, got {L}")
    if not 16 < k <= 31:
        raise ValueError(f"butterfly kernel needs 16 < k <= 31, got {k}")
    rows = min(BLOCK_ROWS, N)
    if N % rows != 0:
        raise ValueError(f"N ({N}) must be a multiple of {rows}")
    thr = ((1 << 64) - 1) // c
    kern = functools.partial(_butterfly_pack_kernel, k=k,
                             thr_hi=np.uint32(thr >> 32),
                             thr_lo=np.uint32(thr & 0xFFFFFFFF))
    grid = (N // rows,)
    in_spec = pl.BlockSpec((rows, L), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((rows, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((rows, CAP_LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[in_spec, len_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((N, CAP_LANES), jnp.uint32),
                   jax.ShapeDtypeStruct((N, CAP_LANES), jnp.uint32)),
        interpret=interpret,
    )(bases, lengths.reshape(N, 1).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("c", "k", "interpret"))
def seed_compact_pallas(bases, lengths, *, c: int, k: int,
                        interpret: bool = False):
    """Fused Pallas sketch step: [N, L] 2-bit codes -> compacted (hi, lo)
    [N, CAP_LANES] survivor hashes (sentinel-padded, position order).
    Requires L % 128 == 0 and per-read capacity 4L/c+8 <= 128.
    """
    N, L = bases.shape
    if L % 128 != 0:
        raise ValueError(f"L must be a multiple of 128, got {L}")
    cap = min(CAP_LANES, 4 * L // c + 8)
    rows = min(BLOCK_ROWS, N)
    if N % rows != 0:
        raise ValueError(f"N ({N}) must be a multiple of {rows}")
    thr = ((1 << 64) - 1) // c
    kern = functools.partial(_seed_compact_kernel, k=k,
                             thr_hi=np.uint32(thr >> 32),
                             thr_lo=np.uint32(thr & 0xFFFFFFFF), cap=cap)
    grid = (N // rows,)
    in_spec = pl.BlockSpec((rows, L), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((rows, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((rows, CAP_LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    hi, lo = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[in_spec, len_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((N, CAP_LANES), jnp.uint32),
                   jax.ShapeDtypeStruct((N, CAP_LANES), jnp.uint32)),
        interpret=interpret,
    )(bases, lengths.reshape(N, 1).astype(jnp.int32))
    return hi, lo


@functools.partial(jax.jit, static_argnames=("c", "k", "interpret"))
def seed_hashes_pallas(bases, lengths, *, c: int, k: int,
                       interpret: bool = False):
    """Drop-in replacement for seeding.seed_hashes via one fused kernel.

    bases: [N, L] uint32 2-bit codes, L a multiple of 128.
    Returns (hash_hi, hash_lo, keep), each [N, L] — note the window axis is
    NOT trimmed to L-k+1 (lane layout stays 128-aligned); windows beyond
    L-k are masked in `keep` exactly like pad windows.
    """
    N, L = bases.shape
    if L % 128 != 0:
        raise ValueError(f"L must be a multiple of 128, got {L}")
    rows = BLOCK_ROWS if N >= BLOCK_ROWS else N
    if N % rows != 0:
        raise ValueError(f"N ({N}) must be a multiple of {rows}")
    thr = ((1 << 64) - 1) // c
    kern = functools.partial(_seed_kernel, k=k,
                             thr_hi=np.uint32(thr >> 32),
                             thr_lo=np.uint32(thr & 0xFFFFFFFF))
    grid = (N // rows,)
    spec = pl.BlockSpec((rows, L), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    hhi, hlo, keep = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[spec],
        out_specs=(spec, spec,
                   pl.BlockSpec((rows, L), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((N, L), jnp.uint32),
                   jax.ShapeDtypeStruct((N, L), jnp.uint32),
                   jax.ShapeDtypeStruct((N, L), jnp.bool_)),
        interpret=interpret,
    )(bases)
    pos = jax.lax.broadcasted_iota(jnp.int32, (N, L), 1)
    keep &= pos + k <= lengths[:, None]
    return hhi, hlo, keep
