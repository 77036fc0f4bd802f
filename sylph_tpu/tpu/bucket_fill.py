"""Scatter-free bucket-grid fill: butterfly routing of a sorted sample.

`bucket_join._sample_to_buckets` lays a hash-sorted sample slice out as a
dense [B, CS] bucket grid with an XLA scatter — ~8 ns/element on this
hardware, which made the grid fill (3 arrays x P slots x n_chunks) the
dominant cost of the database-scale grange join (measured ~18 ms/chunk at
GTDB scale, docs/BENCHMARKS.md).

This module replaces the scatter with a Pallas butterfly route. The input
slice is sorted, so bucket ids are nondecreasing and the map
``source position -> bucket*CS + rank`` is monotone. Monotone routes are
congestion-free on a butterfly network in two passes:

  compact (LSB-first, leftward):  position -> kept-rank
  expand  (MSB-first, rightward): kept-rank -> bucket*CS + rank

since kept-rank <= target (dropping over-capacity entries only shrinks
targets) and both passes have nondecreasing displacements. Each grid step
routes one output window of TBK buckets x CS slots; its input window (two
block-quantized fetches via scalar-prefetch index maps) covers the slice
range of those buckets. All ops are lane/sublane rolls + selects on
[rows, 256] tiles in "flat order" (position = row*256 + lane) — no
scatters, no gathers.

Entries whose input window does not cover them (pathological occupancy)
are silently dropped — callers MUST verify the grange conservation scalars
(w_in == sum(dw), as `grange._chunk_codes` already does) and fall back to
the lossless path on mismatch, exactly like compaction overflow.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENT = np.uint32(0xFFFFFFFF)
_LANES = 256
# Fixed input-fetch block: 8 sublanes x 256 lanes (the Mosaic minimum for
# 32-bit tiles), and a power of two so the 2-block routing tile (W2=4096)
# is fully covered by the MSB-first butterfly (sum of pow2 steps = W2-1).
_IN_W = 8 * _LANES


def _iota(shape, axis):
    return jax.lax.broadcasted_iota(jnp.int32, shape, axis)


def _flat_pos(shape):
    return _iota(shape, 0) * shape[1] + _iota(shape, 1)


def _flat_roll_r(x, m):
    """y[p] = x[p - m] in flat (row*LANES + lane) order, wrapping."""
    rb, L = x.shape
    s, q = m % L, m // L
    t = pltpu.roll(x, s, axis=1) if s else x
    a = pltpu.roll(t, q % rb, axis=0) if q % rb else t
    if s == 0:
        return a
    b = pltpu.roll(t, (q + 1) % rb, axis=0)
    return jnp.where(_iota(x.shape, 1) >= s, a, b)


def _flat_roll_l(x, m):
    """y[p] = x[p + m] in flat order, wrapping."""
    rb, L = x.shape
    s, q = m % L, m // L
    t = pltpu.roll(x, (-s) % L, axis=1) if s else x
    a = pltpu.roll(t, (-q) % rb, axis=0) if q % rb else t
    if s == 0:
        return a
    b = pltpu.roll(t, (-(q + 1)) % rb, axis=0)
    return jnp.where(_iota(x.shape, 1) < L - s, a, b)


def _flat_prefix_sum(x):
    """Inclusive prefix sum of an i32 tile in flat order."""
    rb, L = x.shape
    lane = _iota(x.shape, 1)
    p = 1
    while p < L:
        x = x + jnp.where(lane >= p, pltpu.roll(x, p, axis=1), 0)
        p *= 2
    if rb == 1:
        return x
    row = _iota(x.shape, 0)
    tot = jnp.sum(jnp.where(lane == L - 1, x, 0), axis=1, keepdims=True)
    rp = tot
    p = 1
    while p < rb:
        rp = rp + jnp.where(row[:, :1] >= p, pltpu.roll(rp, p, axis=0), 0)
        p *= 2
    return x + (rp - tot)        # + exclusive row prefix, broadcast


def _flat_cummax(x):
    """Inclusive running max of an i32 tile in flat order."""
    rb, L = x.shape
    lane = _iota(x.shape, 1)
    NEG = jnp.int32(-(1 << 30))
    p = 1
    while p < L:
        sh = pltpu.roll(x, p, axis=1)
        x = jnp.maximum(x, jnp.where(lane >= p, sh, NEG))
        p *= 2
    if rb == 1:
        return x
    row = _iota(x.shape, 0)
    rm = jnp.sum(jnp.where(lane == L - 1, x, 0), axis=1, keepdims=True)
    p = 1
    while p < rb:
        sh = pltpu.roll(rm, p, axis=0)
        rm = jnp.maximum(rm, jnp.where(row[:, :1] >= p, sh, NEG))
        p *= 2
    excl = jnp.where(row[:, :1] >= 1, pltpu.roll(rm, 1, axis=0), NEG)
    return jnp.maximum(x, excl)


def _route_left(vals, keep):
    """Compact kept entries to ranks (LSB-first butterfly, flat order)."""
    shape = keep.shape
    W2 = shape[0] * shape[1]
    pos = _flat_pos(shape)
    rank = _flat_prefix_sum(keep.astype(jnp.int32))
    drem = jnp.where(keep, pos - (rank - 1), 0)
    act = keep
    b = 1
    while b < W2:
        move = act & ((drem & b) != 0)
        inc = (_flat_roll_l(move.astype(jnp.int32), b) != 0) & (
            pos < W2 - b)
        vals = tuple(jnp.where(inc, _flat_roll_l(v, b), v) for v in vals)
        drem = jnp.where(inc, _flat_roll_l(drem, b) - b, drem)
        act = (act & ~move) | inc
        b *= 2
    return vals, act


def _route_right(vals, act, tgt):
    """Spread rank-compacted entries to targets (MSB-first butterfly).

    Requires tgt >= current position for every active entry and tgt
    strictly increasing across active entries (monotone expansion — the
    time-reversal of a leftward compaction, hence congestion-free)."""
    shape = act.shape
    W2 = shape[0] * shape[1]
    pos = _flat_pos(shape)
    drem = jnp.where(act, tgt - pos, 0)
    b = 1 << (W2.bit_length() - 2) if W2 > 1 else 0
    while b >= 1:
        move = act & ((drem & b) != 0)
        inc = (_flat_roll_r(move.astype(jnp.int32), b) != 0) & (pos >= b)
        vals = tuple(jnp.where(inc, _flat_roll_r(v, b), v) for v in vals)
        drem = jnp.where(inc, _flat_roll_r(drem, b) - b, drem)
        act = (act & ~move) | inc
        b //= 2
    return vals, act


_WPB = 8          # windows per grid step (8-sublane output-block minimum)


def _repack1_flat_kernel(v_in, v_out, *, rows_in, rows_out, cap):
    """Compact _WPB flat [rows_in, 256] windows' live (non-sentinel)
    entries to their first ``cap`` slots in flat order (LSB-first
    butterfly — strides > 256 route via sublane rolls, ~5x cheaper than
    lane rolls). Windows are independent; the static loop keeps each
    window's temporaries at [rows_in, 256]."""
    for w in range(_WPB):
        v = v_in[w * rows_in:(w + 1) * rows_in, :]
        keep = v != SENT
        (v,), act = _route_left((v,), keep)
        pos = _flat_pos((rows_out, _LANES))
        a = act[:rows_out] & (pos < cap)
        v_out[w * rows_out:(w + 1) * rows_out, :] = jnp.where(
            a, v[:rows_out], SENT)


def _repack2_flat_kernel(h_in, l_in, h_out, l_out, *, rows_in, rows_out,
                         cap):
    """Two-payload _repack1_flat_kernel (hash hi/lo pair streams)."""
    for w in range(_WPB):
        h = h_in[w * rows_in:(w + 1) * rows_in, :]
        lo = l_in[w * rows_in:(w + 1) * rows_in, :]
        keep = h != SENT
        (h, lo), act = _route_left((h, lo), keep)
        pos = _flat_pos((rows_out, _LANES))
        a = act[:rows_out] & (pos < cap)
        h_out[w * rows_out:(w + 1) * rows_out, :] = jnp.where(
            a, h[:rows_out], SENT)
        l_out[w * rows_out:(w + 1) * rows_out, :] = jnp.where(
            a, lo[:rows_out], SENT)


@functools.partial(jax.jit, static_argnames=("row", "cap", "interpret"))
def repack2_flat(hi, lo, *, row: int, cap: int, interpret: bool = False):
    """Pair-stream repack1_flat: condense a sentinel-padded (hi, lo)
    stream by flat [row/256, 256] windows. Wide windows (up to 32k slots)
    reach a dense stop in ONE pass where the lane-roll repack_pallas
    (1024-lane rows) needed three."""
    if row % _LANES != 0 or cap % _LANES != 0 or cap > row:
        raise ValueError(f"row/cap must be multiples of {_LANES} with "
                         f"cap <= row (got row={row} cap={cap})")
    fh = hi.reshape(-1)
    fl = lo.reshape(-1)
    n = fh.shape[0]
    nwin = _WPB * (-(-n // (row * _WPB)))
    pad = nwin * row - n
    if pad:
        fh = jnp.pad(fh, (0, pad), constant_values=SENT)
        fl = jnp.pad(fl, (0, pad), constant_values=SENT)
    rows_in = row // _LANES
    rows_out = cap // _LANES
    mh = fh.reshape(nwin * rows_in, _LANES)
    ml = fl.reshape(nwin * rows_in, _LANES)
    kern = functools.partial(_repack2_flat_kernel, rows_in=rows_in,
                             rows_out=rows_out, cap=cap)
    spec_in = pl.BlockSpec((_WPB * rows_in, _LANES), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((_WPB * rows_out, _LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    oh, ol = pl.pallas_call(
        kern,
        grid=(nwin // _WPB,),
        in_specs=[spec_in, spec_in],
        out_specs=(spec_out, spec_out),
        out_shape=(jax.ShapeDtypeStruct((nwin * rows_out, _LANES),
                                        jnp.uint32),
                   jax.ShapeDtypeStruct((nwin * rows_out, _LANES),
                                        jnp.uint32)),
        interpret=interpret,
    )(mh, ml)
    return oh.reshape(-1), ol.reshape(-1)


@functools.partial(jax.jit, static_argnames=("row", "cap", "interpret"))
def repack1_flat(v, *, row: int, cap: int, interpret: bool = False):
    """Single-array stream compaction in flat order: condense each
    ``row``-slot window's live entries to ``cap`` slots (caller sizes cap
    above expected occupancy; overflow drops entries — callers verify
    conservation downstream). Unlike pallas_seeding.repack1_pallas (one
    VMEM row per window, lane rolls across the whole row), windows here
    are [row/256, 256] tiles routed with flat rolls, so wide windows
    (32k slots) compact in one cheap pass with ~128 KB temporaries."""
    if row % _LANES != 0 or cap % _LANES != 0 or cap > row:
        raise ValueError(f"row/cap must be multiples of {_LANES} with "
                         f"cap <= row (got row={row} cap={cap})")
    flat = v.reshape(-1)
    n = flat.shape[0]
    nwin = _WPB * (-(-n // (row * _WPB)))
    pad = nwin * row - n
    if pad:
        flat = jnp.pad(flat, (0, pad), constant_values=SENT)
    rows_in = row // _LANES
    rows_out = cap // _LANES
    m = flat.reshape(nwin * rows_in, _LANES)
    kern = functools.partial(_repack1_flat_kernel, rows_in=rows_in,
                             rows_out=rows_out, cap=cap)
    out = pl.pallas_call(
        kern,
        grid=(nwin // _WPB,),
        in_specs=[pl.BlockSpec((_WPB * rows_in, _LANES),
                               lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_WPB * rows_out, _LANES),
                               lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nwin * rows_out, _LANES),
                                       jnp.uint32),
        interpret=interpret,
    )(m)
    return out.reshape(-1)


def _fill_kernel(sblk_ref, base_ref, hi0, hi1, lo0, lo1, w0, w1,
                 hi_out, lo_out, w_out, *, width, TBK, CS, nt=1,
                 subwidth=0):
    r = pl.program_id(0)
    hi = jnp.concatenate([hi0[...], hi1[...]], axis=0)
    lo = jnp.concatenate([lo0[...], lo1[...]], axis=0)
    w = jnp.concatenate([w0[...], w1[...]], axis=0)
    base = base_ref[0].astype(jnp.uint32)

    # hash_hi < 2^32/c <= 2^31 for c >= 2, so u32 division stays exact;
    # hashes below base (or sentinels) wrap to huge buckets and drop.
    # nt > 1: cell = bucket*nt + hash sub-range (tiled grange layout).
    off = hi - base
    bucket = off // jnp.uint32(width)
    if nt > 1:
        # min in i32 (Mosaic cannot legalize vector minui); sub < nt tiny
        sub = jnp.minimum(((off - bucket * jnp.uint32(width))
                           // jnp.uint32(subwidth)).astype(jnp.int32),
                          nt - 1)
        bucket = bucket * jnp.uint32(nt) + sub.astype(jnp.uint32)
    lo_b = jnp.uint32(r * TBK)
    in_win = (bucket >= lo_b) & (bucket < lo_b + jnp.uint32(TBK))
    local_b = jnp.where(in_win, (bucket - lo_b).astype(jnp.int32), TBK)
    live = in_win & (w > 0)

    # rank among live entries within each raw-bucket run (zero-weight
    # folded duplicates interleave and must not consume capacity)
    bkt_i = bucket.astype(jnp.int32)    # run ids; garbage ok outside win
    prev = _flat_roll_r(bkt_i, 1)
    pos = _flat_pos(hi.shape)
    new_run = (bkt_i != prev) | (pos == 0)
    clx = _flat_prefix_sum(live.astype(jnp.int32)) - live.astype(jnp.int32)
    start = _flat_cummax(jnp.where(new_run, clx, -1))
    rank = clx - start

    keep = live & (rank < CS)
    tgt = local_b * CS + rank
    (hi, lo, w, tgt), act = _route_left((hi, lo, w, tgt), keep)
    (hi, lo, w), act = _route_right((hi, lo, w), act, tgt)

    rows_out = hi_out.shape[0]
    acto = act[:rows_out]
    hi_out[...] = jnp.where(acto, hi[:rows_out], SENT)
    lo_out[...] = jnp.where(acto, lo[:rows_out], SENT)
    w_out[...] = jnp.where(acto, w[:rows_out], 0)


def fill_geometry(B: int, CS: int, cover: int = 0):
    """(TBK, W_out) if the butterfly fill supports this grid, else None.

    W_out = TBK*CS <= 2*_IN_W slots per grid step — the output tile spans
    the WHOLE two-block routing window (padded and sliced by the caller,
    so CS needs no lane/sublane alignment of its own). A full-width
    output halves the windows per fill versus a one-block output: the
    routing tile's work is fixed, so output slots per window is the
    whole cost lever.

    ``cover`` is the mean per-bucket OCCURRENCE count of the input slice
    (slice entries per window bucket INCLUDING zero-weight slots — folded
    duplicates occupy slice positions without consuming CS capacity).
    The window's input fetch is block-quantized, so only _IN_W+1 entries
    past the window's first entry are guaranteed covered; TBK therefore
    also satisfies TBK*cover <= 3/4*_IN_W (the 4/3 headroom plus the
    downstream conservation check absorb occupancy fluctuations).
    cover=0 skips the constraint (pre-folded unique tables, where the
    CS slack already keeps windows far under the fetch span)."""
    if CS < 1 or CS > 2 * _IN_W:
        return None
    tbk = 1
    while (tbk * 2 * CS <= 2 * _IN_W and tbk * 2 <= B
           and B % (tbk * 2) == 0
           and (cover <= 0 or tbk * 2 * cover <= (3 * _IN_W) // 4)):
        tbk *= 2
    if tbk > B or B % tbk != 0:
        return None
    if cover > 0 and tbk * cover > _IN_W:
        return None                 # even TBK=1 windows can't be covered
    return tbk, tbk * CS


def _lower_bound_hi(shi, q):
    """Vectorized first-position-with-hi >= q (device binary search; the
    queries are one per window, so the log(P) gathers are negligible)."""
    n = int(shi.shape[0])
    pos = jnp.zeros(q.shape, jnp.int32)
    for t in reversed(range(max(1, (n + 1).bit_length()))):
        mid = pos + (1 << t)
        ok = mid <= n
        g = jnp.minimum(mid - 1, n - 1)
        v = jnp.take(shi, g)
        pos = jnp.where(ok & (v < q), mid, pos)
    return pos


@functools.partial(jax.jit, static_argnames=(
    "width", "B", "CS", "interpret", "nt", "subwidth", "cover"))
def bucket_fill_pallas(shi, slo, sw, base, *, width: int, B: int, CS: int,
                       interpret: bool = False, nt: int = 1,
                       subwidth: int = 0, cover: int = 0):
    """[B*nt, CS] dense cell grid of a HASH-SORTED sample slice.

    Drop-in replacement for `bucket_join._sample_to_buckets` (same
    semantics: zero-weight and over-capacity entries dropped, bucket =
    (hash_hi - base) // width, SENT padding) built on butterfly routing
    instead of an XLA scatter. ``base`` is traced (per-chunk); ``width``,
    ``B``, ``CS`` are static. ``nt`` > 1 routes to hash-tiled cells
    (bucket*nt + sub-range of ``subwidth`` hash_hi units). Callers must
    check `fill_geometry(B*nt, CS)` first and must verify conservation
    downstream (entries outside a window's two fetched input blocks are
    dropped)."""
    NC = B * max(nt, 1)
    geom = fill_geometry(NC, CS, cover)
    assert geom is not None, "call fill_geometry first"
    TBK, W_out = geom
    R = NC // TBK
    P = int(shi.shape[0])
    rows = _IN_W // _LANES          # 8 — fixed block height

    # pad the slice to whole _IN_W input blocks + one sentinel block so
    # the second fetch of the last window always exists
    nblk = -(-P // _IN_W) + 1
    pad = nblk * _IN_W - P
    shi2 = jnp.pad(shi, (0, pad), constant_values=SENT)
    slo2 = jnp.pad(slo, (0, pad), constant_values=SENT)
    sw2 = jnp.pad(sw, (0, pad))
    shi2 = shi2.reshape(nblk * rows, _LANES)
    slo2 = slo2.reshape(nblk * rows, _LANES)
    sw2 = sw2.reshape(nblk * rows, _LANES)

    # first slice position of each window's bucket range -> input block
    c0 = np.arange(R, dtype=np.int64) * TBK
    if nt > 1:
        bh = base + jnp.asarray(
            (c0 // nt) * width + (c0 % nt) * subwidth, jnp.uint32)
    else:
        bh = base + jnp.asarray(c0 * width, jnp.uint32)
    sblk = jnp.minimum(_lower_bound_hi(shi, bh) // _IN_W,
                       jnp.int32(nblk - 2))
    base_arr = jnp.reshape(base.astype(jnp.int32), (1,))

    spec_in = pl.BlockSpec((rows, _LANES),
                           lambda r, sblk, b: (sblk[r], 0),
                           memory_space=pltpu.VMEM)
    spec_in2 = pl.BlockSpec((rows, _LANES),
                            lambda r, sblk, b: (sblk[r] + 1, 0),
                            memory_space=pltpu.VMEM)
    # output tile spans the whole two-block routing window (16x256)
    spec_out = pl.BlockSpec((2 * rows, _LANES), lambda r, sblk, b: (r, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(R,),
        in_specs=[spec_in, spec_in2, spec_in, spec_in2, spec_in, spec_in2],
        out_specs=(spec_out, spec_out, spec_out))
    kern = functools.partial(_fill_kernel, width=width, TBK=TBK, CS=CS,
                             nt=nt, subwidth=subwidth)
    oh, ol, ow = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((R * 2 * rows, _LANES), jnp.uint32),
            jax.ShapeDtypeStruct((R * 2 * rows, _LANES), jnp.uint32),
            jax.ShapeDtypeStruct((R * 2 * rows, _LANES), jnp.int32)),
        interpret=interpret,
    )(sblk, base_arr, shi2, shi2, slo2, slo2, sw2, sw2)
    # each grid step fills a full 16x256 tile; only the first W_out slots
    # are real targets — slice them out, then lay out as [NC, CS]
    oh = oh.reshape(R, 2 * _IN_W)[:, :W_out].reshape(NC, CS)
    ol = ol.reshape(R, 2 * _IN_W)[:, :W_out].reshape(NC, CS)
    ow = ow.reshape(R, 2 * _IN_W)[:, :W_out].reshape(NC, CS)
    return oh, ol, ow
