"""Bucketed compare-join: per-k-mer sample counts without re-sorting the index.

merge_join_counts sorts (index ∪ sample) per sample — at GTDB scale the
index side (hundreds of millions of k-mers) dominates that sort even though
it never changes. This module splits the work by hash range instead:

  offline (host, once per database):
    hashes are uniform in [0, U64MAX/c), so bucket = hash_hi // width gives
    Poisson-balanced buckets; the index is laid out dense [B, CI] with CI =
    the exact max bucket occupancy (no loss), padded with sentinels, plus
    the original position of every slot.

  per sample (device):
    the sample table arrives hash-sorted, so bucket ids are nondecreasing —
    rank-in-bucket comes from a cummax over run starts (no sort, no gather)
    and one scatter places it dense [B, CS] (CS = mean + 6 sigma, overflow
    ~1e-9). A Pallas kernel then compares every index slot against its
    bucket's CS sample slots and accumulates weights: pure VPU broadcast
    compares, no gathers, O(M * CS) work independent of the index sort.

Counts return in index order via the host-side position map.
"""

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENT = np.uint32(0xFFFFFFFF)


class BucketedIndex(NamedTuple):
    hi: np.ndarray        # [B, CI] uint32, sentinel-padded
    lo: np.ndarray        # [B, CI] uint32
    pos: np.ndarray       # [B, CI] int64 original index position (-1 pad)
    width: int            # hash_hi bucket width
    n_buckets: int
    m: int                # original index length


def build_bucketed_index(hi: np.ndarray, lo: np.ndarray, c: int,
                         target_mean: float = 64.0) -> BucketedIndex:
    """Host-side dense bucketing of a flattened index (see HostIndex)."""
    m = int(hi.size)
    thr_hi = int((((1 << 64) - 1) // max(c, 1)) >> 32)
    b_want = max(1, int(m / target_mean))
    B = 1 << max(0, int(np.ceil(np.log2(b_want))))
    width = thr_hi // B + 1
    b = np.minimum(hi.astype(np.int64) // width, B - 1)
    counts = np.bincount(b, minlength=B)
    ci = max(8, int(counts.max()))
    CI = -(-ci // 128) * 128 if ci > 8 else 8
    out_hi = np.full((B, CI), SENT, np.uint32)
    out_lo = np.full((B, CI), SENT, np.uint32)
    out_pos = np.full((B, CI), -1, np.int64)
    order = np.argsort(b, kind="stable")
    bs = b[order]
    ranks = np.arange(m) - np.concatenate(
        [[0], np.cumsum(counts)])[bs]
    out_hi[bs, ranks] = hi[order]
    out_lo[bs, ranks] = lo[order]
    out_pos[bs, ranks] = order
    return BucketedIndex(out_hi, out_lo, out_pos, width, B, m)


def _cell_ids(shi, *, width: int, B: int, base, nt: int = 1,
              subwidth: int = 0):
    """(cell, n_cells, in_range) — elementwise hash -> routing cell.

    nt == 1: cell = bucket = (hash_hi - base) // width. nt > 1 (tiled
    grange layout): cell = bucket*nt + hash sub-range within the bucket.
    hash_hi < 2^32/c <= 2^31 for c >= 2, so u32 division stays exact."""
    off = shi - jnp.asarray(base, jnp.uint32)
    raw = off // jnp.uint32(width)
    in_range = raw < jnp.uint32(B)
    if nt <= 1:
        return raw, B, in_range
    within = off - raw * jnp.uint32(width)
    sub = jnp.minimum(within // jnp.uint32(subwidth), jnp.uint32(nt - 1))
    return raw * jnp.uint32(nt) + sub, B * nt, in_range


def _sample_to_buckets(shi, slo, sw, *, width: int, B: int, CS: int,
                       base: int = 0, nt: int = 1, subwidth: int = 0):
    """Dense [B(+1), CS] layout of a HASH-SORTED sample table (jnp).

    Zero-weight rows (padding) route to the overflow bucket B. Rank within
    bucket via run-start cummax — the input is sorted so bucket ids are
    nondecreasing. ``base`` shifts the bucket origin for range-chunked
    indexes (grange join): bucket = (hash_hi - base) // width; values below
    base wrap to huge u32 and land in the overflow bucket. ``nt`` > 1
    routes to hash-tiled cells (bucket*nt + sub-range) — B then means
    B*nt output rows.
    """
    t = shi.shape[0]
    # Hashes past the index's range (a sample sketched with smaller c) can
    # match nothing — route them to the overflow bucket with the padding.
    raw, NC, in_range = _cell_ids(shi, width=width, B=B, base=base,
                                  nt=nt, subwidth=subwidth)
    B = NC
    live = in_range & (sw > 0)
    b = jnp.where(live, raw.astype(jnp.int32), B)
    idx = jnp.arange(t, dtype=jnp.int32)
    # rank = live entries before i in the same RAW bucket run (zero-weight
    # slots may interleave with live ones — e.g. duplicates folded into a
    # first-occurrence weight — and must not consume capacity or split a
    # run; ``raw`` is nondecreasing because the input is hash-sorted)
    new_run = jnp.concatenate([jnp.ones(1, bool), raw[1:] != raw[:-1]])
    cl = jnp.cumsum(live.astype(jnp.int32)) - live.astype(jnp.int32)
    start_cl = jax.lax.cummax(jnp.where(new_run, cl, -1))
    rank = cl - start_cl
    tgt = jnp.where(rank < CS, b * CS + rank, B * CS)
    flat = (B + 1) * CS
    dh = jnp.full((flat + 1,), SENT, jnp.uint32).at[tgt].set(shi,
                                                             mode="drop")
    dl = jnp.full((flat + 1,), SENT, jnp.uint32).at[tgt].set(slo,
                                                             mode="drop")
    dw = jnp.zeros((flat + 1,), jnp.int32).at[tgt].set(sw, mode="drop")
    return (dh[:B * CS].reshape(B, CS), dl[:B * CS].reshape(B, CS),
            dw[:B * CS].reshape(B, CS))


# roll-free compare loop: static lane-column extracts instead of rotating
# the lane tile. DEFAULT ON since the v5e battery (2026-08-19): the three
# per-iteration rolls were ~half the compare kernel's cost (grange join
# 486 -> 296 ms at GTDB scale). Bounded at 96 lanes — beyond that the
# unrolled program grows without bound and the rolled fori_loop returns.
_JOIN_UNROLL = os.environ.get("SYLPH_JOIN_UNROLL", "1") == "1"
_UNROLL_MAX = 96


def _counts_vs_lanes(a_hi, a_lo, dh, dl, dw):
    """All-pairs weighted equality counts: index columns [TB, W] vs CS
    sample lanes [TB, CS]. Compares one lane column at a time — unrolled
    static lane extracts by default (no rolls, no carried mutation); the
    rolled fori_loop remains for wide lane tiles (a fully unrolled loop
    with ROLLED carries made Mosaic stack-allocate every intermediate,
    which is why the carries stay in the fori variant)."""
    CS = dh.shape[1]
    if _JOIN_UNROLL and CS <= _UNROLL_MAX:
        counts = jnp.zeros(a_hi.shape, jnp.int32)
        for j in range(CS):
            eq = (a_hi == dh[:, j:j + 1]) & (a_lo == dl[:, j:j + 1])
            counts = counts + jnp.where(eq, dw[:, j:j + 1], 0)
        return counts

    def body(_, carry):
        dh, dl, dw, counts = carry
        eq = (a_hi == dh[:, 0:1]) & (a_lo == dl[:, 0:1])
        counts = counts + jnp.where(eq, dw[:, 0:1], 0)
        r = CS - 1          # left-rotate by 1 (roll wants non-negative)
        return (pltpu.roll(dh, r, axis=1), pltpu.roll(dl, r, axis=1),
                pltpu.roll(dw, r, axis=1), counts)

    _, _, _, counts = jax.lax.fori_loop(
        0, CS, body, (dh, dl, dw, jnp.zeros(a_hi.shape, jnp.int32)))
    return counts


def _block_counts(ihi, ilo, shi, slo, sw, *, NT=1, TILE=0):
    """Per-slot sample multiplicities for one [TB, CI] index block.

    NT == 1: every slot vs every lane (the sample block is [TB, CS]).
    NT > 1 (hash-tiled layout): index columns [t*TILE, (t+1)*TILE) only
    see lanes [t*CS_T, (t+1)*CS_T) of the [TB, NT*CS_T] sample block (a
    sample hash can only match index slots of its own sub-range); the
    trailing overflow columns see every lane. Compare work drops from
    CI*(NT*CS_T) to CI*CS_T + OV*NT*CS_T.

    One rotation loop serves both: the whole lane block rotates left once
    per step, so lane j sits at column 0 on step j — tile t's compares
    run during steps [t*CS_T, (t+1)*CS_T) (a static phase per tile, no
    narrow-group rolls, which waste full vregs), the overflow compares
    on every step."""
    A_hi = ihi[...]
    A_lo = ilo[...]
    SH = shi[...]
    SL = slo[...]
    SW = sw[...]
    if NT <= 1:
        return _counts_vs_lanes(A_hi, A_lo, SH, SL, SW)
    CS_T = SH.shape[1] // NT
    LW = SH.shape[1]
    CI = A_hi.shape[1]
    has_ov = CI > NT * TILE
    o_hi = A_hi[:, NT * TILE:] if has_ov else None
    o_lo = A_lo[:, NT * TILE:] if has_ov else None
    parts = []
    cov = (jnp.zeros((A_hi.shape[0], CI - NT * TILE), jnp.int32)
           if has_ov else None)
    if _JOIN_UNROLL and LW <= 2 * _UNROLL_MAX:
        for t in range(NT):
            a_hi = A_hi[:, t * TILE:(t + 1) * TILE]
            a_lo = A_lo[:, t * TILE:(t + 1) * TILE]
            ct = jnp.zeros(a_hi.shape, jnp.int32)
            for j in range(t * CS_T, (t + 1) * CS_T):
                h0 = SH[:, j:j + 1]
                l0 = SL[:, j:j + 1]
                w0 = SW[:, j:j + 1]
                ct = ct + jnp.where((a_hi == h0) & (a_lo == l0), w0, 0)
                if has_ov:
                    cov = cov + jnp.where((o_hi == h0) & (o_lo == l0),
                                          w0, 0)
            parts.append(ct)
        if has_ov:
            parts.append(cov)
        return jnp.concatenate(parts, axis=1)
    dh, dl, dw = SH, SL, SW
    for t in range(NT):
        a_hi = A_hi[:, t * TILE:(t + 1) * TILE]
        a_lo = A_lo[:, t * TILE:(t + 1) * TILE]

        def body(_, carry, a_hi=a_hi, a_lo=a_lo):
            dh, dl, dw, ct, cov = carry
            h0, l0, w0 = dh[:, 0:1], dl[:, 0:1], dw[:, 0:1]
            ct = ct + jnp.where((a_hi == h0) & (a_lo == l0), w0, 0)
            if cov is not None:
                cov = cov + jnp.where((o_hi == h0) & (o_lo == l0), w0, 0)
            r = LW - 1
            return (pltpu.roll(dh, r, axis=1), pltpu.roll(dl, r, axis=1),
                    pltpu.roll(dw, r, axis=1), ct, cov)

        dh, dl, dw, ct, cov = jax.lax.fori_loop(
            0, CS_T, body,
            (dh, dl, dw, jnp.zeros(a_hi.shape, jnp.int32), cov))
        parts.append(ct)
    if has_ov:
        parts.append(cov)
    return jnp.concatenate(parts, axis=1)


def _join_kernel(ihi, ilo, shi, slo, sw, out, *, CS, NT=1, TILE=0):
    out[...] = _block_counts(ihi, ilo, shi, slo, sw, NT=NT, TILE=TILE)


def _join_codes_kernel(ihi, ilo, gid, shi, slo, sw, out, *, CS, G, H,
                       batched=False, NT=1, TILE=0):
    """_join_kernel fused with code emission: instead of materializing the
    [B, CI] count grid to HBM and re-reading it (plus the gid grid) to form
    gid*H+mult codes, emit the sentinel-coded u32 stream directly — one
    output write replaces a write + two reads of full grids per chunk.
    ``batched`` adds the sample tag s*(G*H) from the second grid axis
    (the _grid_from_buckets_batched layout)."""
    counts = _block_counts(ihi, ilo, shi, slo, sw, NT=NT, TILE=TILE)
    g = gid[...]
    live = (counts > 0) & (g < G)
    codes = (g.astype(jnp.uint32) * np.uint32(H)
             + jnp.minimum(counts, H - 1).astype(jnp.uint32))
    if batched:
        codes = codes + (pl.program_id(1).astype(jnp.uint32)
                         * np.uint32(G * H))
    out[...] = jnp.where(live, codes, jnp.uint32(0xFFFFFFFF))


def _route_up1(v, keep, rows):
    """Per-COLUMN butterfly compaction along the sublane axis: kept
    entries of each lane column move to the top rows (rank order).
    Sublane rolls measure ~5x cheaper than lane rolls on v5e
    (scripts/kbench.py), which is why the in-kernel code compaction
    routes along rows, not lanes."""
    R = v.shape[0]
    k = keep.astype(jnp.int32)
    # inclusive prefix sum down each column
    x = k
    p = 1
    while p < R:
        x = x + jnp.where(rows >= p, pltpu.roll(x, p, axis=0), 0)
        p *= 2
    rank = x - k                       # exclusive: target row
    drem = jnp.where(keep, rows - rank, 0)
    act = keep
    b = 1
    while b < R:
        move = act & ((drem & b) != 0)
        up = pltpu.roll(move.astype(jnp.int32), (-b) % R, axis=0)
        inc = (up != 0) & (rows < R - b)
        v = jnp.where(inc, pltpu.roll(v, (-b) % R, axis=0), v)
        drem = jnp.where(inc, pltpu.roll(drem, (-b) % R, axis=0) - b,
                         drem)
        act = (act & ~move) | inc
        b *= 2
    return v, act


def _join_codes_compact_kernel(ihi, ilo, gid, shi, slo, sw, out, nlive, *,
                               CS, G, H, CAPR, batched=False, NT=1,
                               TILE=0):
    """_join_codes_kernel + in-kernel column compaction: emit only the
    top CAPR rows of each lane column (codes are ~0.5% dense at database
    scale, so writing the full [TB, CI] block to HBM and re-reading it
    for the first repack pass dominated the code-stage cost). ``nlive``
    (per block) carries the pre-compaction live count for the
    caller's conservation check — a column overflowing CAPR is detected
    as n_live != n_comp, never silent."""
    counts = _block_counts(ihi, ilo, shi, slo, sw, NT=NT, TILE=TILE)
    g = gid[...]
    live = (counts > 0) & (g < G)
    # per-block live count in a (8, 128) VMEM tile (scalar SMEM outputs
    # fail the Mosaic block-divisibility check): count at [0, 0], zeros
    # elsewhere; the caller sums the whole array
    nz = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) + \
        jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    nlive[...] = jnp.where(nz == 0, jnp.sum(live.astype(jnp.int32)), 0)
    codes = (g.astype(jnp.uint32) * np.uint32(H)
             + jnp.minimum(counts, H - 1).astype(jnp.uint32))
    if batched:
        codes = codes + (pl.program_id(1).astype(jnp.uint32)
                         * np.uint32(G * H))
    codes = jnp.where(live, codes, jnp.uint32(0xFFFFFFFF))
    rows = jax.lax.broadcasted_iota(jnp.int32, codes.shape, 0)
    # over-CAPR ranks route below the emitted window and are dropped —
    # the nlive/n_comp conservation check catches it
    codes, act = _route_up1(codes, live, rows)
    out[...] = jnp.where(act[:CAPR], codes[:CAPR],
                         jnp.uint32(0xFFFFFFFF))


def _join_xla(ihi, ilo, shi, slo, sw):
    """XLA fallback of the compare kernel (CPU tests / non-TPU)."""
    CS = shi.shape[1]

    def body(j, counts):
        eq = (ihi == jax.lax.dynamic_slice_in_dim(shi, j, 1, 1)) & \
             (ilo == jax.lax.dynamic_slice_in_dim(slo, j, 1, 1))
        w = jax.lax.dynamic_slice_in_dim(sw, j, 1, 1)
        return counts + jnp.where(eq, w, 0)

    return jax.lax.fori_loop(0, CS, body,
                             jnp.zeros(ihi.shape, jnp.int32))


def _join_xla_tiled(ihi, ilo, dh, dl, dw, *, nt: int, tile: int):
    """XLA fallback of _block_counts for the hash-tiled layout: the cell
    grids arrive as [B, nt*CS_T]; tile t's index columns join only cell
    lane-group t, the trailing overflow columns join every lane."""
    B, CI = ihi.shape
    CS_T = dh.shape[1] // nt
    dh3, dl3, dw3 = dh, dl, dw
    parts = []
    for t in range(nt):
        s0 = t * CS_T
        parts.append(_join_xla(
            ihi[:, t * tile:(t + 1) * tile],
            ilo[:, t * tile:(t + 1) * tile],
            dh3[:, s0:s0 + CS_T], dl3[:, s0:s0 + CS_T],
            dw3[:, s0:s0 + CS_T]))
    if CI > nt * tile:
        parts.append(_join_xla(ihi[:, nt * tile:], ilo[:, nt * tile:],
                               dh3, dl3, dw3))
    return jnp.concatenate(parts, axis=1)


@functools.partial(jax.jit, static_argnames=("width", "B", "CS", "base",
                                             "interpret", "force_xla"))
def bucket_join_device(ihi, ilo, shi, slo, sw, *, width: int, B: int,
                       CS: int, base: int = 0, interpret: bool = False,
                       force_xla: bool = False):
    """[B, CI] per-slot sample multiplicities for a bucketed index."""
    dh, dl, dw = _sample_to_buckets(shi, slo, sw, width=width, B=B, CS=CS,
                                    base=base)
    CI = ihi.shape[1]
    if force_xla or (jax.default_backend() == "cpu" and not interpret):
        return _join_xla(ihi, ilo, dh, dl, dw)
    TB = max(1, min(64, B))
    if B % TB != 0:
        TB = 1
    kern = functools.partial(_join_kernel, CS=CS)
    spec_i = pl.BlockSpec((TB, CI), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_s = pl.BlockSpec((TB, CS), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(B // TB,),
        in_specs=[spec_i, spec_i, spec_s, spec_s, spec_s],
        out_specs=pl.BlockSpec((TB, CI), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, CI), jnp.int32),
        interpret=interpret,
    )(ihi, ilo, dh, dl, dw)


def build_gid_grid(bidx: BucketedIndex, gids: np.ndarray,
                   n_genomes: int) -> np.ndarray:
    """[B, CI] genome id per index slot (padding slots get n_genomes)."""
    grid = np.full(bidx.hi.shape, n_genomes, np.int32)
    live = bidx.pos >= 0
    grid[live] = gids[bidx.pos[live]]
    return grid


@functools.partial(jax.jit, static_argnames=(
    "width", "B", "CS", "n_genomes", "n_buckets", "interpret",
    "force_xla"))
def bucket_join_hist(ihi, ilo, gid_grid, shi, slo, sw, *, width: int,
                     B: int, CS: int, n_genomes: int, n_buckets: int,
                     interpret: bool = False, force_xla: bool = False):
    """Per-genome multiplicity histograms [G, H] via the bucketed join.

    Replaces merge_join_hist when the index is pre-bucketed: no per-sample
    sort of the index, one dense compare kernel + one bincount.
    """
    from .containment import _bincount
    grid = bucket_join_device(ihi, ilo, shi, slo, sw, width=width, B=B,
                              CS=CS, interpret=interpret,
                              force_xla=force_xla)
    G, H = n_genomes, n_buckets
    bucket = jnp.minimum(grid, H - 1)
    seg = jnp.where(gid_grid < G, gid_grid * H + bucket, G * H)
    flat = _bincount(seg.reshape(-1), G * H + 1)
    return flat[:G * H].reshape(G, H)


def sample_cs(t_real: int, B: int, granularity: int = 128) -> int:
    """Sample-side bucket capacity: mean + 6 sigma, rounded up to
    ``granularity`` (compare-kernel work is linear in CS, so the grange
    join uses granularity 8; the whole-range join keeps 128-lane tiles)."""
    mean = max(1.0, t_real / B)
    cs = int(np.ceil(mean + 6.0 * np.sqrt(mean) + 8))
    return -(-cs // granularity) * granularity if cs > 8 else 8


def cell_cs(t_real: int, n_cells: int) -> int:
    """Per-CELL sample lane capacity for the hash-tiled layout. Cells
    are ~nt-fold finer than buckets, so the +8 constant in sample_cs
    would dominate the small means; 4-granular with a +3 pad keeps
    overflow probability per run astronomically small while the compare
    work (linear in CS) stays near the mean."""
    mean = max(0.25, t_real / n_cells)
    cs = int(np.ceil(mean + 6.0 * np.sqrt(mean) + 3))
    return max(4, -(-cs // 4) * 4)


def bucket_join_counts(bidx: BucketedIndex, shi, slo, sw, t_real: int,
                       interpret: bool = False,
                       force_xla: bool = False) -> np.ndarray:
    """Exact per-k-mer sample counts [M] in original index order."""
    CS = sample_cs(t_real, bidx.n_buckets)
    grid = bucket_join_device(
        jnp.asarray(bidx.hi), jnp.asarray(bidx.lo), jnp.asarray(shi),
        jnp.asarray(slo), jnp.asarray(sw), width=bidx.width,
        B=bidx.n_buckets, CS=CS, interpret=interpret, force_xla=force_xla)
    grid = np.asarray(grid)
    out = np.zeros(bidx.m, np.int32)
    live = bidx.pos >= 0
    out[bidx.pos[live]] = grid[live]
    return out
