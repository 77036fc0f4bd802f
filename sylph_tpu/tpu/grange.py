"""Global-range bucketed join: database-scale containment on one chip.

The whole-range bucketed join (bucket_join.py) scatters the ENTIRE sample
table into every index chunk's buckets, so compare work is
M_index x CS_whole-sample — fine at tens of millions of index k-mers, ruinous
at GTDB scale (10^8-10^9). This module removes that factor:

  build (host, once per database):
    all index k-mers are sorted by hash GLOBALLY, then cut into chunks of
    CHUNK consecutive slots — a chunk covers a narrow hash range, so a
    sample k-mer can match in exactly one chunk (boundary duplicates are
    handled by overlapping the per-chunk sample slices). Within a chunk,
    hashes are uniform over the chunk's span, so width-bucketing gives
    Poisson-balanced buckets: a dense [B, CI] layout with B = CHUNK/mean
    buckets. CI is uniform across chunks (one compiled program); rare
    over-occupied buckets spill to a host-side overflow list joined
    separately. A parallel [B, CI] genome-id grid supports on-device
    histogram reduction.

  per sample (device):
    the sorted sample is sliced per chunk on host (searchsorted on the
    chunk hash edges) — each chunk sees ~T/n_chunks sample k-mers, so the
    per-bucket sample capacity CS collapses to ~8-48 and compare work drops
    to M_index x CS_small. The compare kernel emits a per-slot count grid;
    nonzero slots (<= sample hits, a tiny fraction) are butterfly-compacted
    as gid*H+multiplicity codes and one small sort-bincount yields the
    per-genome coverage histograms [G, H] — which is all pass-1 statistics
    need. A device-side conservation check (live-slot count before vs after
    compaction) guards the compaction capacity; on the astronomically rare
    overflow the chunk histogram is recomputed by the lossless full-grid
    path.

This replaces the reference's genome-kmer -> sample-hashmap probe loop
(sylph src/contain.rs:632-652) at its headline scale (85k-113k genome
databases, README.md:28) with work proportional to the index size times a
small constant, no per-sample re-sort of static data, and no gathers.
"""

import functools
import os
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .bucket_join import _sample_to_buckets
from .containment import _bincount

SENT = np.uint32(0xFFFFFFFF)
HIST_H = 64                      # multiplicity clamp for histograms
_EMPTY_I32 = np.empty(0, np.int32)
_EMPTY_PTR = np.zeros(1, np.int64)


def _ranges(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenate arange(s, s + l) for each (start, len) pair — the
    vectorized CSR-segment gather used by heavy-run handling."""
    lens = np.asarray(lens, np.int64)
    tot = int(lens.sum())
    if tot == 0:
        return np.empty(0, np.int64)
    nz = lens > 0
    sv = np.asarray(starts, np.int64)[nz]
    lv = lens[nz]
    firsts = np.cumsum(lv) - lv          # offsets of each segment in out
    step = np.ones(tot, np.int64)
    step[0] = sv[0]
    if sv.size > 1:
        step[firsts[1:]] = sv[1:] - (sv[:-1] + lv[:-1] - 1)
    return np.cumsum(step)

# butterfly bucket-grid fill (bucket_fill.py) instead of the XLA scatter
# in _sample_to_buckets — DEFAULT ON since the v5e battery (2026-08-19):
# at GTDB scale (22-chunk, 7.2e8-k-mer index, planted-match workload) the
# fill cut the join from 1081 to 843 ms (the XLA scatter's ~8 ns/element
# was the dominant join cost); conservation checks pass on every run.
# SYLPH_BUCKET_FILL=0 restores the scatter; "interpret" runs the fill
# kernel in interpret mode (CPU engine tests).
_USE_BUCKET_FILL = os.environ.get("SYLPH_BUCKET_FILL", "1") in (
    "1", "interpret")
_FILL_INTERPRET = os.environ.get("SYLPH_BUCKET_FILL", "0") == "interpret"


def _fill_or_scatter(shi, slo, sw, base, *, width, B, CS, use_fill,
                     nt=1, subwidth=0, cover=0):
    if use_fill:
        from .bucket_fill import bucket_fill_pallas
        return bucket_fill_pallas(shi, slo, sw, base, width=width, B=B,
                                  CS=CS, interpret=_FILL_INTERPRET,
                                  nt=nt, subwidth=subwidth, cover=cover)
    return _sample_to_buckets(shi, slo, sw, width=width, B=B, CS=CS,
                              base=base, nt=nt, subwidth=subwidth)


def _fill_supported(B: int, CS: int, cover: int = 0) -> bool:
    if not _USE_BUCKET_FILL:
        return False
    from .bucket_fill import fill_geometry
    return fill_geometry(B, CS, cover) is not None


class GRangeIndex(NamedTuple):
    """Host-side chunked layout; device residency is managed by the engine.

    ``nt`` > 1 selects the hash-tiled bucket layout: each bucket's CI
    columns split into nt TILEs of (CI - ov)/nt slots holding the
    bucket's t-th hash sub-range ([t*subwidth, (t+1)*subwidth) within the
    bucket, subwidth = ceil(width/nt)), plus a shared ``ov``-column
    overflow region for sub-ranges deeper than a tile. A sample k-mer's
    tile is hash-derived (elementwise), so the compare kernel only scans
    its own tile's sample lanes plus the overflow columns — ~2x less
    compare work with zero probabilistic routing (a hash run always lies
    in one sub-range).

    Heavy duplication runs (one hash shared by > heavy_run genomes —
    conserved k-mers across related genomes, the dominant occupancy skew
    in real databases) are extracted at build time: the grid keeps ONE
    representative slot with marker gid ``n_genomes + r`` and the run's
    real genome ids live in the ``heavy_gids``/``heavy_ptr`` CSR. The
    join then bins marker codes past the real-genome range and the
    engine expands them back host-side — grids stay near-Poisson no
    matter how skewed the genome collection is."""
    chunk_hi: List[np.ndarray]    # per chunk [B, CI] uint32
    chunk_lo: List[np.ndarray]
    chunk_gid: List[np.ndarray]   # per chunk [B, CI] int32 (pad: g_eff)
    bases: np.ndarray             # [n_chunks] uint32 hash_hi bucket origin
    edges_u64: np.ndarray         # [n_chunks, 2] first/last u64 hash in chunk
    width: int                    # uniform bucket width (hash_hi units)
    B: int                        # buckets per chunk
    CI: int                       # uniform index bucket capacity
    spill_kmers: np.ndarray       # [S] uint64 over-capacity slots
    spill_gids: np.ndarray        # [S] int32
    m: int                        # live index k-mers (incl. spill + heavy)
    n_genomes: int
    nt: int = 1                   # hash sub-range tiles per bucket
    ov: int = 0                   # shared overflow columns per bucket
    heavy_gids: np.ndarray = _EMPTY_I32   # CSR values: run genome ids
    heavy_ptr: np.ndarray = _EMPTY_PTR    # [n_heavy + 1] CSR offsets

    @property
    def tile(self) -> int:
        return (self.CI - self.ov) // max(self.nt, 1)

    @property
    def subwidth(self) -> int:
        return -(-self.width // max(self.nt, 1))

    @property
    def n_heavy(self) -> int:
        return int(self.heavy_ptr.size) - 1

    @property
    def g_eff(self) -> int:
        """Code-space genome count: real genomes + heavy-run markers."""
        return self.n_genomes + self.n_heavy


def build_grange_index(kmers_u64: np.ndarray, gids: np.ndarray,
                       n_genomes: int, chunk_slots: int = 1 << 25,
                       target_mean: Optional[int] = None,
                       ci_cap: Optional[int] = None,
                       presorted: bool = False,
                       nt: Optional[int] = None,
                       ov: int = 128,
                       heavy_run: Optional[int] = None) -> GRangeIndex:
    """Sort the flat (kmer, gid) index by hash and lay it out in range
    chunks. ``ci_cap`` bounds the bucket capacity (defaults to a generous
    Poisson tail); deeper buckets (heavy k-mer duplication across genomes)
    spill to the overflow list. ``presorted`` skips the (expensive) global
    sort when the caller's arrays are already hash-ascending. ``nt`` > 1
    selects the hash-tiled layout (see GRangeIndex): per-tile capacity is
    sized at the sub-range mean (the shared ``ov`` columns absorb the
    Poisson tail; anything deeper spills). Duplication runs longer than
    ``heavy_run`` (default SYLPH_HEAVY_RUN=16; 0 disables) are extracted
    to the heavy CSR and replaced by one marker slot — see GRangeIndex.

    ``target_mean``/``nt`` default to a measured auto-pick (v5e battery,
    docs/BENCHMARKS.md "Duplication-skew characterization"): mean-1024
    buckets join ~2x faster than mean-512 at database scale, and the
    hash-tiled layout (nt=4) only pays when the per-tile mean clears the
    128-slot tile floor with Poisson headroom — so nt=4 engages iff the
    REAL per-bucket mean (actual fill of a chunk, not the target) is
    >= 896 (tile 256 with slack), else the flat layout. SYLPH_NT
    overrides with an explicit value ("auto" keeps the measured rule)."""
    m_total = m = int(kmers_u64.size)
    if target_mean is None:
        target_mean = 1024
    if nt is None:
        env_nt = os.environ.get("SYLPH_NT", "auto")
        if env_nt != "auto":
            nt = int(env_nt)
    if presorted:
        su = kmers_u64
        sg = np.ascontiguousarray(gids, np.int32)
    else:
        from ..core.native_core import radix_sort_kv
        su = np.array(kmers_u64, np.uint64, copy=True)
        sg = np.array(gids, np.int32, copy=True)
        if not radix_sort_kv(su, sg):     # no native toolchain: numpy
            order = np.argsort(kmers_u64, kind="stable")
            su = kmers_u64[order]
            sg = gids[order].astype(np.int32)
            del order

    # heavy-run extraction: a hash shared by d >> 1 genomes occupies d
    # consecutive sorted slots — all in ONE bucket (and one tile), the
    # occupancy skew that would otherwise force deep ci_cap/ov or heavy
    # spill on real (strain-rich) databases. Pull runs longer than
    # heavy_run out into a CSR, leave one marker slot behind.
    heavy_gids, heavy_ptr = _EMPTY_I32, _EMPTY_PTR
    if heavy_run is None:
        heavy_run = int(os.environ.get("SYLPH_HEAVY_RUN", "16"))
    if heavy_run > 0 and m > 1:
        first = np.empty(m, bool)
        first[0] = True
        np.not_equal(su[1:], su[:-1], out=first[1:])
        rstarts = np.flatnonzero(first)
        rlens = np.diff(np.append(rstarts, m))
        hsel = rlens > heavy_run
        nh = int(np.count_nonzero(hsel))
        # code space is int32-segmented downstream: (g_eff)*HIST_H must
        # stay below 2^31 (and leave batched sample tags headroom), so
        # keep only the longest runs if a pathological index would
        # overflow it — the rest lay out in the grid as before
        nh_cap = max(0, (1 << 27) // HIST_H * 16 - n_genomes - 2)
        if nh > nh_cap:
            keep_runs = np.argpartition(rlens[hsel], nh - nh_cap
                                        )[nh - nh_cap:]
            sel_idx = np.flatnonzero(hsel)
            hsel = np.zeros_like(hsel)
            hsel[sel_idx[keep_runs]] = True
            nh = nh_cap
        if nh:
            hstarts = rstarts[hsel].astype(np.int64)
            hlens = rlens[hsel].astype(np.int64)
            hidx = _ranges(hstarts, hlens)
            heavy_gids = np.ascontiguousarray(sg[hidx], np.int32)
            heavy_ptr = np.zeros(nh + 1, np.int64)
            np.cumsum(hlens, out=heavy_ptr[1:])
            keep = np.ones(m, bool)
            keep[hidx] = False
            keep[hstarts] = True
            if presorted:            # never clobber the caller's arrays
                sg = sg.copy() if sg is gids or sg.base is not None \
                    else sg
            sg[hstarts] = n_genomes + np.arange(nh, dtype=np.int32)
            su = su[keep]
            sg = sg[keep]
            m = int(su.size)
        del first, rstarts, rlens, hsel
    g_eff = n_genomes + (int(heavy_ptr.size) - 1)

    n_chunks = max(1, -(-m // chunk_slots))
    B = 1 << max(0, int(np.ceil(np.log2(max(1, chunk_slots // target_mean)))))
    mean = chunk_slots / B
    if nt is None:
        # auto: tiled layout iff the fullest chunk's REAL per-bucket mean
        # (post heavy-extraction fill, not the target) clears the 128-slot
        # tile floor with Poisson headroom — tile 256 at mean >= ~900; the
        # shared overflow columns otherwise eat the win (measured, see
        # docs/BENCHMARKS.md duplication-skew table)
        nt = 4 if min(m, chunk_slots) / B >= 896 else 1

    # uniform width: cover the widest chunk span
    starts = [ci * chunk_slots for ci in range(n_chunks)]
    ends = [min(s + chunk_slots, m) for s in starts]
    spans = [int((su[e - 1] >> np.uint64(32)) - (su[s] >> np.uint64(32)))
             for s, e in zip(starts, ends)]
    width = max(1, max(spans) // B + 1)

    if ci_cap is None:
        # Poisson(mean) upper tail over B*n_chunks buckets, with slack for
        # moderate duplication; heavy duplicates spill.
        z = np.sqrt(2.0 * np.log(max(2.0, float(B * n_chunks)))) + 2.0
        ci_cap = int(mean + z * np.sqrt(mean) + 8)
        ci_cap = -(-ci_cap // 128) * 128

    if nt > 1:
        # per-tile capacity at the sub-range mean; the shared overflow
        # region takes the Poisson tail (compare work per sample entry
        # is TILE + ov instead of the whole bucket)
        tile = max(128, 128 * int(round(mean / nt / 128 + 0.25)))
        ov = max(128, -(-ov // 128) * 128)
        subwidth = -(-width // nt)
    chunk_hi, chunk_lo, chunk_gid = [], [], []
    bases = np.zeros(n_chunks, np.uint32)
    edges = np.zeros((n_chunks, 2), np.uint64)
    spill_k, spill_g = [], []
    ci_used = 8
    # nt > 1: CI is known up front (nt*tile + ov), so grids materialize
    # INSIDE the chunk loop and per-chunk temporaries free immediately —
    # at GTDB scale the two-phase layout retained ~20 GB of int64
    # (b, col) + u32 triplets across all 11-22 chunks, which on a
    # fault-throttled host costs minutes of first-touch time. nt == 1
    # still needs the deferred pass (CI = observed max occupancy).
    per_chunk = []                # nt == 1: (b, col, hi32, lo32, gid)
    for ci_i, (s, e) in enumerate(zip(starts, ends)):
        cu = su[s:e]
        cg = sg[s:e]
        base = np.uint32(cu[0] >> np.uint64(32))
        bases[ci_i] = base
        edges[ci_i] = (cu[0], cu[-1])
        hi32 = (cu >> np.uint64(32)).astype(np.uint32)
        lo32 = (cu & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        b = ((hi32.astype(np.int64) - int(base)) // width)
        # width covers the span, so b < B by construction
        if nt > 1:
            within = hi32.astype(np.int64) - int(base) - b * width
            sub = np.minimum(within // subwidth, nt - 1)
            cell = b * nt + sub
            cc = np.bincount(cell, minlength=B * nt)
            rank_c = np.arange(cu.size, dtype=np.int64) - np.concatenate(
                [[0], np.cumsum(cc)])[cell]
            in_tile = rank_c < tile
            # overflow entries rank within their BUCKET (stable: input is
            # hash-sorted, so bucket ids are nondecreasing)
            ovf = ~in_tile
            bo = b[ovf]
            cb = np.bincount(bo, minlength=B)
            rank_o = np.arange(bo.size, dtype=np.int64) - np.concatenate(
                [[0], np.cumsum(cb)])[bo]
            col = np.where(in_tile, sub * tile + rank_c, 0)
            col[ovf] = nt * tile + rank_o
            over = np.zeros(cu.size, bool)
            over[ovf] = rank_o >= ov
        else:
            counts = np.bincount(b, minlength=B)
            # stable rank within bucket
            col = np.arange(cu.size, dtype=np.int64) - np.concatenate(
                [[0], np.cumsum(counts)])[b]
            over = col >= ci_cap
        if over.any():
            spill_k.append(cu[over])
            spill_g.append(cg[over])
            keep = ~over
            b, col, hi32, lo32, cg = (b[keep], col[keep], hi32[keep],
                                      lo32[keep], cg[keep])
        if nt > 1:
            oh = np.full((B, nt * tile + ov), SENT, np.uint32)
            ol = np.full((B, nt * tile + ov), SENT, np.uint32)
            og = np.full((B, nt * tile + ov), g_eff, np.int32)
            oh[b, col] = hi32
            ol[b, col] = lo32
            og[b, col] = cg
            chunk_hi.append(oh)
            chunk_lo.append(ol)
            chunk_gid.append(og)
            del b, col, hi32, lo32, cg
        else:
            ci_used = max(ci_used,
                          int(col.max()) + 1 if col.size else 0)
            per_chunk.append((b, col, hi32, lo32, cg))

    CI = (nt * tile + ov) if nt > 1 else max(8, -(-ci_used // 8) * 8)
    for b, col, hi32, lo32, cg in per_chunk:
        oh = np.full((B, CI), SENT, np.uint32)
        ol = np.full((B, CI), SENT, np.uint32)
        og = np.full((B, CI), g_eff, np.int32)
        oh[b, col] = hi32
        ol[b, col] = lo32
        og[b, col] = cg
        chunk_hi.append(oh)
        chunk_lo.append(ol)
        chunk_gid.append(og)

    spill_k = (np.concatenate(spill_k) if spill_k
               else np.empty(0, np.uint64))
    spill_g = (np.concatenate(spill_g) if spill_g
               else np.empty(0, np.int32))
    if spill_g.size and heavy_gids.size:
        # a spilled MARKER slot leaves the grid entirely; expand it to
        # its run's real (kmer, gid) pairs so the host spill probe stays
        # exact (its heavy row then simply never matches)
        mk = spill_g >= n_genomes
        if mk.any():
            r = spill_g[mk].astype(np.int64) - n_genomes
            lens_r = heavy_ptr[r + 1] - heavy_ptr[r]
            hidx = _ranges(heavy_ptr[r], lens_r)
            spill_k = np.concatenate([spill_k[~mk],
                                      np.repeat(spill_k[mk], lens_r)])
            spill_g = np.concatenate([spill_g[~mk], heavy_gids[hidx]])

    return GRangeIndex(
        chunk_hi, chunk_lo, chunk_gid, bases, edges, width, B, CI,
        spill_k, spill_g, m_total, n_genomes,
        nt=nt if nt > 1 else 1, ov=ov if nt > 1 else 0,
        heavy_gids=heavy_gids, heavy_ptr=heavy_ptr)


def slice_sample(gidx: GRangeIndex, skmers_u64: np.ndarray
                 ) -> List[Tuple[int, int]]:
    """[start, end) into the sorted sample for each chunk; slices overlap
    where a duplicated hash value straddles a chunk boundary."""
    out = []
    for ci in range(len(gidx.chunk_hi)):
        lo_u, hi_u = gidx.edges_u64[ci]
        s = int(np.searchsorted(skmers_u64, lo_u, side="left"))
        e = int(np.searchsorted(skmers_u64, hi_u, side="right"))
        out.append((s, e))
    return out


@functools.lru_cache(maxsize=None)
def _sort_view_jit(nseg: int):
    """Concat nseg fixed-size sample key buffers and sort by (hi, lo);
    the u8 weights (already one device array) ride along as a payload.
    Keys are distinct (dedup output) so the device order equals the host
    stable sort exactly."""
    @jax.jit
    def f(his, los, w):
        hi = jnp.concatenate(his)
        lo = jnp.concatenate(los)
        return jax.lax.sort((hi, lo, w), num_keys=2)
    return f


@functools.lru_cache(maxsize=None)
def _edge_counts_jit():
    """Chunk-edge offsets into the device-sorted sample: for each edge
    pair, #{x < lo} and #{x <= hi} over the (hi, lo) u32-pair keys. The
    broadcast-compare-reduce fuses; nothing [E, N] materializes."""
    @jax.jit
    def f(shi, slo, lhi, llo, hhi, hlo):
        sh = shi[None, :]
        sl = slo[None, :]
        lt = (sh < lhi[:, None]) | ((sh == lhi[:, None])
                                    & (sl < llo[:, None]))
        le = (sh < hhi[:, None]) | ((sh == hhi[:, None])
                                    & (sl <= hlo[:, None]))
        return (jnp.sum(lt.astype(jnp.int32), axis=1),
                jnp.sum(le.astype(jnp.int32), axis=1))
    return f


@functools.lru_cache(maxsize=None)
def _extract_slice_jit(P: int):
    """Device-side _pad_slice: length-P window at a traced offset, tail
    masked to sentinels. dynamic_slice clamps starts near the array end,
    so the clamped delta is rolled off to keep index 0 == `start`."""
    @jax.jit
    def f(shi, slo, sw, start, n):
        N = shi.shape[0]
        safe = jnp.minimum(start, np.int32(max(N - P, 0)))
        d = start - safe
        ph = jax.lax.dynamic_slice(shi, (safe,), (P,))
        pl = jax.lax.dynamic_slice(slo, (safe,), (P,))
        pw = jax.lax.dynamic_slice(sw, (safe,), (P,))
        ph = jnp.roll(ph, -d)
        pl = jnp.roll(pl, -d)
        pw = jnp.roll(pw, -d)
        m = jnp.arange(P, dtype=jnp.int32) < n
        ph = jnp.where(m, ph, jnp.uint32(0xFFFFFFFF))
        pl = jnp.where(m, pl, jnp.uint32(0xFFFFFFFF))
        pw = jnp.where(m, pw, jnp.uint8(0))
        return ph, pl, pw
    return f


def _pad_slice(shi, slo, sw, s: int, e: int, P: int):
    out_hi = np.full(P, SENT, np.uint32)
    out_lo = np.full(P, SENT, np.uint32)
    out_w = np.zeros(P, sw.dtype)
    n = e - s
    out_hi[:n] = shi[s:e]
    out_lo[:n] = slo[s:e]
    out_w[:n] = sw[s:e]
    return out_hi, out_lo, out_w


# code-compaction stop density: the concatenated per-chunk code streams
# feed ONE sort-based bincount, so a denser stop shrinks that sort
# linearly. The first repack pass keeps a 4x-expectation capacity (the
# grid's local code clustering is unmeasured); later passes have mixed
# ~Poisson rows and run at 1.5x + 8 sigma, which is what lets the chain
# actually reach a dense stop (a uniform 4x multiplier self-limits at
# ~0.25 density).
_CODE_DENSITY = float(os.environ.get("SYLPH_CODE_DENSITY", "0.5"))

# final-stream re-compaction floor: below this concatenated size the
# histogram is cheap enough that the extra chain + verify fetch lose
# (tests lower it to exercise the path at toy scale)
_RECOMPACT_MIN = int(os.environ.get("SYLPH_RECOMPACT_MIN", str(1 << 22)))

# fused compare+code-emission Pallas kernel (bucket_join._join_codes_kernel)
# instead of materializing the [B, CI] count grid to HBM and re-reading it
# (plus the gid grid) to form codes: "1" on, "0" restores the two-step
# path, "interpret" forces the fused kernel in interpret mode (CPU tests).
_FUSED_ENV = os.environ.get("SYLPH_FUSED_CODES", "1")
_USE_FUSED_CODES = _FUSED_ENV in ("1", "interpret")
_CODES_INTERPRET = _FUSED_ENV == "interpret"

# in-kernel column compaction of the fused kernel's code block (sublane
# butterfly): the sparse [B, CI] code stream never reaches HBM at full
# width, replacing the widest outer repack pass. "0" restores the plain
# fused emit.
_USE_KCOMPACT = os.environ.get("SYLPH_KCOMPACT", "1") == "1"

# bounded boundary scatter for the final code histogram: the [G*H+1]-bin
# scatter costs ~8 ns/bin (~51 ms at GTDB scale) while distinct
# (gid, mult) codes present are typically ~10^5; cap the scatter and
# verify the measured run count (check()/redo fall back on overflow).
_HIST_RUNS_CAP = int(os.environ.get("SYLPH_HIST_RUNS_CAP", str(1 << 20)))


def _compact_codes(codes: jnp.ndarray, density: float,
                   interpret: bool = False):
    """Butterfly-compact a sparse sentinel-coded u32 stream (order-free).

    Flat-order windows (bucket_fill.repack1_flat: [rows, 256] tiles,
    sublane-dominated rolls) adapt to the current density — sparser
    stream -> wider windows, so one pass compacts further. Capacities are
    conservation-checked by the caller (n_live == n_comp), so overflow is
    detected, never silent."""
    from .bucket_fill import repack1_flat
    v = codes.reshape(-1)
    d = max(density, 1e-6)
    mult = 4.0
    while d < _CODE_DENSITY and v.size > 4 * 1024:
        # widest window whose expected occupancy keeps cap << row
        row = 1024
        while row < 32768 and row * 2 * d < 768 and v.size > 4 * row * 2:
            row *= 2
        exp = row * d
        cap = 256 * int(np.ceil(
            (mult * exp + 8.0 * np.sqrt(exp) + 32) / 256))
        if cap >= row:
            break
        v = repack1_flat(v, row=row, cap=cap, interpret=interpret)
        d = d * row / cap
        mult = 1.5
    return v


@jax.jit
def _fold_weights(shi, slo):
    """Collapse duplicate-hash runs of a HASH-SORTED sentinel-padded
    stream into first-occurrence weights (the reference's kmer_counts
    multiplicity map, sylph src/sketch.rs:930-939, as a run reduction).
    Positions are preserved — non-first slots get weight 0 and are skipped
    by the bucket scatter — so chunk slicing stays valid."""
    t = shi.shape[0]
    live = shi != SENT
    prev_same = jnp.concatenate([
        jnp.zeros(1, bool),
        (shi[1:] == shi[:-1]) & (slo[1:] == slo[:-1])])
    first = live & ~prev_same
    pos = jnp.arange(t, dtype=jnp.int32)
    m = jnp.where(~prev_same, pos, t)
    nxt = jax.lax.cummin(m[::-1])[::-1]          # min_{j>=i} m[j]
    nxt_excl = jnp.concatenate([nxt[1:], jnp.full(1, t, jnp.int32)])
    w = jnp.where(first, nxt_excl - pos, 0)
    return shi, slo, w.astype(jnp.int32)


def _capr(density: float, TB: int) -> int:
    """Static per-column capacity for the in-kernel code compaction."""
    exp = density * TB
    cap = int(np.ceil(4.0 * exp + 8.0 * np.sqrt(exp) + 4.0))
    return min(TB, max(8, -(-cap // 8) * 8))


@functools.partial(jax.jit, static_argnames=(
    "width", "B", "CS", "n_genomes", "density", "use_pallas", "use_fill",
    "fused", "kcompact", "nt", "subwidth", "ov", "cover"))
def _chunk_codes(ihi, ilo, gid_grid, shi, slo, sw, base, *, width: int,
                 B: int, CS: int, n_genomes: int, density: float,
                 use_pallas: bool, use_fill: bool = False,
                 fused: bool = False, kcompact: bool = False,
                 nt: int = 1, subwidth: int = 0, ov: int = 0,
                 cover: int = 0):
    """One chunk: join + nonzero-slot compaction to gid*H+mult codes.

    Returns (codes, n_live, n_compacted, w_lost) — callers verify
    n_live == n_compacted (compaction capacity) and w_lost == 0 (sample
    bucket-capacity CS honored AND, under use_fill, every entry covered
    by its butterfly window) and fall back to _chunk_hist_lossless /
    a larger CS on mismatch. Codes from many chunks concatenate into ONE
    histogram bincount (the scatter then runs once over the small hit
    stream instead of once per chunk). ``fused`` emits codes straight
    from the compare kernel (no [B, CI] grid round-trip through HBM).
    ``nt`` > 1: hash-tiled index layout — CS is the per-CELL lane
    capacity and the cell grids are reshaped to [B, nt*CS] so each index
    tile only scans its own lane group. ``cover`` widens the fill's
    input-coverage requirement for duplication-heavy streams (zero-weight
    folded slots occupy slice positions; see bucket_fill.fill_geometry)."""
    sw = sw.astype(jnp.int32)     # weights may arrive as uint8 (wire)
    dh, dl, dw = _fill_or_scatter(shi, slo, sw, base, width=width, B=B,
                                  CS=CS, use_fill=use_fill, nt=nt,
                                  subwidth=subwidth, cover=cover)
    if nt > 1:
        dh = dh.reshape(B, nt * CS)
        dl = dl.reshape(B, nt * CS)
        dw = dw.reshape(B, nt * CS)
    raw = (shi - base) // jnp.uint32(width)
    w_in = jnp.sum(jnp.where(raw < jnp.uint32(B), sw, 0))
    G, H = n_genomes, HIST_H
    CI = ihi.shape[1]
    tile = (CI - ov) // nt if nt > 1 else 0
    TB = max(1, min(64, B))
    capr = _capr(density, TB) if B % TB == 0 else TB
    if fused and kcompact and capr < TB:
        codes, n_live = _codes_from_buckets_compact(
            ihi, ilo, gid_grid, dh, dl, dw, G=G, H=H, CAPR=capr,
            nt=nt, tile=tile)
        # kcompact top-packs each column's codes into its first rows, so
        # a row-major flattening would concentrate the live codes into
        # the leading flat windows of the outer repack and overflow their
        # uniform-density capacities; flatten column-major instead
        # (occupancy per column is ~independent, so windows see the mean)
        codes = codes.T
        density = density * TB / capr
    elif fused:
        codes = _codes_from_buckets(ihi, ilo, gid_grid, dh, dl, dw,
                                    G=G, H=H, nt=nt, tile=tile)
        n_live = jnp.sum((codes != SENT).astype(jnp.int32))
    else:
        grid = _grid_from_buckets(ihi, ilo, dh, dl, dw,
                                  use_pallas=use_pallas, nt=nt,
                                  tile=tile)
        live = (grid > 0) & (gid_grid < G)
        n_live = jnp.sum(live.astype(jnp.int32))
        codes = jnp.where(
            live,
            (gid_grid.astype(jnp.uint32) * np.uint32(H)
             + jnp.minimum(grid, H - 1).astype(jnp.uint32)),
            SENT)
    if use_pallas or _CODES_INTERPRET:
        codes = _compact_codes(codes.reshape(-1), density,
                               interpret=_CODES_INTERPRET)
    n_comp = jnp.sum((codes != SENT).astype(jnp.int32))
    return codes.reshape(-1), n_live, n_comp, jnp.abs(w_in - jnp.sum(dw))


def _codes_from_buckets(ihi, ilo, gidg, dh, dl, dw, *, G, H, nt=1,
                        tile=0):
    """Fused compare + code emission: [B, CI] sentinel-coded u32 codes
    without materializing the count grid (bucket_join._join_codes_kernel)."""
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .bucket_join import _join_codes_kernel
    B, CI = ihi.shape
    CS = dh.shape[1] if nt <= 1 else dh.shape[1] // nt
    LW = dh.shape[1]
    TB = max(1, min(64, B))
    if B % TB != 0:
        TB = 1
    kern = ft.partial(_join_codes_kernel, CS=CS, G=G, H=H, NT=nt,
                      TILE=tile)
    spec_i = pl.BlockSpec((TB, CI), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_s = pl.BlockSpec((TB, LW), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(B // TB,),
        in_specs=[spec_i, spec_i, spec_i, spec_s, spec_s, spec_s],
        out_specs=pl.BlockSpec((TB, CI), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, CI), jnp.uint32),
        interpret=_CODES_INTERPRET,
    )(ihi, ilo, gidg, dh, dl, dw)


def _codes_from_buckets_compact(ihi, ilo, gidg, dh, dl, dw, *, G, H,
                                CAPR, nt=1, tile=0):
    """Fused compare + code emission + in-kernel column compaction:
    returns (codes [B/TB*CAPR, CI], n_live). The code stream leaves the
    kernel already TB/CAPR-fold compacted (sublane butterfly), so the
    outer repack chain starts ~8x denser and the full-width block never
    round-trips HBM. n_live is the pre-compaction live count (summed
    per-block SMEM scalars) for the caller's conservation check."""
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .bucket_join import _join_codes_compact_kernel
    B, CI = ihi.shape
    CS = dh.shape[1] if nt <= 1 else dh.shape[1] // nt
    LW = dh.shape[1]
    TB = max(1, min(64, B))
    if B % TB != 0:
        TB = 1
    kern = ft.partial(_join_codes_compact_kernel, CS=CS, G=G, H=H,
                      CAPR=CAPR, NT=nt, TILE=tile)
    spec_i = pl.BlockSpec((TB, CI), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_s = pl.BlockSpec((TB, LW), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    codes, nl = pl.pallas_call(
        kern,
        grid=(B // TB,),
        in_specs=[spec_i, spec_i, spec_i, spec_s, spec_s, spec_s],
        out_specs=(pl.BlockSpec((CAPR, CI), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((8, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B // TB * CAPR, CI), jnp.uint32),
                   jax.ShapeDtypeStruct((B // TB * 8, 128), jnp.int32)),
        interpret=_CODES_INTERPRET,
    )(ihi, ilo, gidg, dh, dl, dw)
    return codes, jnp.sum(nl)


@functools.partial(jax.jit, static_argnames=("n_genomes", "runs_cap"))
def hist_from_codes(codes, *, n_genomes: int, runs_cap=None):
    """[G*H+1] histogram from a concatenated gid*H+mult code stream.

    With ``runs_cap`` set, returns (hist, n_runs); the histogram is exact
    iff n_runs <= min(G*H+2, runs_cap, len(codes)) — callers verify and
    recompute uncapped on overflow (see containment._bincount)."""
    G, H = n_genomes, HIST_H
    seg = jnp.where(codes != SENT, codes.astype(jnp.int32), G * H)
    if runs_cap is None:
        return _bincount(seg, G * H + 1)
    return _bincount(seg, G * H + 1, runs_cap)


@functools.partial(jax.jit, static_argnames=(
    "width", "B", "CS", "n_genomes", "use_pallas"))
def _chunk_hist_lossless(ihi, ilo, gid_grid, shi, slo, sw, base, *,
                         width: int, B: int, CS: int, n_genomes: int,
                         use_pallas: bool):
    """Compaction-free fallback: bincount over the full grid."""
    sw = sw.astype(jnp.int32)     # weights may arrive as uint8 (wire)
    grid = _joined_grid(ihi, ilo, shi, slo, sw, base, width=width, B=B,
                        CS=CS, use_pallas=use_pallas)
    G, H = n_genomes, HIST_H
    live = (grid > 0) & (gid_grid < G)
    seg = jnp.where(
        live,
        gid_grid * H + jnp.minimum(grid, H - 1),
        G * H)
    return _bincount(seg.reshape(-1), G * H + 1)


def _joined_grid(ihi, ilo, shi, slo, sw, base, *, width, B, CS, use_pallas):
    """Per-slot sample multiplicities [B, CI] (traced ``base``)."""
    dh, dl, dw = _sample_to_buckets(shi, slo, sw, width=width, B=B, CS=CS,
                                    base=base)
    return _grid_from_buckets(ihi, ilo, dh, dl, dw, use_pallas=use_pallas)


def _grid_from_buckets(ihi, ilo, dh, dl, dw, *, use_pallas, nt=1,
                       tile=0):
    if not use_pallas:
        if nt > 1:
            from .bucket_join import _join_xla_tiled
            return _join_xla_tiled(ihi, ilo, dh, dl, dw, nt=nt, tile=tile)
        from .bucket_join import _join_xla
        return _join_xla(ihi, ilo, dh, dl, dw)
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .bucket_join import _join_kernel
    B, CI = ihi.shape
    LW = dh.shape[1]
    CS = LW if nt <= 1 else LW // nt
    TB = max(1, min(64, B))
    if B % TB != 0:
        TB = 1
    kern = ft.partial(_join_kernel, CS=CS, NT=nt, TILE=tile)
    spec_i = pl.BlockSpec((TB, CI), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_s = pl.BlockSpec((TB, LW), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(B // TB,),
        in_specs=[spec_i, spec_i, spec_s, spec_s, spec_s],
        out_specs=pl.BlockSpec((TB, CI), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, CI), jnp.int32),
    )(ihi, ilo, dh, dl, dw)


def _grid_from_buckets_batched(ihi, ilo, dh, dl, dw, *, use_pallas,
                               nt=1, tile=0):
    """S-sample compare: [S, B, CS] buckets vs ONE [B, CI] chunk -> [S, B, CI].

    The Pallas grid is (B/TB, S) with the sample axis fastest, so each
    index block is loaded into VMEM once and reused across all S samples
    — the index HBM traffic (the dominant stream at database scale) is
    amortized S-fold versus S independent joins."""
    if not use_pallas:
        if nt > 1:
            from .bucket_join import _join_xla_tiled
            return jax.vmap(lambda a, b, c: _join_xla_tiled(
                ihi, ilo, a, b, c, nt=nt, tile=tile))(dh, dl, dw)
        from .bucket_join import _join_xla
        return jax.vmap(
            lambda a, b, c: _join_xla(ihi, ilo, a, b, c))(dh, dl, dw)
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .bucket_join import _join_kernel
    B, CI = ihi.shape
    S, _, LW = dh.shape
    CS = LW if nt <= 1 else LW // nt
    TB = max(1, min(64, B))
    if B % TB != 0:
        TB = 1
    kern = ft.partial(_join_kernel, CS=CS, NT=nt, TILE=tile)
    spec_i = pl.BlockSpec((TB, CI), lambda i, s: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_s = pl.BlockSpec((None, TB, LW), lambda i, s: (s, i, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(B // TB, S),
        in_specs=[spec_i, spec_i, spec_s, spec_s, spec_s],
        out_specs=pl.BlockSpec((None, TB, CI), lambda i, s: (s, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, B, CI), jnp.int32),
    )(ihi, ilo, dh, dl, dw)


@functools.partial(jax.jit, static_argnames=(
    "width", "B", "CS", "n_genomes", "density", "use_pallas", "use_fill",
    "fused", "kcompact", "nt", "subwidth", "ov", "cover"))
def _chunk_codes_batched(ihi, ilo, gid_grid, shi_s, slo_s, sw_s, base, *,
                         width: int, B: int, CS: int, n_genomes: int,
                         density: float, use_pallas: bool,
                         use_fill: bool = False, fused: bool = False,
                         kcompact: bool = False,
                         nt: int = 1, subwidth: int = 0, ov: int = 0,
                         cover: int = 0):
    """S samples x one chunk -> one compacted code stream.

    Codes are sample-tagged: s*(G*H) + gid*H + mult, so ONE compaction +
    ONE bincount serve the whole batch. Callers verify the summed
    conservation scalars exactly as in _chunk_codes."""
    sw_s = sw_s.astype(jnp.int32)  # weights may arrive as uint8 (wire)
    if use_fill:
        # unrolled loop (S is small/static): vmap over a scalar-prefetch
        # pallas_call is not supported
        parts = [_fill_or_scatter(shi_s[s], slo_s[s], sw_s[s], base,
                                  width=width, B=B, CS=CS, use_fill=True,
                                  nt=nt, subwidth=subwidth, cover=cover)
                 for s in range(shi_s.shape[0])]
        dh = jnp.stack([p[0] for p in parts])
        dl = jnp.stack([p[1] for p in parts])
        dw = jnp.stack([p[2] for p in parts])
    else:
        dh, dl, dw = jax.vmap(lambda a, b, c: _sample_to_buckets(
            a, b, c, width=width, B=B, CS=CS, base=base, nt=nt,
            subwidth=subwidth))(shi_s, slo_s, sw_s)
    if nt > 1:
        S0 = shi_s.shape[0]
        dh = dh.reshape(S0, B, nt * CS)
        dl = dl.reshape(S0, B, nt * CS)
        dw = dw.reshape(S0, B, nt * CS)
    raw = (shi_s - base) // jnp.uint32(width)
    w_in = jnp.sum(jnp.where(raw < jnp.uint32(B), sw_s, 0))
    G, H = n_genomes, HIST_H
    S = shi_s.shape[0]
    CI = ihi.shape[1]
    tile = (CI - ov) // nt if nt > 1 else 0
    TB = max(1, min(64, B))
    capr = _capr(density, TB) if B % TB == 0 else TB
    if fused and kcompact and capr < TB:
        codes, n_live = _codes_from_buckets_compact_batched(
            ihi, ilo, gid_grid, dh, dl, dw, G=G, H=H, CAPR=capr,
            nt=nt, tile=tile)
        codes = jnp.swapaxes(codes, 1, 2)   # column-major: see _chunk_codes
        density = density * TB / capr
    elif fused:
        codes = _codes_from_buckets_batched(ihi, ilo, gid_grid, dh, dl,
                                            dw, G=G, H=H, nt=nt,
                                            tile=tile)
        n_live = jnp.sum((codes != SENT).astype(jnp.int32))
    else:
        grid = _grid_from_buckets_batched(ihi, ilo, dh, dl, dw,
                                          use_pallas=use_pallas, nt=nt,
                                          tile=tile)
        live = (grid > 0) & (gid_grid[None, :, :] < G)
        n_live = jnp.sum(live.astype(jnp.int32))
        sid = jax.lax.broadcasted_iota(jnp.uint32, grid.shape, 0)
        codes = jnp.where(
            live,
            (sid * np.uint32(G * H)
             + gid_grid[None, :, :].astype(jnp.uint32) * np.uint32(H)
             + jnp.minimum(grid, H - 1).astype(jnp.uint32)),
            SENT)
    if use_pallas or _CODES_INTERPRET:
        codes = _compact_codes(codes.reshape(-1), density,
                               interpret=_CODES_INTERPRET)
    n_comp = jnp.sum((codes != SENT).astype(jnp.int32))
    return codes.reshape(-1), n_live, n_comp, jnp.abs(w_in - jnp.sum(dw))


def _codes_from_buckets_batched(ihi, ilo, gidg, dh, dl, dw, *, G, H,
                                nt=1, tile=0):
    """Batched _codes_from_buckets: [S, B, CS] buckets vs one [B, CI]
    chunk -> [S, B, CI] sample-tagged codes, index blocks VMEM-resident
    across the batch (same grid order as _grid_from_buckets_batched)."""
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .bucket_join import _join_codes_kernel
    B, CI = ihi.shape
    S, _, LW = dh.shape
    CS = LW if nt <= 1 else LW // nt
    TB = max(1, min(64, B))
    if B % TB != 0:
        TB = 1
    kern = ft.partial(_join_codes_kernel, CS=CS, G=G, H=H, batched=True,
                      NT=nt, TILE=tile)
    spec_i = pl.BlockSpec((TB, CI), lambda i, s: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_s = pl.BlockSpec((None, TB, LW), lambda i, s: (s, i, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(B // TB, S),
        in_specs=[spec_i, spec_i, spec_i, spec_s, spec_s, spec_s],
        out_specs=pl.BlockSpec((None, TB, CI), lambda i, s: (s, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, B, CI), jnp.uint32),
        interpret=_CODES_INTERPRET,
    )(ihi, ilo, gidg, dh, dl, dw)


def _codes_from_buckets_compact_batched(ihi, ilo, gidg, dh, dl, dw, *,
                                        G, H, CAPR, nt=1, tile=0):
    """Batched _codes_from_buckets_compact: [S, B, LW] cell grids vs one
    [B, CI] chunk -> ([S, B/TB*CAPR, CI] sample-tagged compacted codes,
    n_live). Index blocks stay VMEM-resident across the batch; per-block
    live counts exit via (8, 128) tiles per (block, sample)."""
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .bucket_join import _join_codes_compact_kernel
    B, CI = ihi.shape
    S, _, LW = dh.shape
    CS = LW if nt <= 1 else LW // nt
    TB = max(1, min(64, B))
    if B % TB != 0:
        TB = 1
    kern = ft.partial(_join_codes_compact_kernel, CS=CS, G=G, H=H,
                      CAPR=CAPR, batched=True, NT=nt, TILE=tile)
    spec_i = pl.BlockSpec((TB, CI), lambda i, s: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_s = pl.BlockSpec((None, TB, LW), lambda i, s: (s, i, 0),
                          memory_space=pltpu.VMEM)
    codes, nl = pl.pallas_call(
        kern,
        grid=(B // TB, S),
        in_specs=[spec_i, spec_i, spec_i, spec_s, spec_s, spec_s],
        out_specs=(pl.BlockSpec((None, CAPR, CI), lambda i, s: (s, i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((None, 8, 128), lambda i, s: (s, i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((S, B // TB * CAPR, CI),
                                        jnp.uint32),
                   jax.ShapeDtypeStruct((S, B // TB * 8, 128),
                                        jnp.int32)),
        interpret=_CODES_INTERPRET,
    )(ihi, ilo, gidg, dh, dl, dw)
    return codes, jnp.sum(nl)


def _quantize_p(want: float, t=None) -> int:
    """Static per-chunk slice length: round ``want`` up to a quarter-octave
    step (multiple of 2048). Pow-2 rounding wasted up to 2x of fill +
    compare input on sentinel padding; quarter-octave keeps the
    compile-cache hit rate (few distinct shapes) while bounding slack
    at ~19%. ``t`` (the whole-stream length) caps the result."""
    want = max(1024.0, want)
    q = np.ceil(np.log2(want) * 4.0) / 4.0
    p = int(-(-(2.0 ** q) // 2048) * 2048)
    return p if t is None else min(p, t)


def _bound_positions(shi, slo, qhi, qlo, upper: bool):
    """Vectorized binary search of queries into a sorted (hi, lo) stream.

    Few queries (chunk edges) x log(n) gathers — negligible. Returns
    lower_bound (first >= q) or upper_bound (first > q) positions."""
    from . import u64 as u64mod
    n = int(shi.shape[0])
    pos = jnp.zeros(qhi.shape, jnp.int32)
    nbits = max(1, (n + 1).bit_length())
    for t in reversed(range(nbits)):
        mid = pos + (1 << t)
        ok = mid <= n
        g = jnp.minimum(mid - 1, n - 1)
        vhi = jnp.take(shi, g)
        vlo = jnp.take(slo, g)
        if upper:
            go = u64mod.le((vhi, vlo), (qhi, qlo))
        else:
            go = u64mod.lt((vhi, vlo), (qhi, qlo))
        pos = jnp.where(ok & go, mid, pos)
    return pos


@functools.partial(jax.jit, static_argnames=("P",))
def _device_slices(shi, slo, ehi_lo, elo_lo, ehi_hi, elo_hi, *, P: int):
    """(starts [n_chunks], max_len) for device-resident chunk slicing."""
    starts = _bound_positions(shi, slo, ehi_lo, elo_lo, upper=False)
    ends = _bound_positions(shi, slo, ehi_hi, elo_hi, upper=True)
    n = shi.shape[0]
    starts = jnp.minimum(starts, jnp.maximum(n - P, 0))
    return starts, jnp.max(ends - starts)


class GRangeEngine:
    """Device-resident grange index serving per-sample [G, H] histograms.

    ``max_resident_chunks`` bounds HBM residency for databases larger
    than device memory (e.g. >100k genomes at deep sketch sizes): the
    first N chunks stay pinned per device, the remainder upload
    asynchronously per sample and are released after their join — the
    upload of chunk i+1 overlaps chunk i's compare kernel, so the extra
    cost approaches the wire time of the non-resident tail (PCIe-class
    links move a 472 MB chunk in tens of ms). None = everything resident
    (the fast path when the index fits, as GTDB-R220 does on 16 GB v5e)."""

    def __init__(self, gidx: GRangeIndex, devices=None,
                 max_resident_chunks: Optional[int] = None,
                 process_span: Optional[tuple] = None):
        """``process_span=(proc_id, n_procs)`` selects the multi-host mode:
        this engine owns only chunks i with i % n_procs == proc_id (the
        analog of sharding the syldb index over hosts' HBM — BASELINE.md's
        pod-scale row). hists() then returns a PARTIAL [G, H] histogram of
        the owned chunks — spill and heavy side channels are accounted by
        process 0 only — and callers merge across processes with
        merge_process_hists (host allreduce; hists are [G, 64] i64)."""
        self.gidx = gidx
        self._GE = gidx.g_eff       # code-space genomes (real + markers)
        devs = devices if devices is not None else jax.devices()
        self._devices = devs
        if process_span is not None:
            pid, npr = process_span
            assert 0 <= pid < npr, process_span
        self._span = process_span
        n_res = (len(gidx.chunk_hi) if max_resident_chunks is None
                 else max(0, min(max_resident_chunks, len(gidx.chunk_hi))))
        self._n_resident = n_res
        self._dev_chunks = {}
        for i in range(n_res):
            if not self._owns(i):
                continue
            d = devs[i % len(devs)]
            self._dev_chunks[i] = (
                jax.device_put(gidx.chunk_hi[i], d),
                jax.device_put(gidx.chunk_lo[i], d),
                jax.device_put(gidx.chunk_gid[i], d))
        self._use_pallas = jax.default_backend() != "cpu"
        self._fused = _USE_FUSED_CODES and (self._use_pallas
                                            or _CODES_INTERPRET)
        self._kcompact = _USE_KCOMPACT
        e = gidx.edges_u64
        m32 = np.uint64(0xFFFFFFFF)
        self._edges_dev = jax.device_put((
            (e[:, 0] >> np.uint64(32)).astype(np.uint32),
            (e[:, 0] & m32).astype(np.uint32),
            (e[:, 1] >> np.uint64(32)).astype(np.uint32),
            (e[:, 1] & m32).astype(np.uint32)), self._devices[0])

    def _owns(self, i: int) -> bool:
        """Chunk ownership: all chunks (single-process), or a round-robin
        subset by chunk id when a process_span is set."""
        if self._span is None:
            return True
        pid, npr = self._span
        return i % npr == pid

    def _owns_sides(self) -> bool:
        """Spill/global side channels: exactly one process accounts them."""
        return self._span is None or self._span[0] == 0

    def _chunk_dev(self, i: int):
        """Device arrays for chunk i: pinned, or a per-use async upload."""
        hit = self._dev_chunks.get(i)
        if hit is not None:
            return hit
        d = self._devices[i % len(self._devices)]
        g = self.gidx
        return (jax.device_put(g.chunk_hi[i], d),
                jax.device_put(g.chunk_lo[i], d),
                jax.device_put(g.chunk_gid[i], d))

    def hist_device_stream(self, shi, slo, P: Optional[int] = None,
                           n_live: Optional[int] = None,
                           n_unique: Optional[int] = None,
                           n_matches: Optional[int] = None,
                           diag: bool = False,
                           cs: Optional[int] = None,
                           w_dev=None):
        """All-device histogram for a SORTED sample occurrence stream
        (sentinel-padded tail; duplicates encode multiplicity). Single
        device only (the bench/serving hot path: nothing crosses the
        host boundary except the conservation scalars).

        ``n_live`` is the caller's count of non-sentinel entries; pass it
        whenever known — the sentinel tail otherwise inflates the per-chunk
        slice P (sentinels sort past every chunk edge, so only live entries
        land in slices) and with it both the compare work (CS) and the
        compaction density estimate. The round-1 OOM at GTDB scale came
        from exactly that inflation: density > 0.25 disabled code
        compaction and 22 full-grid code streams (~7 GB) piled up in HBM.

        Returns (hist [g_eff*H+1] device i32, check() -> bool). check()
        fetches the conservation scalars and returns True iff the
        histogram is exact (compaction capacity honored and every chunk
        slice fit in P); on False callers re-run via the host path. Bins
        [0, n_genomes*H) are real genome counts; bins past that are
        heavy-run marker rows — expand with ``heavy_expand`` (all zero
        when the index has no heavy runs, as synthetic benches don't)."""
        assert self._span is None, (
            "hist_device_stream sweeps every chunk; multi-host engines "
            "(process_span set) must use hists() + merge_process_hists")
        shi = shi.reshape(-1)
        slo = slo.reshape(-1)
        gidx = self.gidx
        G = self._GE
        n_chunks = len(gidx.chunk_hi)
        t = int(shi.shape[0])
        if n_live is None:
            n_live = t
        # fold duplicate hashes into a first-occurrence weight (the
        # reference's kmer_counts multiplicity map, sylph
        # src/sketch.rs:930-939, built as a sorted-run reduction): the
        # per-bucket sample capacity CS then scales with UNIQUE hashes,
        # which is what bounds compare work in the join kernel. Callers
        # with an already-unique sorted stream (the CLI's device-resident
        # sample) pass w_dev to skip the fold.
        if w_dev is None:
            shi, slo, w = _fold_weights(shi, slo)
        else:
            w = w_dev
        if P is None:
            mean = n_live / n_chunks
            P = _quantize_p(1.3 * mean + 6.0 * np.sqrt(mean) + 64, t)
        lo_hi, lo_lo, hi_hi, hi_lo = self._edges_dev
        starts, max_len = _device_slices(shi, slo, lo_hi, lo_lo, hi_hi,
                                         hi_lo, P=P)
        from .bucket_join import sample_cs
        if cs is not None:
            CS = cs                 # caller override (e.g. a retry after
            #                         a conservation check caught a
            #                         capacity overflow)
        elif gidx.nt > 1:
            from .bucket_join import cell_cs
            CS = cell_cs(max(1, (n_unique or n_live) // n_chunks),
                         gidx.B * gidx.nt)
        else:
            CS = sample_cs(max(1, (n_unique or n_live) // n_chunks),
                           gidx.B, granularity=8)
        # fill input coverage scales with OCCURRENCES (zero-weight folded
        # duplicates occupy slice positions), where CS scales with unique:
        # mean occurrences per cell, enforced window-level by
        # fill_geometry against the guaranteed input-fetch span
        cover = int(np.ceil((n_live / n_chunks)
                            / (gidx.B * gidx.nt))) + 1
        use_fill = ((self._use_pallas or _FILL_INTERPRET)
                    and _fill_supported(gidx.B * gidx.nt, CS, cover))
        # live codes per chunk <= unique sample hashes in the chunk times
        # the cross-genome duplication factor; estimate 2x unique (or the
        # live count when unique is unknown) — _compact_codes layers its
        # own 4x-expectation capacity on top and the conservation check +
        # host-path fallback catch any violation. ``n_matches`` (a measured
        # whole-sample hit count, e.g. from a warmup run: hist[:G*H].sum())
        # overrides the 2x-unique worst case — for low-identity samples the
        # worst case leaves the concatenated code stream ~unique-sized and
        # its final bincount sort becomes the dominant join cost.
        est_codes = ((1.25 * n_matches) if n_matches is not None
                     else 2.0 * (n_unique if n_unique else n_live)
                     ) / n_chunks
        density = min(1.0, max(est_codes, 512.0)
                      / max(1, gidx.B * gidx.CI))
        codes_parts, diag_parts, wl_parts = [], [], []
        nxt = self._chunk_dev(0) if n_chunks else None
        for i in range(n_chunks):
            cur = nxt                # prefetch overlaps the previous join
            nxt = self._chunk_dev(i + 1) if i + 1 < n_chunks else None
            s = starts[i]
            c_hi = jax.lax.dynamic_slice_in_dim(shi, s, P)
            c_lo = jax.lax.dynamic_slice_in_dim(slo, s, P)
            c_w = jax.lax.dynamic_slice_in_dim(w, s, P)
            ihi, ilo, gidg = cur
            base = jnp.uint32(gidx.bases[i])
            cod, nl, nc, wlost = _chunk_codes(
                ihi, ilo, gidg, c_hi, c_lo, c_w, base, width=gidx.width,
                B=gidx.B, CS=CS, n_genomes=G, density=density,
                use_pallas=self._use_pallas, use_fill=use_fill,
                fused=self._fused, kcompact=self._kcompact,
                nt=gidx.nt, subwidth=gidx.subwidth, ov=gidx.ov,
                cover=cover)
            codes_parts.append(cod)
            diag_parts.append(jnp.abs(nl - nc) + wlost)
            wl_parts.append(wlost)
        all_codes = (jnp.concatenate(codes_parts)
                     if len(codes_parts) > 1 else codes_parts[0])
        cap = (_HIST_RUNS_CAP if G * HIST_H + 2 > _HIST_RUNS_CAP
               else None)
        if cap is None:
            hist = hist_from_codes(all_codes, n_genomes=G)
            runs = None
        else:
            hist, runs = hist_from_codes(all_codes, n_genomes=G,
                                         runs_cap=cap)
            cap = min(G * HIST_H + 2, cap, int(all_codes.shape[0]))
        diag_v = jnp.stack(diag_parts)
        ml = max_len
        # one fused conservation vector: a single fetch instead of three
        # serial ~27 ms relay round-trips (check.probe lets callers fold
        # it into their own result fetch for zero extra round trips)
        probe_parts = [jnp.sum(jnp.abs(diag_v)).astype(jnp.int32),
                       jnp.asarray(ml, jnp.int32)]
        if runs is not None:
            probe_parts.append(runs.astype(jnp.int32).reshape(()))
        probe = jnp.stack(probe_parts)

        def check(vals=None) -> bool:
            v = np.asarray(probe) if vals is None else np.asarray(vals)
            return (int(v[0]) == 0 and int(v[1]) <= P
                    and (runs is None or int(v[2]) <= cap))

        check.probe = probe
        if diag:
            info = dict(diag=diag_v, max_len=ml, P=P, CS=CS,
                        density=density, use_fill=use_fill,
                        w_lost=jnp.stack(wl_parts))
            return hist, check, info
        return hist, check

    def hist_device_stream_batched(self, shi_s, slo_s,
                                   P: Optional[int] = None,
                                   n_live: Optional[int] = None,
                                   n_unique: Optional[int] = None,
                                   w_s=None,
                                   n_matches: Optional[int] = None,
                                   cs: Optional[int] = None):
        """S-sample batched form of hist_device_stream: [S, T] sorted
        streams -> ([S, G*H] i32, check). One index sweep serves the whole
        batch — per-chunk dispatch cost and index HBM reads amortize
        S-fold (the production cohort-profiling shape). ``n_live`` /
        ``n_unique`` are per-sample maxima when known. ``w_s`` supplies
        pre-folded per-entry multiplicities ([S, T] i32, 0 on padding) for
        already-unique sorted tables (the CLI sketch form), skipping the
        duplicate-run fold. Per-sample rows span g_eff*H bins (real
        genomes first, heavy-run marker rows after — see
        hist_device_stream)."""
        assert self._span is None, (
            "hist_device_stream_batched sweeps every chunk; multi-host "
            "engines (process_span set) must use hists()")
        gidx = self.gidx
        G = self._GE
        S, t = int(shi_s.shape[0]), int(shi_s.shape[1])
        n_chunks = len(gidx.chunk_hi)
        assert S * G * HIST_H + 1 < (1 << 31), "sample-tag code overflow"
        if n_live is None:
            n_live = t
        if P is None:
            mean = n_live / n_chunks
            P = _quantize_p(1.3 * mean + 6.0 * np.sqrt(mean) + 64, t)
        lo_hi, lo_lo, hi_hi, hi_lo = self._edges_dev
        starts_s, max_len_s = jax.vmap(
            lambda a, b: _device_slices(a, b, lo_hi, lo_lo, hi_hi, hi_lo,
                                        P=P))(shi_s, slo_s)
        prefolded = w_s is not None
        if w_s is None:
            shi_s, slo_s, w_s = jax.vmap(_fold_weights)(shi_s, slo_s)
        from .bucket_join import sample_cs
        if cs is not None:
            CS = cs                 # caller override (e.g. a retry after
            #                         a conservation check caught a
            #                         capacity overflow)
        elif gidx.nt > 1:
            from .bucket_join import cell_cs
            CS = cell_cs(max(1, (n_unique or n_live) // n_chunks),
                         gidx.B * gidx.nt)
        else:
            CS = sample_cs(max(1, (n_unique or n_live) // n_chunks),
                           gidx.B, granularity=8)
        # occurrence-based fill input coverage (see hist_device_stream);
        # pre-folded tables (w_s given) have no zero-weight slots and the
        # CS slack already keeps windows far under the fetch span
        cover = 0 if prefolded else (
            int(np.ceil((n_live / n_chunks) / (gidx.B * gidx.nt))) + 1)
        use_fill = ((self._use_pallas or _FILL_INTERPRET)
                    and _fill_supported(gidx.B * gidx.nt, CS, cover))
        est_codes = S * ((1.25 * n_matches) if n_matches is not None
                         else 2.0 * (n_unique if n_unique else n_live)
                         ) / n_chunks
        density = min(1.0, max(est_codes, 512.0)
                      / max(1, S * gidx.B * gidx.CI))
        codes_parts, diag = [], []
        nxt = self._chunk_dev(0) if n_chunks else None
        slc = jax.vmap(
            lambda x, s: jax.lax.dynamic_slice_in_dim(x, s, P))
        for i in range(n_chunks):
            cur = nxt
            nxt = self._chunk_dev(i + 1) if i + 1 < n_chunks else None
            c_hi = slc(shi_s, starts_s[:, i])
            c_lo = slc(slo_s, starts_s[:, i])
            c_w = slc(w_s, starts_s[:, i])
            ihi, ilo, gidg = cur
            base = jnp.uint32(gidx.bases[i])
            cod, nl, nc, wlost = _chunk_codes_batched(
                ihi, ilo, gidg, c_hi, c_lo, c_w, base, width=gidx.width,
                B=gidx.B, CS=CS, n_genomes=G, density=density,
                use_pallas=self._use_pallas, use_fill=use_fill,
                fused=self._fused, kcompact=self._kcompact,
                nt=gidx.nt, subwidth=gidx.subwidth, ov=gidx.ov,
                cover=cover)
            codes_parts.append(cod)
            diag.append(jnp.abs(nl - nc) + wlost)
        # codes are (s*G + gid)*H + mult — one bincount over S*G bins
        all_codes = (jnp.concatenate(codes_parts)
                     if len(codes_parts) > 1 else codes_parts[0])
        cap = (_HIST_RUNS_CAP if S * G * HIST_H + 2 > _HIST_RUNS_CAP
               else None)
        if cap is None:
            hist = hist_from_codes(all_codes, n_genomes=S * G)
            runs = None
        else:
            hist, runs = hist_from_codes(all_codes, n_genomes=S * G,
                                         runs_cap=cap)
            cap = min(S * G * HIST_H + 2, cap, int(all_codes.shape[0]))
        diag_v = jnp.stack(diag)
        ml = jnp.max(max_len_s)
        probe_parts = [jnp.sum(jnp.abs(diag_v)).astype(jnp.int32),
                       ml.astype(jnp.int32)]
        if runs is not None:
            probe_parts.append(runs.astype(jnp.int32).reshape(()))
        probe = jnp.stack(probe_parts)

        def check(vals=None) -> bool:
            v = np.asarray(probe) if vals is None else np.asarray(vals)
            return (int(v[0]) == 0 and int(v[1]) <= P
                    and (runs is None or int(v[2]) <= cap))

        check.probe = probe
        return hist[:S * G * HIST_H].reshape(S, G * HIST_H), check

    def heavy_expand(self, hh: np.ndarray) -> np.ndarray:
        """[n_heavy, H] marker-row counts -> [G, H] real-genome counts.

        A heavy hash yields at most one (marker, mult) code per sample
        (one representative grid slot), so each nonzero entry fans out to
        its run's CSR genome list at that multiplicity."""
        g = self.gidx
        G, H = g.n_genomes, HIST_H
        out = np.zeros((G, H), np.int64)
        ptr, hg = g.heavy_ptr, g.heavy_gids
        for mlt in range(H):
            rows = np.flatnonzero(hh[:, mlt])
            if not rows.size:
                continue
            lens = ptr[rows + 1] - ptr[rows]
            hidx = _ranges(ptr[rows], lens)
            cnt = np.repeat(hh[rows, mlt].astype(np.int64), lens)
            seg = hg[hidx].astype(np.int64) * H + mlt
            out += np.bincount(seg, weights=cnt,
                               minlength=G * H).astype(np.int64
                                                       ).reshape(G, H)
        return out

    def _fold_heavy(self, hist_eff: np.ndarray) -> np.ndarray:
        """[g_eff*H...] flat histogram -> [G, H] with markers expanded."""
        G, H = self.gidx.n_genomes, HIST_H
        out = hist_eff[:G * H].astype(np.int64).reshape(G, H)
        nh = self.gidx.n_heavy
        if nh:
            hh = hist_eff[G * H:self._GE * H].reshape(nh, H)
            if hh.any():
                out = out + self.heavy_expand(hh)
        return out

    def hists_batched(self, tables) -> np.ndarray:
        """[S, G, HIST_H] histograms for S (sorted_kmers, counts) tables
        via ONE batched index sweep (hist_device_stream_batched with
        pre-folded weights). Spill slots probe host-side per sample; a
        failed conservation check falls back to the per-sample path."""
        from . import u64 as u64mod
        if self._span is not None:   # multi-host: per-sample partials
            return np.stack([self.hists(k.astype(np.uint64),
                                        c.astype(np.uint32))
                             for k, c in tables])
        G, H = self.gidx.n_genomes, HIST_H
        S = len(tables)
        T = max(1024, 1 << int(np.ceil(np.log2(max(
            max(k.size for k, _ in tables), 1)))))
        shi = np.full((S, T), SENT, np.uint32)
        slo = np.full((S, T), SENT, np.uint32)
        w = np.zeros((S, T), np.uint8)    # clamped weights (see hists)
        for s, (k, c) in enumerate(tables):
            hi, lo = u64mod.from_u64_np(k.astype(np.uint64))
            shi[s, :k.size] = hi
            slo[s, :k.size] = lo
            w[s, :k.size] = np.minimum(c, HIST_H - 1)
        n_live = max((k.size for k, _ in tables), default=1)
        hist_d, check = self.hist_device_stream_batched(
            jnp.asarray(shi), jnp.asarray(slo), n_live=max(n_live, 1),
            n_unique=max(n_live, 1), w_s=jnp.asarray(w))
        if not check():
            return np.stack([self.hists(k.astype(np.uint64),
                                        c.astype(np.uint32))
                             for k, c in tables])
        rows = np.asarray(hist_d).astype(np.int64)
        out = np.stack([self._fold_heavy(rows[s]) for s in range(S)])
        if self.gidx.spill_kmers.size:
            for s, (k, c) in enumerate(tables):
                out[s] += self._spill_hist(k.astype(np.uint64),
                                           c.astype(np.uint32))
        return out

    def candidate_mask_stream(self, device_view, mask_fn,
                              n_matches: Optional[int] = None):
        """([G] bool candidate mask, measured match total) via the
        single-dispatch stream sweep.

        The per-chunk hists() path pays three serial host<->device round
        trips (slice fetch, conservation fetch, mask fetch) at ~30-100 ms
        each through a slow interconnect; this path sorts the streamed
        device-resident sample, runs hist_device_stream (chunk offsets
        computed ON device, one fused conservation probe) and fetches
        probe + match-total + mask in ONE vector. ``n_matches`` (e.g. the
        previous request's measured total in a serving session) sizes the
        code-compaction chain for the actual hit rate instead of the
        2x-unique worst case — an underestimate is caught by the
        conservation check and falls back losslessly. Returns None when
        the regime doesn't apply or the check failed (callers fall back
        to hists())."""
        if (self.gidx.n_heavy or self._span is not None
                or len(self._devices) != 1 or device_view is None):
            return None
        import logging
        import time as _time
        _log = logging.getLogger("sylph")
        _t0 = _time.perf_counter()
        G, H = self._GE, HIST_H
        shi, slo, w = self._sorted_device_sample(device_view)
        n = device_view.n
        hist, check = self.hist_device_stream(
            shi, slo, n_live=n, n_unique=n,
            n_matches=n_matches, w_dev=w.astype(jnp.int32))
        mask_dev = mask_fn(hist[:G * H])
        matches_dev = hist[:G * H].sum().reshape(1)
        probe = check.probe
        fused = jnp.concatenate([probe.astype(jnp.int32),
                                 matches_dev.astype(jnp.int32),
                                 mask_dev.astype(jnp.int32)])
        v = np.asarray(fused)
        np_len = int(probe.shape[0])
        _log.debug("[timing] grange mask stream: dispatch+fetch %.3f s",
                   _time.perf_counter() - _t0)
        if not check(v[:np_len]):
            _log.debug("mask stream conservation check failed; "
                       "falling back to the per-chunk path")
            return None
        return v[np_len + 1:].astype(bool), int(v[np_len])

    def partial_hists(self, skmers_u64: np.ndarray,
                      scounts: np.ndarray) -> np.ndarray:
        """Multi-host entry: this process's partial [G, H] histogram over
        its owned chunk subset (== hists(); named for call-site clarity).
        Merge with merge_process_hists. The reference's counterpart is
        the single-host rayon genome loop (src/contain.rs:284-292); the
        TPU-native design instead shards the index over hosts and merges
        [G, 64] i64 histograms (SURVEY.md §5 'Distributed backend')."""
        return self.hists(skmers_u64, scounts)

    def _spill_hist(self, skmers_u64: np.ndarray,
                    scounts: np.ndarray) -> np.ndarray:
        """[G, H] contribution of the (tiny) host-side spill list."""
        gidx = self.gidx
        G, H = gidx.n_genomes, HIST_H
        out = np.zeros((G, H), np.int64)
        idx = np.searchsorted(skmers_u64, gidx.spill_kmers)
        idxc = np.minimum(idx, max(skmers_u64.size - 1, 0))
        found = (skmers_u64.size > 0) & (idx < skmers_u64.size)
        found = found & (skmers_u64[idxc] == gidx.spill_kmers)
        cts = np.where(found, scounts[idxc], 0).astype(np.int64)
        live = cts > 0
        if live.any():
            seg = (gidx.spill_gids[live].astype(np.int64) * H
                   + np.minimum(cts[live], H - 1))
            out += np.bincount(seg, minlength=G * H).reshape(G, H)
        return out

    def _sorted_device_sample(self, device_view):
        """Concat + sort the streamed sample buffers on device; returns
        (shi, slo, sw) sorted device arrays of length p2(nseg)*SEG
        (sentinels at the tail) — shapes are stable per buffer count, so
        the sort compiles once per power-of-two size class."""
        vh, vl, vw = device_view.padded_to_pow2()
        return _sort_view_jit(len(vh))(vh, vl, vw)

    def _device_view_slices(self, shi_d, slo_d, sw_d, n_live: int):
        """Per-chunk [start, end) offsets computed ON DEVICE (one tiny
        fetch), equal to host slice_sample on the sorted live keys."""
        gidx = self.gidx
        edges = np.asarray([e for e in gidx.edges_u64], np.uint64)
        lo_u, hi_u = edges[:, 0], edges[:, 1]
        import jax
        dev = shi_d.devices().pop() if hasattr(shi_d, "devices") else None
        lhi = jax.device_put((lo_u >> np.uint64(32)).astype(np.uint32), dev)
        llo = jax.device_put((lo_u & np.uint64(0xFFFFFFFF)).astype(
            np.uint32), dev)
        hhi = jax.device_put((hi_u >> np.uint64(32)).astype(np.uint32), dev)
        hlo = jax.device_put((hi_u & np.uint64(0xFFFFFFFF)).astype(
            np.uint32), dev)
        ss, ee = _edge_counts_jit()(shi_d, slo_d, lhi, llo, hhi, hlo)
        ss = np.minimum(np.asarray(ss), n_live)
        ee = np.minimum(np.asarray(ee), n_live)
        return [(int(s), int(e)) for s, e in zip(ss, ee)]

    def hists(self, skmers_u64: Optional[np.ndarray],
              scounts: Optional[np.ndarray],
              mask_fn=None, device_view=None, table_fn=None) -> np.ndarray:
        """[G, HIST_H] exact (clamped) per-genome multiplicity histograms.

        ``mask_fn`` (device [G*H] i32 histogram -> device [G] bool) short
        -circuits the [G, H] D2H fetch for the prefilter: when the whole
        sweep ran clean on ONE device and the index has no spill/heavy
        side channels, only the [G] boolean mask crosses the wire (25 MB
        -> 100 KB at GTDB scale — material through a slow interconnect).
        Returns the bool mask in that case; any fallback condition
        returns the full histogram as usual (callers detect via ndim).

        With a ``device_view``, the host-sorted table is only needed for
        the spill side channel — callers may pass ``skmers_u64=None`` and
        a ``table_fn`` returning (sorted_kmers_u64, counts) on demand, so
        the host sort can overlap the device sweep instead of gating the
        dispatch."""
        from . import u64 as u64mod
        gidx = self.gidx
        G, H = self._GE, HIST_H

        _tbl_cache = [skmers_u64, scounts]

        def _tbl():
            if _tbl_cache[0] is None:
                _tbl_cache[0], _tbl_cache[1] = table_fn()
            return _tbl_cache[0], _tbl_cache[1]

        shi = slo = sw = None
        if device_view is None or len(self._devices) != 1:
            sk_h, sc_h = _tbl()
            shi, slo = u64mod.from_u64_np(sk_h)
            # histogram bins clamp multiplicity at H-1, so weights clamp
            # to 63 losslessly and cross the (slow) host->device wire as
            # uint8 — a third off the per-sample upload; the device casts
            # back to i32
            sw = np.minimum(sc_h, HIST_H - 1).astype(np.uint8)
        import logging
        import time as _time
        _log = logging.getLogger("sylph")
        _ts = _time.perf_counter
        dv_sorted = None
        if device_view is not None and len(self._devices) == 1:
            # streamed device-resident sample: the k-mers shipped during
            # the host ingest; sort + chunk-slice on device instead of
            # padding + uploading ~9 bytes/k-mer synchronously here
            _t = _ts()
            dv_sorted = self._sorted_device_sample(device_view)
            _t_sort = _ts() - _t
            _t = _ts()
            slices = self._device_view_slices(*dv_sorted,
                                              device_view.n)
            _log.debug("[timing] grange hists: device sort dispatch "
                       "%.3f s, slice fetch(sync) %.3f s", _t_sort,
                       _ts() - _t)
        else:
            _t = _ts()
            slices = slice_sample(gidx, _tbl()[0])
            _log.debug("[timing] grange hists: host slice_sample %.3f s",
                       _ts() - _t)
        max_n = max((e - s for s, e in slices), default=0)
        P = _quantize_p(float(max(max_n, 1)))
        from .bucket_join import sample_cs
        if gidx.nt > 1:
            from .bucket_join import cell_cs
            CS = cell_cs(P, gidx.B * gidx.nt)
        else:
            CS = sample_cs(P, gidx.B, granularity=8)
        density = min(1.0, 4.0 * P / max(1, gidx.B * gidx.CI))
        use_fill = ((self._use_pallas or _FILL_INTERPRET)
                    and _fill_supported(gidx.B * gidx.nt, CS))

        # dispatch every chunk asynchronously; retain the (small) sample
        # slices so a failed conservation check can be patched without
        # re-running the good chunks (non-resident index chunks re-upload
        # on that astronomically rare path rather than pinning HBM here)
        import logging
        import time as _time
        _log = logging.getLogger("sylph")
        _t0 = _time.perf_counter()
        parts = []          # (dev_i, codes_dev, nl-nc diff, (i, smp, base))
        owned = [i for i in range(len(slices)) if self._owns(i)]
        nxt = self._chunk_dev(owned[0]) if owned else None
        for oi, i in enumerate(owned):
            s, e = slices[i]
            cur = nxt
            nxt = (self._chunk_dev(owned[oi + 1])
                   if oi + 1 < len(owned) else None)
            di = i % len(self._devices)   # matches _chunk_dev placement
            if dv_sorted is not None:
                smp = _extract_slice_jit(P)(*dv_sorted, np.int32(s),
                                            np.int32(e - s))
            else:
                ph, plo, pw = _pad_slice(shi, slo, sw, s, e, P)
                smp = jax.device_put((ph, plo, pw), self._devices[di])
            ihi, ilo, gidg = cur
            base = jax.device_put(np.uint32(gidx.bases[i]),
                                  self._devices[di])
            cod, nl, nc, wlost = _chunk_codes(
                ihi, ilo, gidg, *smp, base, width=gidx.width, B=gidx.B,
                CS=CS, n_genomes=G, density=density,
                use_pallas=self._use_pallas, use_fill=use_fill,
                fused=self._fused, kcompact=self._kcompact,
                nt=gidx.nt, subwidth=gidx.subwidth, ov=gidx.ov)
            parts.append((di, cod, jnp.abs(nl - nc) + wlost, nl,
                          (i, smp, base)))

        _t1 = _time.perf_counter()
        # one small fetch per device for all conservation checks (the
        # true live counts ride along: they size the final-stream
        # re-compaction below)
        by_dev = {}
        for idx, (di, _c, d, nl, _a) in enumerate(parts):
            by_dev.setdefault(di, []).append((idx, d, nl))
        bad = set()
        live_by_idx = {}
        for di, items in by_dev.items():
            fetched = np.asarray(jnp.stack(
                [jnp.stack((d, nl)) for _, d, nl in items]))
            for (idx, _, _), (dv, nlv) in zip(items, fetched):
                live_by_idx[idx] = int(nlv)
                if int(dv) != 0:
                    bad.add(idx)
        _t2 = _time.perf_counter()
        _log.debug("[timing] grange hists: dispatch %.3f s, "
                   "sync(upload+compute) %.3f s", _t1 - _t0, _t2 - _t1)

        # good chunks: concatenate code streams per device, ONE bincount
        hist = np.zeros(G * H + 1, np.int64)
        by_codes = {}
        live_total = 0
        for idx, (di, cod, _d, _nl, _a) in enumerate(parts):
            if idx not in bad:
                by_codes.setdefault(di, []).append(cod)
                live_total += live_by_idx[idx]

        def _recompact(cc):
            """The per-chunk streams are sized by a conservative 4*P
            estimate; the measured live count is typically far smaller
            (CLI samples: ~0.03 true density vs the 0.5 stop), and the
            histogram pays ~9 ns/element on the padding. One extra
            butterfly chain at the TRUE density collapses it; a single
            scalar verifies (overflow -> keep the original stream)."""
            n = int(cc.shape[0])
            if (n < _RECOMPACT_MIN or live_total * 8 >= n
                    or not (self._use_pallas or _CODES_INTERPRET)):
                return cc
            d_true = max(live_total / n, 1e-6)
            # the chain sizes window capacities FROM the assumed density,
            # so safety = overstating it (understating starves the
            # windows and overflows); quantized -> bounded compiles
            dq = min(0.25, 2.0 ** np.ceil(np.log2(d_true)) * 2.0)
            cc2 = _compact_codes(cc, dq, interpret=_CODES_INTERPRET)
            n2 = int(np.asarray(jnp.sum(
                (cc2 != SENT).astype(jnp.int32))))
            return cc2 if n2 == live_total else cc
        # NOTE: the device mask covers GRID counts only — spill and heavy
        # side channels are the caller's to account for (device_exec ORs
        # spill-hit genomes in; heavy DBs don't take this path)
        if (mask_fn is not None and not bad and len(by_codes) <= 1
                and gidx.n_heavy == 0 and self._span is None):
            if not by_codes:
                return np.zeros(gidx.n_genomes, bool)
            (_di, cods), = by_codes.items()
            cc = jnp.concatenate(cods) if len(cods) > 1 else cods[0]
            cc = _recompact(cc)
            h_dev = hist_from_codes(cc, n_genomes=G)
            mask = np.asarray(mask_fn(h_dev[:G * H]))
            _log.debug("[timing] grange hists: device-mask path %.3f s",
                       _time.perf_counter() - _t2)
            return mask
        cap0 = (_HIST_RUNS_CAP if G * H + 2 > _HIST_RUNS_CAP else None)
        for di, cods in by_codes.items():
            cc = jnp.concatenate(cods) if len(cods) > 1 else cods[0]
            if len(by_codes) == 1:
                cc = _recompact(cc)
            if cap0 is not None:
                h, runs = hist_from_codes(cc, n_genomes=G, runs_cap=cap0)
                if int(np.asarray(runs)) > min(G * H + 2, cap0,
                                               int(cc.shape[0])):
                    h = hist_from_codes(cc, n_genomes=G)   # rare redo
            else:
                h = hist_from_codes(cc, n_genomes=G)
            hist += np.asarray(h).astype(np.int64)
        for idx in bad:
            # compaction or bucket-capacity overflow (astronomically
            # rare): lossless redo at 4x the sample capacity
            di, _c, _d, _nl, (ci, smp, base) = parts[idx]
            ihi, ilo, gidg = self._chunk_dev(ci)
            h = _chunk_hist_lossless(
                ihi, ilo, gidg, *smp, base, width=gidx.width,
                B=gidx.B, CS=4 * CS, n_genomes=G,
                use_pallas=self._use_pallas)
            hist += np.asarray(h).astype(np.int64)
        out = self._fold_heavy(hist)

        # spilled (over-capacity) slots: host probe of the tiny overflow
        # (accounted once across processes in multi-host mode)
        if gidx.spill_kmers.size and self._owns_sides():
            out += self._spill_hist(*_tbl())
        _log.debug("[timing] grange hists: hist fetch+fold %.3f s",
                   _time.perf_counter() - _t2)
        return out


def merge_process_hists(partial: np.ndarray) -> np.ndarray:
    """Sum per-process partial grange histograms across jax.distributed
    processes (the DCN histogram merge of BASELINE.md's pod-scale row).

    Histograms are [G, 64] i64 — ~50 MB at GTDB scale — so a host-level
    allgather-and-sum is the right tool: the payload is tiny next to the
    index shards and needs no device round trip. Outside a distributed
    session (process_count == 1) this is the identity."""
    import jax
    if jax.process_count() == 1:
        return partial
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(
        np.ascontiguousarray(partial.astype(np.int64)))
    return np.asarray(gathered).sum(axis=0)
