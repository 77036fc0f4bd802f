"""Device containment: gather-free sort-merge join of index vs sample.

The reference probes each genome k-mer into a per-sample FxHashMap
(sylph src/contain.rs:624-652). Random-access probes (binary search,
hash tables) cost ~8ns/element on TPU — gathers don't vectorize — so the
TPU-native formulation is a merge join built ONLY from the ops the hardware
is fast at: one lexicographic sort, neighbor compares, segmented scans
(associative_scan), and one segment-sum:

  1. concatenate (index k-mers, gid payload) with (sample hash occurrences)
  2. sort by 64-bit hash value (uint32 pairs, num_keys=2)
  3. per equal-value run, count sample occurrences with a forward+reverse
     segmented scan -> every index element learns its sample multiplicity
  4. one segment-sum scatters (genome, multiplicity) into [G, H] histograms

Every statistic downstream is a function of the histogram (the multiset of
multiplicities), matching the host engine. Sentinel entries (u64::MAX) from
fixed-capacity compaction sort to the end and match nothing.
"""


from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import u64

SENTINEL = (np.uint32(0xFFFFFFFF), np.uint32(0xFFFFFFFF))
_FLAG_BIT = np.uint32(1 << 31)
_FORCE_SORT_BINCOUNT = False   # tests flip this to exercise the sort path


def compact_rows(hhi: jnp.ndarray, hlo: jnp.ndarray, keep: jnp.ndarray,
                 row: int, cap: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-capacity compaction of surviving hashes, gather/scatter-free.

    Reshapes the window stream into rows of `row` entries, masks dropped
    windows to u64::MAX, row-sorts the (hi, lo) pairs (survivors < u64::MAX/c
    sort to the front), and keeps the first `cap` columns. Static-shape
    replacement for Vec::push: a row overflowing `cap` drops the excess
    (callers size cap ~4x the FracMinHash expectation row/c).

    Returns (hi, lo) of shape [ceil(n/row), cap], sentinel-padded.
    """
    flat_hi = hhi.reshape(-1)
    flat_lo = hlo.reshape(-1)
    flat_keep = keep.reshape(-1)
    n = flat_hi.shape[0]
    rows = -(-n // row)
    pad = rows * row - n
    if pad:
        flat_hi = jnp.pad(flat_hi, (0, pad))
        flat_lo = jnp.pad(flat_lo, (0, pad))
        flat_keep = jnp.pad(flat_keep, (0, pad))
    mhi = jnp.where(flat_keep, flat_hi, SENTINEL[0]).reshape(rows, row)
    mlo = jnp.where(flat_keep, flat_lo, SENTINEL[1]).reshape(rows, row)
    shi, slo = jax.lax.sort((mhi, mlo), dimension=1, num_keys=2)
    return shi[:, :cap], slo[:, :cap]


def _run_totals(occ: jnp.ndarray, prev_ne: jnp.ndarray,
                next_ne: jnp.ndarray) -> jnp.ndarray:
    """Sum of `occ` within each equal-value run, broadcast to every element.

    Built from native prefix ops only (cumsum + cummax + reverse cummin):
    with z = cumsum(occ), the run total at i is z[run_end] - z[run_start-1];
    the boundary values propagate via monotone cummax/cummin — cheaper to
    compile and run than a custom segmented associative_scan.
    """
    z = jnp.cumsum(occ.astype(jnp.int32))   # total occurrences < 2^31
    zprev = z - occ
    big = jnp.int32(2**31 - 1)
    start_z = jax.lax.cummax(jnp.where(prev_ne, zprev, -1))
    end_z = jax.lax.cummin(jnp.where(next_ne, z, big), reverse=True)
    return end_z - start_z


def merge_join_hist(idx_hi, idx_lo, gids, smp_hi, smp_lo, *,
                    n_genomes: int, n_buckets: int) -> jnp.ndarray:
    """Per-genome multiplicity histograms [G, H] via one sort + scans.

    idx_hi/idx_lo/gids: [M] genome index (padding rows: gid >= n_genomes).
    smp_hi/smp_lo: [T] sample hash occurrence stream (sentinel padding ok;
    duplicates encode multiplicity, the device analog of kmer_counts).

    hist[g, j] = #genome-g sketch k-mers whose sample multiplicity is j
    (j clamped to H-1; j=0 = not contained). Matches the reference probe
    loop's covs multiset (src/contain.rs:632-652) exactly.
    """
    M = idx_hi.shape[0]
    G, H = n_genomes, n_buckets
    vhi = jnp.concatenate([idx_hi, smp_hi.reshape(-1)])
    vlo = jnp.concatenate([idx_lo, smp_lo.reshape(-1)])
    # payload: bit31 = is_sample, low bits = genome id (index rows only)
    pay = jnp.concatenate([
        gids.astype(jnp.uint32),
        jnp.full(smp_hi.size, _FLAG_BIT, jnp.uint32)])
    shi, slo, spay = jax.lax.sort((vhi, vlo, pay), num_keys=2)

    is_smp = (spay & _FLAG_BIT) != 0
    sgid = (spay & ~_FLAG_BIT).astype(jnp.int32)

    prev_ne = jnp.concatenate([
        jnp.ones(1, bool),
        (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1])])
    next_ne = jnp.concatenate([prev_ne[1:], jnp.ones(1, bool)])

    count = _run_totals(is_smp.astype(jnp.int32), prev_ne, next_ne)

    bucket = jnp.minimum(count, H - 1)
    valid = (~is_smp) & (sgid < G)
    seg = jnp.where(valid, sgid * H + bucket, G * H)
    flat = _bincount(seg, G * H + 1)
    return flat[:G * H].reshape(G, H)


def _bincount(seg: jnp.ndarray, n_bins: int, runs_cap=None):
    """Histogram of int32 bin ids, scatter-minimized for TPU.

    Scatters cost ~8ns/element, so instead of one segment_sum over the
    whole stream: sort the ids, turn each equal run into ONE (bin, total)
    pair at its run boundary, sort the boundary pairs to the front
    (lossless — at most n_bins+1 boundaries exist), and scatter only that
    prefix. Two sorts + scans beat one full-stream scatter ~2x at TPU
    cost ratios. CPU (and small inputs) keep the plain segment_sum.

    ``runs_cap`` (static) bounds the boundary scatter to
    min(n_bins+1, runs_cap, n) — at database scale (n_bins ~ 10^7) the
    full-width scatter dominates, while the number of DISTINCT bins
    present is typically tiny. With a cap the return is
    (hist, n_runs): exact iff n_runs <= the applied bound (callers must
    verify and fall back to the uncapped form otherwise).
    """
    n = seg.size
    use_sort = _FORCE_SORT_BINCOUNT or (
        jax.default_backend() != "cpu" and n >= (1 << 20)
        and n_bins + 1 < n)
    if not use_sort:
        out = jax.ops.segment_sum(
            jnp.ones((n,), jnp.int32), seg, num_segments=n_bins)
        if runs_cap is None:
            return out
        return out, jnp.zeros((), jnp.int32)   # exact; 0 <= any cap
    s = jax.lax.sort(seg.astype(jnp.int32))
    prev_ne = jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]])
    next_ne = jnp.concatenate([prev_ne[1:], jnp.ones(1, bool)])
    tot = _run_totals(jnp.ones((n,), jnp.int32), prev_ne, next_ne)
    bkey = jnp.where(prev_ne, s, jnp.int32(2**31 - 1))
    skey, stot = jax.lax.sort((bkey, tot), num_keys=1)
    m = n_bins + 1
    if runs_cap is not None:
        m = min(m, int(runs_cap), n)
    tgt = jnp.where(skey[:m] == jnp.int32(2**31 - 1), n_bins, skey[:m])
    out = jnp.zeros((n_bins + 1,), jnp.int32)
    out = out.at[tgt].set(stot[:m], mode="drop")
    if runs_cap is None:
        return out[:n_bins]
    return out[:n_bins], jnp.sum(prev_ne.astype(jnp.int32))


def merge_join_counts(idx_hi, idx_lo, smp_hi, smp_lo,
                      smp_weights=None) -> jnp.ndarray:
    """Exact sample multiplicity for each index k-mer, in index order.

    Same merge join as merge_join_hist but the payload carries the original
    index position, and the result is scattered back to [M] — the device
    replacement for the reference's per-genome hashmap probe when callers
    need per-k-mer counts (bit-parity CLI path). smp_weights (i32, optional)
    lets the sample side be a deduplicated (kmer, count) table instead of an
    occurrence stream.
    """
    M = idx_hi.shape[0]
    smp_hi = smp_hi.reshape(-1)
    smp_lo = smp_lo.reshape(-1)
    if smp_weights is None:
        smp_weights = jnp.ones(smp_hi.shape, jnp.int32)
    vhi = jnp.concatenate([idx_hi, smp_hi])
    vlo = jnp.concatenate([idx_lo, smp_lo])
    pay = jnp.concatenate([
        jnp.arange(M, dtype=jnp.uint32),
        jnp.full(smp_hi.size, _FLAG_BIT, jnp.uint32)])
    wts = jnp.concatenate([jnp.zeros(M, jnp.int32),
                           smp_weights.astype(jnp.int32)])
    shi, slo, spay, socc = jax.lax.sort((vhi, vlo, pay, wts), num_keys=2)

    is_smp = (spay & _FLAG_BIT) != 0
    spos = (spay & ~_FLAG_BIT).astype(jnp.int32)

    prev_ne = jnp.concatenate([
        jnp.ones(1, bool),
        (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1])])
    next_ne = jnp.concatenate([prev_ne[1:], jnp.ones(1, bool)])
    count = _run_totals(socc, prev_ne, next_ne)

    target = jnp.where(is_smp, M, spos)
    out = jnp.zeros((M + 1,), jnp.int32).at[target].set(count, mode="drop")
    return out[:M]


def sort_pairs(hi: jnp.ndarray, lo: jnp.ndarray):
    """Lexicographic sort of (hi, lo) u64 pairs (1-D)."""
    return jax.lax.sort((hi, lo), num_keys=2)


def probe_counts(table_hi, table_lo, qhi, qlo) -> jnp.ndarray:
    """Reference probe: batched binary search into a sorted sample table.

    Multiplicity = upper_bound - lower_bound. O(log T) gathers per query —
    kept as the small-scale/CPU oracle; the production path is
    merge_join_hist (gathers are ~8ns/element on TPU).
    """
    def search(upper):
        T = int(table_hi.shape[0])
        pos = jnp.zeros(qhi.shape, jnp.int32)
        nbits = max(1, (T + 1).bit_length())
        for t in reversed(range(nbits)):
            step = 1 << t
            mid = pos + step
            ok = mid <= T
            gather = jnp.minimum(mid - 1, T - 1)
            vhi = jnp.take(table_hi, gather)
            vlo = jnp.take(table_lo, gather)
            if upper:
                go = u64.le((vhi, vlo), (qhi, qlo))
            else:
                go = u64.lt((vhi, vlo), (qhi, qlo))
            pos = jnp.where(ok & go, mid, pos)
        return pos

    return (search(True) - search(False)).astype(jnp.int32)
