"""Device FracMinHash seeding over packed read batches.

Behavioral spec: sylph's scalar seeding loop (src/seeding.rs:86-146) — for
every k-mer window take ``min(forward, revcomp)`` by 64-bit compare, hash
with the bugged Wang mix, keep iff ``hash < u64::MAX / c``. The reference
rolls one window at a time (AVX2: 4 lanes); here ALL windows of a whole read
batch are materialized with a log-doubling composition over uint32 halves,
which XLA fuses into a handful of VPU passes — the TPU-native shape of the
same computation.

Layout: reads are padded to a static length L and stacked [N, L] as 2-bit
codes (uint32, values 0..3); a lengths vector masks windows that cross a
read's end (pad windows never pollute output — same guarantee as the
reference's per-read loop bounds).

k-mers are <= 62 bits and split (hi, lo): lo = last 16 bases of the window
(forward) / first 16 bases (revcomp), hi = the rest, so every intermediate
fits uint32 (2m <= 32 bits for m <= 16).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import u64

U32 = jnp.uint32


def _pow2_parts(m: int):
    """m as descending powers of two (31 -> [16, 8, 4, 2, 1])."""
    parts, p = [], 1
    while p * 2 <= m:
        p *= 2
    rem = m
    while rem:
        if rem >= p:
            parts.append(p)
            rem -= p
        p //= 2
    return parts


def _build_mers(bases: jnp.ndarray, want):
    """u32 m-mer tables for each m in `want` (all m <= 16).

    bases: [..., L] uint32 in 0..3. Returns {m: (fwd_m, rc_m)} where
    fwd_m[..., i] = sum_{j<m} b[i+j] << 2(m-1-j)   (big-endian window)
    rc_m[..., i]  = sum_{j<m} (3-b[i+j]) << 2j     (reverse complement)
    both of length L-m+1 along the last axis.

    Built by log-doubling: F_{a+b}[i] = F_a[i] << 2b | F_b[i+a],
    R_{a+b}[i] = R_a[i] | R_b[i+a] << 2a — O(log k) whole-array passes.
    """
    L = bases.shape[-1]
    pf = {1: bases}
    pr = {1: np.uint32(3) - bases}
    need_pows = set()
    for m in want:
        need_pows.update(_pow2_parts(m))
    top = max(need_pows) if need_pows else 1
    p = 1
    while p * 2 <= top:
        f, r = pf[p], pr[p]
        n = f.shape[-1] - p
        t = (f[..., :n] << np.uint32(2 * p)) | f[..., p:]
        s = r[..., :n] | (r[..., p:] << np.uint32(2 * p))
        pf[2 * p] = t
        pr[2 * p] = s
        p *= 2

    out = {}
    for m in sorted(set(want)):
        parts = _pow2_parts(m)
        size = parts[0]
        accf, accr = pf[size], pr[size]
        for q in parts[1:]:
            n = L - size - q + 1
            accf = ((accf[..., :n] << np.uint32(2 * q))
                    | pf[q][..., size:size + n])
            accr = (accr[..., :n]
                    | (pr[q][..., size:size + n] << np.uint32(2 * size)))
            size += q
        out[m] = (accf, accr)
    return out


def canonical_kmers(bases: jnp.ndarray, k: int) -> Tuple[jnp.ndarray,
                                                         jnp.ndarray]:
    """Canonical k-mers for every window of a [..., L] 2-bit base batch.

    Returns (hi, lo) uint32 arrays of shape [..., L-k+1]. Canonical =
    min(forward, revcomp) by 64-bit compare, forward on ties — matching
    sylph src/seeding.rs:134-139.
    """
    if not 1 <= k <= 31:
        raise ValueError(f"k must be in 1..31, got {k}")
    L = bases.shape[-1]
    if L < k:
        raise ValueError(f"padded read length {L} < k {k}")
    W = L - k + 1
    if k <= 16:
        mers = _build_mers(bases, [k])
        f, r = mers[k]
        fhi = jnp.zeros_like(f[..., :W])
        flo = f[..., :W]
        rhi = jnp.zeros_like(fhi)
        rlo = r[..., :W]
    else:
        hi_len = k - 16
        mers = _build_mers(bases, [16, hi_len])
        f16, r16 = mers[16]
        fh, rh = mers[hi_len]
        # forward = fwd_{k-16}[i] << 32 | fwd_16[i + k - 16]
        fhi = fh[..., :W]
        flo = f16[..., hi_len:hi_len + W]
        # revcomp = rc_{k-16}[i + 16] << 32 | rc_16[i]
        rhi = rh[..., 16:16 + W]
        rlo = r16[..., :W]
    is_fwd = u64.lt((fhi, flo), (rhi, rlo))
    return u64.select(is_fwd, (fhi, flo), (rhi, rlo))


@functools.partial(jax.jit, static_argnames=("c", "k"))
def seed_hashes(bases: jnp.ndarray, lengths: jnp.ndarray, *, c: int,
                k: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """FracMinHash-surviving hash candidates for a read batch.

    bases: [N, L] uint32 2-bit codes (pad value arbitrary in 0..3).
    lengths: [N] int32 true read lengths.
    Returns (hash_hi, hash_lo, keep) each [N, L-k+1]; keep is True iff the
    window lies inside its read AND the hash clears ``u64::MAX / c``
    (src/seeding.rs:108,140-144).
    """
    hi, lo = canonical_kmers(bases, k)
    hhi, hlo = u64.mm_hash64((hi, lo))
    thr = u64.const(((1 << 64) - 1) // c)
    keep = u64.lt((hhi, hlo), thr)
    W = hi.shape[-1]
    pos = jax.lax.broadcasted_iota(jnp.int32, hi.shape, hi.ndim - 1)
    keep &= pos + k <= lengths[:, None]
    return hhi, hlo, keep
