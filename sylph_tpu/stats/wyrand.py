"""wyrand PRNG, bit-compatible with fastrand 2.1.1.

The reference seeds the thread-local fastrand RNG with 7 at the top of every
bootstrap (sylph src/contain.rs:854) and draws indices via
``fastrand::usize(..len)``. fastrand 2.x state: wyrand —

    s += 0xa0761d6478bd642f;  t = (u128)s * (s ^ 0xe7037ed1a0b428db);
    out = (t as u64) ^ (t >> 64)

and bounded draws use Lemire's multiply-shift with rejection. Because the
state advances by a fixed additive constant, the whole index stream is
computable in one vectorized pass (``wyrand_indices``): state_i = seed + i*A.
Rejections (probability < n/2^64) fall back to the scalar walk.
"""

from typing import List

import numpy as np

_A = 0xA0761D6478BD642F
_B = 0xE7037ED1A0B428DB
_M64 = (1 << 64) - 1


class WyRand:
    """Scalar oracle (pure Python ints)."""

    def __init__(self, seed: int):
        self.state = seed & _M64

    def gen_u64(self) -> int:
        s = (self.state + _A) & _M64
        self.state = s
        t = s * (s ^ _B)
        return ((t & _M64) ^ (t >> 64)) & _M64

    def gen_mod_u64(self, n: int) -> int:
        """Lemire bounded draw in [0, n) (fastrand gen_mod_u64)."""
        r = self.gen_u64()
        hi, lo = divmod(r * n, 1 << 64)
        if lo < n:
            t = ((1 << 64) - n) % n
            while lo < t:
                r = self.gen_u64()
                hi, lo = divmod(r * n, 1 << 64)
        return hi

    def usize(self, n: int) -> int:
        """fastrand::usize(..n)."""
        return self.gen_mod_u64(n)


def _mul_hi_lo_u64(a: np.ndarray, n: int):
    """(high, low) 64-bit halves of a * n for uint64 array a, scalar n."""
    u = np.uint64
    m32 = u(0xFFFFFFFF)
    a0 = a & m32
    a1 = a >> u(32)
    b0 = u(n & 0xFFFFFFFF)
    b1 = u(n >> 32)
    t = a0 * b0
    w0 = t & m32
    t = a1 * b0 + (t >> u(32))
    w1 = t & m32
    w2 = t >> u(32)
    t = a0 * b1 + w1
    hi = a1 * b1 + w2 + (t >> u(32))
    lo = ((t & m32) << u(32)) | w0
    return hi, lo


def _gen_u64_vec(seed: int, start: int, count: int) -> np.ndarray:
    """Outputs of gen_u64 for state positions start+1 .. start+count."""
    u = np.uint64
    idx = np.arange(1, count + 1, dtype=np.uint64) + u(start)
    hiA, loA = _mul_hi_lo_u64(idx, _A)  # idx * A; we need low 64 bits only
    s = (u(seed) + loA).astype(np.uint64)
    sx = s ^ u(_B)
    # t = (u128)s * sx ; out = lo ^ hi
    m32 = u(0xFFFFFFFF)
    a0 = s & m32
    a1 = s >> u(32)
    b0 = sx & m32
    b1 = sx >> u(32)
    t = a0 * b0
    w0 = t & m32
    t = a1 * b0 + (t >> u(32))
    w1 = t & m32
    w2 = t >> u(32)
    t = a0 * b1 + w1
    hi = a1 * b1 + w2 + (t >> u(32))
    lo = ((t & m32) << u(32)) | w0
    return lo ^ hi


import threading as _threading

_U64_CACHE = {}              # seed -> raw gen_u64 output prefix
_U64_CACHE_MAX = 1 << 24     # cap (128 MB of u64) for huge genomes
_CACHE_LOCK = _threading.Lock()   # stats passes run on a thread pool


def _gen_u64_cached(seed: int, count: int) -> np.ndarray:
    """Raw wyrand stream prefix; cached per seed. The bootstrap reseeds
    wyrand(7) for EVERY (genome, sample) pair (src/contain.rs:854), so the
    u64 stream is identical across all pairs — only the Lemire reduction
    (mod n) differs. Regenerating it was ~90% of each CI's cost at
    database scale (100 iters x |sketch| u64 draws through emulated
    128-bit multiplies)."""
    if count > _U64_CACHE_MAX:
        return _gen_u64_vec(seed, 0, count)
    with _CACHE_LOCK:
        cur = _U64_CACHE.get(seed)
        if cur is None or cur.size < count:
            newlen = min(max(count,
                             2 * (cur.size if cur is not None else 0),
                             1 << 16), _U64_CACHE_MAX)
            _U64_CACHE[seed] = _gen_u64_vec(seed, 0, newlen)
        return _U64_CACHE[seed][:count]


def _mul_hi_lo_u64_small(a: np.ndarray, n: int):
    """(high, low) halves of a * n when n < 2^32 (half the multiplies;
    a_hi*n + carry < 2^64 because both factors are < 2^32)."""
    u = np.uint64
    m32 = u(0xFFFFFFFF)
    nn = u(n)
    lo0 = (a & m32) * nn
    mid = (a >> u(32)) * nn + (lo0 >> u(32))
    return mid >> u(32), (mid << u(32)) | (lo0 & m32)


_IDX_CACHE = {}              # (seed, count, n) -> reduced index stream
_IDX_CACHE_BUDGET = 256 << 20   # bytes; serving re-runs the same
                                # (sample, genome) pairs every request


def _idx_cache_put(key, val: np.ndarray) -> None:
    with _CACHE_LOCK:
        _IDX_CACHE[key] = val
        total = sum(v.nbytes for v in _IDX_CACHE.values())
        while total > _IDX_CACHE_BUDGET and _IDX_CACHE:
            k0 = next(iter(_IDX_CACHE))      # FIFO eviction
            total -= _IDX_CACHE.pop(k0).nbytes


def wyrand_indices(seed: int, count: int, n: int) -> np.ndarray:
    """The first ``count`` outputs of ``fastrand::usize(..n)`` after
    ``fastrand::seed(seed)``, vectorized. The reduced stream is cached
    per (seed, count, n): the raw u64 prefix is shared across genomes,
    but the Lemire reduction depends on n (= the genome's contained-kmer
    count), and in serving mode identical (sample, genome) pairs recur
    every request."""
    if n <= 0:
        raise ValueError("n must be positive")
    key = (seed, count, n)
    hit = _IDX_CACHE.get(key)
    if hit is not None:
        return hit
    r = _gen_u64_cached(seed, count)
    if n < (1 << 32):
        hi, lo = _mul_hi_lo_u64_small(r, n)
    else:
        hi, lo = _mul_hi_lo_u64(r, n)
    t_rej = ((1 << 64) - n) % n
    rejected = lo < np.uint64(t_rej)
    if rejected.any():
        # rare: replay the exact scalar walk (rejections shift the stream)
        rng = WyRand(seed)
        out = np.fromiter((rng.usize(n) for _ in range(count)),
                          dtype=np.uint64, count=count)
        _idx_cache_put(key, out)
        return out
    out = (hi.astype(np.uint32) if n < (1 << 32) else hi)
    _idx_cache_put(key, out)
    return out
