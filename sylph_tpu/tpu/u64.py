"""uint64 arithmetic as (hi, lo) uint32 pairs, for TPU.

TPU vector units operate on 32-bit lanes; XLA emulates 64-bit integers
slowly (and Pallas not at all). All 64-bit quantities in the device path —
k-mers, hashes, FracMinHash thresholds — are therefore struct-of-arrays
(hi, lo) uint32 pairs. Ops below are branch-free and jit/pallas-safe.

The hash is the reference's *bugged* Wang 64-bit mix (sylph
src/seeding.rs:4-15 — first step ``~(key + (key << 21))`` instead of Wang's
``(~key) + (key << 21)``), kept bit-exact; see sylph_tpu.kmer.hashing for
the scalar oracle.
"""

from typing import Tuple

import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
_32 = np.uint32(32)

Pair = Tuple[jnp.ndarray, jnp.ndarray]  # (hi, lo), both uint32


def from_u64_np(arr: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Split a numpy uint64 array into (hi, lo) uint32 host arrays."""
    arr = np.asarray(arr, dtype=np.uint64)
    hi = (arr >> np.uint64(32)).astype(np.uint32)
    lo = arr.astype(np.uint32)
    return hi, lo


def to_u64_np(hi, lo) -> np.ndarray:
    """Recombine (hi, lo) uint32 arrays into a numpy uint64 array."""
    return ((np.asarray(hi, np.uint64) << np.uint64(32))
            | np.asarray(lo, np.uint64))


def const(value: int) -> Tuple[np.uint32, np.uint32]:
    """A 64-bit immediate as (hi, lo) uint32 scalars."""
    return np.uint32((value >> 32) & 0xFFFFFFFF), np.uint32(value & 0xFFFFFFFF)


def add(a: Pair, b: Pair) -> Pair:
    ahi, alo = a
    bhi, blo = b
    lo = alo + blo
    carry = (lo < alo).astype(U32)
    return ahi + bhi + carry, lo


def xor(a: Pair, b: Pair) -> Pair:
    return a[0] ^ b[0], a[1] ^ b[1]


def bit_not(a: Pair) -> Pair:
    return ~a[0], ~a[1]


def shl(a: Pair, s: int) -> Pair:
    """Left shift by a static amount 0 <= s < 64."""
    hi, lo = a
    if s == 0:
        return hi, lo
    s = int(s)
    if s < 32:
        sh = np.uint32(s)
        return (hi << sh) | (lo >> np.uint32(32 - s)), lo << sh
    if s == 32:
        return lo, jnp.zeros_like(lo)
    return lo << np.uint32(s - 32), jnp.zeros_like(lo)


def shr(a: Pair, s: int) -> Pair:
    """Logical right shift by a static amount 0 <= s < 64."""
    hi, lo = a
    if s == 0:
        return hi, lo
    s = int(s)
    if s < 32:
        sh = np.uint32(s)
        return hi >> sh, (lo >> sh) | (hi << np.uint32(32 - s))
    if s == 32:
        return jnp.zeros_like(hi), hi
    return jnp.zeros_like(hi), hi >> np.uint32(s - 32)


def lt(a: Pair, b: Pair) -> jnp.ndarray:
    """a < b, unsigned 64-bit."""
    return (a[0] < b[0]) | ((a[0] == b[0]) & (a[1] < b[1]))


def eq(a: Pair, b: Pair) -> jnp.ndarray:
    return (a[0] == b[0]) & (a[1] == b[1])


def le(a: Pair, b: Pair) -> jnp.ndarray:
    return (a[0] < b[0]) | ((a[0] == b[0]) & (a[1] <= b[1]))


def select(pred: jnp.ndarray, a: Pair, b: Pair) -> Pair:
    return jnp.where(pred, a[0], b[0]), jnp.where(pred, a[1], b[1])


def mm_hash64(key: Pair) -> Pair:
    """The bugged Wang 64-bit mix on uint32 pairs (sylph src/seeding.rs:4-15).

    Multiplications by 265 and 21 are expanded into shift-adds exactly as the
    reference writes them; addition mod 2^64 is associative so the pairwise
    carry-adds reproduce the scalar result bit-for-bit.
    """
    key = bit_not(add(key, shl(key, 21)))           # ~(key + (key << 21))
    key = xor(key, shr(key, 24))
    key = add(add(key, shl(key, 3)), shl(key, 8))   # key * 265
    key = xor(key, shr(key, 14))
    key = add(add(key, shl(key, 2)), shl(key, 4))   # key * 21
    key = xor(key, shr(key, 28))
    key = add(key, shl(key, 31))
    return key
