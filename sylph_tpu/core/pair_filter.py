"""(k-mer, fingerprint) pair membership for PCR-duplicate removal.

Two implementations behind one ``check_insert(km, pair) -> bool`` interface
("was it already present? insert if not"):

  - ExactPairSet: a plain set — the reference's FxHashSet path, selected
    for ``--fpr 0`` (sylph src/sketch.rs:830-838).
  - ScalableBloomPairSet: a memory-bounded scalable blocked-bloom filter —
    the reference's ScalableCuckooFilter role for ``--fpr > 0``
    (src/sketch.rs:796-804, 840-846). Levels double in capacity starting
    at 2^23 keys; level i runs at fpr/2^(i+1) so the whole chain's false
    positive probability is bounded by fpr. Each key touches one 512-bit
    cache-line block per level.

The bloom layout is a deterministic function of (key, level-position) and
is mirrored BIT-FOR-BIT by native/sketchcore.c (bloom_check_insert), so the
pure-Python fallback makes identical dedup decisions (tests enforce).
"""

import math

import numpy as np

_M64 = (1 << 64) - 1
_PHI = 0x9E3779B97F4A7C15
_SALT2 = 0xD1B54A32D192ED03
_SALT3 = 0x2545F4914F6CDD1D
_CAP0 = 1 << 23
_MAX_LEVELS = 24


def mix64(x: int) -> int:
    """murmur3 fmix64 (native sketchcore.c mix64)."""
    x &= _M64
    x ^= x >> 33
    x = (x * 0xFF51AFD7ED558CCD) & _M64
    x ^= x >> 33
    x = (x * 0xC4CEB9FE1A85EC53) & _M64
    x ^= x >> 33
    return x


class ExactPairSet:
    __slots__ = ("_s",)

    def __init__(self):
        self._s = set()

    def check_insert(self, km: int, pair: int) -> bool:
        key = (km, pair)
        if key in self._s:
            return True
        self._s.add(key)
        return False


class _Level:
    __slots__ = ("words", "n_blocks", "k", "cap", "n")

    def __init__(self, cap: int, fpr_i: float):
        k, p = 1, 0.5
        while p > fpr_i and k < 21:
            k += 1
            p *= 0.5
        self.k = k
        bits = cap * k / math.log(2.0)
        self.n_blocks = int(bits / 512.0) + 1
        self.words = np.zeros(self.n_blocks * 8, np.uint64)
        self.cap = cap
        self.n = 0

    def test(self, li: int, h: int, insert: bool) -> bool:
        h1 = mix64((h + 2 * li + 1) & _M64)
        block = (h1 * self.n_blocks) >> 64
        h2 = mix64(h1 ^ _PHI)
        h3 = mix64(h2 ^ _SALT2)
        h4 = mix64(h3 ^ _SALT3)
        words = self.words
        all_set = True
        for j in range(self.k):
            hw = h2 if j < 7 else (h3 if j < 14 else h4)
            pos = (hw >> (9 * (j % 7))) & 511
            widx = block * 8 + (pos >> 6)
            bit = np.uint64(1 << (pos & 63))
            if not (words[widx] & bit):
                all_set = False
                if insert:
                    words[widx] |= bit
                else:
                    return False
        return all_set


class ScalableBloomPairSet:
    """Memory-bounded approximate pair set; total FP probability <= fpr."""

    __slots__ = ("fpr", "levels")

    def __init__(self, fpr: float):
        self.fpr = fpr
        self.levels = []
        self._add_level()

    def _add_level(self):
        i = len(self.levels)
        self.levels.append(_Level(_CAP0 << i, self.fpr * 0.5 ** (i + 1)))

    def check_insert(self, km: int, pair: int) -> bool:
        h = mix64(km) ^ mix64((pair * _PHI) & _M64)
        for li, lv in enumerate(self.levels):
            if lv.test(li, h, False):
                return True
        last = self.levels[-1]
        if last.n >= last.cap and len(self.levels) < _MAX_LEVELS:
            self._add_level()
            last = self.levels[-1]
        last.test(len(self.levels) - 1, h, True)
        last.n += 1
        return False

    @property
    def n_bytes(self) -> int:
        return sum(lv.words.nbytes for lv in self.levels)


def make_pair_filter(fpr: float):
    return ScalableBloomPairSet(fpr) if fpr > 0.0 else ExactPairSet()
