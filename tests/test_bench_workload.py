"""Benchmark workload construction: bugged-hash inversion and index-hit
read planting (bench.py helpers). CPU-only, tiny shapes."""

import numpy as np

import jax
import jax.numpy as jnp

from bench import _plant_reads, _rc31_np, _synth_sorted_index, _usable_plants
from sylph_tpu.kmer.hashing import (inv_mm_hash64_np, mm_hash64_np,
                                    mm_hash64_py)
from sylph_tpu.kmer.seeding import fmh_seeds_np
from sylph_tpu.tpu.grange import build_grange_index


def test_inv_mm_hash64_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2**64, size=50000, dtype=np.uint64)
    np.testing.assert_array_equal(inv_mm_hash64_np(mm_hash64_np(x)), x)
    np.testing.assert_array_equal(mm_hash64_np(inv_mm_hash64_np(x)), x)
    for v in (0, 1, 2**63, 1234567890123456789):
        assert int(inv_mm_hash64_np(
            np.array([mm_hash64_py(v)], np.uint64))[0]) == v


def _tiny_gidx(G=60, KPG=256, seed=3):
    kmers, gids = _synth_sorted_index(G * KPG, G, 200, seed=seed)
    return build_grange_index(kmers, gids, G, chunk_slots=4096,
                              target_mean=16, presorted=True)


def test_usable_plants_are_canonical_index_members():
    gidx = _tiny_gidx()
    k, g = _usable_plants(gidx, per_chunk=4096)
    assert k.size > 0
    v = inv_mm_hash64_np(k)
    assert (v < np.uint64(1) << np.uint64(62)).all()
    assert (v <= _rc31_np(v)).all()
    np.testing.assert_array_equal(mm_hash64_np(v), k)  # hash(plant) == entry


def test_planted_reads_hit_index():
    """Every planted read's FracMinHash sketch contains an index k-mer
    (the bench's realistic-match workload is actually matching)."""
    gidx = _tiny_gidx()
    bases8 = jax.random.randint(jax.random.PRNGKey(1), (1, 64, 256), 0, 4,
                                dtype=jnp.uint8)
    planted, n_ab, n_up = _plant_reads(jax, jnp, bases8, gidx)
    assert n_up > 0
    iset = set()
    for hi, lo in zip(gidx.chunk_hi, gidx.chunk_lo):
        h = hi.reshape(-1)
        m = h != np.uint32(0xFFFFFFFF)
        iset.update(((h[m].astype(np.uint64) << np.uint64(32))
                     | lo.reshape(-1)[m].astype(np.uint64)).tolist())
    arr = np.asarray(planted[0])
    for r in range(arr.shape[0]):
        seeds = np.asarray(fmh_seeds_np(arr[r], c=200, k=31), np.uint64)
        assert any(int(s) in iset for s in seeds), f"read {r} missed"
