"""Native dedup fold + spacing scan vs the pure-Python implementations."""

import importlib

import numpy as np
import pytest

TF = "/root/repo/test_files"


@pytest.fixture(scope="module")
def lib_available():
    from sylph_tpu.core import native_core
    if native_core.get_lib() is None:
        pytest.skip("no C toolchain / native lib unavailable")


def _sketch_both(fn, *args, **kwargs):
    """Run a sketch function with native enabled and disabled."""
    import os

    from sylph_tpu.core import sketch_reads
    native = fn(*args, **kwargs)
    os.environ["SYLPH_TPU_NO_NATIVE"] = "1"
    try:
        # reset the cached lib handles so the env var is honored
        from sylph_tpu.core import native_core
        native_core._TRIED = False
        native_core._LIB = None
        python = fn(*args, **kwargs)
    finally:
        del os.environ["SYLPH_TPU_NO_NATIVE"]
        native_core._TRIED = False
        native_core._LIB = None
    return native, python


def _assert_sketch_equal(a, b):
    assert a.paired == b.paired
    assert a.mean_read_length == b.mean_read_length
    da = dict(zip(a.kmers.tolist(), a.counts.tolist()))
    db = dict(zip(b.kmers.tolist(), b.counts.tolist()))
    assert da == db
    # insertion order must match too (serialization order)
    assert a.kmers.tolist() == b.kmers.tolist()


def test_single_end_fold_matches(lib_available):
    from sylph_tpu.core.sketch_reads import sketch_sequences
    a, b = _sketch_both(sketch_sequences,
                        f"{TF}/o157_reads.fastq.gz", 100, 31)
    _assert_sketch_equal(a, b)


def test_paired_fold_matches(lib_available):
    from sylph_tpu.core.sketch_reads import sketch_pair_sequences
    a, b = _sketch_both(sketch_pair_sequences,
                        f"{TF}/k12_R1.fq", f"{TF}/k12_R2.fq", 50, 31)
    _assert_sketch_equal(a, b)


def test_paired_no_dedup_matches(lib_available):
    from sylph_tpu.core.sketch_reads import sketch_pair_sequences
    a, b = _sketch_both(sketch_pair_sequences,
                        f"{TF}/t1.fq", f"{TF}/t2.fq", 2, 21, None, True)
    _assert_sketch_equal(a, b)


def test_spacing_scan_matches(lib_available):
    from sylph_tpu.core.sketch_genomes import sketch_genome

    def run():
        return sketch_genome(200, 31, f"{TF}/e.coli-K12.fasta.gz", 30, True)

    a, b = _sketch_both(run)
    assert a.genome_kmers.tolist() == b.genome_kmers.tolist()
    assert (a.pseudotax_tracked_nonused_kmers.tolist()
            == b.pseudotax_tracked_nonused_kmers.tolist())


def test_fp_kernels_match_numpy(lib_available):
    """C fingerprint kernels vs the numpy oracle across the length gates
    (66/400 single, 33 paired) and random codes."""
    from sylph_tpu.core import sketch_reads as sr
    from sylph_tpu.core.native_core import fp_paired_native, fp_single_native
    from sylph_tpu.io.fastx import ParsedFastx

    rng = np.random.default_rng(11)

    def make_px(lens):
        ends = np.cumsum(np.asarray(lens, np.int64))
        starts = ends - lens
        codes = rng.integers(0, 4, int(ends[-1]), dtype=np.uint8)
        return ParsedFastx(codes, starts, ends)

    lens1 = np.array([65, 66, 150, 400, 401, 32, 33, 80], np.int64)
    lens2 = np.array([70, 40, 150, 32, 300, 33, 32, 80], np.int64)
    px1, px2 = make_px(lens1), make_px(lens2)
    rids = np.arange(lens1.size, dtype=np.int64)

    nat = fp_single_native(px1.codes, px1.starts, px1.lengths, rids)
    ref_fps = np.zeros((rids.size, 4), np.uint64)
    ref_valid = np.zeros(rids.size, np.uint8)
    ok = (lens1 >= 66) & (lens1 <= 400)
    ref = sr._fp_single(px1, rids)
    for i, r in enumerate(rids):
        if int(r) in ref:
            (a, b), (c, d) = ref[int(r)]
            ref_fps[i] = (a, b, c, d)
            ref_valid[i] = 1
    assert nat is not None
    assert np.array_equal(nat[1].astype(bool), ok)
    assert np.array_equal(nat[0], ref_fps)
    assert np.array_equal(nat[1], ref_valid)

    natp = fp_paired_native(px1.codes, px1.starts, px1.lengths,
                            px2.codes, px2.starts, px2.lengths, rids)
    refp = sr._fp_paired(px1, px2, rids)
    ref_fps[:] = 0
    ref_valid[:] = 0
    for i, r in enumerate(rids):
        if int(r) in refp:
            (a, b), (c, d) = refp[int(r)]
            ref_fps[i] = (a, b, c, d)
            ref_valid[i] = 1
    assert natp is not None
    assert np.array_equal(natp[0], ref_fps)
    assert np.array_equal(natp[1], ref_valid)


def test_simd_seed_parity(lib_available):
    """AVX-512 / AVX2 / scalar seeding all bit-match the numpy oracle on
    adversarial read-length mixes (short, ragged, < k, long spills)."""
    import subprocess
    import sys

    code = r"""
import numpy as np
from sylph_tpu.core.native_core import seed_concat_native
from sylph_tpu.kmer.seeding import fmh_seeds_concat_np
rng = np.random.default_rng(5)
for lens in [np.array([150]*1003), rng.integers(20, 400, 4003),
             np.array([10, 31, 38, 39, 150, 151, 5000, 33, 150]*7),
             np.array([100000, 150, 150, 150, 29, 150, 150, 150, 88])]:
    lens = lens.astype(np.int64)
    ends = np.cumsum(lens); starts = ends - lens
    codes = rng.integers(0, 4, int(ends[-1]), dtype=np.uint8)
    for c, k in ((200, 31), (50, 21), (2, 17)):
        r1, h1 = seed_concat_native(codes, starts, ends, c, k)
        r2, h2 = fmh_seeds_concat_np(codes, starts, ends, c, k)
        assert np.array_equal(r1, r2) and np.array_equal(h1, h2), (c, k)
print("OK")
"""
    import os
    for env_extra in ({}, {"SYLPH_NO_AVX512": "1"}):
        env = dict(os.environ, **env_extra)
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=300)
        assert out.returncode == 0, out.stderr
        assert "OK" in out.stdout


def test_simd_positions_parity(lib_available):
    """Striped AVX-512 genome seeding (positions) bit-matches the numpy
    oracle on stripe-boundary-adversarial contig lengths."""
    import os
    import subprocess
    import sys

    code = r"""
import numpy as np
from sylph_tpu.core.native_core import seed_positions_native
from sylph_tpu.kmer.seeding import fmh_seeds_positions_np
rng = np.random.default_rng(7)
def oracle(codes, starts, ends, c, k):
    cs, ps, hs = [], [], []
    for r in range(len(starts)):
        h, p = fmh_seeds_positions_np(codes[starts[r]:ends[r]], c, k)
        cs.append(np.full(h.size, r)); ps.append(p); hs.append(h)
    z = lambda a: np.concatenate(a) if a else np.empty(0)
    return z(cs), z(ps), z(hs)
for lens in [np.array([4096*8+30, 4096*8+31, 4096*8+29, 100, 30, 31,
                       4096*16+500]),
             rng.integers(25, 100_000, 30)]:
    lens = lens.astype(np.int64)
    ends = np.cumsum(lens); starts = ends - lens
    codes = rng.integers(0, 4, int(ends[-1]), dtype=np.uint8)
    for c, k in ((200, 31), (20, 21)):
        got = seed_positions_native(codes, starts, ends, c, k)
        want = oracle(codes, starts, ends, c, k)
        assert all(np.array_equal(a, b) for a, b in zip(got, want)), (c, k)
print("OK")
"""
    for env_extra in ({}, {"SYLPH_NO_AVX512": "1"}):
        env = dict(os.environ, **env_extra)
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=300)
        assert out.returncode == 0, out.stderr
        assert "OK" in out.stdout


def test_radix_sort_kv_matches_stable_argsort():
    from sylph_tpu.core.native_core import get_lib, radix_sort_kv
    if get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(5)
    for n in (0, 1, 255, 65537):
        k = rng.integers(0, 2**64, size=n, dtype=np.uint64)
        v = rng.integers(-2**31, 2**31 - 1, size=n).astype(np.int32)
        k2, v2 = k.copy(), v.copy()
        assert radix_sort_kv(k2, v2, threads=3)
        order = np.argsort(k, kind="stable")
        np.testing.assert_array_equal(k2, k[order])
        np.testing.assert_array_equal(v2, v[order])
    # stability on heavy duplicates
    k = rng.integers(0, 17, size=100000, dtype=np.uint64)
    v = np.arange(100000, dtype=np.int32)
    k2, v2 = k.copy(), v.copy()
    radix_sort_kv(k2, v2, threads=4)
    np.testing.assert_array_equal(v2, v[np.argsort(k, kind="stable")])


def test_sharded_fold_parity():
    """ShardedStreamingFold must reproduce the serial StreamingFold
    bit-for-bit: emit order, counts, ndup, and per-push new_keys —
    including heavy duplication, the zero key, alternating filter_prev,
    and fingerprint collisions."""
    import numpy as np

    from sylph_tpu.core.native_core import (ShardedStreamingFold,
                                            StreamingFold, get_lib)
    if get_lib() is None:
        import pytest
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(42)
    pool = rng.integers(0, 1 << 56, size=40, dtype=np.uint64)
    pool[0] = 0                      # Set128 zero_present edge case
    blocks = []
    for _ in range(40):
        n_segs = int(rng.integers(2, 30))
        kmers, seg_starts, fps, valid, fprev = [], [0], [], [], []
        for s in range(n_segs):
            ln = int(rng.integers(1, 5))
            kmers.append(rng.choice(pool, size=ln))
            seg_starts.append(seg_starts[-1] + ln)
            fps.append(rng.integers(0, 4, size=4, dtype=np.uint64))
            valid.append(int(rng.random() < 0.9))
            fprev.append(int(s % 2 == 1))
        blocks.append((np.concatenate(kmers),
                       np.array(seg_starts[:-1], np.int64),
                       np.stack(fps).reshape(-1),
                       np.array(valid, np.uint8),
                       np.array(fprev, np.uint8)))
    for W in (2, 4):
        a = StreamingFold(False, 4)
        b = ShardedStreamingFold(False, 4, n_shards=W)
        nk_a, nk_b = [], []
        for km, ss, fp, v, fv in blocks:
            a.push(km, ss, fp, v, fv)
            b.push(km, ss, fp, v, fv)
            nk_a.append(a.new_keys())
            nk_b.append(b.new_keys())
        ka, ca, da = a.finish()
        kb, cb, db = b.finish()
        a.close()
        b.close()
        assert (ka == kb).all() and (ca == cb).all() and da == db
        for x, y in zip(nk_a, nk_b):
            assert (x == y).all()


def test_sharded_fold_reserve_and_large():
    """Reserve + growth path: 200k random occurrences through 4 shards
    equals the serial fold (exercises per-shard rehash + realloc of the
    seq arrays)."""
    import numpy as np

    from sylph_tpu.core.native_core import (ShardedStreamingFold,
                                            StreamingFold, get_lib)
    if get_lib() is None:
        import pytest
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(5)
    a = StreamingFold(True, None)
    b = ShardedStreamingFold(True, None, n_shards=4)
    b.reserve(100_000)
    for _ in range(10):
        km = rng.integers(1, 1 << 56, size=20_000, dtype=np.uint64)
        ss = np.arange(0, km.size, 3, dtype=np.int64)
        fp = np.zeros(ss.size * 4, np.uint64)
        v = np.zeros(ss.size, np.uint8)
        a.push(km, ss, fp, v)
        b.push(km, ss, fp, v)
    ka, ca, da = a.finish()
    kb, cb, db = b.finish()
    a.close()
    b.close()
    assert (ka == kb).all() and (ca == cb).all() and da == db
