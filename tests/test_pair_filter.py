"""Approximate (k-mer, fingerprint) pair filter: semantics, FP bound,
memory bound, and native/Python decision parity."""

import numpy as np
import pytest

from sylph_tpu.core.pair_filter import (ExactPairSet, ScalableBloomPairSet,
                                        make_pair_filter, mix64)


def test_make_pair_filter_dispatch():
    assert isinstance(make_pair_filter(0.0), ExactPairSet)
    assert isinstance(make_pair_filter(1e-4), ScalableBloomPairSet)


def test_exact_set_semantics():
    s = ExactPairSet()
    assert not s.check_insert(1, 2)
    assert s.check_insert(1, 2)
    assert not s.check_insert(1, 3)
    assert not s.check_insert(2, 2)


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(0)
    f = ScalableBloomPairSet(1e-3)
    keys = [(int(a), int(b)) for a, b in
            zip(rng.integers(0, 1 << 63, 5000),
                rng.integers(0, 1 << 63, 5000))]
    for km, p in keys:
        f.check_insert(km, p)
    # every inserted key must be reported present
    assert all(f.check_insert(km, p) for km, p in keys)


@pytest.mark.parametrize("fpr", [1e-2, 1e-3])
def test_bloom_fp_rate_bounded(fpr):
    rng = np.random.default_rng(1)
    f = ScalableBloomPairSet(fpr)
    n = 20000
    for a, b in zip(rng.integers(0, 1 << 62, n),
                    rng.integers(0, 1 << 62, n)):
        f.check_insert(int(a), int(b))
    # fresh keys: measured FP rate must be within ~4 sigma of the bound
    m = 40000
    fp = sum(f.check_insert(int(a), int(b))
             for a, b in zip(rng.integers(1 << 62, 1 << 63, m),
                             rng.integers(0, 1 << 62, m)))
    bound = fpr * m + 4.0 * np.sqrt(fpr * m) + 3
    assert fp <= bound, (fp, bound)


def test_bloom_memory_bounded():
    """The exact set on a 10^8-pair stream costs gigabytes; the bloom's
    allocation is a closed-form function of fpr and capacity, independent
    of how many distinct keys stream through below capacity."""
    f = ScalableBloomPairSet(1e-4)
    # level 0 sized for 2^23 keys at fpr 5e-5: k=15, ~2.7 bytes/key
    assert f.n_bytes < 32 << 20
    # adding levels doubles capacity with geometric total memory:
    # 10^8 keys => levels 0..4, sum cap_i >= 1e8, total < 1 GB
    total_cap, total_bytes, i = 0, 0, 0
    while total_cap < 10**8:
        cap = f.levels[0].cap << i
        fpr_i = 1e-4 * 0.5 ** (i + 1)
        k = int(np.ceil(np.log2(1.0 / fpr_i)))
        total_bytes += int(cap * k / np.log(2.0) / 8)
        total_cap += cap
        i += 1
    assert total_bytes < 1 << 30


def test_fold_python_bloom_vs_native_bloom():
    """Decision-level parity: the C bloom and the Python bloom must agree
    on every dedup decision (same layout, same hashes)."""
    from sylph_tpu.core import native_core
    from sylph_tpu.core.pair_filter import make_pair_filter
    from sylph_tpu.core.sketch_reads import _dedup_fold, _fold_native
    if native_core.get_lib() is None:
        pytest.skip("no C toolchain")
    rng = np.random.default_rng(7)
    # heavy duplication: 3000 segments drawing k-mers from a pool of 500,
    # fingerprints from a pool of 40 -> plenty of real dups + FP chances
    pool = rng.integers(0, 1 << 62, 500, dtype=np.uint64)
    fpp = rng.integers(0, 1 << 31, (40, 4), dtype=np.uint64)
    seg_lists, seg_fps = [], []
    for _ in range(3000):
        kms = rng.choice(pool, size=rng.integers(1, 6)).tolist()
        f, r, g, t = fpp[rng.integers(0, 40)].tolist()
        seg_lists.append([int(x) for x in kms])
        seg_fps.append(((f, r), (g, t)))
    for fpr in (0.0, 1e-2, 1e-4):
        ks, cs, ndup = _fold_native(seg_lists, seg_fps, None, False, None,
                                    fpr=fpr)
        counts = {}
        ndup_py = _dedup_fold(zip(seg_lists, seg_fps), counts,
                              make_pair_filter(fpr), False, None)
        assert ndup == ndup_py
        assert dict(zip(ks.tolist(), cs.tolist())) == counts
        assert ks.tolist() == list(counts.keys())   # insertion order


def test_paired_sketch_fpr_native_python_parity(tmp_path):
    """sketch_pair_sequences with fpr>0: native and Python folds agree."""
    from sylph_tpu.core import native_core
    from sylph_tpu.core.sketch_reads import sketch_pair_sequences
    if native_core.get_lib() is None:
        pytest.skip("no C toolchain")
    import os
    TF = "/root/repo/test_files"
    a = sketch_pair_sequences(f"{TF}/k12_R1.fq", f"{TF}/k12_R2.fq", 50, 31,
                              fpr=1e-3)
    os.environ["SYLPH_TPU_NO_NATIVE"] = "1"
    try:
        native_core._TRIED = False
        native_core._LIB = None
        b = sketch_pair_sequences(f"{TF}/k12_R1.fq", f"{TF}/k12_R2.fq",
                                  50, 31, fpr=1e-3)
    finally:
        del os.environ["SYLPH_TPU_NO_NATIVE"]
        native_core._TRIED = False
        native_core._LIB = None
    assert a.kmers.tolist() == b.kmers.tolist()
    assert a.counts.tolist() == b.counts.tolist()


def test_mix64_pinned_vectors():
    # murmur3 fmix64; pinned so any constant drift breaks loudly (the C
    # mirror is cross-checked by test_fold_python_bloom_vs_native_bloom)
    assert mix64(0) == 0
    assert mix64(1) == 0xB456BCFC34C2CB2C
    assert mix64(2) == 0x3ABF2A20650683E7
    assert mix64(0x123456789ABCDEF) == 0x87CBFBFE89022CEA
