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
