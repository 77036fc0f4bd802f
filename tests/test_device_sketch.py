"""sketch --tpu (device read seeding) vs host path: bit-identical sketches."""

import numpy as np
import pytest

from sylph_tpu.core.sketch_reads import (sketch_pair_sequences,
                                         sketch_sequences)

TF = "/root/repo/test_files"


def _eq(a, b):
    assert a is not None and b is not None
    assert a.kmers.tolist() == b.kmers.tolist()     # insertion order too
    assert a.counts.tolist() == b.counts.tolist()
    assert a.mean_read_length == b.mean_read_length
    assert a.paired == b.paired


def test_single_end_device_parity():
    _eq(sketch_sequences(f"{TF}/o157_reads.fastq.gz", 100, 31),
        sketch_sequences(f"{TF}/o157_reads.fastq.gz", 100, 31, device=True))


def test_paired_device_parity():
    _eq(sketch_pair_sequences(f"{TF}/k12_R1.fq", f"{TF}/k12_R2.fq", 50, 31),
        sketch_pair_sequences(f"{TF}/k12_R1.fq", f"{TF}/k12_R2.fq", 50, 31,
                              device=True))


def test_tiny_low_c_device_parity():
    _eq(sketch_pair_sequences(f"{TF}/t1.fq", f"{TF}/t2.fq", 5, 21),
        sketch_pair_sequences(f"{TF}/t1.fq", f"{TF}/t2.fq", 5, 21,
                              device=True))
