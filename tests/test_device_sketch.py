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


def test_genome_device_parity():
    from sylph_tpu.core.sketch_genomes import (sketch_genome,
                                               sketch_genome_individual)
    a = sketch_genome(200, 31, f"{TF}/e.coli-o157.fasta.gz", 30, True)
    b = sketch_genome(200, 31, f"{TF}/e.coli-o157.fasta.gz", 30, True,
                      device=True)
    assert a.genome_kmers.tolist() == b.genome_kmers.tolist()
    assert (a.pseudotax_tracked_nonused_kmers.tolist()
            == b.pseudotax_tracked_nonused_kmers.tolist())
    ia = sketch_genome_individual(200, 31, f"{TF}/e.coli-o157.fasta.gz",
                                  30, True)
    ib = sketch_genome_individual(200, 31, f"{TF}/e.coli-o157.fasta.gz",
                                  30, True, device=True)
    assert len(ia) == len(ib) == 2
    for x, y in zip(ia, ib):
        assert x.genome_kmers.tolist() == y.genome_kmers.tolist()
        assert x.first_contig_name == y.first_contig_name
