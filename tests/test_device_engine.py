"""Device containment engine (--tpu) vs host engine: bit-identical TSVs."""

import io

import numpy as np
import pytest

from sylph_tpu.engine.runner import ContainOptions, contain
from sylph_tpu.engine.sketch_cmd import SketchOptions, sketch

TF = "/root/repo/test_files"


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    d = tmp_path_factory.mktemp("dev_engine")
    sketch(SketchOptions(
        files=[], genomes=[f"{TF}/e.coli-EC590.fasta.gz",
                           f"{TF}/e.coli-K12.fasta.gz",
                           f"{TF}/e.coli-o157.fasta.gz"],
        reads=[f"{TF}/o157_reads.fastq.gz"],
        db_out_name=str(d / "db"), sample_output_dir=str(d)))
    return d


def _run(opts, pseudotax):
    out = io.StringIO()
    contain(opts, pseudotax=pseudotax, out=out)
    return out.getvalue()


@pytest.mark.parametrize("pseudotax", [False, True])
def test_tpu_engine_bit_parity(db, pseudotax):
    base = dict(files=[str(db / "db.syldb"),
                       str(db / "o157_reads.fastq.gz.sylsp")])
    host = _run(ContainOptions(**base), pseudotax)
    dev = _run(ContainOptions(**base, tpu=True), pseudotax)
    assert host == dev
    assert len(host.splitlines()) >= 2


def test_tpu_engine_raw_reads_parity(db):
    base = dict(files=[str(db / "db.syldb")],
                first_pair=[f"{TF}/k12_R1.fq"],
                second_pair=[f"{TF}/k12_R2.fq"],
                estimate_unknown=True)
    host = _run(ContainOptions(**base), False)
    dev = _run(ContainOptions(**base, tpu=True), False)
    assert host == dev


@pytest.mark.parametrize("pseudotax", [False, True])
def test_tpu_engine_multisample_parity(db, tmp_path, pseudotax):
    """>1 sample through profile/query --tpu: the batched (prefetch)
    device path must emit byte-identical TSVs in the same order."""
    import gzip
    import shutil

    # three distinct samples: the .sylsp, plus two raw read files
    r2 = tmp_path / "reads2.fastq.gz"
    shutil.copy(f"{TF}/o157_reads.fastq.gz", r2)
    with gzip.open(f"{TF}/o157_reads.fastq.gz", "rb") as f:
        recs = f.read().splitlines()
    half = tmp_path / "reads_half.fastq"
    with open(half, "wb") as f:
        f.write(b"\n".join(recs[: 4 * (len(recs) // 8)]) + b"\n")
    base = dict(files=[str(db / "db.syldb"),
                       str(db / "o157_reads.fastq.gz.sylsp"),
                       str(r2), str(half)], threads=4)
    host = _run(ContainOptions(**base), pseudotax)
    dev = _run(ContainOptions(**base, tpu=True), pseudotax)
    assert host == dev
    assert len(host.splitlines()) >= 4
