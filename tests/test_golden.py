"""Golden TSV regression tests.

Pins the exact profile/query output (every column, every formatted digit —
ANI, Eff_cov, wyrand CI percentiles, abundances) on the repo fixtures.
These are this repo's bit-parity anchors: the verify recipe's expected
values (o157 Eff_lambda ~0.338, k12 ANI 98.89) live in these files, and any
numerics regression — hash, Poisson cut, lambda estimator, bootstrap,
formatting — breaks them.
"""

import io
import os

import pytest

from sylph_tpu.engine.runner import ContainOptions, contain
from sylph_tpu.engine.sketch_cmd import SketchOptions, sketch

TF = "/root/repo/test_files"
GOLD = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    d = tmp_path_factory.mktemp("golden")
    sketch(SketchOptions(
        files=[], genomes=[f"{TF}/e.coli-EC590.fasta.gz",
                           f"{TF}/e.coli-K12.fasta.gz",
                           f"{TF}/e.coli-o157.fasta.gz"],
        reads=[f"{TF}/o157_reads.fastq.gz"],
        db_out_name=str(d / "db"), sample_output_dir=str(d)))
    return d


def _normalize(text, db):
    return (text.replace(str(db) + "/", "")
                .replace(TF, "TESTFILES"))


def _run(opts, pseudotax):
    out = io.StringIO()
    contain(opts, pseudotax=pseudotax, out=out)
    return out.getvalue()


def _check(name, got, db):
    want = open(os.path.join(GOLD, name)).read()
    assert _normalize(got, db) == want


def test_profile_golden(db):
    got = _run(ContainOptions(files=[str(db / "db.syldb"),
                                     str(db / "o157_reads.fastq.gz.sylsp")]),
               True)
    _check("profile_o157.tsv", got, db)


def test_query_golden(db):
    got = _run(ContainOptions(files=[str(db / "db.syldb"),
                                     str(db / "o157_reads.fastq.gz.sylsp")]),
               False)
    _check("query_o157.tsv", got, db)


def test_query_raw_unknown_golden(db):
    got = _run(ContainOptions(files=[str(db / "db.syldb")],
                              first_pair=[f"{TF}/k12_R1.fq"],
                              second_pair=[f"{TF}/k12_R2.fq"],
                              estimate_unknown=True), False)
    _check("query_k12_u.tsv", got, db)
