"""CLI flags with thin coverage elsewhere: -I, -s, -i, hidden estimators,
--no-adjust, --mean-coverage, --no-ci."""

import io

import pytest

from sylph_tpu.engine.runner import ContainOptions, contain
from sylph_tpu.engine.sketch_cmd import SketchOptions, sketch

TF = "/root/repo/test_files"


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    d = tmp_path_factory.mktemp("flags")
    sketch(SketchOptions(files=[], genomes=[f"{TF}/e.coli-o157.fasta.gz"],
                         reads=[f"{TF}/o157_reads.fastq.gz"],
                         db_out_name=str(d / "db"),
                         sample_output_dir=str(d)))
    return d


def _run(d, pseudotax=False, **kw):
    out = io.StringIO()
    contain(ContainOptions(files=[str(d / "db.syldb"),
                                  str(d / "o157_reads.fastq.gz.sylsp")],
                           **kw), pseudotax=pseudotax, out=out)
    return out.getvalue().strip().splitlines()


def test_no_ci_blanks_interval_columns(db):
    rows = _run(db, no_ci=True)
    cols = rows[1].split("\t")
    assert cols[4] == "NA-NA" and cols[6] == "NA-NA"


def test_no_adjust_uses_naive(db):
    rows = _run(db, no_adj=True)
    cols = rows[1].split("\t")
    assert cols[2] == "96.08"           # Adjusted_ANI == Naive_ANI
    assert cols[10] == "96.08"


def test_seq_id_overrides_identity(db):
    # -I with -u: true cov scales by (seq_id/100)^-k; lower claimed
    # identity means a larger upward correction
    base = _run(db, estimate_unknown=True)
    forced = _run(db, estimate_unknown=True, seq_id=90.0)
    assert base[1] != forced[1]
    assert float(forced[1].split("\t")[3]) > float(base[1].split("\t")[3])


@pytest.mark.parametrize("estimator", ["mme", "mle"])
def test_hidden_estimators_run(db, estimator):
    rows = _run(db, estimator=estimator)
    lam = float(rows[1].split("\t")[5])
    assert 0.2 < lam < 0.5              # near the ratio estimate 0.338


def test_mean_coverage_flag(db):
    rows = _run(db, mean_coverage=True)
    assert len(rows) == 2               # accepted; low-cov path unchanged


def test_sample_threads_parallel_samples(db, tmp_path):
    out = io.StringIO()
    contain(ContainOptions(
        files=[str(db / "db.syldb"), str(db / "o157_reads.fastq.gz.sylsp")],
        reads=[f"{TF}/o157_reads.fastq.gz"], sample_threads=2),
        pseudotax=False, out=out)
    lines = out.getvalue().strip().splitlines()
    assert len(lines) == 3              # header + raw-read + sketched sample
    # raw-read sample prints first (input order preserved under threads)
    assert lines[1].split("\t")[0].endswith("o157_reads.fastq.gz")


def test_individual_contain(db, tmp_path):
    # -i on a raw fasta in query: one result row per contig
    out = io.StringIO()
    contain(ContainOptions(
        files=[f"{TF}/e.coli-o157.fasta.gz",
               str(db / "o157_reads.fastq.gz.sylsp")],
        individual=True, minimum_ani=85.0), pseudotax=False, out=out)
    lines = out.getvalue().strip().splitlines()
    assert len(lines) >= 3              # the o157 fixture has 2 contigs


def test_sample_parallelism_step_table():
    """Heuristic table vs sylph src/contain.rs:239-256."""
    from sylph_tpu.engine.runner import sample_parallelism_step as step
    # profile: max(threads/3 + 1, min(n_raw, threads))
    assert step(True, 3, None, 0) == 2          # 3/3+1=2, min(0,3)=0
    assert step(True, 3, None, 1) == 2
    assert step(True, 3, None, 10) == 3         # min(10,3)=3 > 2
    assert step(True, 64, None, 2) == 22        # 64/3+1=22 > min(2,64)
    assert step(True, 64, None, 40) == 40       # min(40,64)=40 > 22
    # query: max(1, min(n_raw, threads))
    assert step(False, 3, None, 0) == 1
    assert step(False, 3, None, 2) == 2
    assert step(False, 8, None, 100) == 8
    # explicit --sample-threads wins; 0 clamps to 1
    assert step(True, 64, 5, 100) == 5
    assert step(False, 3, 0, 100) == 1
