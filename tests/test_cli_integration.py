"""Port of the reference's integration test matrix
(sylph tests/integration_test.rs) against our CLI, plus its concordance
oracles (identical stdout whether inputs are raw fastq/fasta or pre-sketched).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TF = os.path.join(REPO, "test_files")


def run(args, cwd=None):
    return subprocess.run(
        [sys.executable, "-m", "sylph_tpu"] + args,
        capture_output=True, text=True, cwd=cwd or REPO)


def tf(name):
    return os.path.join(TF, name)


@pytest.fixture()
def d(tmp_path):
    return str(tmp_path)


def test_sketch_commands(d):
    r = run(["sketch", tf("e.coli-EC590.fasta.gz"), tf("e.coli-K12.fasta.gz"),
             tf("o157_reads.fastq.gz"), "-o", f"{d}/db", "-d", d])
    assert r.returncode == 0, r.stderr
    assert os.path.exists(f"{d}/db.syldb")
    assert os.path.exists(f"{d}/o157_reads.fastq.gz.sylsp")

    r = run(["profile", f"{d}/o157_reads.fastq.gz.sylsp", f"{d}/db.syldb"])
    assert r.returncode == 0, r.stderr

    r = run(["profile", f"{d}/o157_reads.fastq.gz.sylsp",
             tf("e.coli-EC590.fasta.gz")])
    assert r.returncode == 0, r.stderr

    r = run(["profile", tf("o157_reads.fastq.gz"),
             tf("e.coli-EC590.fasta.gz"), "-i", "-m", "90"])
    assert r.returncode == 0, r.stderr

    r = run(["sketch", "-1", tf("t1.fq"), "-2", tf("t2.fq"), "-d", d])
    assert r.returncode == 0, r.stderr
    assert os.path.exists(f"{d}/t1.fq.paired.sylsp")


def test_profile_with_list_file(d):
    with open(f"{d}/list.txt", "w") as f:
        for n in ["e.coli-EC590.fasta.gz", "e.coli-K12.fasta.gz",
                  "e.coli-o157.fasta.gz", "o157_reads.fastq.gz", "t1.fq",
                  "t2.fq"]:
            f.write(tf(n) + "\n")
    r = run(["profile", "-l", f"{d}/list.txt"])
    assert r.returncode == 0, r.stderr
    assert r.stdout.count("\n") >= 1


def test_sketch_pair_lists(d):
    with open(f"{d}/p1.txt", "w") as f:
        f.write(tf("t1.fq") + "\n")
    with open(f"{d}/p2.txt", "w") as f:
        f.write(tf("t2.fq") + "\n")
    r = run(["sketch", "--l1", f"{d}/p1.txt", "--l2", f"{d}/p2.txt",
             "-d", d])
    assert r.returncode == 0, r.stderr
    assert os.path.exists(f"{d}/t1.fq.paired.sylsp")


def test_sketch_g_r_flags(d):
    r = run(["sketch", "-g", tf("t1.fq"), "-r", tf("t2.fq"), "-d", d,
             "-o", f"{d}/testdb"])
    assert r.returncode == 0, r.stderr
    assert os.path.exists(f"{d}/t2.fq.sylsp")
    assert os.path.exists(f"{d}/testdb.syldb")


def test_profile_vs_query_line_counts(d):
    r = run(["profile", tf("o157_reads.fastq.gz"),
             tf("e.coli-EC590.fasta.gz")])
    assert r.returncode == 0
    assert r.stdout.count("\n") == 2  # header + 1 row

    r = run(["query", tf("o157_reads.fastq.gz"), tf("e.coli-EC590.fasta.gz"),
             tf("e.coli-o157.fasta.gz"), tf("e.coli-K12.fasta.gz")])
    assert r.returncode == 0
    assert r.stdout.count("\n") == 4  # header + 3 rows


def test_sketch_routing_r_vs_g(d):
    # -r: everything is reads
    r = run(["sketch", "-r", tf("e.coli-EC590.fasta.gz"),
             tf("o157_reads.fastq.gz"), "-o", f"{d}/db", "-d", d])
    assert r.returncode == 0
    assert os.path.exists(f"{d}/e.coli-EC590.fasta.gz.sylsp")
    assert os.path.exists(f"{d}/o157_reads.fastq.gz.sylsp")
    assert not os.path.exists(f"{d}/db.syldb")

    # -g: everything is genomes
    r = run(["sketch", "-g", tf("e.coli-EC590.fasta.gz"),
             tf("o157_reads.fastq.gz"), "-o", f"{d}/db2", "-d", f"{d}/g"])
    assert r.returncode == 0
    assert not os.path.exists(f"{d}/g/e.coli-EC590.fasta.gz.sylsp")
    assert not os.path.exists(f"{d}/g/o157_reads.fastq.gz.sylsp")
    assert os.path.exists(f"{d}/db2.syldb")


def test_sketch_gl_rl_lists(d):
    with open(f"{d}/list.txt", "w") as f:
        f.write(tf("e.coli-EC590.fasta.gz") + "\n")
        f.write(tf("o157_reads.fastq.gz") + "\n")
    r = run(["sketch", "--gl", f"{d}/list.txt", "-o", f"{d}/db"])
    assert r.returncode == 0
    assert os.path.exists(f"{d}/db.syldb")

    r = run(["sketch", "--rl", f"{d}/list.txt", "-o", f"{d}/db3",
             "-d", f"{d}/r"])
    assert r.returncode == 0
    assert not os.path.exists(f"{d}/db3.syldb")
    assert os.path.exists(f"{d}/r/e.coli-EC590.fasta.gz.sylsp")
    assert os.path.exists(f"{d}/r/o157_reads.fastq.gz.sylsp")


def test_profile_disabling(d):
    r = run(["sketch", "-g", tf("e.coli-EC590.fasta.gz"), "-o", f"{d}/db",
             "-d", d, "--disable-profiling"])
    assert r.returncode == 0, r.stderr
    r = run(["profile", tf("o157_reads.fastq.gz"), f"{d}/db.syldb"])
    assert r.returncode == 1
    r = run(["query", tf("o157_reads.fastq.gz"), f"{d}/db.syldb"])
    assert r.returncode == 0, r.stderr


def test_sketch_fasta_fastq_concord(d):
    """The strongest oracle: identical stdout whether inputs are raw or
    pre-sketched (integration_test.rs:246-295)."""
    r = run(["sketch", tf("e.coli-EC590.fasta.gz"), tf("o157_reads.fastq.gz"),
             "-o", f"{d}/db", "-d", d])
    assert r.returncode == 0, r.stderr
    out1 = run(["profile", tf("o157_reads.fastq.gz"), f"{d}/db.syldb"])
    out2 = run(["profile", tf("o157_reads.fastq.gz"),
                tf("e.coli-EC590.fasta.gz")])
    out3 = run(["profile", f"{d}/o157_reads.fastq.gz.sylsp",
                f"{d}/db.syldb"])
    assert out1.stdout != ""
    # seq names differ between raw file and sketch (file path vs stored name)
    # in OUR deterministic runner the stored file name is the raw path, so
    # all three must be byte-identical like the reference asserts.
    assert out1.stdout == out2.stdout
    assert out1.stdout == out3.stdout


def test_sample_names(d):
    with open(f"{d}/single_sample.txt", "w") as f:
        f.write("SAMPLE_TEST\n")
    r = run(["sketch", "-1", tf("t1.fq"), "-2", tf("t2.fq"), "-d", d,
             "--lS", f"{d}/single_sample.txt"])
    assert r.returncode == 0, r.stderr
    assert os.path.exists(f"{d}/SAMPLE_TEST.paired.sylsp")

    with open(f"{d}/sample_list.txt", "w") as f:
        f.write("S1\nS2\n")
    r = run(["sketch", tf("t1.fq"), tf("o157_reads.fastq.gz"), "-d", d,
             "--lS", f"{d}/sample_list.txt"])
    assert r.returncode == 0, r.stderr
    assert os.path.exists(f"{d}/S1.sylsp")
    assert os.path.exists(f"{d}/S2.sylsp")

    r = run(["profile", f"{d}/S2.sylsp", tf("e.coli-EC590.fasta.gz")])
    assert r.returncode == 0
    assert "S2" in r.stdout
    assert "o157_reads" not in r.stdout

    r = run(["sketch", "-1", tf("t1.fq"), "-2", tf("t2.fq"), "-d", d,
             "-S", "SAMPLE_TEST_S"])
    assert r.returncode == 0, r.stderr
    assert os.path.exists(f"{d}/SAMPLE_TEST_S.paired.sylsp")

    r = run(["sketch", "-1", tf("t1.fq"), tf("t1.fq"), "-2", tf("t2.fq"),
             tf("t2.fq"), "-d", d, "-S", "SAMPLE_TEST_S", "SAMPLE_TEST_S1"])
    assert r.returncode == 0, r.stderr
    assert os.path.exists(f"{d}/SAMPLE_TEST_S1.paired.sylsp")


def test_fpr(d):
    r = run(["sketch", "-1", tf("t1.fq"), "-2", tf("t2.fq"), "-d", d, "0"])
    assert r.returncode == 0, r.stderr
    r = run(["sketch", "-1", tf("t1.fq"), "-2", tf("t2.fq"), "-d", d,
             "--fpr", "0.001"])
    assert r.returncode == 0, r.stderr
    r = run(["sketch", "-1", tf("t1.fq"), "-2", tf("t2.fq"), "-d", d,
             "--fpr", "2"])
    assert r.returncode == 1


def test_raw_inputs_profile_simple(d):
    r = run(["profile", tf("e.coli-o157.fasta.gz"), "-1", tf("t1.fq"),
             "-2", tf("t2.fq")])
    assert r.returncode == 0, r.stderr
    r = run(["profile", tf("e.coli-o157.fasta.gz"), "-1", tf("t1.fq")])
    assert r.returncode == 1
    r = run(["profile", tf("e.coli-o157.fasta.gz"), "-1", tf("k12_R1.fq"),
             tf("t1.fq"), "-2", tf("k12_R2.fq"), tf("t1.fq")])
    assert r.returncode == 0, r.stderr


def test_raw_inputs_profile_with_sketch(d):
    out1 = run(["profile", tf("e.coli-EC590.fasta.gz"), "-1",
                tf("k12_R1.fq"), "-2", tf("k12_R2.fq")])
    r = run(["sketch", "-1", tf("k12_R1.fq"), "-2", tf("k12_R2.fq"),
             "-d", d])
    assert r.returncode == 0, r.stderr
    out2 = run(["profile", tf("e.coli-EC590.fasta.gz"),
                f"{d}/k12_R1.fq.paired.sylsp"])
    assert out1.stdout == out2.stdout


def test_inspect(d):
    r = run(["sketch", tf("e.coli-EC590.fasta.gz"), tf("e.coli-K12.fasta.gz"),
             tf("o157_reads.fastq.gz"), "-o", f"{d}/db", "-d", d])
    assert r.returncode == 0, r.stderr
    r = run(["sketch", "-1", tf("k12_R1.fq"), "-2", tf("k12_R2.fq"),
             "-d", d])
    assert r.returncode == 0, r.stderr

    r = run(["inspect", f"{d}/k12_R1.fq.paired.sylsp"])
    assert r.returncode == 0, r.stderr
    assert "k12_R1.fq" in r.stdout

    r = run(["inspect", f"{d}/db.syldb"])
    assert r.returncode == 0, r.stderr
    assert "e.coli-EC590.fasta.gz" in r.stdout
    assert "e.coli-K12.fasta.gz" in r.stdout


def test_no_args_shows_help():
    r = run([])
    assert r.returncode == 2


def test_query_profile_no_genomes():
    r = run(["query", tf("o157_reads.fastq.gz")])
    assert r.returncode == 1
    r = run(["query", tf("e.coli-EC590.fasta.gz")])
    assert r.returncode == 1


def test_flags_interleave_with_positionals(d):
    """clap accepts options between positionals (`profile db -u sample`);
    our argparse front end must too (parse_intermixed_args in cli.main)."""
    r = run(["sketch", tf("e.coli-o157.fasta.gz"),
             tf("o157_reads.fastq.gz"), "-o", os.path.join(d, "db"),
             "-d", d])
    assert r.returncode == 0, r.stderr
    sylsp = os.path.join(d, "o157_reads.fastq.gz.sylsp")
    inter = run(["profile", os.path.join(d, "db.syldb"), "-u", sylsp])
    assert inter.returncode == 0, inter.stderr
    assert "True_cov" in inter.stdout.splitlines()[0]
    canon = run(["profile", "-u", os.path.join(d, "db.syldb"), sylsp])
    assert inter.stdout == canon.stdout
    # trailing-flag form and interleaved sketch form
    trail = run(["profile", os.path.join(d, "db.syldb"), sylsp, "-u"])
    assert trail.stdout == canon.stdout
    r = run(["sketch", tf("e.coli-o157.fasta.gz"), "-o",
             os.path.join(d, "db2"), tf("o157_reads.fastq.gz"), "-d", d])
    assert r.returncode == 0, r.stderr


def test_serve_mode(d):
    """--serve: resident-index loop reading sample paths from stdin; the
    emitted TSV rows must equal the one-shot CLI's for the same samples,
    bad request lines log-and-continue, EOF exits 0."""
    r = run(["sketch", tf("e.coli-EC590.fasta.gz"), tf("e.coli-K12.fasta.gz"),
             tf("e.coli-o157.fasta.gz"), tf("o157_reads.fastq.gz"),
             "-o", f"{d}/db", "-d", d])
    assert r.returncode == 0, r.stderr
    sylsp = f"{d}/o157_reads.fastq.gz.sylsp"

    # request stream: a sketch, a raw fastq (same sample), a bogus path,
    # a 3-token malformed line, a paired request
    req = "\n".join([sylsp, tf("o157_reads.fastq.gz"), f"{d}/nope.fq",
                     "a b c", f"{tf('t1.fq')} {tf('t2.fq')}", ""])
    rs = subprocess.run(
        [sys.executable, "-m", "sylph_tpu", "profile", "--serve",
         f"{d}/db.syldb"],
        input=req, capture_output=True, text=True, cwd=REPO)
    assert rs.returncode == 0, rs.stderr

    one = run(["profile", f"{d}/db.syldb", sylsp])
    assert one.returncode == 0, one.stderr
    # the serve stream's first block == the one-shot rows (header + rows)
    serve_lines = rs.stdout.splitlines()
    one_lines = one.stdout.splitlines()
    assert serve_lines[0] == one_lines[0]                  # header
    assert serve_lines[1:len(one_lines)] == one_lines[1:]  # sketch rows
    # raw-fastq request of the same reads reproduces the same rows
    # (concordance through the serve surface)
    n = len(one_lines) - 1
    raw_rows = serve_lines[len(one_lines):len(one_lines) + n]
    assert [r.split("\t")[1:] for r in raw_rows] == \
        [r.split("\t")[1:] for r in one_lines[1:]]


def test_serve_requires_database():
    rs = subprocess.run(
        [sys.executable, "-m", "sylph_tpu", "profile", "--serve"],
        input="", capture_output=True, text=True, cwd=REPO)
    assert rs.returncode == 1


def test_serve_mode_tpu(d):
    """--serve --tpu: the resident device index serves repeated stdin
    requests; rows must be bit-identical to the host engine's."""
    r = run(["sketch", tf("e.coli-EC590.fasta.gz"), tf("e.coli-K12.fasta.gz"),
             tf("e.coli-o157.fasta.gz"), tf("o157_reads.fastq.gz"),
             "-o", f"{d}/db", "-d", d])
    assert r.returncode == 0, r.stderr
    sylsp = f"{d}/o157_reads.fastq.gz.sylsp"
    req = f"{sylsp}\n{sylsp}\n"
    # pin the subprocess to the CPU backend THROUGH the container's
    # sitecustomize (which force-sets jax_platforms after import; the
    # env var alone is clobbered) — without this the test would reach
    # for the real accelerator, which tests must never do
    env = dict(os.environ, SYLPH_JAX_PLATFORMS="cpu")
    rs = subprocess.run(
        [sys.executable, "-m", "sylph_tpu", "profile", "--serve", "--tpu",
         f"{d}/db.syldb"],
        input=req, capture_output=True, text=True, cwd=REPO, env=env)
    assert rs.returncode == 0, rs.stderr
    host = run(["profile", f"{d}/db.syldb", sylsp])
    assert host.returncode == 0, host.stderr
    h = host.stdout.splitlines()
    s = rs.stdout.splitlines()
    assert s[0] == h[0]
    n = len(h) - 1
    assert s[1:1 + n] == h[1:]            # request 1
    assert s[1 + n:1 + 2 * n] == h[1:]    # request 2 (warm engine)
