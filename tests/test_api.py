"""Library API smoke + consistency with the CLI engine."""

import numpy as np
import pytest

import sylph_tpu.api as sylph

TF = "/root/repo/test_files"


@pytest.fixture(scope="module")
def db():
    return sylph.sketch_genomes([f"{TF}/e.coli-EC590.fasta.gz",
                                 f"{TF}/e.coli-K12.fasta.gz",
                                 f"{TF}/e.coli-o157.fasta.gz"])


@pytest.fixture(scope="module")
def sample():
    return sylph.sketch_reads(f"{TF}/o157_reads.fastq.gz")


def test_profile_api(db, sample):
    rows = sylph.profile(db, sample)
    assert len(rows) == 1
    r = rows[0]
    assert "o157" in r.genome
    assert r.rel_abundance == pytest.approx(100.0)
    assert r.adjusted_ani == pytest.approx(100.0, abs=0.5)
    assert r.eff_cov == pytest.approx(0.338, abs=0.01)


def test_query_api(db, sample):
    rows = sylph.query(db, sample)
    assert len(rows) == 3
    assert rows[0].adjusted_ani >= rows[-1].adjusted_ani
    assert rows[0].kmers_reassigned is None


def test_query_tpu_matches_host(db, sample):
    host = sylph.query(db, sample)
    dev = sylph.query(db, sample, tpu=True)
    assert [(r.genome, r.adjusted_ani, r.eff_cov) for r in host] == \
           [(r.genome, r.adjusted_ani, r.eff_cov) for r in dev]


def test_roundtrip_io(db, sample, tmp_path):
    sylph.save_db(str(tmp_path / "x.syldb"), db)
    db2 = sylph.load_db(str(tmp_path / "x.syldb"))
    assert len(db2) == len(db)
    assert (db2[0].genome_kmers == db[0].genome_kmers).all()
    sylph.save_sample(str(tmp_path / "x.sylsp"), sample)
    s2 = sylph.load_sample(str(tmp_path / "x.sylsp"))
    assert (np.sort(s2.kmers) == np.sort(sample.kmers)).all()


def test_profile_rejects_disabled_db():
    db = sylph.sketch_genomes([f"{TF}/e.coli-K12.fasta.gz"],
                              enable_profiling=False)
    sample = sylph.sketch_reads(f"{TF}/t1.fq", c=5, k=31)
    with pytest.raises(ValueError):
        sylph.profile(db, sample)


def test_profiler_handle(db, sample):
    """api.Profiler: resident-index serving handle matches the one-shot
    api.profile/query rows across repeated calls."""
    import sylph_tpu.api as sylph
    prof = sylph.Profiler(db, tpu=False)
    want_p = sylph.profile(db, sample)
    want_q = sylph.query(db, sample)
    for _ in range(2):           # repeated calls hit the same engine
        rows = prof.profile(sample)
        assert [(r.genome, r.adjusted_ani, r.rel_abundance)
                for r in rows] == \
            [(r.genome, r.adjusted_ani, r.rel_abundance) for r in want_p]
        rows = prof.query(sample)
        assert [(r.genome, r.adjusted_ani) for r in rows] == \
            [(r.genome, r.adjusted_ani) for r in want_q]


def test_profiler_path_input(db, sample, tmp_path):
    import sylph_tpu.api as sylph
    p = str(tmp_path / "s.sylsp")
    sylph.save_sample(p, sample)
    prof = sylph.Profiler(db, tpu=False)
    rows = prof.profile(p)
    want = sylph.profile(db, sample)
    assert [(r.genome, r.adjusted_ani) for r in rows] == \
        [(r.genome, r.adjusted_ani) for r in want]
