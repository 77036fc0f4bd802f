"""End-to-end scientific correctness on a synthetic planted community:
genomes planted at low coverage must be detected by profile's lambda
correction; background noise must be filtered. Exercises the full CLI
chain (syldb read, fastq parse, sketch, containment, statistics, TSV)
on the gtdb_cli fixture generator's machinery at tiny scale."""

import importlib.util
import io
import os
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_gen():
    spec = importlib.util.spec_from_file_location(
        "gen_gtdb_cli_fixture",
        os.path.join(ROOT, "scripts", "gen_gtdb_cli_fixture.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    gen = _load_gen()
    d = tmp_path_factory.mktemp("gtdb_cli_small")
    db = str(d / "db.syldb")
    rf = str(d / "reads.fastq.gz")
    kmers, gids = gen.synth_syldb(db, G=40, kpg=2048, seed=5)
    gen.synth_planted_fastq(rf, kmers, gids, G=40,
                            total_bp=4000 * 150, read_len=150,
                            n_abundant=4, seed=6)
    return db, rf


def _profile(db, rf, tpu=False):
    from sylph_tpu.engine.runner import ContainOptions, contain
    out = io.StringIO()
    contain(ContainOptions(files=[db, rf], threads=2, tpu=tpu),
            pseudotax=True, out=out)
    return out.getvalue()


def test_planted_genomes_detected(fixture_dir):
    db, rf = fixture_dir
    tsv = _profile(db, rf)
    lines = tsv.strip().splitlines()
    rows = [l.split("\t") for l in lines[1:]]
    found = {r[1] for r in rows}
    # exactly the 4 abundant genomes (lambda-corrected past the 95 floor;
    # naive ANI ~93.5 — only the low-coverage correction finds them)
    expect = {f"synthetic/g{g:06d}.fa" for g in range(4)}
    assert found == expect, tsv
    hdr = lines[0].split("\t")
    ani_i = hdr.index("Adjusted_ANI")
    naive_i = hdr.index("Naive_ANI")
    lam_i = hdr.index("Eff_lambda")
    for r in rows:
        assert float(r[ani_i]) >= 95.0, r
        assert float(r[naive_i]) < 95.0, r      # naive alone would miss
        assert 0.2 <= float(r[lam_i]) <= 2.0, r


def test_planted_profile_device_parity(fixture_dir):
    """--tpu (device containment on the CPU backend) produces the same
    TSV as the host engine on the planted community."""
    db, rf = fixture_dir
    assert _profile(db, rf, tpu=True) == _profile(db, rf, tpu=False)


def test_engine_cache_reuse(fixture_dir, monkeypatch):
    """SYLPH_TPU_CACHE_INDEX=1 reuses one resident device engine across
    contain() calls for the same .syldb (the serving scenario) with
    identical output."""
    from sylph_tpu.engine import runner
    db, rf = fixture_dir
    base = _profile(db, rf, tpu=True)
    monkeypatch.setenv("SYLPH_TPU_CACHE_INDEX", "1")
    runner._ENGINE_CACHE.clear()
    first = _profile(db, rf, tpu=True)
    assert len(runner._ENGINE_CACHE) == 1
    eng = next(iter(runner._ENGINE_CACHE.values()))
    second = _profile(db, rf, tpu=True)
    assert next(iter(runner._ENGINE_CACHE.values())) is eng
    assert first == base and second == base
    runner._ENGINE_CACHE.clear()
