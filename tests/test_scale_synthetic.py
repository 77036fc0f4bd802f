"""Mid-scale synthetic end-to-end: 60 genomes, mutated reads, host vs --tpu.

Validates the full CLI pipeline beyond the tiny fixtures: database build,
profiling with winner-take-all reassignment across closely related genomes,
coverage-corrected ANI, and bit-parity between the host and device engines.
"""

import gzip
import io
import os

import numpy as np
import pytest

from sylph_tpu.engine.runner import ContainOptions, contain
from sylph_tpu.engine.sketch_cmd import SketchOptions, sketch

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    rng = np.random.default_rng(42)
    d = tmp_path_factory.mktemp("scale")
    n_genomes, glen = 60, 30_000
    genomes = []
    paths = []
    for g in range(n_genomes):
        seq = rng.integers(0, 4, size=glen).astype(np.uint8)
        genomes.append(seq)
        p = d / f"g{g:03d}.fa.gz"
        with gzip.open(p, "wb") as f:
            f.write(b">genome%03d synthetic\n" % g)
            f.write(BASES[seq].tobytes() + b"\n")
        paths.append(str(p))

    # sample: reads from 5 genomes at ~1.5x coverage with 0.5% mutations
    targets = [3, 17, 29, 41, 55]
    reads = []
    for t in targets:
        src = genomes[t]
        n_reads = glen * 3 // 2 // 150
        starts = rng.integers(0, glen - 150, size=n_reads)
        for s in starts:
            r = src[s:s + 150].copy()
            mut = rng.random(150) < 0.005
            r[mut] = (r[mut] + rng.integers(1, 4, size=int(mut.sum()))) % 4
            reads.append(r)
    order = rng.permutation(len(reads))
    rf = d / "sample.fq"
    with open(rf, "wb") as f:
        for i in order:
            f.write(b"@r%d\n" % i)
            f.write(BASES[reads[i]].tobytes() + b"\n+\n")
            f.write(b"I" * 150 + b"\n")

    sketch(SketchOptions(files=[], genomes=paths, reads=[str(rf)],
                         db_out_name=str(d / "db"), sample_output_dir=str(d),
                         c=40, k=31, threads=4))
    return d, targets


def _profile(d, tpu):
    out = io.StringIO()
    contain(ContainOptions(files=[str(d / "db.syldb"),
                                  str(d / "sample.fq.sylsp")], tpu=tpu),
            pseudotax=True, out=out)
    return out.getvalue()


def test_profile_finds_targets_and_device_parity(world):
    d, targets = world
    host = _profile(d, tpu=False)
    rows = [ln.split("\t") for ln in host.strip().splitlines()[1:]]
    found = {os.path.basename(r[1]) for r in rows}
    assert found == {f"g{t:03d}.fa.gz" for t in targets}
    # ~equal abundances (same coverage for every target)
    abunds = [float(r[2]) for r in rows]
    assert all(10.0 < a < 30.0 for a in abunds)
    # ANI reflects the 0.5% mutation rate: ~99.5, certainly > 98.5
    anis = [float(r[4]) for r in rows]
    assert all(98.5 < a <= 100.0 for a in anis)

    dev = _profile(d, tpu=True)
    assert host == dev


def test_query_reports_relatives(world):
    d, targets = world
    out = io.StringIO()
    contain(ContainOptions(files=[str(d / "db.syldb"),
                                  str(d / "sample.fq.sylsp")]),
            pseudotax=False, out=out)
    rows = [ln.split("\t") for ln in out.getvalue().strip().splitlines()[1:]]
    # query reports all 5 targets (random genomes share no k-mers)
    found = {os.path.basename(r[1]) for r in rows}
    assert {f"g{t:03d}.fa.gz" for t in targets} <= found
