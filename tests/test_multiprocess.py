"""Simulated multi-host scaling: 2 jax.distributed processes x 4 CPU devices.

The TPU-equivalent of testing multi-node without a cluster (SURVEY.md §4):
collectives cross a real process boundary (gRPC), validating that the
sharded profile step is correct when 'dp' spans hosts.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


# hard timeout guard lives in the subprocess communicate(timeout=540)
def test_two_process_profile(tmp_path):
    port = _free_port()
    coord = f"localhost:{port}"
    out = str(tmp_path / "hist.npy")
    worker = os.path.join(os.path.dirname(__file__), "multiproc_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, coord, "2", str(i), out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(2)]
    outs = [p.communicate(timeout=540) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]
    hist = np.load(out)

    # single-process oracle on the same deterministic data
    from sylph_tpu.tpu.pipeline import build_host_index
    from sylph_tpu.tpu.pipeline import profile_step
    rng = np.random.default_rng(0)
    c, k, G = 20, 31, 4
    N, L = 32, 64
    bases = rng.integers(0, 4, size=(N, L)).astype(np.uint32)
    lengths = np.full(N, L, np.int32)
    thr = ((1 << 64) - 1) // c
    genomes = [rng.integers(0, thr, size=100, dtype=np.uint64)
               for _ in range(G)]
    idx = build_host_index(genomes, pad_multiple=64)
    want, _ = profile_step(bases, lengths, idx.hi, idx.lo, idx.genome_ids,
                           idx.n_kmers, c=c, k=k, n_genomes=G,
                           n_buckets=32, min_ani=0.0)
    assert (hist == np.asarray(want)).all()


def test_two_process_grange(tmp_path):
    """Multi-host mode of the flagship database-scale engine: 2
    jax.distributed processes each own half the grange chunks, compute
    partial histograms on local devices, and merge over gRPC — the
    BASELINE.md pod-scale shape ('>=2 hosts vs the big syldb'). The
    merged histogram must be integer-identical to the single-process
    engine AND a numpy searchsorted oracle on the same data."""
    port = _free_port()
    coord = f"localhost:{port}"
    out = str(tmp_path / "grange_hist.npy")
    worker = os.path.join(os.path.dirname(__file__), "multiproc_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, coord, "2", str(i), out, "grange"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(2)]
    outs = [p.communicate(timeout=540) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]
    merged = np.load(out)

    # single-process oracle: same deterministic data as grange_main
    from sylph_tpu.tpu.grange import HIST_H, GRangeEngine, \
        build_grange_index
    rng = np.random.default_rng(3)
    G, c = 40, 20
    thr = ((1 << 64) - 1) // c
    chunk_slots = 1 << 14
    m = chunk_slots * 4
    kmers = rng.integers(0, thr, size=m, dtype=np.uint64)
    ndup = m // 8
    kmers[:ndup] = rng.choice(kmers[ndup:ndup + 64], size=ndup)
    gids = rng.integers(0, G, size=m).astype(np.int32)
    gidx = build_grange_index(kmers, gids, G, chunk_slots=chunk_slots,
                              target_mean=256, ci_cap=256, heavy_run=8)
    assert gidx.n_heavy > 0
    t = 6_000
    sk = np.unique(np.concatenate([
        rng.choice(kmers, size=t // 2),
        rng.integers(0, thr, size=t // 2, dtype=np.uint64)]))
    sc = rng.integers(1, 100, size=sk.size).astype(np.uint32)
    full = GRangeEngine(gidx).hists(sk, sc)
    assert (merged == full).all(), (
        f"2-process merged grange histogram diverges from single-process:"
        f" {np.abs(merged - full).sum()} total count error")

    want = np.zeros((G, HIST_H), np.int64)
    idx = np.searchsorted(sk, kmers)
    idxc = np.minimum(idx, sk.size - 1)
    cts = np.where((idx < sk.size) & (sk[idxc] == kmers), sc[idxc], 0)
    live = cts > 0
    np.add.at(want, (gids[live], np.minimum(cts[live], HIST_H - 1)), 1)
    assert (merged == want).all()
    assert merged[:, 1:].sum() > 0


def test_two_process_cli_profile(tmp_path, monkeypatch):
    """End-to-end multi-host CLI: two jax.distributed processes run the
    identical `profile --tpu` of the same fixtures; the grange engine
    splits chunk ownership, merges histograms over gRPC, process 0
    emits the TSV (process 1 must emit nothing), and the rows must be
    bit-identical to BOTH a single-process grange run and the host
    engine."""
    import sylph_tpu.api as sylph

    TF = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "test_files")
    db = sylph.sketch_genomes([
        os.path.join(TF, "e.coli-EC590.fasta.gz"),
        os.path.join(TF, "e.coli-K12.fasta.gz"),
        os.path.join(TF, "e.coli-o157.fasta.gz")])
    sample = sylph.sketch_reads(os.path.join(TF, "o157_reads.fastq.gz"))
    fdir = str(tmp_path)
    sylph.save_db(os.path.join(fdir, "db.syldb"), db)
    sylph.save_sample(os.path.join(fdir, "sample.sylsp"), sample)

    port = _free_port()
    out = str(tmp_path / "out.tsv")
    worker = os.path.join(os.path.dirname(__file__),
                          "multiproc_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, f"localhost:{port}", "2", str(i), out,
         "cli", fdir],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(2)]
    outs = [p.communicate(timeout=540) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]
    got = open(out).read()
    assert open(out + ".p1").read() == ""      # only process 0 emits

    # oracles: single-process grange (same patched thresholds) + host
    import functools
    import io

    import sylph_tpu.tpu.grange as gr
    from sylph_tpu.engine.device_exec import DeviceContainment
    from sylph_tpu.engine.runner import ContainOptions, contain
    monkeypatch.setattr(DeviceContainment, "GRANGE_MIN", 1 << 12)
    monkeypatch.setattr(gr, "build_grange_index", functools.partial(
        gr.build_grange_index, chunk_slots=1 << 13))
    files = [os.path.join(fdir, "db.syldb"),
             os.path.join(fdir, "sample.sylsp")]
    one = io.StringIO()
    contain(ContainOptions(files=files, tpu=True, threads=2),
            pseudotax=True, out=one)
    host = io.StringIO()
    contain(ContainOptions(files=files, tpu=False, threads=2),
            pseudotax=True, out=host)
    assert got == one.getvalue() == host.getvalue()
    assert len(got.splitlines()) >= 2
