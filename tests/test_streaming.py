"""Streaming ingest: chunked decode/parse/fold vs the one-shot oracles."""

import gzip

import numpy as np
import pytest

from sylph_tpu.io.fastx import parse_fastx, stream_fastx

TF = "/root/repo/test_files"
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _concat_stream(path, target_bytes):
    parts = list(stream_fastx(path, skip_names=True,
                              target_bytes=target_bytes))
    codes = np.concatenate([p.codes for p in parts]) if parts \
        else np.empty(0, np.uint8)
    lens = np.concatenate([p.lengths for p in parts]) if parts \
        else np.empty(0, np.int64)
    return codes, lens, sum(p.n_records for p in parts)


@pytest.mark.parametrize("target", [1 << 10, 1 << 14, 1 << 30])
def test_stream_fastq_gz_matches_oneshot(target):
    path = f"{TF}/o157_reads.fastq.gz"
    whole = parse_fastx(path, skip_names=True)
    codes, lens, n = _concat_stream(path, target)
    assert n == whole.n_records
    assert (lens == whole.lengths).all()
    assert (codes == whole.codes).all()


@pytest.mark.parametrize("target", [1 << 10, 1 << 20])
def test_stream_fasta_matches_oneshot(target, tmp_path):
    # multi-contig fasta with line-wrapped sequences spanning chunk cuts
    rng = np.random.default_rng(5)
    p = tmp_path / "g.fa"
    with open(p, "wb") as f:
        for i in range(20):
            f.write(b">contig%d\n" % i)
            seq = BASES[rng.integers(0, 4, size=rng.integers(500, 5000))]
            for j in range(0, seq.size, 70):
                f.write(seq[j:j + 70].tobytes() + b"\n")
    whole = parse_fastx(str(p), skip_names=True)
    codes, lens, n = _concat_stream(str(p), target)
    assert n == whole.n_records
    assert (lens == whole.lengths).all()
    assert (codes == whole.codes).all()


def test_stream_fastq_blank_lines(tmp_path):
    p = tmp_path / "b.fq"
    rec = b"@r%d\nACGTACGTACGT\n+\nIIIIIIIIIIII\n"
    with open(p, "wb") as f:
        for i in range(50):
            f.write(rec % i)
            if i % 7 == 0:
                f.write(b"\n")          # interior blank lines
    whole = parse_fastx(str(p), skip_names=True)
    codes, lens, n = _concat_stream(str(p), 256)
    assert n == whole.n_records == 50
    assert (codes == whole.codes).all()


def test_stream_multimember_gzip(tmp_path):
    """Concatenated gzip members (Illumina-style) decode transparently."""
    p = tmp_path / "mm.fastq.gz"
    with open(p, "wb") as f:
        for part in range(3):
            buf = b"".join(b"@p%d_%d\nACGTACGTACGTACGTACGT\n+\n"
                           b"IIIIIIIIIIIIIIIIIIII\n" % (part, i)
                           for i in range(40))
            f.write(gzip.compress(buf))
    whole = parse_fastx(str(p), skip_names=True)
    codes, lens, n = _concat_stream(str(p), 512)
    assert n == whole.n_records == 120
    assert (codes == whole.codes).all()


def test_streaming_sketch_matches_oneshot_oracle(tmp_path, monkeypatch):
    """sketch_sequences (streaming, chunked) == dict-path oracle, with
    duplicates crossing chunk boundaries."""
    import os

    from sylph_tpu.core import native_core
    from sylph_tpu.core.sketch_reads import sketch_sequences
    if native_core.get_lib() is None:
        pytest.skip("no C toolchain")
    rng = np.random.default_rng(11)
    p = tmp_path / "r.fq"
    reads = []
    for i in range(400):
        if i % 5 == 0 and reads:
            reads.append(reads[rng.integers(0, len(reads))])  # dup
        else:
            reads.append(BASES[rng.integers(0, 4, size=120)].tobytes())
    with open(p, "wb") as f:
        for i, r in enumerate(reads):
            f.write(b"@r%d\n" % i + r + b"\n+\n" + b"I" * len(r) + b"\n")

    import sylph_tpu.io.fastx as fastx_mod
    orig = fastx_mod.stream_blocks
    monkeypatch.setattr(
        fastx_mod, "stream_blocks",
        lambda path, target_bytes=0: orig(path, target_bytes=2048))
    a = sketch_sequences(str(p), 15, 21)
    # must actually have streamed in many chunks
    assert sum(1 for _ in orig(str(p), target_bytes=2048)) > 5

    os.environ["SYLPH_TPU_NO_NATIVE"] = "1"
    try:
        native_core._TRIED = False
        native_core._LIB = None
        b = sketch_sequences(str(p), 15, 21)
    finally:
        del os.environ["SYLPH_TPU_NO_NATIVE"]
        native_core._TRIED = False
        native_core._LIB = None
    assert a.kmers.tolist() == b.kmers.tolist()
    assert a.counts.tolist() == b.counts.tolist()
    assert a.mean_read_length == b.mean_read_length


def test_streaming_fold_chunked_equals_oneshot():
    from sylph_tpu.core import native_core
    if native_core.get_lib() is None:
        pytest.skip("no C toolchain")
    rng = np.random.default_rng(3)
    pool = rng.integers(0, 1 << 62, 300, dtype=np.uint64)
    kmers, seg_starts, fps, valid = [], [], [], []
    pos = 0
    for _ in range(500):
        n = int(rng.integers(1, 5))
        kmers.extend(rng.choice(pool, size=n).tolist())
        seg_starts.append(pos)
        pos += n
        fps.append(rng.integers(0, 1 << 31, 4, dtype=np.uint64))
        valid.append(1)
    kmers = np.array(kmers, np.uint64)
    seg_starts = np.array(seg_starts, np.int64)
    fps = np.stack(fps)
    valid = np.array(valid, np.uint8)

    one = native_core.dedup_fold_native(kmers, seg_starts, fps, valid,
                                        None, False, 4)
    f = native_core.StreamingFold(False, 4)
    for lo in range(0, 500, 71):                   # ragged chunks
        hi = min(lo + 71, 500)
        ks = seg_starts[lo]
        ke = seg_starts[hi] if hi < 500 else kmers.size
        f.push(kmers[ks:ke], seg_starts[lo:hi] - ks, fps[lo:hi],
               valid[lo:hi], None)
    ks2, cs2, nd2 = f.finish()
    f.close()
    assert one[0].tolist() == ks2.tolist()
    assert one[1].tolist() == cs2.tolist()
    assert one[2] == nd2


def test_native_seeding_matches_numpy():
    """C scalar rolling seeder vs the numpy log-doubling oracle."""
    from sylph_tpu.core import native_core
    from sylph_tpu.kmer.seeding import (fmh_seeds_concat_np,
                                        fmh_seeds_positions_np)
    if native_core.get_lib() is None:
        pytest.skip("no C toolchain")
    rng = np.random.default_rng(17)
    for trial, (c, k) in enumerate([(5, 21), (20, 31), (3, 15), (100, 27)]):
        lens = rng.integers(1, 400, size=60)
        codes = rng.integers(0, 4, size=int(lens.sum()),
                             dtype=np.uint8)
        ends = np.cumsum(lens)
        starts = ends - lens
        want_r, want_h = fmh_seeds_concat_np(codes, starts, ends, c, k)
        got_r, got_h = native_core.seed_concat_native(codes, starts, ends,
                                                      c, k)
        assert got_r.tolist() == want_r.tolist(), (c, k)
        assert got_h.tolist() == want_h.tolist(), (c, k)
        # positions variant vs per-record numpy oracle
        cids, pos, hs = native_core.seed_positions_native(
            codes, starts, ends, c, k)
        oc, op, oh = [], [], []
        for r in range(60):
            h, p = fmh_seeds_positions_np(codes[starts[r]:ends[r]], c, k)
            oc.extend([r] * h.size)
            op.extend(p.tolist())
            oh.extend(h.tolist())
        assert cids.tolist() == oc and pos.tolist() == op \
            and hs.tolist() == oh, (c, k)


def test_paired_streaming_chunked_matches_oneshot(tmp_path, monkeypatch):
    """Paired streaming with tiny chunks == whole-file result, including
    ragged files (n1 != n2: trailing unpaired records ignored)."""
    from sylph_tpu.core import native_core
    from sylph_tpu.core.sketch_reads import sketch_pair_sequences
    if native_core.get_lib() is None:
        pytest.skip("no C toolchain")
    rng = np.random.default_rng(23)
    p1, p2 = tmp_path / "r1.fq", tmp_path / "r2.fq"
    n1, n2 = 300, 280                      # ragged
    for p, n, seed in ((p1, n1, 1), (p2, n2, 2)):
        r = np.random.default_rng(seed)
        with open(p, "wb") as f:
            for i in range(n):
                ln = int(r.integers(40, 200))
                s = BASES[r.integers(0, 4, size=ln)].tobytes()
                f.write(b"@r%d\n" % i + s + b"\n+\n" + b"I" * ln + b"\n")

    whole = sketch_pair_sequences(str(p1), str(p2), 10, 21)

    import sylph_tpu.io.fastx as fastx_mod
    orig = fastx_mod.stream_blocks
    monkeypatch.setattr(
        fastx_mod, "stream_blocks",
        lambda path, target_bytes=0: orig(path, target_bytes=1024))
    chunked = sketch_pair_sequences(str(p1), str(p2), 10, 21)
    assert chunked.kmers.tolist() == whole.kmers.tolist()
    assert chunked.counts.tolist() == whole.counts.tolist()
    assert chunked.mean_read_length == whole.mean_read_length
    assert chunked.paired


def test_paired_streaming_duplicate_detection(tmp_path):
    """PCR duplicates (identical pairs) are removed across chunk sizes."""
    from sylph_tpu.core import native_core
    from sylph_tpu.core.sketch_reads import sketch_pair_sequences
    if native_core.get_lib() is None:
        pytest.skip("no C toolchain")
    rng = np.random.default_rng(29)
    s1 = BASES[rng.integers(0, 4, size=150)].tobytes()
    s2 = BASES[rng.integers(0, 4, size=150)].tobytes()
    p1, p2 = tmp_path / "d1.fq", tmp_path / "d2.fq"
    with open(p1, "wb") as f:
        for i in range(20):
            f.write(b"@r%d\n" % i + s1 + b"\n+\n" + b"I" * 150 + b"\n")
    with open(p2, "wb") as f:
        for i in range(20):
            f.write(b"@r%d\n" % i + s2 + b"\n+\n" + b"I" * 150 + b"\n")
    sk = sketch_pair_sequences(str(p1), str(p2), 5, 21)
    # every k-mer seen 20x but 19 are duplicates -> all counts == 1
    assert sk.kmers.size > 0
    assert (sk.counts == 1).all()
