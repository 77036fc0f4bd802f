"""Input edge cases: degenerate files and sequences through the full CLI."""

import gzip
import io

import numpy as np
import pytest

from sylph_tpu.core.sketch_genomes import sketch_genome
from sylph_tpu.core.sketch_reads import sketch_sequences
from sylph_tpu.engine.runner import ContainOptions, contain
from sylph_tpu.engine.sketch_cmd import SketchOptions, sketch
from sylph_tpu.io.fastx import FastxParseError, parse_fastx


def test_reads_shorter_than_k(tmp_path):
    p = tmp_path / "short.fq"
    p.write_text("@r1\nACGT\n+\nIIII\n@r2\nACGTACGT\n+\nIIIIIIII\n")
    sk = sketch_sequences(str(p), 1, 31)
    assert sk is not None
    assert sk.kmers.size == 0          # no window fits


def test_all_ambiguous_bases(tmp_path):
    # N maps to 'A' (sylph src/types.rs:50-59): poly-A k-mers still hash
    p = tmp_path / "n.fq"
    p.write_text("@r1\n" + "N" * 64 + "\n+\n" + "I" * 64 + "\n")
    a = sketch_sequences(str(p), 1, 21)
    p2 = tmp_path / "a.fq"
    p2.write_text("@r1\n" + "A" * 64 + "\n+\n" + "I" * 64 + "\n")
    b = sketch_sequences(str(p2), 1, 21)
    assert sorted(a.kmers.tolist()) == sorted(b.kmers.tolist())


def test_empty_genome_file(tmp_path):
    p = tmp_path / "empty.fa"
    p.write_text("")
    assert sketch_genome(200, 31, str(p), 30, True) is None


def test_corrupt_gzip(tmp_path):
    p = tmp_path / "bad.fa.gz"
    p.write_bytes(b"\x1f\x8b" + b"garbage-not-gzip" * 4)
    with pytest.raises((FastxParseError, OSError)):
        parse_fastx(str(p))


def test_truncated_sketch_errors(tmp_path):
    from sylph_tpu.io.sylformat import SketchFormatError, read_syldb
    p = tmp_path / "trunc.syldb"
    p.write_bytes(b"\x05\x00\x00")
    with pytest.raises(SketchFormatError):
        read_syldb(str(p))


def test_contain_with_zero_hit_sample(tmp_path):
    # a sample sharing nothing with the db still prints the header
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    g = tmp_path / "g.fa"
    g.write_text(">g\n" + bases[rng.integers(0, 4, 5000)].tobytes().decode()
                 + "\n")
    r = tmp_path / "r.fq"
    seq = bases[rng.integers(0, 4, 150)].tobytes().decode()
    r.write_text(f"@r\n{seq}\n+\n{'I' * 150}\n")
    sketch(SketchOptions(files=[], genomes=[str(g)], reads=[str(r)],
                         db_out_name=str(tmp_path / "db"),
                         sample_output_dir=str(tmp_path), c=30, k=31))
    out = io.StringIO()
    contain(ContainOptions(files=[str(tmp_path / "db.syldb"),
                                  str(tmp_path / "r.fq.sylsp")]),
            pseudotax=False, out=out)
    lines = out.getvalue().splitlines()
    assert len(lines) == 1 and lines[0].startswith("Sample_file")


def test_genome_with_crlf_and_multiline(tmp_path):
    rng = np.random.default_rng(8)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    seq = bases[rng.integers(0, 4, 3000)].tobytes().decode()
    # CRLF line endings + 60-col wrapping
    wrapped = "\r\n".join(seq[i:i + 60] for i in range(0, len(seq), 60))
    p = tmp_path / "crlf.fa"
    p.write_bytes((">contig x\r\n" + wrapped + "\r\n").encode())
    px = parse_fastx(str(p))
    assert px.n_records == 1
    assert int(px.lengths[0]) == 3000
    assert px.names == ["contig x"]


def test_truncated_bgzf_and_fastq_fuzz(tmp_path):
    """Random truncations/corruptions of a BGZF fastq either sketch the
    readable prefix or skip gracefully (None) — never raise."""
    import numpy as np

    from sylph_tpu.core.sketch_reads import sketch_sequences
    from sylph_tpu.io import bgzf

    rng = np.random.default_rng(1)
    BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
    recs = []
    for i in range(4000):
        seq = BASES[rng.integers(0, 4, 120)].tobytes()
        recs.append(b"@r%d\n" % i + seq + b"\n+\n" + b"J" * 120 + b"\n")
    raw = b"".join(recs)
    p = tmp_path / "ok.fastq.gz"
    bgzf.write(str(p), [raw])
    full = sketch_sequences(str(p), 20, 21)
    assert full is not None and full.kmers.size > 0

    data = p.read_bytes()
    for case in range(12):
        cut = int(rng.integers(1, len(data)))
        blob = bytearray(data[:cut])
        if case % 3 == 2 and len(blob) > 100:   # also flip a byte
            blob[int(rng.integers(50, len(blob)))] ^= 0xFF
        q = tmp_path / f"bad{case}.fastq.gz"
        q.write_bytes(bytes(blob))
        got = sketch_sequences(str(q), 20, 21)   # must not raise
        if got is not None:
            assert got.kmers.size <= full.kmers.size * 1.01
