"""BGZF codec: standard-compliance roundtrip, parallel decode equality,
and ingest integration (reference ingest counterpart: needletail+flate2
reading any gzip serially, sylph src/sketch.rs:780-781)."""

import gzip
import io
import os
import zlib

import numpy as np
import pytest

from sylph_tpu.io import bgzf
from sylph_tpu.io.fastx import parse_fastx, stream_blocks, stream_fastx


def _fastq_bytes(n_reads: int, read_len: int = 101, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    out = []
    qual = b"F" * read_len
    for i in range(n_reads):
        seq = bases[rng.integers(0, 4, size=read_len)].tobytes()
        out.append(b"@r%d\n%s\n+\n%s\n" % (i, seq, qual))
    return b"".join(out)


def test_roundtrip_gzip_module_reads_bgzf(tmp_path):
    """Our BGZF output is standard gzip: the stdlib reads it unchanged
    (and so does the reference's flate2)."""
    raw = _fastq_bytes(3000)
    p = str(tmp_path / "x.fastq.gz")
    total = bgzf.write(p, [raw])
    assert total == len(raw)
    with gzip.open(p, "rb") as f:
        assert f.read() == raw


def test_scan_and_parallel_decode(tmp_path):
    raw = _fastq_bytes(5000, seed=1)
    p = str(tmp_path / "x.fastq.gz")
    bgzf.write(p, [raw[i:i + 7777] for i in range(0, len(raw), 7777)])
    data = open(p, "rb").read()
    assert bgzf.looks_like_bgzf(data[:18])
    blocks = bgzf.scan(data)
    assert blocks is not None
    # every block is a whole gzip member of <= 64 KiB
    assert all(blen <= 65536 for _o, blen, _i in blocks)
    # last block is the EOF marker
    assert blocks[-1][2] == 0
    # tiny superchunks exercise the multi-group + prefetch path
    got = b"".join(bgzf.iter_decompressed(data, blocks,
                                          target_bytes=100_000, workers=3))
    assert got == raw


def test_plain_gzip_not_misdetected(tmp_path):
    raw = _fastq_bytes(100)
    p = str(tmp_path / "plain.fastq.gz")
    with gzip.open(p, "wb") as f:
        f.write(raw)
    head = open(p, "rb").read(18)
    assert not bgzf.looks_like_bgzf(head)
    # and the generic ingest still reads it
    blocks = b"".join(stream_blocks(p, target_bytes=1 << 16))
    assert blocks == raw


def test_stream_ingest_equality(tmp_path):
    """stream_fastx over BGZF == over plain gzip == whole-file parse."""
    raw = _fastq_bytes(4000, seed=2)
    pb = str(tmp_path / "b.fastq.gz")
    pg = str(tmp_path / "g.fastq.gz")
    bgzf.write(pb, [raw])
    with gzip.open(pg, "wb") as f:
        f.write(raw)
    whole = parse_fastx(pg, skip_names=True)

    for path in (pb, pg):
        codes_parts, lens_parts = [], []
        for px in stream_fastx(path, target_bytes=200_000):
            codes_parts.append(px.codes)
            lens_parts.append(px.lengths)
        assert np.array_equal(np.concatenate(codes_parts), whole.codes)
        assert np.array_equal(np.concatenate(lens_parts), whole.lengths)


def test_incompressible_blocks_split(tmp_path):
    """Level-1 deflate of random bytes can exceed the 64 KiB frame; the
    writer must fall back to stored/split blocks and stay lossless."""
    raw = os.urandom(300_000)
    p = str(tmp_path / "r.bin.gz")
    bgzf.write(p, [raw])
    with gzip.open(p, "rb") as f:
        assert f.read() == raw
    blocks = bgzf.scan(open(p, "rb").read())
    assert blocks is not None
    assert all(blen <= 65536 for _o, blen, _i in blocks)


def test_empty_stream(tmp_path):
    p = str(tmp_path / "e.gz")
    assert bgzf.write(p, []) == 0
    data = open(p, "rb").read()
    assert data == bgzf.EOF_MARKER
    blocks = bgzf.scan(data)
    assert blocks is not None and blocks[-1][2] == 0
    assert b"".join(bgzf.iter_decompressed(data, blocks)) == b""


def test_scan_rejects_corrupt():
    raw = _fastq_bytes(50)
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb") as f:
        f.write(raw)
    assert bgzf.scan(buf.getvalue()) is None          # no BC subfield
    assert bgzf.scan(b"\x1f\x8b\x08\x04" + b"\x00" * 20) is None
    assert bgzf.scan(zlib.compress(raw)) is None      # not gzip at all


def test_record_cut_fast_matches_exact():
    """The memchr-speed fastq cut equals the exact numpy cut whenever it
    engages ('@'-quality lines, CRLF and blank-line abstention fuzzed)."""
    import numpy as np

    from sylph_tpu.io.fastx import _record_cut, _record_cut_fast_fastq

    rng = np.random.default_rng(3)

    def mkfq(n, lens, qat=False, crlf=False, blank=False):
        recs = []
        for i in range(n):
            L = int(lens[i])
            seq = bytes(rng.integers(65, 69, L).astype(np.uint8))
            q = b"@" * L if qat else b"I" * L
            nl = b"\r\n" if crlf else b"\n"
            recs.append(b"@r%d" % i + nl + seq + nl + b"+" + nl + q + nl)
            if blank and i % 7 == 3:
                recs.append(b"\n")
        return b"".join(recs)

    for case in range(300):
        n = int(rng.integers(1, 30))
        lens = rng.integers(1, 200, n)
        data = mkfq(n, lens, qat=bool(rng.integers(0, 2)),
                    crlf=rng.integers(0, 4) == 0,
                    blank=rng.integers(0, 4) == 0)
        e = int(rng.integers(1, len(data) + 1))
        fast = _record_cut_fast_fastq(data, 0, e)
        exact = _record_cut(np.frombuffer(data[:e], np.uint8), True)
        if fast is not None:
            assert fast == exact, (case, fast, exact)


def test_frame_fastq_nl_matches_generic_framer():
    """The newline-position framer (BGZF fastq fast path) emits blocks
    that (a) concatenate to the input, (b) each start at a record
    boundary, and (c) parse identically to the generic framer — fuzzed
    over chunk splits mid-record, CRLF, blank lines, '@' quality lines,
    and missing trailing newlines."""
    from sylph_tpu.io.fastx import (_frame_fastq_nl, _frame_records,
                                    parse_block)

    rng = np.random.default_rng(11)
    for case in range(120):
        n = int(rng.integers(1, 60))
        recs = []
        for i in range(n):
            L = int(rng.integers(1, 120))
            seq = bytes(rng.integers(65, 69, L).astype(np.uint8))
            qat = rng.integers(0, 3) == 0
            q = (b"@" if qat else b"I") * L
            nl = b"\r\n" if rng.integers(0, 6) == 0 else b"\n"
            recs.append(b"@r%d" % i + nl + seq + nl + b"+" + nl + q + nl)
            if rng.integers(0, 9) == 0:
                recs.append(b"\n")
        data = b"".join(recs)
        if rng.integers(0, 4) == 0:
            data = data.rstrip(b"\n")       # no trailing newline
        # random chunking, incl. tiny chunks that split records
        cuts = np.sort(rng.integers(0, len(data) + 1,
                                    size=int(rng.integers(0, 8))))
        bounds = [0, *cuts.tolist(), len(data)]
        chunks = [bytearray(data[a:b]) for a, b in zip(bounds, bounds[1:])
                  if b > a]
        fast = list(_frame_fastq_nl(iter(chunks)))
        joined = b"".join(bytes(b) for b in fast)
        # both framers drop a whitespace-only tail
        assert joined == data[:len(joined)], case
        assert not data[len(joined):].strip(), case
        gen = list(_frame_records(iter([data]), target_bytes=256))
        px_f = [parse_block(b, "t.fq") for b in fast]
        px_g = [parse_block(b, "t.fq") for b in gen]
        ids_f = np.concatenate([p.lengths for p in px_f])
        ids_g = np.concatenate([p.lengths for p in px_g])
        np.testing.assert_array_equal(ids_f, ids_g, err_msg=str(case))


def test_bgzf_fasta_genome_sketch_matches_plain(tmp_path):
    """BGZF-compressed genome FASTA (generic framing path) sketches
    identically to the same data in plain gzip."""
    from sylph_tpu.core.sketch_genomes import sketch_genome

    rng = np.random.default_rng(9)
    BASES = np.frombuffer(b"ACGT", np.uint8)
    recs = []
    for i in range(5):
        seq = BASES[rng.integers(0, 4, size=30_000)].tobytes()
        recs.append(b">contig%d desc\n" % i + seq + b"\n")
    raw = b"".join(recs)
    pb = str(tmp_path / "g.fa.gz")
    pg = str(tmp_path / "h.fa.gz")
    bgzf.write(pb, [raw])
    with gzip.open(pg, "wb") as f:
        f.write(raw)
    a = sketch_genome(25, 31, pb, 30, True)
    b = sketch_genome(25, 31, pg, 30, True)
    assert a is not None and b is not None
    np.testing.assert_array_equal(a.genome_kmers, b.genome_kmers)
    np.testing.assert_array_equal(a.pseudotax_tracked_nonused_kmers,
                                  b.pseudotax_tracked_nonused_kmers)
    assert a.gn_size == b.gn_size
