"""Native C FASTX decoder vs the pure-numpy parser (oracle)."""

import numpy as np
import pytest

from sylph_tpu.io.fastx import parse_fastx_py
from sylph_tpu.io.native import parse_fastx_native

FIXTURES = [
    "test_files/k12_R1.fq",
    "test_files/k12_R2.fq",
    "test_files/t1.fq",
    "test_files/t2.fq",
    "test_files/e.coli-K12.fasta.gz",
    "test_files/e.coli-EC590.fasta.gz",
    "test_files/e.coli-o157.fasta.gz",
    "test_files/o157_reads.fastq.gz",
]


@pytest.fixture(scope="module")
def lib_available():
    from sylph_tpu.io import native
    if native.get_lib() is None:
        pytest.skip("no C toolchain / native lib unavailable")


@pytest.mark.parametrize("path", FIXTURES)
def test_native_matches_python(path, lib_available):
    a = parse_fastx_py(path)
    b = parse_fastx_native(path)
    assert b is not None
    assert (a.codes == b.codes).all()
    assert (a.starts == b.starts).all()
    assert (a.ends == b.ends).all()
    assert a.names == b.names


def test_skip_names(lib_available):
    b = parse_fastx_native("test_files/t1.fq", skip_names=True)
    assert b.names == []
    assert b.n_records == 4


def test_malformed(tmp_path, lib_available):
    from sylph_tpu.io.fastx import FastxParseError
    p = tmp_path / "bad.fq"
    p.write_text("@r1\nACGT\nnot-plus\nIIII\n")
    with pytest.raises(FastxParseError):
        parse_fastx_native(str(p))
    p2 = tmp_path / "junk.fq"
    p2.write_text("hello world\n")
    with pytest.raises(FastxParseError):
        parse_fastx_native(str(p2))


def test_interior_blank_lines(tmp_path, lib_available):
    # blank lines BETWEEN fastq records are skipped, not a parse error
    p = tmp_path / "blank.fq"
    p.write_text("@r1\nACGTACGT\n+\nIIIIIIII\n\n\n@r2\nTTTTGGGG\n+\n"
                 "IIIIIIII\n\n")
    b = parse_fastx_native(str(p))
    assert b is not None
    assert b.n_records == 2
    assert b.names == ["r1", "r2"]
    a = parse_fastx_py(str(p))
    assert (a.codes == b.codes).all()
    assert (a.starts == b.starts).all()
