"""IO + sketch-construction tests: fastx parsing, bincode round-trips, and
read/genome sketching vs literal sequential transcriptions of the reference
algorithms."""

import gzip

import numpy as np
import pytest

from sylph_tpu.core.sketch_genomes import sketch_genome, sketch_genome_individual
from sylph_tpu.core.sketch_reads import (
    _mean_fold, sketch_pair_sequences, sketch_sequences)
from sylph_tpu.core.types import GenomeSketch, SequencesSketch
from sylph_tpu.io import sylformat
from sylph_tpu.io.fastx import parse_fastx
from sylph_tpu.kmer.hashing import BYTE_TO_SEQ_NP
from sylph_tpu.kmer.seeding import fmh_seeds_np, fmh_seeds_positions_np

RNG = np.random.default_rng(42)


def rand_seq(n):
    return bytes(RNG.choice(list(b"ACGT"), size=n).tolist())


def write_fastq(path, reads):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@read{i}\n{r.decode()}\n+\n{'I' * len(r)}\n")


def write_fasta(path, records, gz=False, width=70):
    op = gzip.open if gz else open
    with op(path, "wt") as f:
        for name, seq in records:
            f.write(f">{name}\n")
            s = seq.decode()
            for j in range(0, len(s), width):
                f.write(s[j:j + width] + "\n")


# ---------- fastx ----------

def test_parse_fastq(tmp_path):
    reads = [rand_seq(100), rand_seq(50), rand_seq(150)]
    p = str(tmp_path / "x.fq")
    write_fastq(p, reads)
    px = parse_fastx(p)
    assert px.n_records == 3
    assert px.lengths.tolist() == [100, 50, 150]
    for i, r in enumerate(reads):
        exp = BYTE_TO_SEQ_NP[np.frombuffer(r, np.uint8)]
        assert px.record_codes(i).tolist() == exp.tolist()
    assert px.names == ["read0", "read1", "read2"]


def test_parse_fasta_multiline_gz(tmp_path):
    recs = [("contig one with spaces", rand_seq(333)), ("c2", rand_seq(10))]
    p = str(tmp_path / "x.fa.gz")
    write_fasta(p, recs, gz=True, width=60)
    px = parse_fastx(p)
    assert px.n_records == 2
    assert px.names == ["contig one with spaces", "c2"]
    assert px.lengths.tolist() == [333, 10]
    exp = BYTE_TO_SEQ_NP[np.frombuffer(recs[0][1], np.uint8)]
    assert px.record_codes(0).tolist() == exp.tolist()


def test_parse_crlf_and_sniffing(tmp_path):
    p = str(tmp_path / "weird.txt")
    with open(p, "wb") as f:
        f.write(b">a\r\nACGTACGT\r\nACGT\r\n")
    px = parse_fastx(p)
    assert px.lengths.tolist() == [12]


# ---------- bincode formats ----------

def test_sylsp_roundtrip(tmp_path):
    sk = SequencesSketch(
        kmers=np.array([5, 1, 99], dtype=np.uint64),
        counts=np.array([2, 7, 1], dtype=np.uint32),
        c=200, k=31, file_name="reads.fq", sample_name="S1",
        paired=True, mean_read_length=151.25)
    p = str(tmp_path / "x.sylsp")
    sylformat.write_sylsp(p, sk)
    got = sylformat.read_sylsp(p)
    assert got.kmers.tolist() == sk.kmers.tolist()
    assert got.counts.tolist() == sk.counts.tolist()
    assert (got.c, got.k, got.file_name, got.sample_name, got.paired,
            got.mean_read_length) == (200, 31, "reads.fq", "S1", True, 151.25)


def test_sylsp_binary_layout(tmp_path):
    # hand-decode the bincode bytes to pin the wire format
    sk = SequencesSketch(
        kmers=np.array([0x0102030405060708], dtype=np.uint64),
        counts=np.array([3], dtype=np.uint32),
        c=200, k=31, file_name="f", sample_name=None, paired=False,
        mean_read_length=2.0)
    p = str(tmp_path / "x.sylsp")
    sylformat.write_sylsp(p, sk)
    raw = open(p, "rb").read()
    expected = (
        (1).to_bytes(8, "little")                 # seq len
        + (0x0102030405060708).to_bytes(8, "little") + (3).to_bytes(4, "little")
        + (200).to_bytes(8, "little") + (31).to_bytes(8, "little")
        + (1).to_bytes(8, "little") + b"f"        # file_name
        + b"\x00"                                  # sample_name: None
        + b"\x00"                                  # paired: false
        + np.float64(2.0).tobytes()
    )
    assert raw == expected


def test_syldb_roundtrip_and_metadata(tmp_path):
    g1 = GenomeSketch(
        genome_kmers=np.array([3, 1, 2], dtype=np.uint64),
        pseudotax_tracked_nonused_kmers=np.array([9], dtype=np.uint64),
        file_name="g1.fa", first_contig_name="chr1 desc", c=200, k=31,
        gn_size=12345, min_spacing=30)
    g2 = GenomeSketch(
        genome_kmers=np.empty(0, dtype=np.uint64),
        pseudotax_tracked_nonused_kmers=None,
        file_name="g2.fa", first_contig_name="", c=200, k=31,
        gn_size=1, min_spacing=30)
    p = str(tmp_path / "db.syldb")
    sylformat.write_syldb(p, [g1, g2])
    got = sylformat.read_syldb(p)
    assert len(got) == 2
    assert got[0].genome_kmers.tolist() == [3, 1, 2]
    assert got[0].pseudotax_tracked_nonused_kmers.tolist() == [9]
    assert got[1].pseudotax_tracked_nonused_kmers is None
    assert got[0].first_contig_name == "chr1 desc"
    metas = sylformat.read_syldb_metadata(p)
    assert metas[0]["genome_kmers_num"] == 3
    assert metas[0]["genome_size"] == 12345
    assert metas[1]["file_name"] == "g2.fa"


# ---------- sequential oracles (literal re-derivations of the spec) ----------

def dedup_add_oracle(counts, pair_set, km, fp, no_dedup, threshold):
    c = counts.get(km, 0)
    thr = threshold if threshold is not None else (1 << 32) - 1
    if not no_dedup and c < thr and fp is not None:
        ret = False
        for key in ((km, fp[0]), (km, fp[1])):
            if key in pair_set:
                if c > 0:
                    ret = True
            else:
                pair_set.add(key)
        if ret:
            return 1
    counts[km] = c + 1
    return 0


def pack16(vals):
    f = 0
    for v in vals:
        f = ((f << 2) | int(v)) & 0xFFFFFFFF
    return f


def fp_single_oracle(codes):
    n = len(codes)
    if n < 66:
        return None
    half = n // 2
    f = pack16([codes[2 * i] for i in range(16)])
    r = pack16([codes[2 * i + half] for i in range(16)])
    g = pack16([codes[1 + 2 * i] for i in range(16)])
    t = pack16([codes[1 + 2 * i + half] for i in range(16)])
    return ((f, r), (g, t))


def fp_pair_oracle(c1, c2):
    if len(c1) < 33 or len(c2) < 33:
        return None
    f = pack16([c1[2 * i] for i in range(16)])
    r = pack16([c2[2 * i] for i in range(16)])
    g = pack16([c1[1 + 2 * i] for i in range(16)])
    t = pack16([c2[1 + 2 * i] for i in range(16)])
    return ((f, r), (g, t))


def single_end_oracle(reads, c, k, no_dedup=False):
    counts, pair_set = {}, set()
    mean, counter = 0.0, 0.0
    for r in reads:
        codes = BYTE_TO_SEQ_NP[np.frombuffer(r, np.uint8)]
        fp = None if len(r) > 400 else fp_single_oracle(codes.tolist())
        for km in fmh_seeds_np(r, c, k).tolist():
            dedup_add_oracle(counts, pair_set, km, fp, no_dedup, 4)
        counter += 1.0
        mean = mean + (len(r) - mean) / counter
    return counts, mean


def paired_oracle(r1s, r2s, c, k, no_dedup=False):
    counts, pair_set = {}, set()
    mean, counter = 0.0, 0.0
    for r1, r2 in zip(r1s, r2s):
        c1 = BYTE_TO_SEQ_NP[np.frombuffer(r1, np.uint8)].tolist()
        c2 = BYTE_TO_SEQ_NP[np.frombuffer(r2, np.uint8)].tolist()
        fp = fp_pair_oracle(c1, c2)
        v1 = fmh_seeds_np(r1, c, k).tolist()
        v2 = fmh_seeds_np(r2, c, k).tolist()
        for km in v1:
            dedup_add_oracle(counts, pair_set, km, fp, no_dedup, None)
        for km in v2:
            if km in v1:
                continue
            dedup_add_oracle(counts, pair_set, km, fp, no_dedup, None)
        counter += 1.0
        mean = mean + (len(r1) - mean) / counter
    return counts, mean


@pytest.mark.parametrize("no_dedup", [False, True])
def test_single_end_sketch_vs_oracle(tmp_path, no_dedup):
    c, k = 8, 21
    base = rand_seq(5000)
    # include exact duplicates + varied lengths to exercise dedup paths
    reads = []
    for _ in range(60):
        s = int(RNG.integers(0, 4500))
        ln = int(RNG.integers(40, 420))
        reads.append(base[s:s + ln])
    reads += reads[:20]        # duplicates
    reads.append(rand_seq(500))  # > 400bp, no fingerprint
    reads.append(rand_seq(10))   # < k
    p = str(tmp_path / "r.fq")
    write_fastq(p, reads)
    sk = sketch_sequences(p, c, k, no_dedup=no_dedup)
    exp_counts, exp_mean = single_end_oracle(reads, c, k, no_dedup)
    got = dict(zip(sk.kmers.tolist(), sk.counts.tolist()))
    assert got == exp_counts
    assert sk.mean_read_length == pytest.approx(exp_mean, abs=1e-12)
    assert not sk.paired


def test_paired_sketch_vs_oracle(tmp_path):
    c, k = 8, 21
    base = rand_seq(6000)
    r1s, r2s = [], []
    for _ in range(50):
        s = int(RNG.integers(0, 5400))
        r1s.append(base[s:s + 150])
        r2s.append(base[s + 200:s + 350])
    # duplicated pairs (PCR dups)
    r1s += r1s[:15]
    r2s += r2s[:15]
    p1, p2 = str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq")
    write_fastq(p1, r1s)
    write_fastq(p2, r2s)
    sk = sketch_pair_sequences(p1, p2, c, k)
    exp_counts, exp_mean = paired_oracle(r1s, r2s, c, k)
    got = dict(zip(sk.kmers.tolist(), sk.counts.tolist()))
    assert got == exp_counts
    assert sk.mean_read_length == pytest.approx(exp_mean, abs=1e-12)
    assert sk.paired


def test_paired_unequal_lengths(tmp_path):
    # extra R1 reads beyond R2 are consumed but ignored
    c, k = 4, 21
    r1s = [rand_seq(100) for _ in range(5)]
    r2s = [rand_seq(100) for _ in range(3)]
    p1, p2 = str(tmp_path / "a1.fq"), str(tmp_path / "a2.fq")
    write_fastq(p1, r1s)
    write_fastq(p2, r2s)
    sk = sketch_pair_sequences(p1, p2, c, k)
    exp_counts, exp_mean = paired_oracle(r1s[:3], r2s, c, k)
    got = dict(zip(sk.kmers.tolist(), sk.counts.tolist()))
    assert got == exp_counts
    assert sk.mean_read_length == pytest.approx(exp_mean)


# ---------- genome sketching ----------

def genome_oracle(records, c, k, min_spacing, pseudotax, per_contig_reset):
    tuples = []
    for ci, (_, seq) in enumerate(records):
        hs, pos = fmh_seeds_positions_np(seq, c, k)
        tuples += [(ci, int(p), int(h)) for p, h in zip(pos, hs)]
    tuples.sort()
    from collections import Counter
    cnt = Counter(h for _, _, h in tuples)
    new_vec, tracked = [], []
    last_pos, last_contig = 0, 0
    for contig, pos, km in tuples:
        if cnt[km] > 1:
            continue
        if (last_pos == 0 or (per_contig_reset and last_contig != contig)
                or pos - last_pos > min_spacing):
            new_vec.append(km)
            last_contig = contig
            last_pos = pos
        elif pseudotax:
            tracked.append(km)
    return new_vec, tracked


@pytest.mark.parametrize("pseudotax", [True, False])
def test_sketch_genome_vs_oracle(tmp_path, pseudotax):
    c, k, ms = 6, 21, 30
    # two contigs with a shared (duplicate) region
    shared = rand_seq(400)
    recs = [("c1 first", rand_seq(3000) + shared),
            ("c2", shared + rand_seq(2000))]
    p = str(tmp_path / "g.fa")
    write_fasta(p, recs)
    g = sketch_genome(c, k, p, ms, pseudotax)
    exp_kmers, exp_tracked = genome_oracle(recs, c, k, ms, pseudotax, True)
    assert g.genome_kmers.tolist() == exp_kmers
    if pseudotax:
        assert g.pseudotax_tracked_nonused_kmers.tolist() == exp_tracked
    else:
        assert g.pseudotax_tracked_nonused_kmers is None
    assert g.gn_size == sum(len(s) for _, s in recs)
    assert g.first_contig_name == "c1 first"


def test_sketch_genome_individual(tmp_path):
    c, k, ms = 6, 21, 30
    recs = [("c1", rand_seq(2000)), ("c2", rand_seq(1500))]
    p = str(tmp_path / "g.fa")
    write_fasta(p, recs)
    gs = sketch_genome_individual(c, k, p, ms, True)
    assert len(gs) == 2
    for i, (name, seq) in enumerate(recs):
        exp_kmers, exp_tracked = genome_oracle([(name, seq)], c, k, ms, True,
                                               False)
        assert gs[i].genome_kmers.tolist() == exp_kmers
        assert gs[i].first_contig_name == name
        assert gs[i].gn_size == len(seq)


def test_mean_fold_matches_sequential():
    lens = np.array([100, 151, 250, 33, 99], dtype=np.int64)
    mean, counter = 0.0, 0.0
    for ln in lens.tolist():
        counter += 1
        mean += (ln - mean) / counter
    assert _mean_fold(lens) == mean
    assert _mean_fold(np.array([151] * 10)) == 151.0
    assert _mean_fold(np.empty(0, np.int64)) == 0.0


def test_sorted_view_does_not_mutate_sketch():
    """Regression: the in-place C radix sort must never alias the sketch
    arrays (ascontiguousarray can return a same-buffer view) — a profile
    followed by save_sample once wrote a scrambled (kmer, count)
    pairing."""
    import numpy as np

    from sylph_tpu.core.types import SequencesSketch
    rng = np.random.default_rng(11)
    kmers = rng.integers(0, 1 << 63, size=4096, dtype=np.uint64)
    counts = rng.integers(1, 9, size=4096).astype(np.uint32)
    s = SequencesSketch(kmers=kmers, counts=counts, c=200, k=31,
                        file_name="x", sample_name=None, paired=False,
                        mean_read_length=100.0)
    k0, c0 = kmers.copy(), counts.copy()
    sk, sc = s.sorted_view()
    assert (s.kmers == k0).all() and (s.counts == c0).all()
    assert (np.diff(sk.astype(np.uint64)) >= 0).all()
    want = dict(zip(k0.tolist(), c0.tolist()))
    assert dict(zip(sk.tolist(), sc.tolist())) == want
