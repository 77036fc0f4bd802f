"""Generate the end-to-end CLI benchmark fixture (once; cached on disk).

Produces in .bench_data/e2e/:
  - genomes/g0000.fa .. g0063.fa : 64 synthetic 1-Mbp genomes
  - db.syldb                     : sketched via the real CLI (c=200, k=31)
  - reads.fastq.gz               : ~1.07 Gbp of 150-bp reads drawn from 8
                                   of the genomes at staggered coverages
                                   plus 20% random background reads,
                                   BGZF-compressed (htslib blocked gzip,
                                   the common pipeline fastq.gz format)
                                   so ingest exercises the parallel
                                   decode path (io/bgzf.py)

The profile bench (bench.py --config e2e) then times
`sylph profile --tpu db.syldb reads.fastq.gz` file -> TSV, i.e. INCLUDING
gzip decode, FASTX parsing, sketching, dedup, containment and statistics —
the number comparable to the reference's wall-clock claim
(/root/reference/README.md:16-28).
"""

import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, ".bench_data", "e2e")
N_GENOMES = 64
GLEN = 1_000_000
READ_LEN = 150
TOTAL_BP = 1_073_741_824            # ~1.07 Gbp
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def main():
    t0 = time.perf_counter()
    os.makedirs(os.path.join(OUT, "genomes"), exist_ok=True)
    rng = np.random.default_rng(42)

    genomes = []
    paths = []
    for g in range(N_GENOMES):
        codes = rng.integers(0, 4, size=GLEN, dtype=np.uint8)
        genomes.append(codes)
        p = os.path.join(OUT, "genomes", f"g{g:04d}.fa")
        if not os.path.exists(p):
            with open(p, "wb") as f:
                f.write(b">genome%04d synthetic\n" % g)
                f.write(BASES[codes].tobytes())
                f.write(b"\n")
        paths.append(p)
    print(f"[{time.perf_counter() - t0:.0f}s] genomes written", flush=True)

    db = os.path.join(OUT, "db")
    if not os.path.exists(db + ".syldb"):
        subprocess.run([sys.executable, "-m", "sylph_tpu.cli", "sketch",
                        "-g", *paths, "-o", db, "-t", "8"], check=True,
                       cwd=ROOT)
    print(f"[{time.perf_counter() - t0:.0f}s] db.syldb done", flush=True)

    rf = os.path.join(OUT, "reads.fastq.gz")
    if os.path.exists(rf):
        print("reads.fastq.gz exists")
        if "--paired" in sys.argv:
            gen_paired(genomes, rng, t0)
        return
    n_reads = TOTAL_BP // READ_LEN
    # 8 source genomes at staggered coverage shares; 20% background noise
    shares = np.array([28, 17, 11, 8, 6, 5, 3, 2], np.float64)
    shares = shares / shares.sum() * 0.8
    src_counts = (shares * n_reads).astype(np.int64)
    n_noise = n_reads - int(src_counts.sum())

    qual = b"I" * READ_LEN
    tmpl_mid = b"\n+\n" + qual + b"\n"
    CHUNK = 65536
    rid_box = [0]

    def text_chunks():
        rid = 0
        for src, cnt in enumerate(src_counts.tolist()):
            codes = genomes[src]
            done = 0
            while done < cnt:
                b = min(CHUNK, cnt - done)
                starts = rng.integers(0, GLEN - READ_LEN, size=b)
                idx = starts[:, None] + np.arange(READ_LEN)[None, :]
                seqs = BASES[codes[idx]]
                parts = []
                for i in range(b):
                    parts.append(b"@r%d\n" % (rid + i))
                    parts.append(seqs[i].tobytes())
                    parts.append(tmpl_mid)
                yield b"".join(parts)
                rid += b
                done += b
            print(f"[{time.perf_counter() - t0:.0f}s] genome {src}: "
                  f"{cnt} reads", flush=True)
        done = 0
        while done < n_noise:
            b = min(CHUNK, n_noise - done)
            seqs = BASES[rng.integers(0, 4, size=(b, READ_LEN),
                                      dtype=np.uint8)]
            parts = []
            for i in range(b):
                parts.append(b"@n%d\n" % (rid + i))
                parts.append(seqs[i].tobytes())
                parts.append(tmpl_mid)
            yield b"".join(parts)
            rid += b
            done += b
        rid_box[0] = rid

    from sylph_tpu.io import bgzf
    bgzf.write(rf, text_chunks(), level=1)
    rid = rid_box[0]
    print(f"[{time.perf_counter() - t0:.0f}s] DONE: {rid} reads, "
          f"{rid * READ_LEN / 1e9:.2f} Gbp raw, "
          f"{os.path.getsize(rf) / 1e9:.2f} GB gz", flush=True)

    if "--paired" in sys.argv:
        gen_paired(genomes, rng, t0)


def gen_paired(genomes, rng, t0):
    """R1/R2 mate files (~0.54 Gbp each): fragments of ~300 bp from the
    same 8 source genomes; R1 = fragment head, R2 = fragment tail. The
    paired e2e bench (bench.py --config e2e_paired) drives the pair
    fingerprint dedup + bloom filter path at the 1 Gbp scale."""
    import time as _t

    r1 = os.path.join(OUT, "reads_R1.fastq.gz")
    r2 = os.path.join(OUT, "reads_R2.fastq.gz")
    if os.path.exists(r1) and os.path.exists(r2):
        print("paired fixture exists; done")
        return
    n_pairs = TOTAL_BP // (2 * READ_LEN)
    shares = np.array([28, 17, 11, 8, 6, 5, 3, 2], np.float64)
    shares = shares / shares.sum() * 0.8
    src_counts = (shares * n_pairs).astype(np.int64)
    n_noise = n_pairs - int(src_counts.sum())
    qual = b"I" * READ_LEN
    tmpl_mid = b"\n+\n" + qual + b"\n"
    CHUNK = 65536
    FRAG = 300

    def chunks(mate):
        rid = 0
        for src, cnt in enumerate(src_counts.tolist()):
            codes = genomes[src]
            g = np.random.default_rng(1000 + src)   # same frags per mate
            done = 0
            while done < cnt:
                b = min(CHUNK, cnt - done)
                fs = g.integers(0, GLEN - FRAG, size=b)
                starts = fs if mate == 1 else fs + FRAG - READ_LEN
                idx = starts[:, None] + np.arange(READ_LEN)[None, :]
                seqs = BASES[codes[idx]]
                parts = []
                for i in range(b):
                    parts.append(b"@p%d/%d\n" % (rid + i, mate))
                    parts.append(seqs[i].tobytes())
                    parts.append(tmpl_mid)
                yield b"".join(parts)
                rid += b
                done += b
        g = np.random.default_rng(2000 + mate)
        done = 0
        while done < n_noise:
            b = min(CHUNK, n_noise - done)
            seqs = BASES[g.integers(0, 4, size=(b, READ_LEN),
                                    dtype=np.uint8)]
            parts = []
            for i in range(b):
                parts.append(b"@q%d/%d\n" % (rid + i, mate))
                parts.append(seqs[i].tobytes())
                parts.append(tmpl_mid)
            yield b"".join(parts)
            rid += b
            done += b

    from sylph_tpu.io import bgzf
    for mate, path in ((1, r1), (2, r2)):
        bgzf.write(path, chunks(mate), level=1)
        print(f"[{_t.perf_counter() - t0:.0f}s] {path}: "
              f"{os.path.getsize(path) / 1e9:.2f} GB gz", flush=True)


if __name__ == "__main__":
    main()
