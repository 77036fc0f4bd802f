"""Generate the GTDB-scale CLI benchmark fixture (once; cached on disk).

Produces in .bench_data/gtdb_cli/:
  - db.syldb         : 100,000 synthetic genome sketches, 7,168 k-mers each
                       (~5.8 GB; the same hash population as the grange
                       bench index — reference headline scale,
                       /root/reference/README.md:28,42-48)
  - reads.fastq.gz   : ~1.07 Gbp of 150-bp reads. 64 "abundant" genomes
                       carry their full plantable k-mer set at a
                       zero-truncated-Poisson-like multiplicity mix
                       (lambda ~0.6) — containment ~12.5%, naive ANI
                       ~93.5%, ADJUSTED ANI ~95.9%: only sylph's
                       low-coverage lambda correction lifts them over the
                       profile threshold, so the fixture exercises the
                       full statistics chain at database scale. Remaining
                       reads carry singleton background plants over all
                       genomes (~1% containment noise, filtered).

bench.py --config gtdb_cli then times
`sylph profile --tpu db.syldb reads.fastq.gz` file -> TSV.

Run: python scripts/gen_gtdb_cli_fixture.py [--genomes 100000]
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

if os.environ.get("MALLOC_MMAP_THRESHOLD_") is None and __name__ == "__main__":
    env = dict(os.environ, MALLOC_MMAP_THRESHOLD_="17179869184",
               MALLOC_TRIM_THRESHOLD_="-1", MALLOC_ARENA_MAX="1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import numpy as np

KPG = 7168
READ_LEN = 150
TOTAL_BP = 1_073_741_824
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def usable_mask(kmers_u64: np.ndarray) -> np.ndarray:
    """True where the hash inverts to a valid canonical 31-mer."""
    from bench import _rc31_np
    from sylph_tpu.kmer.hashing import inv_mm_hash64_np
    v = inv_mm_hash64_np(kmers_u64)
    return (v < np.uint64(1) << np.uint64(62)) & (v <= _rc31_np(v))


def synth_syldb(path: str, G: int, kpg: int = KPG, c: int = 200,
                seed: int = 1, log=lambda *_: None):
    """Write a synthetic .syldb: G genomes x kpg k-mers from the same hash
    population as bench.load_gtdb_index (grouped per genome)."""
    from bench import _synth_sorted_index
    from sylph_tpu.core.native_core import radix_sort_kv
    from sylph_tpu.core.types import GenomeSketch
    from sylph_tpu.io.sylformat import write_syldb

    kmers, gids = _synth_sorted_index(G * kpg, G, c, seed=seed)
    log("index synthesized")
    keys = gids.astype(np.uint64)
    pos = np.arange(kmers.size, dtype=np.int32)
    if not radix_sort_kv(keys, pos):
        pos = np.argsort(gids, kind="stable").astype(np.int32)
    by_gid = kmers[pos]
    counts = np.bincount(gids, minlength=G)
    offs = np.concatenate([[0], np.cumsum(counts)])
    log("grouped by genome")
    sketches = []
    for g in range(G):
        sketches.append(GenomeSketch(
            genome_kmers=np.ascontiguousarray(by_gid[offs[g]:offs[g + 1]]),
            # empty (not None): None marks a --disable-profiling database
            pseudotax_tracked_nonused_kmers=np.empty(0, np.uint64),
            file_name=f"synthetic/g{g:06d}.fa",
            first_contig_name=f"synthetic_contig_{g:06d}",
            c=c, k=31, gn_size=kpg * c, min_spacing=30))
    log("sketch objects built")
    write_syldb(path, sketches)
    log("syldb written")
    return kmers, gids


def plant_codes(plants_u64: np.ndarray) -> np.ndarray:
    """[n, 31] uint8 base codes for index hashes (must be usable)."""
    from sylph_tpu.kmer.hashing import inv_mm_hash64_np
    v = inv_mm_hash64_np(plants_u64)
    sh = (2 * (30 - np.arange(31, dtype=np.uint64)))[None, :]
    return ((v[:, None] >> sh) & np.uint64(3)).astype(np.uint8)


def synth_planted_fastq(path: str, kmers: np.ndarray, gids: np.ndarray,
                        G: int, total_bp: int = TOTAL_BP,
                        read_len: int = READ_LEN, n_abundant: int = 64,
                        seed: int = 9, log=lambda *_: None):
    """Planted read set (see module docstring). Returns n_reads."""
    rng = np.random.default_rng(seed)
    n_reads = total_bp // read_len

    ab_cand = kmers[gids < n_abundant]     # subset BEFORE the inversion
    ab = ab_cand[usable_mask(ab_cand)]
    # multiplicity mix ~ zero-truncated Poisson(~0.5): all once, 20% twice
    # (ratio-lambda then lands ~0.67 and the adjusted ANI clears the 95
    # floor at ~12.5% containment — the low-coverage correction regime)
    extra = ab[rng.random(ab.size) < 0.20]
    ab_plants = np.concatenate([ab, extra])
    log(f"abundant plants: {ab.size} unique over {n_abundant} genomes, "
        f"{ab_plants.size} occurrences")

    n_bg = n_reads - ab_plants.size
    stride = max(1, kmers.size // int(n_bg * 8.6))
    cand = kmers[::stride]
    cand_g = gids[::stride]
    # keep the abundant genomes' multiplicity mix clean: background
    # singletons come from the other genomes only
    cand = cand[cand_g >= n_abundant]
    bg = cand[usable_mask(cand)]
    if bg.size < n_bg:
        bg = np.tile(bg, -(-n_bg // max(1, bg.size)))
    plants = np.concatenate([ab_plants, bg[:n_bg]])
    rng.shuffle(plants)
    log(f"total plants: {plants.size} ({n_reads} reads)")

    qual = b"I" * read_len
    tmpl_mid = b"\n+\n" + qual + b"\n"
    CHUNK = 65536

    def text_chunks():
        rid = 0
        for s in range(0, n_reads, CHUNK):
            b = min(CHUNK, n_reads - s)
            codes = rng.integers(0, 4, size=(b, read_len), dtype=np.uint8)
            pc = plant_codes(plants[s:s + b])
            off = rng.integers(0, read_len - 31 + 1, size=b)
            cols = off[:, None] + np.arange(31)[None, :]
            np.put_along_axis(codes, cols, pc, axis=1)
            seqs = BASES[codes]
            parts = []
            for i in range(b):
                parts.append(b"@r%d\n" % (rid + i))
                parts.append(seqs[i].tobytes())
                parts.append(tmpl_mid)
            yield b"".join(parts)
            rid += b
            if (s // CHUNK) % 16 == 0:
                log(f"reads {rid}/{n_reads}")

    from sylph_tpu.io import bgzf
    bgzf.write(path, text_chunks(), level=1)
    log("fastq written")
    return n_reads


def main():
    t0 = time.perf_counter()

    def log(msg):
        print(f"[{time.perf_counter() - t0:.0f}s] {msg}", flush=True)

    G = (int(sys.argv[sys.argv.index("--genomes") + 1])
         if "--genomes" in sys.argv else 100_000)
    out = os.path.join(ROOT, ".bench_data", "gtdb_cli")
    os.makedirs(out, exist_ok=True)
    db = os.path.join(out, "db.syldb")
    rf = os.path.join(out, "reads.fastq.gz")
    if os.path.exists(db) and os.path.exists(rf):
        print("fixture exists")
        return
    kmers, gids = synth_syldb(db, G, log=log)
    synth_planted_fastq(rf, kmers, gids, G, log=log)
    log(f"DONE: {os.path.getsize(db) / 1e9:.2f} GB syldb, "
        f"{os.path.getsize(rf) / 1e9:.2f} GB fastq.gz")


if __name__ == "__main__":
    main()
