"""Produce the host-engine golden TSV for the gtdb_cli fixture (once).

`sylph profile` (NO --tpu) of the planted 1.07 Gbp fastq against the
100k-genome syldb; the device run (bench --config gtdb_cli) must be
byte-identical. Writes .bench_data/gtdb_cli/golden_host.tsv.
"""
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

if os.environ.get("MALLOC_MMAP_THRESHOLD_") is None:
    env = dict(os.environ, MALLOC_MMAP_THRESHOLD_="17179869184",
               MALLOC_TRIM_THRESHOLD_="-1", MALLOC_ARENA_MAX="1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def main():
    d = os.path.join(ROOT, ".bench_data", "gtdb_cli")
    db = os.path.join(d, "db.syldb")
    rf = os.path.join(d, "reads.fastq.gz")
    out_path = os.path.join(d, "golden_host.tsv")
    if not (os.path.exists(db) and os.path.exists(rf)):
        raise SystemExit("run scripts/gen_gtdb_cli_fixture.py first")
    from sylph_tpu.engine.runner import ContainOptions, contain
    t0 = time.perf_counter()
    with open(out_path + ".tmp", "w") as out:
        contain(ContainOptions(files=[db, rf], threads=4),
                pseudotax=True, out=out)
    os.replace(out_path + ".tmp", out_path)
    n = sum(1 for _ in open(out_path)) - 1
    print(f"host golden: {n} rows in {time.perf_counter() - t0:.0f}s "
          f"-> {out_path}", flush=True)


if __name__ == "__main__":
    main()
