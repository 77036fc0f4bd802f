"""One instrumented e2e profile run: fixture fastq.gz -> TSV with --debug
stage timers + ingest phase accounting printed to stderr (dev tool).

Usage: python scripts/e2e_debug.py [--paired] [n_runs]
"""
import io
import logging
import os
import sys
import time

if "MALLOC_TRIM_THRESHOLD_" not in os.environ and __name__ == "__main__":
    os.environ["MALLOC_MMAP_THRESHOLD_"] = "17179869184"
    os.environ["MALLOC_TRIM_THRESHOLD_"] = "-1"
    os.environ["MALLOC_ARENA_MAX"] = "1"
    os.execv(sys.executable, [sys.executable] + sys.argv)

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

logging.basicConfig(level=logging.DEBUG,
                    format="%(asctime)s %(levelname)s %(message)s")
logging.getLogger("jax").setLevel(logging.WARNING)

from sylph_tpu.engine.runner import ContainOptions, contain  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DB = os.path.join(ROOT, ".bench_data", "e2e", "db.syldb")
READS = os.path.join(ROOT, ".bench_data", "e2e", "reads.fastq.gz")
R1 = os.path.join(ROOT, ".bench_data", "e2e", "reads_R1.fastq.gz")
R2 = os.path.join(ROOT, ".bench_data", "e2e", "reads_R2.fastq.gz")

paired = "--paired" in sys.argv
runs = int(sys.argv[-1]) if sys.argv[-1].isdigit() else 2

for i in range(runs):
    out = io.StringIO()
    t0 = time.perf_counter()
    if paired:
        contain(ContainOptions(files=[DB], first_pair=[R1],
                               second_pair=[R2], tpu=True, threads=4),
                pseudotax=True, out=out)
    else:
        contain(ContainOptions(files=[DB, READS], tpu=True, threads=4),
                pseudotax=True, out=out)
    dt = time.perf_counter() - t0
    n = len(out.getvalue().strip().splitlines())
    print(f"### run {i}: {dt:.2f}s  ({1.07374 / dt:.3f} Gbp/s, "
          f"{n} TSV lines)", flush=True)
