"""Dev script: clean per-stage TPU timings (run with exclusive relay)."""
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from sylph_tpu.tpu.containment import compact_rows
from sylph_tpu.tpu.pallas_seeding import seed_hashes_pallas
from sylph_tpu.tpu.seeding import seed_hashes


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def sync(x):
    return float(np.asarray(x))


rng = np.random.default_rng(0)
N, L, C, K = 65536, 256, 200, 31
MBP = N * L / 1e9
bases = jax.device_put(rng.integers(0, 4, size=(N, L),
                                    dtype=np.uint8).astype(np.uint32))
lengths = jax.device_put(np.full(N, L, np.int32))
log(f"data on device ({N}x{L} = {MBP*1000:.1f} Mbp)")

# 1. XLA seeding
t0 = time.perf_counter()
hhi, hlo, keep = seed_hashes(bases, lengths, c=C, k=K)
s = sync(keep.sum())
log(f"xla seed compile+run: {time.perf_counter()-t0:.1f}s survivors={s}")
t0 = time.perf_counter()
R = 5
for _ in range(R):
    hhi, hlo, keep = seed_hashes(bases, lengths, c=C, k=K)
s = sync(keep.sum())
dt = (time.perf_counter() - t0) / R
log(f"xla seed: {dt*1000:.1f} ms -> {MBP/dt:.2f} Gbp/s")

# 2. pallas seeding
t0 = time.perf_counter()
phi, plo, pkeep = seed_hashes_pallas(bases, lengths, c=C, k=K)
s2 = sync(pkeep.sum())
log(f"pallas seed compile+run: {time.perf_counter()-t0:.1f}s "
    f"survivors={s2} (match={s2==s})")
t0 = time.perf_counter()
for _ in range(R):
    phi, plo, pkeep = seed_hashes_pallas(bases, lengths, c=C, k=K)
s2 = sync(pkeep.sum())
dt = (time.perf_counter() - t0) / R
log(f"pallas seed: {dt*1000:.1f} ms -> {MBP/dt:.2f} Gbp/s")

# 3. compaction (row-sort)
cap = 4 * 512 // C + 8
f = jax.jit(lambda a, b, m: compact_rows(a, b, m, 512, cap))
t0 = time.perf_counter()
chi, clo = f(phi, plo, pkeep)
s3 = sync((chi != np.uint32(0xFFFFFFFF)).sum())
log(f"compact compile+run: {time.perf_counter()-t0:.1f}s kept={s3}")
t0 = time.perf_counter()
for _ in range(R):
    chi, clo = f(phi, plo, pkeep)
s3 = sync((chi != np.uint32(0xFFFFFFFF)).sum())
dt = (time.perf_counter() - t0) / R
log(f"compact: {dt*1000:.1f} ms -> {MBP/dt:.2f} Gbp/s")
log("done")
