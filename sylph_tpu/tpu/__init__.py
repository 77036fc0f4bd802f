"""Device (TPU) compute path: JAX/XLA implementations of the hot loops.

Everything here is jittable, static-shape, and runs on uint32 pairs (TPUs
have no native 64-bit integers). The host pipeline (numpy, f64) remains the
bit-parity oracle; this path is the throughput engine.
"""

import os

_CACHE_CONFIGURED = False


def configure_persistent_cache() -> None:
    """Point JAX at the repo-local persistent compilation cache.

    Remote XLA compiles through the TPU relay take minutes; every device
    entry point (CLI --tpu, bench, library API) calls this so a process
    never pays for a program another process already compiled. Idempotent.
    """
    global _CACHE_CONFIGURED
    if _CACHE_CONFIGURED:
        return
    import jax
    cache_dir = os.environ.get(
        "SYLPH_TPU_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:   # config name drift across jax versions: non-fatal
        pass
    _CACHE_CONFIGURED = True
