"""Stage timing / observability.

The reference's only observability is log levels (SURVEY.md §5); the TPU
framework adds per-stage wall-clock + throughput logging and an optional
jax.profiler trace. All output rides the standard `sylph` logger at DEBUG
(`--debug`), so default runs stay quiet.
"""

import contextlib
import logging
import time

log = logging.getLogger("sylph")


@contextlib.contextmanager
def stage_timer(stage: str, bases: int = 0, items: int = 0):
    """Log `stage took X s [Y Gbp/s | Z items/s]` at DEBUG on exit."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        extra = ""
        if bases and dt > 0:
            extra = f" ({bases / dt / 1e9:.3f} Gbp/s)"
        elif items and dt > 0:
            extra = f" ({items / dt:.1f} items/s)"
        log.debug("[timing] %s: %.3f s%s", stage, dt, extra)


class PhaseAcc:
    """Thread-safe per-phase busy-time accumulator for pipelined stages.

    Used by the streaming ingest (--debug) to attribute wall time across
    the decode / parse / seed / fingerprint / fold threads — the numbers
    are per-phase BUSY seconds summed over threads, not wall time, so
    they diagnose which stage is the pipeline's critical path."""

    def __init__(self):
        import threading
        self._t = {}
        self._lock = threading.Lock()

    def add(self, name: str, dt: float):
        with self._lock:
            self._t[name] = self._t.get(name, 0.0) + dt

    @contextlib.contextmanager
    def timed(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.add(name, time.perf_counter() - t0)

    def log_summary(self, label: str, wall: float):
        parts = " ".join(f"{k}={v:.2f}" for k, v in sorted(self._t.items()))
        log.debug("[ingest] %s wall=%.2f s | busy: %s", label, wall, parts)


@contextlib.contextmanager
def maybe_profile(trace_dir):
    """jax.profiler.trace(trace_dir) when set; no-op otherwise."""
    if not trace_dir:
        yield
        return
    import jax
    started = False
    try:
        jax.profiler.start_trace(trace_dir)
        started = True
    except Exception as e:  # profiling is best-effort (backend-dependent)
        log.warning("Profiler trace failed to start (%s); continuing.", e)
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                log.info("Wrote profiler trace to %s", trace_dir)
            except Exception as e:
                log.warning("Profiler trace failed to stop (%s).", e)
