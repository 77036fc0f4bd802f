"""Device (TPU) compute path: JAX/XLA implementations of the hot loops.

Everything here is jittable, static-shape, and runs on uint32 pairs (TPUs
have no native 64-bit integers). The host pipeline (numpy, f64) remains the
bit-parity oracle; this path is the throughput engine.
"""
