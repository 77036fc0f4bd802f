import os

# Multi-device sharding tests run on a virtual 8-device CPU mesh; device
# kernels are validated on CPU and exercised on real TPU only in bench.py.
# XLA_FLAGS must be set before the CPU client is created.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize registers the real-TPU PJRT plugin and
# force-sets jax_platforms back to "axon,cpu"; undo that for the test run
# (the config is read lazily at first backend use, which happens after
# collection).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
