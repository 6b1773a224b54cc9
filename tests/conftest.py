"""Test env: run everything on a virtual 8-device CPU mesh so multi-chip
sharding is exercised without TPU hardware (capability the reference lacks —
SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# persistent compilation cache: XLA-CPU compiles of the UNet take minutes;
# cache them across test runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/minsu3d_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
