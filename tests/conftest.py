"""Test env: run everything on a virtual 8-device CPU mesh so multi-chip
sharding is exercised without TPU hardware (capability the reference lacks —
SURVEY.md §4).

NB: this image's sitecustomize imports jax with JAX_PLATFORMS=axon (remote
TPU tunnel) before conftest runs, so the env var alone is ignored —
``jax.config.update`` is required to actually select CPU.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# persistent compilation cache across test runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/minsu3d_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
