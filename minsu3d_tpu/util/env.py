"""Runtime environment setup shared by all CLIs."""

from __future__ import annotations

import os


def setup_jax_cache(cache_dir: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (compiles of the 7-level
    UNet take tens of seconds; cache them across runs)."""
    cache_dir = cache_dir or os.environ.get(
        "MINSU3D_JAX_CACHE", os.path.expanduser("~/.cache/minsu3d_tpu_jax"))
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
