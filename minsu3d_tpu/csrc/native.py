"""ctypes loader for the optional C++ host-runtime library (libminsu3d_host).

The reference keeps its hot host paths in C++ (common_ops extension); here the
device compute is XLA/Pallas, so the native surface is the *input pipeline*:
voxelization and batch packing. Falls back to NumPy when not compiled.
Build with: ``python -m minsu3d_tpu.csrc.build`` (uses g++, no deps).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "libminsu3d_host.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if os.path.exists(path):
        try:
            lib = ctypes.CDLL(path)
            lib.ms3d_sparse_quantize.restype = ctypes.c_int64
            _LIB = lib
        except OSError:
            _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def sparse_quantize(grid: np.ndarray, feats: np.ndarray):
    """C++ hash-based unique. grid (N,3) int64 (already floored), feats (N,C)."""
    lib = _load()
    n = grid.shape[0]
    grid = np.ascontiguousarray(grid, dtype=np.int64)
    p2v = np.empty(n, dtype=np.int32)
    first_idx = np.empty(n, dtype=np.int32)
    n_voxels = lib.ms3d_sparse_quantize(
        grid.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(n),
        p2v.ctypes.data_as(ctypes.c_void_p), first_idx.ctypes.data_as(ctypes.c_void_p),
    )
    first_idx = first_idx[:n_voxels]
    return grid[first_idx].astype(np.int32), feats[first_idx], p2v
