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


def _ptr(a: np.ndarray) -> ctypes.c_void_p:
    return a.ctypes.data_as(ctypes.c_void_p)


def build_plan_host(vbatch: np.ndarray, vcoords: np.ndarray, vmask: np.ndarray,
                    caps: list[int], num_levels: int) -> dict[str, np.ndarray] | None:
    """Full UNet grid plan on the host (native mirror of ops/sparse.build_plan).

    Returns a flat dict of ``plan{l}_*`` arrays (bit-identical to the device
    builder's Level fields — tests/test_sparse.py compares them) plus
    ``plan_row2voxel`` (input voxel row -> level-0 index) and ``plan{l}_featsrc``
    (level-0 table index -> representative input row, -1 pad). None when the
    native library is not built.
    """
    lib = _load()
    if lib is None:
        return None
    vbatch = np.ascontiguousarray(vbatch, dtype=np.int32)
    vcoords = np.ascontiguousarray(vcoords, dtype=np.int32)
    vmask = np.ascontiguousarray(vmask, dtype=np.uint8)
    n_rows = vbatch.shape[0]

    out: dict[str, np.ndarray] = {}
    cur_batch, cur_coords, cur_valid = vbatch, vcoords, vmask
    for lvl in range(num_levels):
        cap = int(caps[lvl])
        khi = np.empty(cap, np.int32)
        klo = np.empty(cap, np.int32)
        coords = np.empty((cap, 3), np.int32)
        batch = np.empty(cap, np.int32)
        valid = np.empty(cap, np.uint8)
        r2v = np.empty(len(cur_batch), np.int32)
        featsrc = np.empty(cap, np.int32)
        dropped = np.zeros(1, np.int32)
        count = lib.ms3d_plan_base(
            _ptr(cur_batch), _ptr(cur_coords), _ptr(cur_valid),
            ctypes.c_int64(len(cur_batch)), ctypes.c_int32(cap),
            _ptr(khi), _ptr(klo), _ptr(coords), _ptr(batch), _ptr(valid),
            _ptr(r2v), _ptr(featsrc), _ptr(dropped))
        nbr = np.empty((cap, 27), np.int32)
        lib.ms3d_plan_neighbors(_ptr(khi), _ptr(klo), _ptr(coords), _ptr(batch),
                                ctypes.c_int32(count), ctypes.c_int32(cap), _ptr(nbr))
        out[f"plan{lvl}_khi"] = khi
        out[f"plan{lvl}_klo"] = klo
        out[f"plan{lvl}_coords"] = coords
        out[f"plan{lvl}_batch"] = batch
        out[f"plan{lvl}_valid"] = valid.astype(bool)
        out[f"plan{lvl}_count"] = np.int32(count)
        out[f"plan{lvl}_dropped"] = np.int32(dropped[0])
        out[f"plan{lvl}_nbr"] = nbr
        if lvl == 0:
            out["plan_row2voxel"] = r2v
            out["plan0_featsrc"] = featsrc
        else:
            # link the child level to this parent (ops/sparse.py::build_parent)
            pc = out[f"plan{lvl - 1}_coords"]
            kid = ((pc[:, 0] & 1) << 2) | ((pc[:, 1] & 1) << 1) | (pc[:, 2] & 1)
            out[f"plan{lvl - 1}_parent"] = r2v
            out[f"plan{lvl - 1}_kid"] = np.where(out[f"plan{lvl - 1}_valid"], kid, 0).astype(np.int32)
        cur_batch, cur_coords, cur_valid = (
            batch, coords >> 1, valid)
    return out
