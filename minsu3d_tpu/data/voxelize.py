"""Host-side voxelization — replacement for ME.utils.sparse_quantize as used
at reference general_dataset.py:159-163 (quantize coords, unique voxels,
representative features, point->voxel inverse map).

Pure NumPy; a C++ fast path (csrc/voxelize) is used when compiled.
"""

from __future__ import annotations

import numpy as np

from minsu3d_tpu.csrc import native


def sparse_quantize(coords: np.ndarray, feats: np.ndarray, quantization_size: float = 1.0):
    """Quantize float coords to integer voxels.

    Returns (voxel_coords (V,3) int32, voxel_feats (V,C), p2v (N,) int32)
    where ``p2v`` maps every input point to its voxel row. The representative
    feature of a voxel is its first point in input order (ME subsamples one
    point per voxel; the reference consumes it the same way).
    """
    grid = np.floor(coords / quantization_size).astype(np.int64)
    if native.available():
        return native.sparse_quantize(grid, feats)
    gmin = grid.min(0)
    grid -= gmin
    extent = grid.max(0) + 1
    key = (grid[:, 0] * extent[1] + grid[:, 1]) * extent[2] + grid[:, 2]
    uniq, first_idx, inverse = np.unique(key, return_index=True, return_inverse=True)
    voxel_coords = grid[first_idx].astype(np.int32) + gmin.astype(np.int32)
    voxel_feats = feats[first_idx]
    return voxel_coords, voxel_feats, inverse.astype(np.int32)
