"""Dense-grid formulation of the sparse U-Net convolutions.

The gather-GEMM-scatter convs in :mod:`ops.sparse_conv` pay XLA's
random-gather tax (~5 ns/row structured, ~9 ns/elt random) on every tap:
~40M gathered rows/scene pin the backbone at ~0.195 s/scene regardless of
channel width (BENCH_NOTES round 3). This module computes the SAME
convolutions on a dense (B, X, Y, Z, C) scene grid instead: empty cells
hold exact zeros, so a dense cross-correlation masked back to the occupied
set is numerically a submanifold convolution (the masked-dense equivalence
the proposal heads already rely on — see model/general_model.py
clusters_voxelization). Dense convs stream HBM and ride the MXU via the
XLA conv emitter; at ScanNet scale (~(400, 400, 104) cells at 2 cm, 0.7%
occupancy) one 3^3 conv moves ~1.3 GB = ~1.6 ms at roofline vs ~16 ms for
the sparse gather formulation at level 0.

Semantics matched against the sparse ops (reference semantics in turn match
ME — minsu3d/model/module/common.py:85-95):

  * ``subm_conv_grid``  == sparse_conv.subm_conv: out[i] = sum_k W[k]^T
    x[coords[i] + OFFSETS[k]], k = (dx+1)*9 + (dy+1)*3 + (dz+1) — a
    cross-correlation with kernel[dx+1, dy+1, dz+1] = w27[k] (reshape).
  * ``down_conv_grid``  == sparse_conv.down_conv: out[p] = sum_kid
    W[kid]^T x[child c: c>>1 = p, kid = (cx&1)<<2|(cy&1)<<1|(cz&1)] — a
    stride-2 kernel-2 cross-correlation, kernel[κ] = w8[κx*4+κy*2+κz].
  * ``up_conv_grid``    == sparse_conv.up_conv: out[c] = W[kid(c)]^T
    parent[c>>1] — 8 parent-size GEMMs interleaved 2x along each axis.

Validity: every op returns exact zeros at unoccupied cells provided its
input does (convs see zero neighbors; BatchNorm must be masked by the
caller — blocks.MaskedBatchNorm already zeroes invalid rows).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from minsu3d_tpu.ops.sparse import GridPlan, Level


class DenseCtx(NamedTuple):
    """Per-level dense occupancy for a grid plan.

    masks[l]  (B, X_l, Y_l, Z_l) bool — occupied cells at level l
    shapes[l] (X_l, Y_l, Z_l)
    flat0     (V0,) int32 flat cell index of each level-0 voxel (B*X*Y*Z =
              out-of-grid/invalid, routed to a trash cell by scatter/gather)
    n_dropped () int32 level-0 voxels outside the configured grid extent
    """

    masks: tuple
    shapes: tuple
    flat0: jax.Array
    n_dropped: jax.Array


def grid_shapes(shape0: tuple[int, int, int], num_levels: int) -> tuple:
    """Per-level extents: parent coord = child >> 1 => ceil(extent / 2)."""
    shapes = [tuple(shape0)]
    for _ in range(1, num_levels):
        shapes.append(tuple((s + 1) >> 1 for s in shapes[-1]))
    return tuple(shapes)


def _flat_index(level: Level, shape: tuple[int, int, int], n_batch: int):
    """Flat (b, x, y, z) cell index per voxel; invalid/out-of-grid -> size."""
    x, y, z = level.coords[:, 0], level.coords[:, 1], level.coords[:, 2]
    sx, sy, sz = shape
    ok = (level.valid & (level.batch >= 0) & (level.batch < n_batch)
          & (x >= 0) & (x < sx) & (y >= 0) & (y < sy) & (z >= 0) & (z < sz))
    flat = ((level.batch * sx + x) * sy + y) * sz + z
    size = n_batch * sx * sy * sz
    return jnp.where(ok, flat, size).astype(jnp.int32), ok


def build_ctx(plan: GridPlan, shape0: tuple[int, int, int], n_batch: int) -> DenseCtx:
    """Occupancy masks for every level from the plan's voxel tables."""
    shapes = grid_shapes(shape0, len(plan.levels))
    masks = []
    flat0 = None
    n_dropped = None
    for lvl, shape in zip(plan.levels, shapes):
        flat, ok = _flat_index(lvl, shape, n_batch)
        size = n_batch * shape[0] * shape[1] * shape[2]
        m = jnp.zeros((size + 1,), bool).at[flat].set(ok)
        masks.append(m[:size].reshape((n_batch,) + shape))
        if flat0 is None:
            flat0 = flat
            n_dropped = jnp.sum(lvl.valid & ~ok).astype(jnp.int32)
    return DenseCtx(masks=tuple(masks), shapes=shapes, flat0=flat0,
                    n_dropped=n_dropped)


def scatter_to_grid(voxel_feats: jax.Array, ctx: DenseCtx, n_batch: int) -> jax.Array:
    """(V, C) voxel features -> (B, X, Y, Z, C) dense grid (empty = 0)."""
    c = voxel_feats.shape[-1]
    sx, sy, sz = ctx.shapes[0]
    size = n_batch * sx * sy * sz
    g = jnp.zeros((size + 1, c), voxel_feats.dtype).at[ctx.flat0].set(voxel_feats)
    return g[:size].reshape((n_batch, sx, sy, sz, c))


def gather_from_grid(grid: jax.Array, ctx: DenseCtx) -> jax.Array:
    """(B, X, Y, Z, C) -> (V, C) rows at the level-0 voxel cells (0 if absent)."""
    c = grid.shape[-1]
    flat = grid.reshape((-1, c))
    flat = jnp.concatenate([flat, jnp.zeros((1, c), grid.dtype)], axis=0)
    return flat[ctx.flat0]


_DN = jax.lax.conv_dimension_numbers((1, 1, 1, 1, 1), (1, 1, 1, 1, 1),
                                     ("NXYZC", "XYZIO", "NXYZC"))


def _conv(x: jax.Array, w: jax.Array, stride: int, compute_dtype) -> jax.Array:
    precision = None
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    if compute_dtype in (None, jnp.float32, "float32"):
        precision = jax.lax.Precision.HIGHEST
    return jax.lax.conv_general_dilated(
        x, w, (stride,) * 3, "SAME", dimension_numbers=_DN,
        preferred_element_type=jnp.float32, precision=precision)


def subm_conv_grid(x: jax.Array, mask: jax.Array, weight: jax.Array,
                   compute_dtype=None) -> jax.Array:
    """3^3 stride-1 conv masked to occupied cells. weight (27, Cin, Cout)."""
    w = weight.reshape((3, 3, 3) + weight.shape[1:])
    out = _conv(x, w, 1, compute_dtype)
    return jnp.where(mask[..., None], out, 0).astype(x.dtype)


def down_conv_grid(x: jax.Array, parent_mask: jax.Array, weight: jax.Array,
                   compute_dtype=None) -> jax.Array:
    """k2s2 strided conv to the parent grid. weight (8, Cin, Cout).

    SAME + stride 2 on kernel 2 pads odd extents with one zero plane at the
    END — exactly the child cells a (c >> 1) parent can cover. Masking by the
    parent occupancy zeroes parents with no occupied children.
    """
    w = weight.reshape((2, 2, 2) + weight.shape[1:])
    out = _conv(x, w, 2, compute_dtype)
    return jnp.where(parent_mask[..., None], out, 0).astype(x.dtype)


def up_conv_grid(parent: jax.Array, child_mask: jax.Array, weight: jax.Array,
                 compute_dtype=None) -> jax.Array:
    """k2s2 transposed conv back to the child grid. weight (8, Cp, Cc).

    out[c] = W[kid(c)]^T parent[c >> 1]: one batched GEMM at parent size per
    kid, interleaved 2x along each axis, sliced to the child extent.
    """
    b, px, py, pz, cp = parent.shape
    cc = weight.shape[-1]
    out_dtype = parent.dtype
    w = weight.reshape(2, 2, 2, cp, cc)
    precision = None
    if compute_dtype is not None:
        parent = parent.astype(compute_dtype)
        w = w.astype(compute_dtype)
    if compute_dtype in (None, jnp.float32, "float32"):
        precision = jax.lax.Precision.HIGHEST
    # (B,Px,Py,Pz,Cp) x (2,2,2,Cp,Cc) -> (B,Px,Py,Pz,2,2,2,Cc)
    y = jax.lax.dot_general(
        parent, w, dimension_numbers=(((4,), (3,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    # interleave: child cell 2p+κ reads y[p, κ]
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, 2 * px, 2 * py, 2 * pz, cc)
    sx, sy, sz = child_mask.shape[1:]
    y = y[:, :sx, :sy, :sz]
    return jnp.where(child_mask[..., None], y, 0).astype(out_dtype)
