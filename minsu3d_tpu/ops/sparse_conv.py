"""Functional sparse convolution primitives over :mod:`ops.sparse` grid plans.

TPU-native gather-GEMM-scatter replacing MinkowskiEngine's convolutions
(reference minsu3d/model/module/common.py, backbone.py):

  * ``subm_conv``   — 3^3 stride-1 conv on the level's own coordinates
                      (= ME.MinkowskiConvolution(k=3, s=1); ME stride-1 convs
                      emit outputs on the input coordinate map)
  * ``down_conv``   — k2s2 strided conv to the parent level
                      (= ME.MinkowskiConvolution(k=2, s=2))
  * ``up_conv``     — k2s2 transposed conv back to the child level
                      (= ME.MinkowskiConvolutionTranspose(k=2, s=2))

All taps are dense (V, Cin) x (Cin, Cout) GEMMs on the MXU; neighbor gathers
read a zero row at index ``cap`` for missing taps, so no masks enter the
matmul path. Neighbor taps are processed in groups: a group of g taps becomes
one (V, g*Cin) x (g*Cin, Cout) GEMM, trading HBM traffic for MXU-friendly
contraction depth.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minsu3d_tpu.ops.sparse import Level


def _mm(a: jax.Array, b: jax.Array, compute_dtype=None) -> jax.Array:
    # compute_dtype=bfloat16 -> fast MXU path (bf16 multiply, f32 accumulate);
    # compute_dtype=None/float32 -> exact f32 ('highest' = multi-pass on TPU).
    precision = None
    if compute_dtype is not None:
        a = a.astype(compute_dtype)
        b = b.astype(compute_dtype)
    if compute_dtype in (None, jnp.float32, "float32"):
        precision = jax.lax.Precision.HIGHEST
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )


def ext_zero(feats: jax.Array) -> jax.Array:
    """Append a zero row: index ``cap`` gathers zeros (missing neighbor)."""
    return jnp.concatenate([feats, jnp.zeros((1,) + feats.shape[1:], feats.dtype)], axis=0)


def subm_conv(feats: jax.Array, level: Level, weight: jax.Array,
              compute_dtype=None, tap_group: int = 27) -> jax.Array:
    """3^3 submanifold convolution. feats (V, Cin), weight (27, Cin, Cout)."""
    v, cin = feats.shape
    cout = weight.shape[-1]
    fe = ext_zero(feats)
    out = jnp.zeros((v, cout), jnp.float32)
    for g0 in range(0, 27, tap_group):
        g1 = min(g0 + tap_group, 27)
        g = g1 - g0
        gathered = fe[level.nbr_idx[:, g0:g1]]            # (V, g, Cin)
        w = weight[g0:g1].reshape(g * cin, cout)
        out = out + _mm(gathered.reshape(v, g * cin), w, compute_dtype)
    return out.astype(feats.dtype)


def down_conv(feats: jax.Array, child: Level, parent_cap: int, weight: jax.Array,
              compute_dtype=None) -> jax.Array:
    """k2s2 strided conv: child level -> parent level. weight (8, Cin, Cout)."""
    v, cin = feats.shape
    cout = weight.shape[-1]
    contrib = jnp.zeros((v, cout), jnp.float32)
    for k in range(8):
        masked = jnp.where((child.child_kid == k)[:, None], feats, 0)
        contrib = contrib + _mm(masked, weight[k], compute_dtype)
    contrib = jnp.where(child.valid[:, None], contrib, 0)
    out = jnp.zeros((parent_cap + 1, cout), jnp.float32).at[child.parent_idx].add(contrib)
    return out[:parent_cap].astype(feats.dtype)


def up_conv(parent_feats: jax.Array, child: Level, weight: jax.Array,
            compute_dtype=None) -> jax.Array:
    """k2s2 transposed conv: parent level -> child level. weight (8, Cp, Cc)."""
    pf = ext_zero(parent_feats)[child.parent_idx]          # (V, Cp)
    v = pf.shape[0]
    cout = weight.shape[-1]
    out = jnp.zeros((v, cout), jnp.float32)
    for k in range(8):
        masked = jnp.where((child.child_kid == k)[:, None], pf, 0)
        out = out + _mm(masked, weight[k], compute_dtype)
    out = jnp.where(child.valid[:, None], out, 0)
    return out.astype(parent_feats.dtype)
