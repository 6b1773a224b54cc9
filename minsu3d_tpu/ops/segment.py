"""Segment (ragged-group) reductions — TPU equivalents of the reference's
CUDA segment kernels (SURVEY.md §2.3 O5-O7):

  * sec_mean / sec_min / sec_max  (reference src/sec_mean/sec_mean.cu:12-86)
  * roipool (segment max; exact autodiff via JAX's segment_max gradient,
    matching the argmax-scatter backward of src/roipool/roipool.cu:12-57)
  * global_avg_pool (src/roipool/roipool.cu:60-119)

Groups are expressed as a per-row segment id vector (padded rows get
``num_segments``), not CSR offsets — the natural layout for fixed-capacity
XLA buffers. ``valid`` masks padded rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = jnp.float32(1e30)


def _drop_pad(x: jax.Array, num_segments: int) -> jax.Array:
    return x[:num_segments]


def segment_sum(data: jax.Array, seg_id: jax.Array, num_segments: int) -> jax.Array:
    return _drop_pad(
        jnp.zeros((num_segments + 1,) + data.shape[1:], data.dtype).at[seg_id].add(data),
        num_segments,
    )


def segment_count(seg_id: jax.Array, valid: jax.Array, num_segments: int) -> jax.Array:
    ones = valid.astype(jnp.int32)
    return _drop_pad(
        jnp.zeros((num_segments + 1,), jnp.int32).at[seg_id].add(ones), num_segments
    )


def sec_mean(data: jax.Array, seg_id: jax.Array, valid: jax.Array, num_segments: int) -> jax.Array:
    data = jnp.where(valid[:, None], data, 0)
    tot = segment_sum(data, seg_id, num_segments)
    cnt = segment_count(seg_id, valid, num_segments)
    return tot / jnp.maximum(cnt, 1)[:, None].astype(data.dtype)


def sec_min(data: jax.Array, seg_id: jax.Array, valid: jax.Array, num_segments: int) -> jax.Array:
    data = jnp.where(valid[:, None], data, _BIG)
    out = jnp.full((num_segments + 1,) + data.shape[1:], _BIG, data.dtype).at[seg_id].min(data)
    out = _drop_pad(out, num_segments)
    return jnp.where(out >= _BIG, 0, out)  # empty segments -> 0 (ref zero-init)


def sec_max(data: jax.Array, seg_id: jax.Array, valid: jax.Array, num_segments: int) -> jax.Array:
    data = jnp.where(valid[:, None], data, -_BIG)
    out = jnp.full((num_segments + 1,) + data.shape[1:], -_BIG, data.dtype).at[seg_id].max(data)
    out = _drop_pad(out, num_segments)
    return jnp.where(out <= -_BIG, 0, out)


def roipool(feats: jax.Array, seg_id: jax.Array, valid: jax.Array, num_segments: int) -> jax.Array:
    """Per-segment channelwise max-pool (reference roipool_fp).

    JAX's scatter-max gradient routes cotangents to (one) argmax row, matching
    the recorded-argmax backward of the reference kernel.
    """
    seg_id = jnp.where(valid, seg_id, num_segments)
    out = jax.ops.segment_max(feats, seg_id, num_segments=num_segments + 1)
    out = _drop_pad(out, num_segments)
    return jnp.where(jnp.isfinite(out), out, 0)


def global_avg_pool(feats: jax.Array, seg_id: jax.Array, valid: jax.Array, num_segments: int) -> jax.Array:
    """Per-segment mean-pool with exact mean backward (reference global_avg_pool)."""
    return sec_mean(feats, seg_id, valid, num_segments)
