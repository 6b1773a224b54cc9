"""Point offset losses (reference minsu3d/loss/pt_offset_loss.py:6-38):
L1-norm distance + negative cosine direction over instance-assigned points."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _l2_normalize(x: jax.Array, eps: float) -> jax.Array:
    # torch F.normalize: x / max(||x||, eps)
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(norm, eps)


def pt_offset_loss(pred_offsets: jax.Array, gt_offsets: jax.Array, valid_mask: jax.Array):
    """Returns (offset_norm_loss, offset_dir_loss); zero when no valid points."""
    eps = jnp.finfo(jnp.float32).eps
    count = jnp.sum(valid_mask.astype(jnp.float32))
    safe = jnp.maximum(count, 1.0)
    m = valid_mask.astype(jnp.float32)

    dist = jnp.sum(jnp.abs(pred_offsets - gt_offsets), axis=-1)
    norm_loss = jnp.sum(dist * m) / safe

    gt_n = _l2_normalize(gt_offsets, eps)
    pr_n = _l2_normalize(pred_offsets, eps)
    dir_loss = jnp.sum(-jnp.sum(gt_n * pr_n, axis=-1) * m) / safe

    has = count > 0
    return jnp.where(has, norm_loss, 0.0), jnp.where(has, dir_loss, 0.0)
