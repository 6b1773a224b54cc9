"""Point offset losses (reference minsu3d/loss/pt_offset_loss.py:6-38):
L1-norm distance + negative cosine direction over instance-assigned points."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _l2_normalize(x: jax.Array, eps: float) -> jax.Array:
    # torch F.normalize: x / max(||x||, eps). The 1e-20 inside the sqrt keeps
    # its gradient finite at exactly-zero vectors (points at their instance
    # centroid) without measurably changing the value.
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-20)
    return x / jnp.maximum(norm, eps)


def pt_offset_loss(pred_offsets: jax.Array, gt_offsets: jax.Array, valid_mask: jax.Array):
    """Returns (offset_norm_loss, offset_dir_loss); zero when no valid points."""
    eps = jnp.finfo(jnp.float32).eps
    count = jnp.sum(valid_mask.astype(jnp.float32))
    safe = jnp.maximum(count, 1.0)
    m = valid_mask.astype(jnp.float32)

    dist = jnp.sum(jnp.abs(pred_offsets - gt_offsets), axis=-1)
    norm_loss = jnp.sum(dist * m) / safe

    # double-where: masked rows must not reach sqrt(0) — its grad is inf,
    # and inf * 0 mask = NaN in the backward pass
    ones = jnp.ones_like(pred_offsets)
    gt_safe = jnp.where(valid_mask[:, None], gt_offsets, ones)
    pr_safe = jnp.where(valid_mask[:, None], pred_offsets, ones)
    gt_n = _l2_normalize(gt_safe, eps)
    pr_n = _l2_normalize(pr_safe, eps)
    dir_loss = jnp.sum(-jnp.sum(gt_n * pr_n, axis=-1) * m) / safe

    has = count > 0
    return jnp.where(has, norm_loss, 0.0), jnp.where(has, dir_loss, 0.0)
