"""Proposal <-> GT-instance IoU ops — TPU equivalents of reference O8-O11
(src/get_iou/get_iou.cu:12-38, src/cal_iou_and_masklabel/cal_iou_and_
masklabel.cu:14-105).

Proposals are "rows": fixed-capacity (point_idx, proposal_id) membership pairs
with a validity mask — the static-shape analogue of the reference's ragged
(proposals_idx, proposals_offset). All reductions are one-hot scatter-adds
into dense (P, I) matrices; the ``+1e-5`` IoU denominator matches the CUDA
kernels exactly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ProposalRows(NamedTuple):
    point_idx: jax.Array  # (R,) int32 index into the point axis
    prop_id: jax.Array    # (R,) int32 in [0, P) or P for invalid
    valid: jax.Array      # (R,) bool
    n_proposals: jax.Array  # () int32


def proposal_sizes(rows: ProposalRows, p_cap: int, weights: jax.Array | None = None) -> jax.Array:
    w = rows.valid.astype(jnp.float32)
    if weights is not None:
        w = w * weights
    pid = jnp.where(rows.valid, rows.prop_id, p_cap)
    return jnp.zeros((p_cap + 1,), jnp.float32).at[pid].add(w)[:p_cap]


def get_iou(rows: ProposalRows, p_cap: int, instance_ids: jax.Array,
            instance_num_point: jax.Array, i_cap: int,
            row_weights: jax.Array | None = None) -> jax.Array:
    """Dense (P, I) IoU between proposals and gt instances.

    ``row_weights`` (0/1 per row) implements get_mask_iou_on_pred's
    mask_scores_sigmoid > 0.5 filter (cal_iou_and_masklabel.cu:40-71);
    None matches get_iou / get_mask_iou_on_cluster.
    """
    inst = instance_ids[rows.point_idx]
    ok = rows.valid & (inst >= 0) & (inst < i_cap)
    w = ok.astype(jnp.float32)
    if row_weights is not None:
        w = w * row_weights
    pid = jnp.where(ok, rows.prop_id, p_cap)
    iid = jnp.where(ok, inst, i_cap)
    inter = jnp.zeros((p_cap + 1, i_cap + 1), jnp.float32).at[pid, iid].add(w)[:p_cap, :i_cap]
    p_tot = proposal_sizes(rows, p_cap, row_weights)
    denom = p_tot[:, None] + instance_num_point[None, :].astype(jnp.float32) - inter + 1e-5
    return inter / denom


def get_mask_label(rows: ProposalRows, p_cap: int, instance_ids: jax.Array,
                   instance_cls: jax.Array, ious: jax.Array, iou_thr: float,
                   ignored_label: int = -1):
    """Per-row binary mask labels (cal_iou_and_masklabel.cu:73-105).

    For each proposal: the argmax-IoU gt instance among non-ignored classes;
    if that IoU >= iou_thr, rows are labeled (point in that instance) and
    marked supervised. Returns (mask_label (R,) bool, mask_valid (R,) bool).
    """
    iou_m = jnp.where((instance_cls != ignored_label)[None, :], ious, 0.0)
    max_iou = jnp.max(iou_m, axis=1)
    arg = jnp.argmax(iou_m, axis=1).astype(jnp.int32)
    prop_ok = max_iou >= iou_thr            # (P,)
    pid = jnp.minimum(rows.prop_id, p_cap - 1)
    row_ok = rows.valid & prop_ok[pid]
    target = arg[pid]
    label = row_ok & (instance_ids[rows.point_idx] == target)
    return label, row_ok
