"""HAIS (reference minsu3d/model/hais.py): single shifted-coords clustering,
hierarchical set aggregation (fragment -> nearest primary absorb), TinyUnet
intra-instance refinement with mask + score branches.

The reference's CPU BFS + CUDA set-aggregation hybrid (src/hierarchical_
aggregation/*, O4 in SURVEY.md) becomes: on-device connected components, then
a dense (C, C) cluster-center distance argmin with class/batch masking —
no host round-trip and no MAX_PER_PRIMARY absorb caps (the reference's 1024/
8192 limits were overflow guards, not semantics).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from minsu3d_tpu.evaluation.instance_segmentation import rle_encode
from minsu3d_tpu.model import general_model as gm
from minsu3d_tpu.model.caps import StaticCaps
from minsu3d_tpu.model.module import Backbone
from minsu3d_tpu.model.module.dense_blocks import DenseTinyUnet
from minsu3d_tpu.model.pointgroup import foreground_mask
from minsu3d_tpu.ops import dense_grid as dg
from minsu3d_tpu.ops import segment
from minsu3d_tpu.ops.cluster import Clusters
from minsu3d_tpu.ops.instance_iou import ProposalRows, get_iou, get_mask_label


def hierarchical_aggregation(clus: Clusters, shifted: jax.Array, batch_ids: jax.Array,
                             sem_preds: jax.Array, active: jax.Array,
                             point_num_avg: jax.Array, radius_avg: jax.Array,
                             p_cap: int, use_set_aggr: bool) -> ProposalRows:
    """Split clusters into fragment/kept/primary by class-relative size and
    absorb fragments into nearest primaries (hierarchical_aggregation.cpp:43-78,
    .cu:20-91). Returns (proposal membership rows, primaries_dropped) — rows
    hold 2 entries per point: kept-path and primary-path (a kept fragment can
    also be absorbed, as in the reference); primaries_dropped counts primaries
    beyond the compact-table capacity, which silently lose absorption (every
    other capacity in the codebase surfaces its drops — this one must too).
    """
    c_cap = clus.sizes.shape[0]
    n = shifted.shape[0]
    pc = clus.point_cluster  # (N,) in [0, C]
    w = active.astype(jnp.float32)

    # per-cluster class / batch / center (members share class by construction)
    cls = jnp.full((c_cap + 1,), -1, jnp.int32).at[pc].max(
        jnp.where(active, sem_preds, -1))[:c_cap]
    cbatch = jnp.full((c_cap + 1,), -1, jnp.int32).at[pc].max(
        jnp.where(active, batch_ids, -1))[:c_cap]
    csum = jnp.zeros((c_cap + 1, 3), jnp.float32).at[pc].add(shifted * w[:, None])[:c_cap]
    centers = csum / jnp.maximum(clus.sizes, 1)[:, None].astype(jnp.float32)

    cls_c = jnp.clip(cls, 0, point_num_avg.shape[0] - 1)
    mean_np = point_num_avg[cls_c]
    low = 0.05 * mean_np
    high = 0.3 * mean_np
    size_f = clus.sizes.astype(jnp.float32)
    primary = clus.valid & (size_f >= high)
    fragment = clus.valid & (size_f < high)
    kept = fragment & (size_f >= low)

    # proposal ids: kept first, then primaries (reference wrapper hais_ops.py:57-72)
    kept_prop = jnp.where(kept, jnp.cumsum(kept.astype(jnp.int32)) - 1, p_cap)
    n_kept = jnp.sum(kept.astype(jnp.int32))
    prim_prop = jnp.where(primary, n_kept + jnp.cumsum(primary.astype(jnp.int32)) - 1, p_cap)
    n_props = jnp.minimum(n_kept + jnp.sum(primary.astype(jnp.int32)), p_cap)

    if use_set_aggr:
        # fragment -> nearest same-class same-batch primary. Primaries are
        # real objects (size >= 0.3 * class mean), so there are at most a few
        # hundred: COMPACT them to a static cap first and run the argmin as
        # (C, P2) instead of (C, C) — the dense form materialized a C^2
        # distance matrix, which at the zero-overflow clusters cap (16k)
        # is gigabytes. Compact rank order == cluster-id order, so argmin
        # tie-breaking (first index) is BIT-IDENTICAL to the dense form
        # whenever primaries fit (they are bounded by real instance counts;
        # overflow would only ever DISABLE absorption into the dropped
        # primaries, and p_cap overflow already surfaces via n_proposals).
        p2 = min(c_cap, 512)
        n_primary = jnp.sum(primary.astype(jnp.int32))
        primaries_dropped = jnp.maximum(n_primary - p2, 0)
        pr_rank = jnp.cumsum(primary.astype(jnp.int32)) - 1
        slot = jnp.where(primary & (pr_rank < p2), pr_rank, p2)
        centers_p = jnp.zeros((p2 + 1, 3), jnp.float32).at[slot].set(centers)[:p2]
        cls_p = jnp.full((p2 + 1,), -2, jnp.int32).at[slot].set(cls)[:p2]
        cbatch_p = jnp.full((p2 + 1,), -2, jnp.int32).at[slot].set(cbatch)[:p2]
        size_p = jnp.zeros((p2 + 1,), jnp.float32).at[slot].set(size_f)[:p2]
        prop_p = jnp.full((p2 + 1,), p_cap, jnp.int32).at[slot].set(prim_prop)[:p2]
        live_p = jnp.zeros((p2 + 1,), bool).at[slot].set(primary)[:p2]

        d = centers[:, None, :] - centers_p[None, :, :]
        dist2 = jnp.sum(d * d, axis=-1)                          # (C, P2)
        bad = (~fragment[:, None]) | (~live_p[None, :]) | \
              (cls[:, None] != cls_p[None, :]) | (cbatch[:, None] != cbatch_p[None, :])
        dist2 = jnp.where(bad, jnp.float32(1e10), dist2)
        nearest = jnp.argmin(dist2, axis=1).astype(jnp.int32)   # (C,) in [0, P2)
        near_d2 = jnp.min(dist2, axis=1)
        prim_size = size_p[nearest]
        r_size = 0.01 * jnp.sqrt(prim_size)
        r_cls = radius_avg[cls_c]
        r_set = jnp.maximum(r_size, r_cls)
        absorbed = fragment & (near_d2 < r_set * r_set) & (near_d2 < 1e9)
        # primary-path proposal of each cluster
        prim_path = jnp.where(primary, prim_prop,
                              jnp.where(absorbed, prop_p[nearest], p_cap))
    else:
        prim_path = prim_prop
        primaries_dropped = jnp.int32(0)

    kept_ext = jnp.concatenate([kept_prop, jnp.full((1,), p_cap, jnp.int32)])
    prim_ext = jnp.concatenate([prim_path, jnp.full((1,), p_cap, jnp.int32)])
    pid1 = jnp.where(active, kept_ext[pc], p_cap)
    pid2 = jnp.where(active, prim_ext[pc], p_cap)
    point_idx = jnp.arange(n, dtype=jnp.int32)
    return ProposalRows(
        point_idx=jnp.concatenate([point_idx, point_idx]),
        prop_id=jnp.concatenate([jnp.minimum(pid1, p_cap), jnp.minimum(pid2, p_cap)]),
        valid=jnp.concatenate([pid1 < p_cap, pid2 < p_cap]),
        n_proposals=n_props,
    ), primaries_dropped


class HAISNet(nn.Module):
    input_channel: int
    m: int
    blocks: tuple
    block_reps: int
    classes: int
    ignore_classes: tuple
    point_aggr_radius: float
    score_scale: float
    score_fullscale: int
    point_num_avg: tuple
    radius_avg: tuple
    caps: StaticCaps
    voxel_size: float = 0.02
    compute_dtype: str | None = None
    channel_major: bool = False
    dense_grid: bool = False
    tap_compact: tuple = ()
    blocked_subm: tuple = ()
    zslice_subm: bool = False
    remat: bool | int = False

    @nn.compact
    def __call__(self, batch: dict, train: bool, with_heads: bool,
                 use_set_aggr: bool = True, mask_filter_score_feature: bool = False,
                 mask_filter_thre: float = 0.5) -> dict:
        fracs = () if (self.channel_major or self.dense_grid) else self.tap_compact
        halos = () if (self.channel_major or self.dense_grid) else self.blocked_subm
        zsl = (not (self.channel_major or self.dense_grid)) and self.zslice_subm
        plan, v2p, vfeats = gm.build_scene_plan(batch, list(self.caps.voxel_caps),
                                                len(self.blocks), fracs, halos, zsl)
        dctx = (dg.build_ctx(plan, self.caps.grid_extent, self.caps.grid_batch)
                if self.dense_grid else None)
        out = Backbone(self.input_channel, self.m, self.blocks, self.block_reps,
                       self.classes, self.compute_dtype, self.channel_major,
                       grid=self.dense_grid, remat=self.remat, name="backbone")(
            vfeats, plan, v2p, batch["point_mask"], train, dense_ctx=dctx)
        if not with_heads:
            return out

        c = self.caps
        sem_preds = jnp.argmax(out["semantic_scores"], axis=1).astype(jnp.int32)
        obj = foreground_mask(sem_preds, batch["point_mask"], self.ignore_classes)
        shifted = batch["point_xyz"] + jax.lax.stop_gradient(out["point_offsets"])
        bids = batch["vert_batch_ids"]

        if c.shifted_units:
            s_cell = c.shifted_grid_cell or self.voxel_size
            units, units_dropped = gm.make_units_grid(
                bids, shifted, sem_preds, obj, c.cluster_units_shifted, s_cell)
            clus = gm.cluster_step(shifted, bids, obj, sem_preds,
                                   self.point_aggr_radius, c, units,
                                   u_cap=c.cluster_units_shifted,
                                   grid_cell=s_cell)
        else:
            units, units_dropped = gm.make_units(batch["p2v"], sem_preds, obj,
                                                 c.cluster_units)
            clus = gm.cluster_step(shifted, bids, obj, sem_preds,
                                   self.point_aggr_radius, c, units)
        rows, primaries_dropped = hierarchical_aggregation(
            clus, shifted, bids, sem_preds, obj,
            jnp.array(self.point_num_avg, jnp.float32),
            jnp.array(self.radius_avg, jnp.float32),
            c.proposals, use_set_aggr)
        out["proposal_rows"] = rows
        out["diag"] = {"units_dropped": units_dropped,
                       "voxels_dropped": gm.plan_dropped(plan),
                       "edges_dropped": clus.edges_dropped,
                       "clusters_dropped": clus.clusters_dropped,
                       "primaries_dropped": primaries_dropped}
        if self.tap_compact or self.blocked_subm:
            out["diag"]["tap_dropped"] = gm.plan_tap_dropped(plan)
        if dctx is not None:
            out["diag"]["grid_dropped"] = dctx.n_dropped

        rng = self.make_rng("cluster") if train else jax.random.PRNGKey(0)
        volume, occ, row_cell = gm.clusters_voxelization_dense(
            rows, c.proposals, out["point_features"], batch["point_xyz"],
            self.score_scale, self.score_fullscale, rng)
        inst_feats = DenseTinyUnet(self.m, self.compute_dtype, self.remat,
                                   name="tiny_unet")(volume, occ, train)

        # mask branch on voxels, then devoxelize (reference hais.py:79-81)
        mask_hidden = nn.relu(nn.Dense(self.m, name="mask_branch_0")(inst_feats))
        mask_vox = nn.Dense(1, name="mask_branch_1")(mask_hidden)
        mask_scores = gm.devoxelize_dense(mask_vox, row_cell)[:, 0]  # per row
        out["mask_scores"] = mask_scores

        score_feats = gm.devoxelize_dense(inst_feats, row_cell)
        if mask_filter_score_feature:
            keep = jax.nn.sigmoid(mask_scores) >= mask_filter_thre
            score_feats = score_feats * keep[:, None]
        prop_feats = segment.roipool(score_feats, rows.prop_id, rows.valid, c.proposals)
        out["proposal_scores"] = nn.Dense(1, name="score_branch")(prop_feats)[:, 0]
        return out


def make_net(cfg, split: str) -> HAISNet:
    net_cfg = cfg.model.network
    return HAISNet(
        input_channel=3 + 3 * bool(net_cfg.use_color) + 3 * bool(net_cfg.use_normal),
        m=net_cfg.m,
        blocks=tuple(net_cfg.blocks),
        block_reps=net_cfg.block_reps,
        classes=cfg.data.classes,
        ignore_classes=tuple(cfg.data.ignore_classes),
        point_aggr_radius=net_cfg.point_aggr_radius,
        score_scale=net_cfg.score_scale,
        score_fullscale=net_cfg.score_fullscale,
        point_num_avg=tuple(cfg.data.point_num_avg),
        radius_avg=tuple(cfg.data.radius_avg),
        caps=StaticCaps.from_cfg(cfg, split),
        voxel_size=float(cfg.data.voxel_size),
        compute_dtype=(jnp.bfloat16 if cfg.model.trainer.precision == "bfloat16" else None),
        channel_major=bool(net_cfg.get("channel_major", False)),
        dense_grid=gm.dense_grid_flag(cfg),
        tap_compact=gm.tap_compact_cfg(net_cfg),
        blocked_subm=gm.blocked_cfg(net_cfg),
        zslice_subm=bool(net_cfg.get("zslice_subm", False)),
        remat=net_cfg.get("remat", False),  # bool, or int n = remat n shallowest levels
    )


def losses(cfg, caps: StaticCaps, batch: dict, out: dict, with_heads: bool,
           iou_on_mask: bool = False) -> dict:
    """Mask BCE + score BCE (reference hais.py:94-127). ``iou_on_mask``
    switches the IoU source cluster->pred at cal_iou_based_on_mask_start_epoch."""
    result = gm.shared_losses(batch, out)
    if not with_heads:
        return result
    rows: ProposalRows = out["proposal_rows"]
    mask_sig = jax.nn.sigmoid(out["mask_scores"])
    weights = jax.lax.stop_gradient((mask_sig > 0.5).astype(jnp.float32)) if iou_on_mask else None
    ious = get_iou(rows, caps.proposals, batch["instance_ids"],
                   batch["instance_num_point"], caps.instances, row_weights=weights)

    mask_label, mask_valid = get_mask_label(
        rows, caps.proposals, batch["instance_ids"], batch["instance_semantic_cls"],
        ious, 0.5, -1)
    eps = 1e-7
    p = jnp.clip(mask_sig, eps, 1 - eps)
    bce = -(mask_label * jnp.log(p) + (~mask_label) * jnp.log(1 - p))
    w = (mask_valid & rows.valid).astype(jnp.float32)
    # torch BCE(weight=..., reduction=mean) divides by the row count (sumNPoint)
    result["mask_loss"] = jnp.sum(bce * w) / jnp.maximum(jnp.sum(rows.valid), 1)

    gt_scores = gm.get_segmented_scores(
        jnp.max(ious, axis=1), cfg.model.network.fg_thresh, cfg.model.network.bg_thresh)
    logits = out["proposal_scores"]
    prop_valid = jnp.arange(caps.proposals) < rows.n_proposals
    sbce = jnp.maximum(logits, 0) - logits * gt_scores + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    result["score_loss"] = jnp.sum(sbce * prop_valid) / jnp.maximum(jnp.sum(prop_valid), 1)
    return result


def pred_instances(cfg, scan_id: str, xyz: np.ndarray, out_np: dict,
                   num_ignored_classes: int) -> list[dict]:
    """Host-side extraction (reference hais.py:210-247): mask-score outlier
    filter, score + npoint thresholds, no NMS."""
    from minsu3d_tpu.model.pointgroup import rows_to_masks

    test_cfg = cfg.model.network.test
    n = xyz.shape[0]
    sem_labels = out_np["semantic_scores"].argmax(1)
    rows = out_np["proposal_rows"]
    n_props = int(rows["n_proposals"])
    scores = 1.0 / (1.0 + np.exp(-out_np["proposal_scores"][:n_props]))

    rows = dict(rows)
    rows["valid"] = rows["valid"] & (out_np["mask_scores"] > test_cfg.test_mask_score_thre)
    masks = rows_to_masks(rows, n_props, n)

    keep = scores > test_cfg.TEST_SCORE_THRESH
    scores, masks = scores[keep], masks[keep]
    npoint = masks.sum(1)
    keep = npoint >= test_cfg.TEST_NPOINT_THRESH
    scores, masks = scores[keep], masks[keep]

    instances = []
    for i in range(len(scores)):
        mask = masks[i]
        pred_xyz = xyz[mask]
        instances.append({
            "scan_id": scan_id,
            "label_id": int(sem_labels[mask][0]) - num_ignored_classes + 1,
            "conf": float(scores[i]),
            "pred_mask": rle_encode(mask),
            "pred_bbox": np.concatenate((pred_xyz.min(0), pred_xyz.max(0))),
        })
    return instances


def forward_flags(cfg, epoch: int, train: bool) -> dict:
    """Epoch/phase-gated head behavior (reference hais.py:52,83-86)."""
    net_cfg = cfg.model.network
    return {
        "use_set_aggr": bool(net_cfg.using_set_aggr_in_training if train
                             else net_cfg.using_set_aggr_in_testing),
        "mask_filter_score_feature":
            epoch > net_cfg.use_mask_filter_score_feature_start_epoch,
        "mask_filter_thre": float(net_cfg.mask_filter_score_feature_thre),
    }


def loss_flags(cfg, epoch: int) -> dict:
    """IoU source switches cluster->pred (reference hais.py:104-116)."""
    return {"iou_on_mask": epoch > cfg.model.network.cal_iou_based_on_mask_start_epoch}
