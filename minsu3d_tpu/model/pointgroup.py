"""PointGroup (reference minsu3d/model/pointgroup.py): dual clustering on
original + offset-shifted coordinates, proposal re-voxelization, TinyUnet
ScoreNet, score BCE vs segmented IoU targets, mask-IoU NMS at inference.

The reference's GPU ballquery -> CPU BFS round-trip (pointgroup.py:41-68)
becomes a fully on-device grid-hash ball query + label propagation.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from minsu3d_tpu.evaluation.instance_segmentation import rle_encode
from minsu3d_tpu.model import general_model as gm
from minsu3d_tpu.model.caps import StaticCaps
from minsu3d_tpu.model.module import Backbone
from minsu3d_tpu.model.module.dense_blocks import DenseTinyUnet
from minsu3d_tpu.ops import dense_grid as dg
from minsu3d_tpu.ops import segment
from minsu3d_tpu.ops.cluster import Clusters
from minsu3d_tpu.ops.instance_iou import ProposalRows, get_iou


def merge_clusterings(clusterings: Sequence[Clusters], thresholds: Sequence[jax.Array | float],
                      n_points: int, p_cap: int, point_valids: Sequence[jax.Array | None] = None
                      ) -> ProposalRows:
    """Concatenate clusterings into one proposal id space (the reference's
    proposals_idx/offset merge at pointgroup.py:70-73), dropping clusters
    below their size threshold. Rows = one (point, proposal) pair per point
    per clustering, so R = len(clusterings) * N statically.

    Returns (rows, proposals_dropped) — clusters beyond ``p_cap`` are dropped
    deterministically and the count must be surfaced by callers.
    """
    rows_pt, rows_pid, rows_valid = [], [], []
    base = jnp.int32(0)
    for i, (clus, thr) in enumerate(zip(clusterings, thresholds)):
        ok = clus.valid & (clus.sizes >= thr)
        prop = jnp.where(ok, base + jnp.cumsum(ok.astype(jnp.int32)) - 1, p_cap)
        prop = jnp.where(prop < p_cap, prop, p_cap)
        prop_ext = jnp.concatenate([prop, jnp.full((1,), p_cap, jnp.int32)])
        pid = prop_ext[clus.point_cluster]
        valid = pid < p_cap
        if point_valids is not None and point_valids[i] is not None:
            valid = valid & point_valids[i]
        rows_pt.append(jnp.arange(n_points, dtype=jnp.int32))
        rows_pid.append(jnp.where(valid, pid, p_cap))
        rows_valid.append(valid)
        base = base + jnp.sum(ok.astype(jnp.int32))
    n_props = jnp.minimum(base, p_cap)
    rows = ProposalRows(
        point_idx=jnp.concatenate(rows_pt),
        prop_id=jnp.concatenate(rows_pid),
        valid=jnp.concatenate(rows_valid),
        n_proposals=n_props,
    )
    return rows, base - n_props


def foreground_mask(semantic_preds: jax.Array, point_mask: jax.Array,
                    ignore_classes: Sequence[int]) -> jax.Array:
    """Exclude predicted ignore classes (reference pointgroup.py:30-35)."""
    m = point_mask
    for cl in ignore_classes:
        m = m & (semantic_preds != cl - 1)
    return m


class PointGroupNet(nn.Module):
    input_channel: int
    m: int
    blocks: tuple
    block_reps: int
    classes: int
    ignore_classes: tuple
    cluster_radius: float
    cluster_npoint_thre: int
    score_scale: float
    score_fullscale: int
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
    def __call__(self, batch: dict, train: bool, with_heads: bool) -> dict:
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
        xyz = batch["point_xyz"]
        shifted = xyz + jax.lax.stop_gradient(out["point_offsets"])
        bids = batch["vert_batch_ids"]
        if c.xyz_grid_cell > 0:
            units, units_dropped = gm.make_units_grid(
                bids, xyz, sem_preds, obj, c.cluster_units, c.xyz_grid_cell)
        else:
            units, units_dropped = gm.make_units(batch["p2v"], sem_preds, obj,
                                                 c.cluster_units)

        # sequential dual clustering. Two merge attempts were measured and
        # REVERTED (BENCH_NOTES): a combined 2N-unit CC (each merged sweep
        # costs 2N for max(s_xyz, s_shift) rounds — net loss) and a shared
        # ball-query pass (sort cost is superlinear in buffer length, the
        # run-bound machinery linear in units — nothing amortizes; 2.118 ->
        # 2.105 scenes/s). grid_cell lets cluster_step take the W=1 fast path
        # when the unit grid matches the query radius.
        clus = gm.cluster_step(xyz, bids, obj, sem_preds, self.cluster_radius,
                               c, units, edge_factor=c.edge_factor_xyz or None,
                               grid_cell=c.xyz_grid_cell,
                               big_thre=self.cluster_npoint_thre)
        if c.shifted_units:
            s_cell = c.shifted_grid_cell or self.voxel_size
            units_s, us_dropped = gm.make_units_grid(
                bids, shifted, sem_preds, obj, c.cluster_units_shifted, s_cell)
            units_dropped = units_dropped + us_dropped
            clus_shift = gm.cluster_step(shifted, bids, obj, sem_preds,
                                         self.cluster_radius, c, units_s,
                                         u_cap=c.cluster_units_shifted,
                                         grid_cell=s_cell,
                                         big_thre=self.cluster_npoint_thre)
        else:
            clus_shift = gm.cluster_step(shifted, bids, obj, sem_preds,
                                         self.cluster_radius, c, units,
                                         big_thre=self.cluster_npoint_thre)
        rows, props_dropped = merge_clusterings(
            [clus, clus_shift], [self.cluster_npoint_thre] * 2, xyz.shape[0], c.proposals)
        out["proposal_rows"] = rows
        out["diag"] = {"units_dropped": units_dropped,
                       "proposals_dropped": props_dropped,
                       "voxels_dropped": gm.plan_dropped(plan),
                       "edges_dropped": clus.edges_dropped + clus_shift.edges_dropped,
                       "clusters_dropped": clus.clusters_dropped
                       + clus_shift.clusters_dropped}
        if self.tap_compact or self.blocked_subm:
            out["diag"]["tap_dropped"] = gm.plan_tap_dropped(plan)
        if dctx is not None:
            out["diag"]["grid_dropped"] = dctx.n_dropped

        rng = self.make_rng("cluster") if train else jax.random.PRNGKey(0)
        volume, occ, row_cell = gm.clusters_voxelization_dense(
            rows, c.proposals, out["point_features"], xyz,
            self.score_scale, self.score_fullscale, rng)
        sf = DenseTinyUnet(self.m, self.compute_dtype, self.remat,
                           name="score_net")(volume, occ, train)
        row_feats = gm.devoxelize_dense(sf, row_cell)
        prop_feats = segment.roipool(row_feats, rows.prop_id, rows.valid, c.proposals)
        out["proposal_scores"] = nn.Dense(1, name="score_branch")(prop_feats)[:, 0]
        return out


def make_net(cfg, split: str) -> PointGroupNet:
    net_cfg = cfg.model.network
    return PointGroupNet(
        input_channel=3 + 3 * bool(net_cfg.use_color) + 3 * bool(net_cfg.use_normal),
        m=net_cfg.m,
        blocks=tuple(net_cfg.blocks),
        block_reps=net_cfg.block_reps,
        classes=cfg.data.classes,
        ignore_classes=tuple(cfg.data.ignore_classes),
        cluster_radius=net_cfg.cluster.cluster_radius,
        cluster_npoint_thre=net_cfg.cluster.cluster_npoint_thre,
        score_scale=net_cfg.score_scale,
        score_fullscale=net_cfg.score_fullscale,
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


def losses(cfg, caps: StaticCaps, batch: dict, out: dict, with_heads: bool) -> dict:
    result = gm.shared_losses(batch, out)
    if with_heads:
        rows: ProposalRows = out["proposal_rows"]
        ious = get_iou(rows, caps.proposals, batch["instance_ids"],
                       batch["instance_num_point"], caps.instances)
        gt_scores = gm.get_segmented_scores(
            jnp.max(ious, axis=1), cfg.model.network.fg_thresh, cfg.model.network.bg_thresh)
        logits = out["proposal_scores"]
        prop_valid = jnp.arange(caps.proposals) < rows.n_proposals
        bce = jnp.maximum(logits, 0) - logits * gt_scores + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        result["score_loss"] = jnp.sum(bce * prop_valid) / jnp.maximum(jnp.sum(prop_valid), 1)
    return result


def nms_instances(cross_ious: np.ndarray, scores: np.ndarray, threshold: float) -> np.ndarray:
    """Greedy mask-IoU NMS (reference pointgroup.py:197-218)."""
    ixs = np.argsort(-scores)
    pick = []
    while len(ixs) > 0:
        i = ixs[0]
        pick.append(i)
        ious = cross_ious[i, ixs[1:]]
        remove = np.where(ious > threshold)[0] + 1
        ixs = np.delete(ixs, remove)
        ixs = np.delete(ixs, 0)
    return np.array(pick, dtype=np.int32)


def rows_to_masks(rows_np: dict, num_proposals: int, n_points: int) -> np.ndarray:
    """Dense (P, N) bool masks from membership rows."""
    masks = np.zeros((num_proposals, n_points), dtype=bool)
    v = rows_np["valid"]
    masks[rows_np["prop_id"][v], rows_np["point_idx"][v]] = True
    return masks


def pred_instances(cfg, scan_id: str, xyz: np.ndarray, out_np: dict,
                   num_ignored_classes: int) -> list[dict]:
    """Host-side instance extraction (reference pointgroup.py:220-265):
    sigmoid score + npoint thresholds, mask-IoU NMS, RLE encode."""
    test_cfg = cfg.model.network.test
    n = xyz.shape[0]
    sem_labels = out_np["semantic_scores"].argmax(1)
    n_props = int(out_np["proposal_rows"]["n_proposals"])
    scores = 1.0 / (1.0 + np.exp(-out_np["proposal_scores"][:n_props]))
    masks = rows_to_masks(out_np["proposal_rows"], n_props, n)

    npoint = masks.sum(1)
    keep = (scores > test_cfg.TEST_SCORE_THRESH) & (npoint > test_cfg.TEST_NPOINT_THRESH)
    scores, masks = scores[keep], masks[keep]

    if len(scores) == 0:
        pick = np.empty(0, np.int32)
    else:
        mf = masks.astype(np.float32)
        inter = mf @ mf.T
        np_h = mf.sum(1)[:, None]
        cross_ious = inter / (np_h + np_h.T - inter)
        pick = nms_instances(cross_ious, scores, test_cfg.TEST_NMS_THRESH)

    instances = []
    for i in pick:
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
    return {}


def loss_flags(cfg, epoch: int) -> dict:
    return {}
