"""SoftGroup (reference minsu3d/model/softgroup.py): per-class soft grouping
on offset-shifted coords, top-down refinement with classification / mask-
scoring / iou-score branches over (K+1) classes.

The reference's Python loop of per-class ballquery + CPU BFS (softgroup.py:
43-78) becomes a single ``lax.scan`` over foreground classes running the
on-device ball query + label propagation with per-class activity masks; class
results are merged into one proposal id space capped at max_proposal_num.
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
from minsu3d_tpu.ops import dense_grid as dg
from minsu3d_tpu.ops.instance_iou import ProposalRows, get_iou, get_mask_label


def soft_grouping(sem_softmax: jax.Array, shifted: jax.Array, batch_ids: jax.Array,
                  point_mask: jax.Array, fg_class_ids: tuple, score_thr: float,
                  radius: float, npoint_thr: float, point_num_avg: jax.Array,
                  min_npoint: int, max_proposal_num: int, caps: StaticCaps,
                  p2v: jax.Array | None = None, big_thre: int = 1):
    """Per-class thresholded clustering merged across classes
    (reference softgroup.py:38-83 + sg_bfs_cluster O3). Returns (rows, diag)."""
    n = shifted.shape[0]
    cls_ids = jnp.array(fg_class_ids, jnp.int32)

    def per_class(carry, class_id):
        probs = sem_softmax[:, class_id]
        active = point_mask & (probs > score_thr)
        enough = jnp.sum(active.astype(jnp.int32)) >= min_npoint  # skip-class rule
        active = active & enough
        units = None
        dropped = jnp.int32(0)
        if p2v is not None and caps.unit_clustering:
            units, dropped = gm.make_units(p2v, jnp.zeros_like(p2v), active,
                                           caps.cluster_units)
        clus = gm.cluster_step(shifted, batch_ids, active, None, radius, caps,
                               units, big_thre=big_thre)
        # class-size-relative threshold (bfs_cluster.cpp:56-187)
        thr = npoint_thr * point_num_avg[class_id]
        ok = clus.valid & (clus.sizes.astype(jnp.float32) >= thr)
        u, e, c = carry
        carry = (u + dropped,
                 e + jnp.asarray(clus.edges_dropped, jnp.int32),
                 c + jnp.asarray(clus.clusters_dropped, jnp.int32))
        return carry, (clus.point_cluster, ok)

    zero = jnp.int32(0)
    (units_dropped, edges_dropped, clusters_dropped), (pc_all, ok_all) = jax.lax.scan(
        per_class, (zero, zero, zero), cls_ids)                   # (K, N), (K, C)

    p_cap = caps.proposals
    limit = min(max_proposal_num, p_cap)
    counts = jnp.sum(ok_all.astype(jnp.int32), axis=1)            # (K,)
    bases = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]])
    rank = jnp.cumsum(ok_all.astype(jnp.int32), axis=1) - 1       # (K, C)
    prop = jnp.where(ok_all, bases[:, None] + rank, limit)
    prop = jnp.where(prop < limit, prop, p_cap)
    prop_ext = jnp.concatenate([prop, jnp.full((prop.shape[0], 1), p_cap, jnp.int32)], axis=1)
    pid = jnp.take_along_axis(prop_ext, pc_all, axis=1)           # (K, N)
    valid = pid < p_cap

    k = len(fg_class_ids)
    point_idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (k, n))
    rows = ProposalRows(
        point_idx=point_idx.reshape(-1),
        prop_id=jnp.minimum(pid, p_cap).reshape(-1),
        valid=valid.reshape(-1),
        n_proposals=jnp.minimum(jnp.sum(counts), limit),
    )
    return rows, {"pairs_dropped": jnp.int32(0), "units_dropped": units_dropped,
                  "edges_dropped": edges_dropped,
                  "clusters_dropped": clusters_dropped}


def soft_grouping_packed(sem_softmax: jax.Array, shifted: jax.Array, batch_ids: jax.Array,
                         point_mask: jax.Array, fg_class_ids: tuple, score_thr: float,
                         radius: float, npoint_thr: float, point_num_avg: jax.Array,
                         min_npoint: int, max_proposal_num: int, caps: StaticCaps,
                         p2v: jax.Array, pair_cap: int,
                         voxel_size: float = 0.02,
                         big_thre: int = 1) -> ProposalRows:
    """Packed soft grouping: ONE clustering over (point, class) pairs.

    The reference loops ballquery+BFS once per foreground class
    (softgroup.py:43-78); a point is active for a class when its softmax
    exceeds ``score_thr``, which holds for at most a few classes per point
    (sum of probs = 1), so all classes' active pairs fit in ~2N rows. The
    class folds into the ball-query hash key (ops/ballquery.py), making one
    pass over 2N pairs equivalent to K passes over N points — the per-class
    radius graphs are disjoint by construction. ~10x less clustering work at
    ScanNet's 18 foreground classes.

    Proposal ids are re-ranked class-major after clustering (stable sort over
    per-cluster class), matching the reference's per-class concat order so
    max_proposal_num truncation keeps the same proposals.

    Returns (rows, diag) where diag carries overflow counters: active pairs
    beyond ``pair_cap`` and (voxel, class) units beyond ``caps.cluster_units``
    are dropped deterministically — those points never cluster, so callers
    must surface the counts (trainer logs them per epoch).
    """
    n = shifted.shape[0]
    cls_ids = jnp.array(fg_class_ids, jnp.int32)
    k = len(fg_class_ids)
    probs = sem_softmax[:, cls_ids]                        # (N, K)
    active = point_mask[:, None] & (probs > score_thr)
    counts = jnp.sum(active.astype(jnp.int32), axis=0)     # (K,)
    active = active & (counts >= min_npoint)[None, :]      # skip-class rule

    act_kn = active.T.reshape(-1)                          # (K*N,) class-major
    n_active = jnp.sum(act_kn.astype(jnp.int32))
    pairs_dropped = jnp.maximum(n_active - pair_cap, 0)
    order = jnp.argsort(~act_kn, stable=True)[:pair_cap].astype(jnp.int32)
    pair_valid = act_kn[order]
    pair_class = jnp.where(pair_valid, order // n, 0).astype(jnp.int32)
    pair_point = (order % n).astype(jnp.int32)

    pcoords = shifted[pair_point]
    pbatch = batch_ids[pair_point]
    units = None
    units_dropped = jnp.int32(0)
    u_cap = caps.cluster_units
    s_cell = 0.0
    if caps.unit_clustering and caps.shifted_units:
        # units from the SHIFTED-coordinate grid (general_model.make_units_grid)
        u_cap = caps.cluster_units_shifted
        s_cell = caps.shifted_grid_cell or voxel_size
        units, units_dropped = gm.make_units_grid(
            pbatch, pcoords, pair_class, pair_valid, u_cap, s_cell)
    elif caps.unit_clustering:
        # voxel id in the UNCLIPPED key_hi slot (make_units packs key_lo into a
        # 10-bit coord field; voxel ids run to the voxel cap >= 49k, so passing
        # them as key_lo collapsed all voxels >= 1023 into one unit per class)
        units, units_dropped = gm.make_units(p2v[pair_point], pair_class,
                                             pair_valid, caps.cluster_units)
    clus = gm.cluster_step(pcoords, pbatch, pair_valid, pair_class,
                           radius, caps, units, u_cap=u_cap, grid_cell=s_cell,
                           big_thre=big_thre)

    # per-cluster class + class-size-relative threshold (bfs_cluster.cpp:56-187)
    c_cap = caps.clusters
    pc = clus.point_cluster
    ccls = jnp.full((c_cap + 1,), -1, jnp.int32).at[pc].max(
        jnp.where(pair_valid, pair_class, -1))[:c_cap]
    thr = npoint_thr * point_num_avg[cls_ids[jnp.clip(ccls, 0, k - 1)]]
    ok = clus.valid & (clus.sizes.astype(jnp.float32) >= thr)

    # class-major proposal order (reference concatenates per-class proposals,
    # softgroup.py:70-78): rank surviving clusters by (class, cluster id)
    rank_src = jnp.argsort(jnp.where(ok, ccls, k), stable=True)
    rank = jnp.zeros((c_cap,), jnp.int32).at[rank_src].set(
        jnp.arange(c_cap, dtype=jnp.int32))

    p_cap = caps.proposals
    limit = min(max_proposal_num, p_cap)
    prop = jnp.where(ok & (rank < limit), rank, p_cap)
    prop_ext = jnp.concatenate([prop, jnp.full((1,), p_cap, jnp.int32)])
    pid = jnp.where(pair_valid, prop_ext[pc], p_cap)
    rows = ProposalRows(
        point_idx=pair_point,
        prop_id=jnp.minimum(pid, p_cap),
        valid=pid < p_cap,
        n_proposals=jnp.minimum(jnp.sum(ok.astype(jnp.int32)), limit),
    )
    return rows, {"pairs_dropped": pairs_dropped, "units_dropped": units_dropped,
                  "edges_dropped": clus.edges_dropped,
                  "clusters_dropped": clus.clusters_dropped}


def compact_rows(rows: ProposalRows, r_cap: int) -> ProposalRows:
    """Stable-compact valid rows into a smaller static capacity."""
    order = jnp.argsort(~rows.valid, stable=True)[:r_cap]
    return ProposalRows(
        point_idx=rows.point_idx[order],
        prop_id=rows.prop_id[order],
        valid=rows.valid[order],
        n_proposals=rows.n_proposals,
    )


def soft_grouping_compacted(*args, r_cap: int, **kwargs):
    """Per-class-scan soft grouping compacted to ``r_cap`` rows.

    ``soft_grouping`` emits K*N rows (one per class x point); the heads run
    on a 2N-row budget like the packed path, so valid rows beyond ``r_cap``
    (a point active for >2 classes once 2N fills) are dropped by the
    valid-first stable sort in ``compact_rows`` — deterministically, and
    COUNTED in diag["pairs_dropped"] (the reference enumerates every row,
    bfs_cluster.cpp:56-187, so any truncation must be observable)."""
    rows, diag = soft_grouping(*args, **kwargs)
    n_valid = jnp.sum(rows.valid.astype(jnp.int32))
    diag["pairs_dropped"] = diag["pairs_dropped"] + jnp.maximum(n_valid - r_cap, 0)
    return compact_rows(rows, r_cap), diag


class SoftGroupNet(nn.Module):
    input_channel: int
    m: int
    blocks: tuple
    block_reps: int
    classes: int
    ignore_classes: tuple
    score_thr: float
    radius: float
    npoint_thr: float
    min_npoint: int
    max_proposal_num: int
    instance_scale: float
    instance_spatial_shape: int
    point_num_avg: tuple
    caps: StaticCaps
    voxel_size: float = 0.02
    compute_dtype: str | None = None
    channel_major: bool = False
    packed_grouping: bool = True
    dense_grid: bool = False
    tap_compact: tuple = ()
    blocked_subm: tuple = ()
    zslice_subm: bool = False
    remat: bool | int = False

    @property
    def fg_class_ids(self) -> tuple:
        return tuple(c for c in range(self.classes) if c + 1 not in self.ignore_classes)

    @property
    def instance_classes(self) -> int:
        return self.classes - len(self.ignore_classes)

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
        sem_softmax = jax.nn.softmax(out["semantic_scores"], axis=-1)
        shifted = batch["point_xyz"] + jax.lax.stop_gradient(out["point_offsets"])
        # components below every class's size filter can't become proposals:
        # don't count them when they fall off the size-ranked cluster cap
        # (ops/cluster.py::compact_labels big_thre). The per-class thresholds
        # npoint_thr * point_num_avg[class] are static config; the MIN over
        # foreground classes is safe for all of them.
        big = max(int(self.npoint_thr
                      * min(self.point_num_avg[i] for i in self.fg_class_ids)), 1)
        if self.packed_grouping:
            rows, diag = soft_grouping_packed(
                jax.lax.stop_gradient(sem_softmax), shifted, batch["vert_batch_ids"],
                batch["point_mask"], self.fg_class_ids, self.score_thr, self.radius,
                self.npoint_thr, jnp.array(self.point_num_avg, jnp.float32),
                self.min_npoint, self.max_proposal_num, c, batch["p2v"],
                pair_cap=2 * batch["point_xyz"].shape[0],
                voxel_size=self.voxel_size, big_thre=big)
        else:
            n = batch["point_xyz"].shape[0]
            r_cap = min(n * len(self.fg_class_ids), 2 * n)
            rows, diag = soft_grouping_compacted(
                jax.lax.stop_gradient(sem_softmax), shifted, batch["vert_batch_ids"],
                batch["point_mask"], self.fg_class_ids, self.score_thr, self.radius,
                self.npoint_thr, jnp.array(self.point_num_avg, jnp.float32),
                self.min_npoint, self.max_proposal_num, c, p2v=batch["p2v"],
                r_cap=r_cap, big_thre=big)
        out["proposal_rows"] = rows
        out["diag"] = {**diag, "voxels_dropped": gm.plan_dropped(plan)}
        if self.tap_compact or self.blocked_subm:
            out["diag"]["tap_dropped"] = gm.plan_tap_dropped(plan)
        if dctx is not None:
            out["diag"]["grid_dropped"] = dctx.n_dropped

        rng = self.make_rng("cluster") if train else jax.random.PRNGKey(0)
        volume, occ, row_cell = gm.clusters_voxelization_dense(
            rows, c.proposals, out["point_features"], batch["point_xyz"],
            self.instance_scale, self.instance_spatial_shape, rng)
        feats = DenseTinyUnet(self.m, self.compute_dtype, self.remat,
                              name="tiny_unet")(volume, occ, train)

        k1 = self.instance_classes + 1
        mask_hidden = nn.relu(nn.Dense(self.m, name="mask_scoring_0")(feats))
        mask_vox = nn.Dense(k1, name="mask_scoring_1")(mask_hidden)
        out["mask_scores"] = gm.devoxelize_dense(mask_vox, row_cell)  # (R, K+1)

        # global mean-pool per proposal over its voxels (softgroup.py:112-120)
        occ_f = occ[..., None].astype(feats.dtype)
        pooled = jnp.sum(feats * occ_f, axis=(1, 2, 3)) / jnp.maximum(
            jnp.sum(occ_f, axis=(1, 2, 3)), 1.0)
        out["cls_scores"] = nn.Dense(k1, name="classification_branch")(pooled)
        out["iou_scores"] = nn.Dense(k1, name="iou_score")(pooled)
        return out


def make_net(cfg, split: str) -> SoftGroupNet:
    net_cfg = cfg.model.network
    return SoftGroupNet(
        input_channel=3 + 3 * bool(net_cfg.use_color) + 3 * bool(net_cfg.use_normal),
        m=net_cfg.m,
        blocks=tuple(net_cfg.blocks),
        block_reps=net_cfg.block_reps,
        classes=cfg.data.classes,
        ignore_classes=tuple(cfg.data.ignore_classes),
        score_thr=net_cfg.grouping_cfg.score_thr,
        radius=net_cfg.grouping_cfg.radius,
        npoint_thr=net_cfg.grouping_cfg.npoint_thr,
        min_npoint=cfg.model.network.test_cfg.min_npoint,
        max_proposal_num=net_cfg.train_cfg.max_proposal_num,
        instance_scale=net_cfg.instance_voxel_cfg.scale,
        instance_spatial_shape=net_cfg.instance_voxel_cfg.spatial_shape,
        point_num_avg=tuple(cfg.data.point_num_avg),
        caps=StaticCaps.from_cfg(cfg, split),
        voxel_size=float(cfg.data.voxel_size),
        compute_dtype=(jnp.bfloat16 if cfg.model.trainer.precision == "bfloat16" else None),
        channel_major=bool(net_cfg.get("channel_major", False)),
        dense_grid=gm.dense_grid_flag(cfg),
        tap_compact=gm.tap_compact_cfg(net_cfg),
        blocked_subm=gm.blocked_cfg(net_cfg),
        zslice_subm=bool(net_cfg.get("zslice_subm", False)),
        remat=net_cfg.get("remat", False),  # bool, or int n = remat n shallowest levels
        packed_grouping=bool(net_cfg.grouping_cfg.get("packed", True)),
    )


def losses(cfg, caps: StaticCaps, batch: dict, out: dict, with_heads: bool) -> dict:
    """Classification CE + per-class mask BCE + iou-score MSE
    (reference softgroup.py:127-183)."""
    result = gm.shared_losses(batch, out)
    if not with_heads:
        return result

    net_cfg = cfg.model.network
    instance_classes = cfg.data.classes - len(cfg.data.ignore_classes)
    pos_iou_thr = net_cfg.train_cfg.pos_iou_thr
    rows: ProposalRows = out["proposal_rows"]
    p_cap = caps.proposals
    prop_valid = jnp.arange(p_cap) < rows.n_proposals

    ious_on_cluster = get_iou(rows, p_cap, batch["instance_ids"],
                              batch["instance_num_point"], caps.instances)

    inst_cls = batch["instance_semantic_cls"]
    fg = (inst_cls != -1) & batch["instance_mask"]
    fg_ious = jnp.where(fg[None, :], ious_on_cluster, 0.0)
    max_iou = jnp.max(fg_ious, axis=1)
    arg = jnp.argmax(fg_ious, axis=1)
    pos = max_iou >= pos_iou_thr

    labels = jnp.where(pos, jnp.clip(inst_cls[arg], 0, instance_classes), instance_classes)
    logp = jax.nn.log_softmax(out["cls_scores"], axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    result["classification_loss"] = jnp.sum(ce * prop_valid) / jnp.maximum(jnp.sum(prop_valid), 1)

    # mask scoring at each row's proposal class
    pid = jnp.minimum(rows.prop_id, p_cap - 1)
    row_cls = labels[pid]
    mask_sig = jax.nn.sigmoid(out["mask_scores"])
    mask_slice = jnp.take_along_axis(mask_sig, row_cls[:, None], axis=1)[:, 0]
    mask_label, mask_valid = get_mask_label(
        rows, p_cap, batch["instance_ids"], inst_cls, ious_on_cluster, pos_iou_thr, -1)
    eps = 1e-7
    pcl = jnp.clip(mask_slice, eps, 1 - eps)
    bce = -(mask_label * jnp.log(pcl) + (~mask_label) * jnp.log(1 - pcl))
    w = (mask_valid & rows.valid).astype(jnp.float32)
    result["mask_scoring_loss"] = jnp.sum(bce * w) / (jnp.sum(w) + 1)

    # iou scoring vs IoU of the mask-filtered proposal
    row_w = jax.lax.stop_gradient((mask_slice > 0.5).astype(jnp.float32))
    ious_on_pred = get_iou(rows, p_cap, batch["instance_ids"],
                           batch["instance_num_point"], caps.instances, row_weights=row_w)
    gt_iou = jnp.max(jnp.where(fg[None, :], ious_on_pred, 0.0), axis=1)
    iou_slice = jnp.take_along_axis(out["iou_scores"], labels[:, None], axis=1)[:, 0]
    wgt = ((labels < instance_classes) & prop_valid).astype(jnp.float32)
    mse = (iou_slice - gt_iou) ** 2
    result["iou_scoring_loss"] = jnp.sum(mse * wgt) / (jnp.sum(wgt) + 1)
    return result


def pred_instances(cfg, scan_id: str, xyz: np.ndarray, out_np: dict,
                   num_ignored_classes: int) -> list[dict]:
    """Per-class extraction: conf = cls_softmax * clamp(iou,0,1)
    (reference softgroup.py:302-355)."""
    test_cfg = cfg.model.network.test_cfg
    instance_classes = cfg.data.classes - num_ignored_classes
    n = xyz.shape[0]
    rows = out_np["proposal_rows"]
    n_props = int(rows["n_proposals"])
    e = np.exp(out_np["cls_scores"][:n_props] - out_np["cls_scores"][:n_props].max(1, keepdims=True))
    cls_softmax = e / e.sum(1, keepdims=True)
    iou_scores = out_np["iou_scores"][:n_props]
    mask_scores = out_np["mask_scores"]

    instances = []
    v = rows["valid"]
    r_prop, r_point = rows["prop_id"][v], rows["point_idx"][v]
    r_mask_scores = mask_scores[v]
    for i in range(instance_classes):
        cur_cls = cls_softmax[:, i]
        score = cur_cls * np.clip(iou_scores[:, i], 0, 1)
        sel = r_mask_scores[:, i] > test_cfg.mask_score_thr
        masks = np.zeros((n_props, n), dtype=bool)
        masks[r_prop[sel], r_point[sel]] = True

        keep = cur_cls > test_cfg.cls_score_thr
        keep &= masks.sum(1) >= test_cfg.min_npoint
        for p in np.flatnonzero(keep):
            mask = masks[p]
            pred_xyz = xyz[mask]
            instances.append({
                "scan_id": scan_id,
                "label_id": i + 1,
                "conf": float(score[p]),
                "pred_mask": rle_encode(mask),
                "pred_bbox": np.concatenate((pred_xyz.min(0), pred_xyz.max(0))),
            })
    return instances


def forward_flags(cfg, epoch: int, train: bool) -> dict:
    return {}


def loss_flags(cfg, epoch: int) -> dict:
    return {}
