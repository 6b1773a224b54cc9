"""Oracle pipeline test: feed GT-derived semantics/offsets through the
clustering -> proposals -> prediction-extraction -> evaluation chain and
expect near-perfect AP. Validates the whole instance pipeline independent of
network training."""

import jax.numpy as jnp
import numpy as np

from helpers import tiny_cfg, make_batch
from minsu3d_tpu.evaluation.instance_segmentation import (
    GeneralDatasetEvaluator, get_gt_instances)
from minsu3d_tpu.model.pointgroup import (
    foreground_mask, merge_clusterings, pred_instances)
from minsu3d_tpu.ops.cluster import cluster_points
from minsu3d_tpu.ops.instance_iou import get_iou


def oracle_outputs(batch):
    """Semantic one-hots + exact offsets from gt."""
    sem = np.asarray(batch["sem_labels"])
    n = sem.shape[0]
    scores = np.full((n, 20), -10.0, np.float32)
    scores[np.arange(n), np.clip(sem, 0, 19)] = 10.0
    offsets = np.asarray(batch["instance_center_xyz"]) - np.asarray(batch["point_xyz"])
    offsets[np.asarray(batch["instance_ids"]) < 0] = 0
    return scores, offsets.astype(np.float32)


class TestOraclePointGroup:
    def test_clustering_recovers_instances(self):
        cfg = tiny_cfg()
        batch, arrays, items = make_batch(cfg, "val", 1, seed=7)
        sem_scores, offsets = oracle_outputs(batch)
        sem_preds = jnp.array(sem_scores.argmax(1).astype(np.int32))
        obj = foreground_mask(sem_preds, jnp.array(batch["point_mask"]),
                              tuple(cfg.data.ignore_classes))
        xyz = jnp.array(batch["point_xyz"])
        shifted = xyz + jnp.array(offsets)
        bids = jnp.array(batch["vert_batch_ids"])

        radius = cfg.model.network.cluster.cluster_radius
        thr = cfg.model.network.cluster.cluster_npoint_thre
        c = cfg.data.caps
        clus = cluster_points(xyz, bids, obj, sem_preds, radius,
                              c.neighbors, c.cell_window, c.clusters)
        clus_shift = cluster_points(shifted, bids, obj, sem_preds, radius,
                                    c.neighbors, c.cell_window, c.clusters)
        rows, _ = merge_clusterings([clus, clus_shift], [thr, thr],
                                    xyz.shape[0], c.proposals)
        n_props = int(rows.n_proposals)
        n_inst = int(batch["num_instance"])
        assert n_props >= n_inst, f"proposals {n_props} < instances {n_inst}"

        # every gt instance should have a proposal with IoU ~1 (shifted path)
        ious = np.asarray(get_iou(rows, c.proposals, jnp.array(batch["instance_ids"]),
                                  jnp.array(batch["instance_num_point"]), c.instances))
        best_per_inst = ious[:, :n_inst].max(0)
        assert (best_per_inst > 0.85).all(), best_per_inst

    def test_oracle_ap_near_perfect(self):
        cfg = tiny_cfg()
        batch, arrays, items = make_batch(cfg, "val", 1, seed=11)
        sem_scores, offsets = oracle_outputs(batch)
        sem_preds = jnp.array(sem_scores.argmax(1).astype(np.int32))
        obj = foreground_mask(sem_preds, jnp.array(batch["point_mask"]),
                              tuple(cfg.data.ignore_classes))
        xyz = jnp.array(batch["point_xyz"])
        shifted = xyz + jnp.array(offsets)
        bids = jnp.array(batch["vert_batch_ids"])
        c = cfg.data.caps
        radius = cfg.model.network.cluster.cluster_radius
        thr = cfg.model.network.cluster.cluster_npoint_thre
        clus = cluster_points(xyz, bids, obj, sem_preds, radius,
                              c.neighbors, c.cell_window, c.clusters)
        clus_shift = cluster_points(shifted, bids, obj, sem_preds, radius,
                                    c.neighbors, c.cell_window, c.clusters)
        rows, _ = merge_clusterings([clus, clus_shift], [thr, thr],
                                    xyz.shape[0], c.proposals)

        n = int(batch["num_points"])
        out_np = {
            "semantic_scores": sem_scores[:n],
            "proposal_scores": np.full(c.proposals, 5.0, np.float32),
            "proposal_rows": {f: np.asarray(getattr(rows, f)) for f in rows._fields},
        }
        preds = pred_instances(cfg, "scene0", np.asarray(batch["point_xyz"])[:n],
                               out_np, len(cfg.data.ignore_classes))
        assert preds, "no predictions extracted"

        gts = get_gt_instances(np.asarray(batch["sem_labels"])[:n],
                               np.asarray(batch["instance_ids"])[:n],
                               cfg.data.ignore_classes)
        ev = GeneralDatasetEvaluator(cfg.data.class_names, -1, cfg.data.ignore_classes)
        res = ev.evaluate([preds], [gts])
        assert res["all_ap_50%"] > 0.95, res["all_ap_50%"]
        assert res["all_ap_25%"] > 0.95, res["all_ap_25%"]


class TestOracleHAIS:
    def test_hais_pipeline_with_oracle_inputs(self):
        """GT-derived semantics/offsets -> clustering -> hierarchical
        aggregation -> prediction extraction -> AP should be near-perfect."""
        from minsu3d_tpu.model import hais as H
        from minsu3d_tpu.model import general_model as gm

        cfg = tiny_cfg("hais")
        batch, arrays, items = make_batch(cfg, "val", 1, seed=13)
        sem_scores, offsets = oracle_outputs(batch)
        sem_preds = jnp.array(sem_scores.argmax(1).astype(np.int32))
        obj = foreground_mask(sem_preds, jnp.array(batch["point_mask"]),
                              tuple(cfg.data.ignore_classes))
        xyz = jnp.array(batch["point_xyz"])
        shifted = xyz + jnp.array(offsets)
        bids = jnp.array(batch["vert_batch_ids"])
        from minsu3d_tpu.model.caps import StaticCaps

        caps = StaticCaps.from_cfg(cfg, "val")
        units, _ = gm.make_units(jnp.array(batch["p2v"]), sem_preds, obj, caps.cluster_units)
        clus = gm.cluster_step(shifted, bids, obj, sem_preds,
                               cfg.model.network.point_aggr_radius, caps, units)
        # synthetic objects have ~600 pts; set class means so they are primaries
        pna = jnp.full(20, 600.0, jnp.float32)
        ra = jnp.full(20, 0.3, jnp.float32)
        rows, _ = H.hierarchical_aggregation(clus, shifted, bids, sem_preds, obj,
                                             pna, ra, caps.proposals, use_set_aggr=True)
        n_inst = int(batch["num_instance"])
        assert int(rows.n_proposals) >= n_inst

        from minsu3d_tpu.ops.instance_iou import get_iou

        ious = np.asarray(get_iou(rows, caps.proposals, jnp.array(batch["instance_ids"]),
                                  jnp.array(batch["instance_num_point"]), caps.instances))
        best = ious[:, :n_inst].max(0)
        assert (best > 0.85).all(), best

        n = int(batch["num_points"])
        r = rows.point_idx.shape[0]
        out_np = {
            "semantic_scores": sem_scores[:n],
            "proposal_scores": np.full(caps.proposals, 5.0, np.float32),
            "mask_scores": np.full(r, 5.0, np.float32),  # keep all rows
            "proposal_rows": {f: np.asarray(getattr(rows, f)) for f in rows._fields},
        }
        preds = H.pred_instances(cfg, "scene0", np.asarray(batch["point_xyz"])[:n],
                                 out_np, len(cfg.data.ignore_classes))
        assert preds
        gts = get_gt_instances(np.asarray(batch["sem_labels"])[:n],
                               np.asarray(batch["instance_ids"])[:n],
                               cfg.data.ignore_classes)
        ev = GeneralDatasetEvaluator(cfg.data.class_names, -1, cfg.data.ignore_classes)
        res = ev.evaluate([preds], [gts])
        assert res["all_ap_50%"] > 0.9, res["all_ap_50%"]


class TestOracleSoftGroup:
    def test_softgroup_pipeline_with_oracle_inputs(self):
        """GT-derived softmax/offsets -> per-class soft grouping ->
        per-class extraction -> AP should be near-perfect."""
        from minsu3d_tpu.model import softgroup as S
        from minsu3d_tpu.model.caps import StaticCaps

        cfg = tiny_cfg("softgroup")
        batch, arrays, items = make_batch(cfg, "val", 1, seed=17)
        sem_scores, offsets = oracle_outputs(batch)
        e = np.exp(sem_scores - sem_scores.max(1, keepdims=True))
        softmax = e / e.sum(1, keepdims=True)
        xyz = jnp.array(batch["point_xyz"])
        shifted = xyz + jnp.array(offsets)
        caps = StaticCaps.from_cfg(cfg, "val")
        g = cfg.model.network.grouping_cfg

        rows = S.soft_grouping(
            jnp.array(softmax), shifted, jnp.array(batch["vert_batch_ids"]),
            jnp.array(batch["point_mask"]),
            tuple(c for c in range(20) if c + 1 not in cfg.data.ignore_classes),
            g.score_thr, g.radius, g.npoint_thr,
            jnp.full(20, 600.0, jnp.float32), 50,
            cfg.model.network.train_cfg.max_proposal_num, caps,
            p2v=jnp.array(batch["p2v"]))[0]
        rows = S.compact_rows(rows, 2 * xyz.shape[0])
        n_inst = int(batch["num_instance"])
        assert int(rows.n_proposals) >= n_inst

        n = int(batch["num_points"])
        n_props = caps.proposals
        r = rows.point_idx.shape[0]
        k1 = 19  # 20 classes - 2 ignored + 1 bg
        # oracle heads: classify each proposal by its members' gt class,
        # iou score 1, keep all mask rows
        inst_cls = np.asarray(batch["instance_semantic_cls"])
        inst_ids = np.asarray(batch["instance_ids"])
        prop_cls = np.zeros(n_props, np.int64)
        pid = np.asarray(rows.prop_id)
        pt = np.asarray(rows.point_idx)
        v = np.asarray(rows.valid)
        for p in range(int(rows.n_proposals)):
            members = pt[v & (pid == p)]
            ii = inst_ids[members]
            ii = ii[ii >= 0]
            prop_cls[p] = inst_cls[ii[0]] if len(ii) else k1 - 1
        cls_scores = np.full((n_props, k1), -10.0, np.float32)
        cls_scores[np.arange(n_props), np.clip(prop_cls, 0, k1 - 1)] = 10.0
        out_np = {
            "proposal_rows": {f: np.asarray(getattr(rows, f)) for f in rows._fields},
            "cls_scores": cls_scores,
            "iou_scores": np.ones((n_props, k1), np.float32),
            "mask_scores": np.full((r, k1), 5.0, np.float32),
        }
        preds = S.pred_instances(cfg, "scene0", np.asarray(batch["point_xyz"])[:n],
                                 out_np, len(cfg.data.ignore_classes))
        assert preds
        gts = get_gt_instances(np.asarray(batch["sem_labels"])[:n],
                               np.asarray(batch["instance_ids"])[:n],
                               cfg.data.ignore_classes)
        ev = GeneralDatasetEvaluator(cfg.data.class_names, -1, cfg.data.ignore_classes)
        res = ev.evaluate([preds], [gts])
        assert res["all_ap_50%"] > 0.9, res["all_ap_50%"]
