"""Diagnose the PointGroup synthetic-AP gap (VERDICT round-2 weak #5:
PG 0.668/0.756 vs HAIS 0.885/0.923 on the same data, same backbone).

Runs the golden checkpoint ONCE per val scene, then evaluates host-side
ablations from the same outputs:
  * baseline             — dual clustering + ScoreNet ranking + NMS 0.3
  * shifted-only         — drop the original-coordinate clustering's rows
  * xyz-only             — drop the shifted clustering's rows
  * nms=<t>              — NMS threshold sweep
  * oracle-score         — rank proposals by TRUE max-IoU vs gt (upper bound
                           of what a perfect ScoreNet would give)
  * no-score-filter      — TEST_SCORE_THRESH=0
"""
import os
import sys

sys.path.insert(0, ".")
from minsu3d_tpu.util.env import setup_jax_cache

setup_jax_cache()
import jax
import jax.numpy as jnp
import numpy as np

from minsu3d_tpu.config import load_config
from minsu3d_tpu.data.batching import collate, device_arrays, shard_caps
from minsu3d_tpu.data.dataset import DATASETS
from minsu3d_tpu.data.synthetic import make_scene
from minsu3d_tpu.evaluation.instance_segmentation import (
    GeneralDatasetEvaluator, get_gt_instances)
from minsu3d_tpu.model import get_model
from minsu3d_tpu.model import pointgroup as pg

# mirror scripts/eval_synth_pointgroup.sh
cfg = load_config([
    "model=pointgroup", "data=synthetic",
    "model.network.prepare_epochs=20",
    "data.synthetic.train_scenes=12", "data.synthetic.val_scenes=3",
    "data.synthetic.num_objects=8", "data.synthetic.points_per_object=3000",
    "data.synthetic.floor_points=16000", "data.batch_size=2",
    "data.caps.points=131072", "data.caps.voxels=131072",
    "data.caps.eval_points=131072", "data.caps.eval_voxels=98304",
    "data.caps.instances=64", "data.caps.eval_instances=64",
    "data.caps.clusters=512", "data.caps.proposals=128",
    "model.network.cluster.cluster_npoint_thre=50",
    "model.trainer.precision=float32", "experiment_name=diag",
])
CKPT = "output/golden/pointgroup_epoch_120"

ds = DATASETS[cfg.data.dataset](cfg, "val")
caps = shard_caps(cfg, "val")
bundle = get_model("PointGroup")
net = bundle.make_net(cfg, "val")
import orbax.checkpoint as ocp

restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(CKPT))
variables = {"params": restored["params"], "batch_stats": restored["batch_stats"]}

fwd = jax.jit(lambda v, b: net.apply(v, b, False, True))
scenes = []
ignore = list(cfg.data.ignore_classes)
for i in range(len(ds)):
    item = ds[i]
    b = device_arrays(collate([item], caps))
    out = fwd(variables, b)
    n = int(b["num_points"])
    rows = {f: np.asarray(getattr(out["proposal_rows"], f))
            for f in out["proposal_rows"]._fields}
    out_np = {
        "semantic_scores": np.asarray(out["semantic_scores"])[:n],
        "proposal_scores": np.asarray(out["proposal_scores"]),
        "proposal_rows": rows,
        "point_offsets": np.asarray(out["point_offsets"])[:n],
    }
    xyz = np.asarray(b["point_xyz"])[:n]
    sem_gt = np.asarray(b["sem_labels"])[:n]
    inst_gt = np.asarray(b["instance_ids"])[:n]
    scenes.append((f"scene{i}", xyz, out_np, sem_gt, inst_gt, n))
    diag = {k: int(v) for k, v in out.get("diag", {}).items()}
    print(f"# scene{i}: n={n} props={int(rows['n_proposals'])} diag={diag}", flush=True)


def gt_iou_scores(out_np, inst_gt, n):
    """True max-IoU of each proposal vs any gt instance (same class or not)."""
    rows = out_np["proposal_rows"]
    n_props = int(rows["n_proposals"])
    masks = pg.rows_to_masks(rows, n_props, n)
    ious = np.zeros(n_props)
    for g in np.unique(inst_gt[inst_gt >= 0]):
        gm_ = inst_gt == g
        inter = (masks & gm_[None, :]).sum(1)
        union = masks.sum(1) + gm_.sum() - inter
        ious = np.maximum(ious, inter / np.maximum(union, 1))
    return ious


def run_variant(name, row_filter=None, nms=None, score_src="net", score_thr=None):
    all_preds, all_gts = [], []
    c = load_config([])  # throwaway; we mutate the shared cfg's test knobs
    test_cfg = cfg.model.network.test
    old_nms, old_thr = test_cfg.TEST_NMS_THRESH, test_cfg.TEST_SCORE_THRESH
    if nms is not None:
        test_cfg.TEST_NMS_THRESH = nms
    if score_thr is not None:
        test_cfg.TEST_SCORE_THRESH = score_thr
    try:
        for scan_id, xyz, out_np, sem_gt, inst_gt, n in scenes:
            o = {k: (dict(v) if isinstance(v, dict) else v.copy())
                 for k, v in out_np.items()}
            half = o["proposal_rows"]["valid"].shape[0] // 2  # rows are
            # [xyz clustering | shifted clustering], each one point-CAP long
            if row_filter == "shifted":
                o["proposal_rows"]["valid"] = o["proposal_rows"]["valid"].copy()
                o["proposal_rows"]["valid"][:half] = False
            elif row_filter == "xyz":
                o["proposal_rows"]["valid"] = o["proposal_rows"]["valid"].copy()
                o["proposal_rows"]["valid"][half:] = False
            if score_src == "oracle":
                iou = gt_iou_scores(o, inst_gt, len(xyz))
                logits = np.full_like(o["proposal_scores"], -20.0)
                logits[: len(iou)] = np.log(np.clip(iou, 1e-6, 1 - 1e-6) /
                                            np.clip(1 - iou, 1e-6, None))
                o["proposal_scores"] = logits
            preds = pg.pred_instances(cfg, scan_id, xyz, o, len(ignore))
            all_preds.append(preds)
            all_gts.append(get_gt_instances(sem_gt, inst_gt, ignore))
        ev = GeneralDatasetEvaluator(cfg.data.class_names, -1, ignore)
        res = ev.evaluate(all_preds, all_gts, print_result=False)
        npred = sum(len(p) for p in all_preds)
        print(f"# {name:24s} AP={res['all_ap']:.3f} AP50={res['all_ap_50%']:.3f} "
              f"AP25={res['all_ap_25%']:.3f} preds={npred}", flush=True)
    finally:
        test_cfg.TEST_NMS_THRESH = old_nms
        test_cfg.TEST_SCORE_THRESH = old_thr


# coverage: which gt instances have NO proposal at IoU>=0.25/0.5, and are
# misses fragments (several small proposals) or merges (one proposal covering
# several gts)?
for scan_id, xyz, out_np, sem_gt, inst_gt, n in scenes:
    rows = out_np["proposal_rows"]
    n_props = int(rows["n_proposals"])
    masks = pg.rows_to_masks(rows, n_props, len(xyz))
    for g in np.unique(inst_gt[inst_gt >= 0]):
        gm_ = inst_gt == g
        inter = (masks & gm_[None, :]).sum(1)
        union = masks.sum(1) + gm_.sum() - inter
        iou = inter / np.maximum(union, 1)
        best = int(np.argmax(iou)) if n_props else -1
        cls = int(sem_gt[gm_][0])
        # semantic coverage of this instance under the predicted labels
        sem_pred = out_np["semantic_scores"].argmax(1)[:n]
        sem_acc = float((sem_pred[gm_[:n]] == cls).mean())
        if iou.max() < 0.5:
            # fraction of this gt covered by its best proposal + recall
            cover = inter[best] / gm_.sum() if best >= 0 else 0.0
            purity = inter[best] / max(masks[best].sum(), 1) if best >= 0 else 0.0
            # offsets good => shifted coords collapse to the instance center
            gmask = gm_[:n]
            shifted = xyz[gmask] + out_np["point_offsets"][gmask]
            ctr = xyz[gmask].mean(0)
            sp = np.linalg.norm(shifted - shifted.mean(0), axis=1)
            off_err = np.linalg.norm(shifted - ctr, axis=1)
            print(f"# MISS {scan_id} gt={int(g)} cls={cls} size={int(gm_.sum())} "
                  f"bestIoU={iou.max():.2f} cover={cover:.2f} purity={purity:.2f} "
                  f"semacc={sem_acc:.2f} shift_spread_p50={np.median(sp):.3f} "
                  f"p90={np.quantile(sp, 0.9):.3f} off_err_p50={np.median(off_err):.3f}",
                  flush=True)

run_variant("baseline")
run_variant("shifted-only", row_filter="shifted")
run_variant("xyz-only", row_filter="xyz")
for t in (0.2, 0.5, 1.01):
    run_variant(f"nms={t}", nms=t)
run_variant("oracle-score", score_src="oracle")
run_variant("oracle+shifted-only", row_filter="shifted", score_src="oracle")
run_variant("no-score-filter", score_thr=0.0)
run_variant("score-thr=0.2", score_thr=0.2)
