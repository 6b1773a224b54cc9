"""Golden diff: run the REFERENCE evaluators (imported from /root/reference at
test time — no code copied) and this repo's vectorized rewrites on the same
randomized scenes; AP numbers must agree to float32 resolution (1e-6).

The repo evaluator reimplements greedy matching + PR integration with
run-id/cummax vectorization (evaluation/instance_segmentation.py) — exactly
the kind of code where an off-by-one survives invariant-only tests, hence this
oracle (VERDICT round-2 item 5). Skips cleanly when the reference tree is not
present (public CI)."""

import importlib.util
import os
import sys

import numpy as np
import pytest

REF_ROOT = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "minsu3d", "evaluation")),
    reason="reference tree not available")


def _load(name, rel):
    spec = importlib.util.spec_from_file_location(name, os.path.join(REF_ROOT, rel))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_inst():
    return _load("ref_inst_seg", "minsu3d/evaluation/instance_segmentation.py")


@pytest.fixture(scope="module")
def ref_objdet():
    # the reference predates NumPy 2.0 (np.NINF was removed); shim it for the
    # duration of the module so the original code runs unmodified
    had = hasattr(np, "NINF")
    if not had:
        np.NINF = -np.inf
    try:
        yield _load("ref_obj_det", "minsu3d/evaluation/object_detection.py")
    finally:
        if not had:
            del np.NINF


CLASS_NAMES = ["wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door"]
IGNORE = [1, 2]  # wall, floor (1-indexed), as in ScanNet configs


def random_scene(rng, scene_idx):
    """Per-point sem/inst labels + noisy predictions exercising the protocol
    quirks: duplicates, tiny regions (<100 pts), wrong classes, void overlap,
    unassigned points, confidence ties."""
    n_classes = len(CLASS_NAMES)
    n_inst = int(rng.integers(3, 9))
    sizes = rng.integers(40, 400, n_inst)  # some below min_region_size=100
    n_bg = int(rng.integers(200, 600))
    n = int(sizes.sum()) + n_bg

    sem = np.full(n, -1, np.int32)
    inst = np.full(n, -1, np.int32)
    xyz = rng.uniform(0, 10, (n, 3)).astype(np.float32)
    pos = 0
    for i, s in enumerate(sizes):
        cls = int(rng.integers(0, n_classes))  # may be an ignored class
        sem[pos:pos + s] = cls
        inst[pos:pos + s] = i
        xyz[pos:pos + s] = rng.uniform(0, 10, 3) + rng.normal(0, 0.3, (s, 3))
        pos += s
    # background: some unlabeled (-1, void), some labeled-but-uninstanced
    sem[pos + n_bg // 2:] = rng.integers(0, 2, n_bg - n_bg // 2)  # ignored classes

    preds = []
    scan_id = f"scene{scene_idx:04d}"
    for i, s in enumerate(sizes):
        start = int(sizes[:i].sum())
        for dup in range(int(rng.integers(1, 3))):  # duplicate predictions
            mask = np.zeros(n, bool)
            # noisy span: jittered start/end + random dropout
            lo = max(0, start + int(rng.integers(-30, 30)))
            hi = min(n, start + s + int(rng.integers(-30, 30)))
            if hi <= lo:
                lo, hi = start, start + s
            mask[lo:hi] = True
            mask &= rng.random(n) > 0.1
            label = int(sem[start]) - len(IGNORE) + 1  # 1-indexed eval label
            if rng.random() < 0.2:
                label = int(rng.integers(1, n_classes - len(IGNORE) + 1))  # wrong class
            if label < 1:
                label = 1
            m_xyz = xyz[mask] if mask.any() else xyz[:1]
            preds.append({
                "scan_id": scan_id,
                "label_id": label,
                "conf": float(rng.choice([0.3, 0.5, 0.5, 0.9, rng.random()])),
                "pred_mask": mask,
                "pred_bbox": np.concatenate((m_xyz.min(0), m_xyz.max(0))),
            })
    # a tiny spurious prediction (< min_region_size)
    mask = np.zeros(n, bool)
    mask[rng.integers(0, n, 40)] = True
    preds.append({"scan_id": scan_id, "label_id": 1, "conf": 0.7, "pred_mask": mask,
                  "pred_bbox": np.concatenate((xyz[mask].min(0), xyz[mask].max(0)))})
    return sem, inst, xyz, preds


def _encode(preds, rle_encode):
    return [{**p, "pred_mask": rle_encode(p["pred_mask"])} for p in preds]


def test_instance_seg_ap_matches_reference(ref_inst):
    from minsu3d_tpu.evaluation.instance_segmentation import (
        GeneralDatasetEvaluator, get_gt_instances, rle_encode)

    rng = np.random.default_rng(42)
    ours_preds, ref_preds, ours_gts, ref_gts = [], [], [], []
    for i in range(20):
        sem, inst, _, preds = random_scene(rng, i)
        ours_preds.append(_encode(preds, rle_encode))
        ref_preds.append(_encode(preds, ref_inst.rle_encode))
        ours_gts.append(get_gt_instances(sem.copy(), inst.copy(), IGNORE))
        ref_gts.append(ref_inst.get_gt_instances(sem.copy(), inst.copy(), IGNORE))

    for a, b in zip(ours_gts, ref_gts):
        np.testing.assert_array_equal(a, b)

    ours = GeneralDatasetEvaluator(CLASS_NAMES, -1, IGNORE).evaluate(
        ours_preds, ours_gts, print_result=False)
    ref = ref_inst.GeneralDatasetEvaluator(CLASS_NAMES, -1, IGNORE).evaluate(
        ref_preds, ref_gts, print_result=False)

    # the reference accumulates APs in float32 (np.zeros default of its ap
    # array is f64 but averages mix f32) — match to f32 resolution
    for key in ("all_ap", "all_ap_50%", "all_ap_25%"):
        assert abs(ours[key] - float(ref[key])) < 1e-6, (key, ours[key], ref[key])
    for cls, vals in ref["classes"].items():
        for k in ("ap", "ap50%", "ap25%"):
            o = ours["classes"][cls][k]
            r = vals[k]
            if np.isnan(r):
                assert np.isnan(o), (cls, k)
            else:
                assert abs(o - float(r)) < 1e-6, (cls, k, o, r)


def test_bbox_ap_matches_reference(ref_objdet):
    from minsu3d_tpu.evaluation.object_detection import (
        evaluate_bbox_acc, get_gt_bbox)

    rng = np.random.default_rng(7)
    all_preds, gt_ours, gt_ref = [], [], []
    for i in range(20):
        sem, inst, xyz, preds = random_scene(rng, i)
        all_preds.append(preds)  # bbox eval reads pred_bbox/label_id/conf only
        gt_ours.append(get_gt_bbox(xyz, inst.copy(), sem.copy(), -1, IGNORE))
        gt_ref.append(ref_objdet.get_gt_bbox(xyz, inst.copy(), sem.copy(), -1, IGNORE))

    ours = evaluate_bbox_acc(all_preds, gt_ours, CLASS_NAMES, IGNORE, print_result=False)
    ref = ref_objdet.evaluate_bbox_acc(all_preds, gt_ref, CLASS_NAMES, IGNORE,
                                       print_result=False)
    for thr in ("all_bbox_ap_0.25", "all_bbox_ap_0.5"):
        for cls, val in ref[thr].items():
            o = ours[thr][cls]
            if np.isnan(val):
                assert np.isnan(o), (thr, cls)
            else:
                assert abs(o - float(val)) < 1e-6, (thr, cls, o, val)
