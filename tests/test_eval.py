"""Evaluator protocol tests: perfect predictions score AP=1, corrupted ones
degrade sensibly; RLE round-trips; bbox AP behaves."""

import numpy as np

from minsu3d_tpu.evaluation.instance_segmentation import (
    GeneralDatasetEvaluator, get_gt_instances, rle_decode, rle_encode)
from minsu3d_tpu.evaluation.object_detection import evaluate_bbox_acc, get_gt_bbox, voc_ap
from minsu3d_tpu.evaluation.semantic_segmentation import (
    evaluate_semantic_accuracy, evaluate_semantic_miou)

CLASS_NAMES = [f"c{i}" for i in range(6)]
IGNORE = [1, 2]


def make_scene(seed=0, n_inst=4, points_per=300):
    """gt labels in 'dataset' space: sem in [-1, 0..5], inst ids, xyz."""
    rng = np.random.default_rng(seed)
    n_bg = 500
    sem = [np.full(n_bg, 0), np.full(n_bg, 1)]  # ignored classes 0/1
    inst = [np.full(n_bg, -1), np.full(n_bg, -1)]
    xyz = [rng.uniform(0, 5, (2 * n_bg, 3))]
    for k in range(n_inst):
        cls = 2 + (k % 4)
        sem.append(np.full(points_per, cls))
        inst.append(np.full(points_per, k))
        xyz.append(rng.uniform(0, 1, (points_per, 3)) + k * 3)
    return (np.concatenate(sem).astype(np.int32),
            np.concatenate(inst).astype(np.int32),
            np.concatenate(xyz).astype(np.float32))


def perfect_preds(sem, inst, scan_id="scene0"):
    preds = []
    for k in np.unique(inst):
        if k < 0:
            continue
        mask = inst == k
        # label_id in eval space: dataset sem - n_ignored + 1
        preds.append({
            "scan_id": scan_id,
            "label_id": int(sem[mask][0]) - len(IGNORE) + 1,
            "conf": 0.9,
            "pred_mask": rle_encode(mask),
        })
    return preds


class TestRLE:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        mask = rng.random(1000) > 0.7
        np.testing.assert_array_equal(rle_decode(rle_encode(mask)), mask.astype(np.uint8))

    def test_empty_and_full(self):
        for mask in (np.zeros(10, bool), np.ones(10, bool)):
            np.testing.assert_array_equal(rle_decode(rle_encode(mask)), mask.astype(np.uint8))


class TestInstanceSegEval:
    def test_perfect_predictions_ap1(self):
        sem, inst, _ = make_scene()
        gts = get_gt_instances(sem.copy(), inst.copy(), IGNORE)
        preds = perfect_preds(sem, inst)
        ev = GeneralDatasetEvaluator(CLASS_NAMES, -1, IGNORE)
        res = ev.evaluate([preds], [gts])
        assert abs(res["all_ap_50%"] - 1.0) < 1e-6
        assert abs(res["all_ap"] - 1.0) < 1e-6

    def test_missing_instance_lowers_ap(self):
        sem, inst, _ = make_scene(n_inst=4)
        gts = get_gt_instances(sem.copy(), inst.copy(), IGNORE)
        preds = perfect_preds(sem, inst)[:2]  # drop half
        ev = GeneralDatasetEvaluator(CLASS_NAMES, -1, IGNORE)
        res = ev.evaluate([preds], [gts])
        assert res["all_ap_50%"] < 0.99

    def test_wrong_class_is_fp(self):
        sem, inst, _ = make_scene(n_inst=2)
        gts = get_gt_instances(sem.copy(), inst.copy(), IGNORE)
        preds = perfect_preds(sem, inst)
        for p in preds:
            p["label_id"] = (p["label_id"] % 4) + 1  # shift classes
        ev = GeneralDatasetEvaluator(CLASS_NAMES, -1, IGNORE)
        res = ev.evaluate([preds], [gts])
        assert res["all_ap_50%"] < 0.5

    def test_low_conf_duplicates_tolerated_by_ap(self):
        """Extra low-confidence duplicates shouldn't destroy AP at high conf."""
        sem, inst, _ = make_scene(n_inst=3)
        gts = get_gt_instances(sem.copy(), inst.copy(), IGNORE)
        preds = perfect_preds(sem, inst)
        dupes = [dict(p, conf=0.1) for p in preds]
        ev = GeneralDatasetEvaluator(CLASS_NAMES, -1, IGNORE)
        res = ev.evaluate([preds + dupes], [gts])
        assert res["all_ap_50%"] > 0.66


class TestBBoxEval:
    def test_voc_ap_perfect(self):
        rec = np.array([0.5, 1.0])
        prec = np.array([1.0, 1.0])
        assert abs(voc_ap(rec, prec) - 1.0) < 1e-6

    def test_bbox_ap_perfect(self):
        sem, inst, xyz = make_scene()
        gt_bbox = get_gt_bbox(xyz, inst, sem, -1, IGNORE)
        preds = perfect_preds(sem, inst)
        for p in preds:
            mask = rle_decode(p["pred_mask"]).astype(bool)
            p["pred_bbox"] = np.concatenate([xyz[mask].min(0), xyz[mask].max(0)])
        res = evaluate_bbox_acc([preds], [gt_bbox], CLASS_NAMES, IGNORE)
        assert abs(res["all_bbox_ap_0.5"]["avg"] - 1.0) < 1e-6


class TestSemanticEval:
    def test_accuracy_and_miou(self):
        gt = np.array([0, 0, 1, 1, -1, -1])
        pred = np.array([0, 1, 1, 1, 0, 1])
        assert abs(evaluate_semantic_accuracy(pred, gt, -1) - 75.0) < 1e-6
        # class0: inter 1, union 2 -> 0.5; class1: inter 2, union 3 -> 2/3
        assert abs(evaluate_semantic_miou(pred, gt, -1) - (0.5 + 2 / 3) / 2 * 100) < 1e-4
