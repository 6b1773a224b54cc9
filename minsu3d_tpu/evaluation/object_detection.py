"""Object-detection evaluation: VOC-style bbox AP at IoU 0.25/0.5 over
axis-aligned boxes derived from instance masks (reference minsu3d/evaluation/
object_detection.py:5-335, a votenet-lineage eval)."""

from __future__ import annotations

import numpy as np


def voc_ap(rec: np.ndarray, prec: np.ndarray) -> float:
    """Exact-area VOC AP (reference :5-36, use_07_metric=False path)."""
    mrec = np.concatenate(([0.0], rec, [1.0]))
    mpre = np.concatenate(([0.0], prec, [0.0]))
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = max(mpre[i - 1], mpre[i])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def get_iou(box_a: np.ndarray, box_b: np.ndarray) -> float:
    """AABB IoU, boxes as xyzxyz (reference :39-61)."""
    min_max = np.minimum(box_a[3:6], box_b[3:6])
    max_min = np.maximum(box_a[0:3], box_b[0:3])
    if not (min_max > max_min).all():
        return 0.0
    inter = float(np.prod(min_max - max_min))
    vol_a = float(np.prod(box_a[3:6] - box_a[0:3]))
    vol_b = float(np.prod(box_b[3:6] - box_b[0:3]))
    return inter / (vol_a + vol_b - inter)


def eval_det_cls(pred: dict, gt: dict, ovthresh: float) -> tuple:
    """Per-class PR/AP (reference :68-150): sort detections by confidence,
    greedily match each to its best-IoU unclaimed gt box in the same scene."""
    class_recs = {}
    npos = 0
    for img_id, boxes in gt.items():
        class_recs[img_id] = {"bbox": np.array(boxes, np.float64),
                              "det": np.zeros(len(boxes), bool)}
        npos += len(boxes)
    for img_id in pred:
        if img_id not in class_recs:
            class_recs[img_id] = {"bbox": np.zeros((0, 6)), "det": np.zeros(0, bool)}

    image_ids, confidence, boxes = [], [], []
    for img_id, dets in pred.items():
        for box, score in dets:
            image_ids.append(img_id)
            confidence.append(score)
            boxes.append(box)
    order = np.argsort(-np.asarray(confidence)) if confidence else np.zeros(0, int)
    nd = len(order)
    tp = np.zeros(nd)
    fp = np.zeros(nd)
    for rank, d in enumerate(order):
        rec = class_recs[image_ids[d]]
        bb = np.asarray(boxes[d], np.float64)
        ovmax, jmax = -np.inf, -1
        for j in range(len(rec["bbox"])):
            iou = get_iou(bb, rec["bbox"][j])
            if iou > ovmax:
                ovmax, jmax = iou, j
        if ovmax > ovthresh and not rec["det"][jmax]:
            tp[rank] = 1
            rec["det"][jmax] = True
        else:
            fp[rank] = 1

    fp = np.cumsum(fp)
    tp = np.cumsum(tp)
    recall = tp / max(npos, 1)
    precision = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
    return recall, precision, voc_ap(recall, precision)


def eval_sphere(pred_all: dict, gt_all: dict, ovthresh: float) -> tuple:
    """Group detections/gt by class and run per-class eval (reference :204-257)."""
    pred, gt = {}, {}
    for img_id, dets in pred_all.items():
        for classname, box, score in dets:
            pred.setdefault(classname, {}).setdefault(img_id, []).append((box, score))
    for img_id, gts in gt_all.items():
        for classname, box in gts:
            gt.setdefault(classname, {}).setdefault(img_id, []).append(box)

    rec, prec, ap = {}, {}, {}
    for classname in gt:
        if classname in pred:
            rec[classname], prec[classname], ap[classname] = eval_det_cls(
                pred[classname], gt[classname], ovthresh)
        else:
            rec[classname], prec[classname], ap[classname] = 0, 0, 0
    return rec, prec, ap


def get_gt_bbox(xyz: np.ndarray, instance_ids: np.ndarray, sem_labels: np.ndarray,
                ignored_label: int, ignore_classes: list[int]) -> list:
    """Axis-aligned gt boxes per instance (reference :260-278)."""
    gt_bbox = []
    for instance_id in np.unique(instance_ids):
        if instance_id == ignored_label:
            continue
        idx = instance_ids == instance_id
        sem = int(sem_labels[idx][0])
        if sem + 1 in ignore_classes or sem == ignored_label:
            continue
        xyz_i = xyz[idx]
        gt_bbox.append((sem - len(ignore_classes),
                        np.concatenate((xyz_i.min(0), xyz_i.max(0)))))
    return gt_bbox


def evaluate_bbox_acc(all_preds: list, all_gts: list, class_names: list[str],
                      ignored_classes_indices: list[int], print_result: bool = False) -> dict:
    """Bbox AP at IoU 0.25/0.5 (reference :281-298)."""
    pred_all, gt_all = {}, {}
    for preds, gts in zip(all_preds, all_gts):
        if not preds:
            continue
        img_id = preds[0]["scan_id"]
        pred_all[img_id] = [(p["label_id"] - 1, p["pred_bbox"], p["conf"]) for p in preds]
        gt_all[img_id] = gts
    bbox_aps = {}
    for iou_threshold in (0.25, 0.5):
        _, _, ap = eval_sphere(pred_all, gt_all, ovthresh=iou_threshold)
        ap["avg"] = float(np.mean(list(ap.values()))) if ap else 0.0
        bbox_aps[f"all_bbox_ap_{iou_threshold}"] = ap
    if print_result:
        print_results(bbox_aps, class_names, ignored_classes_indices)
    return bbox_aps


def print_results(bbox_aps: dict, class_names: list[str], ignored_classes_indices: list[int]):
    line_len = 46
    print("\n" + "#" * line_len)
    print("{:<15}:{:>15}{:>15}".format("what", "BBox_AP_50%", "BBOX_AP_25%"))
    print("#" * line_len)
    names = [c for i, c in enumerate(class_names) if i + 1 not in ignored_classes_indices]
    for li, name in enumerate(names):
        ap50 = bbox_aps["all_bbox_ap_0.5"].get(li, 0.0)
        ap25 = bbox_aps["all_bbox_ap_0.25"].get(li, 0.0)
        print("{:<15}:{:>15.3f}{:>15.3f}".format(name, ap50, ap25))
    print("-" * line_len)
    print("{:<15}:{:>15.3f}{:>15.3f}".format(
        "average", bbox_aps["all_bbox_ap_0.5"]["avg"], bbox_aps["all_bbox_ap_0.25"]["avg"]))
    print("#" * line_len + "\n")
