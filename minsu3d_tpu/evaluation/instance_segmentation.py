"""Instance-segmentation evaluation: the ScanNet benchmark AP protocol
(reference minsu3d/evaluation/instance_segmentation.py:10-476, itself the
standard public ScanNet benchmark script).

Protocol summary, preserved exactly:
  * IoU thresholds 0.5:0.05:0.95 plus 0.25; min gt/pred region 100 verts
  * gt encoding ``sem_id*1000 + inst_id`` (0 = void)
  * greedy per-class matching with global pred-visited state; duplicate
    matches of one gt count the lower-score pred as FP
  * unmatched preds are ignored (not FP) when mostly covered by void/"group"
    (id<1000)/small gt regions (proportion > iou threshold)
  * AP integrates the PR curve with half-step widths at unique score
    thresholds; mAP averages IoU 0.5..0.95; AP50/AP25 are single thresholds.
"""

from __future__ import annotations

import numpy as np


def rle_encode(mask: np.ndarray) -> dict:
    """Run-length encode a 1D binary mask (reference format: 1-indexed
    start/length pairs in a space-separated string)."""
    mask = np.asarray(mask).astype(np.int8)
    padded = np.concatenate([[0], mask, [0]])
    edges = np.flatnonzero(padded[1:] != padded[:-1]) + 1
    edges[1::2] -= edges[::2]
    return {"length": int(mask.shape[0]), "counts": " ".join(str(int(x)) for x in edges)}


def rle_decode(rle: dict) -> np.ndarray:
    mask = np.zeros(rle["length"], dtype=np.uint8)
    vals = [int(x) for x in rle["counts"].split()]
    for start, num in zip(vals[::2], vals[1::2]):
        mask[start - 1 : start - 1 + num] = 1
    return mask


def get_gt_instances(sem_labels: np.ndarray, instance_ids: np.ndarray,
                     ignored_classes: list[int]) -> np.ndarray:
    """Encode gt as sem*1000+inst with 0 = ignored (reference :60-71)."""
    sem = np.asarray(sem_labels).astype(np.int64) - len(ignored_classes) + 1
    sem[sem < 0] = 0
    inst = np.asarray(instance_ids).astype(np.int64) + 1
    out = sem * 1000 + inst
    out[inst <= 0] = 0
    return out


class GeneralDatasetEvaluator:
    """ScanNet-protocol AP evaluator (reference :104-476)."""

    def __init__(self, class_labels, ignored_label, ignored_classes_indices,
                 iou_type=None, use_label=True):
        self.valid_class_labels = [
            c for i, c in enumerate(class_labels) if i + 1 not in ignored_classes_indices
        ]
        self.valid_class_ids = np.arange(len(self.valid_class_labels)) + 1
        self.ignored_label = ignored_label
        self.use_label = use_label
        self.eval_class_labels = self.valid_class_labels if use_label else ["class_agnostic"]
        self.id2label = dict(zip(self.valid_class_ids, self.valid_class_labels))
        self.ious = np.append(np.arange(0.5, 0.95, 0.05), 0.25)
        self.min_region_size = 100

    # -- per-scene association ------------------------------------------------
    def _scene_assoc(self, preds: list[dict], gts: np.ndarray) -> dict:
        """Precompute, per class: gt instances and predictions with their
        pairwise intersections (reference assign_instances_for_scan)."""
        scene = {lbl: {"gt": [], "pred": []} for lbl in self.eval_class_labels}
        gt_ids = np.unique(gts)
        gt_ids = gt_ids[gt_ids != 0]
        void_mask = ~np.isin(gts // 1000, self.valid_class_ids)

        gt_info = {}
        for gid in gt_ids:
            label_id = int(gid) // 1000
            if label_id not in self.id2label:
                continue
            lbl = self.id2label[label_id] if self.use_label else self.eval_class_labels[0]
            info = {
                "instance_id": int(gid),
                "vert_count": int(np.count_nonzero(gts == gid)),
                "matched": [],  # (pred_index_in_scene_list, iou)
            }
            gt_info[int(gid)] = (lbl, info)
            scene[lbl]["gt"].append(info)

        for pred in preds:
            if self.use_label:
                label_id = pred["label_id"]
                if label_id not in self.id2label:
                    continue
                lbl = self.id2label[label_id]
            else:
                lbl = self.eval_class_labels[0]
            mask = rle_decode(pred["pred_mask"]).astype(bool)
            vert_count = int(np.count_nonzero(mask))
            if vert_count < self.min_region_size:
                continue
            p = {
                "confidence": float(pred["conf"]),
                "vert_count": vert_count,
                "void_intersection": int(np.count_nonzero(void_mask & mask)),
                # same-class gt overlaps: (instance_id, intersection, iou, gt_vert_count)
                "matched": [],
            }
            masked_gts = gts[mask]
            overlap_ids, counts = np.unique(masked_gts, return_counts=True)
            for gid, inter in zip(overlap_ids, counts):
                gid = int(gid)
                if gid == 0:
                    continue
                entry = gt_info.get(gid)
                if entry is not None and entry[0] == lbl:
                    gt_vert = entry[1]["vert_count"]
                    iou = inter / (gt_vert + vert_count - inter)
                    entry[1]["matched"].append((len(scene[lbl]["pred"]), float(iou)))
                    p["matched"].append((gid, int(inter), float(iou), gt_vert))
            scene[lbl]["pred"].append(p)
        return scene

    # -- AP over all scenes ---------------------------------------------------
    def _ap_for(self, scenes: list[dict], label: str, iou_th: float):
        y_true, y_score = [], []
        hard_fn = 0
        has_gt = has_pred = False
        for si, scene in enumerate(scenes):
            data = scene[label]
            gt_list = [g for g in data["gt"]
                       if g["instance_id"] >= 1000 and g["vert_count"] >= self.min_region_size]
            preds = data["pred"]
            if gt_list:
                has_gt = True
            if preds:
                has_pred = True

            pred_visited = np.zeros(len(preds), bool)
            cur_true, cur_score, cur_match = [], [], []
            for gt in gt_list:
                found = False
                matched_here = False
                best_score = -np.inf
                for (pi, iou) in sorted(gt["matched"], key=lambda t: t[0]):
                    if pred_visited[pi] or iou <= iou_th:
                        continue
                    conf = preds[pi]["confidence"]
                    if matched_here:
                        # duplicate: lower-score pred becomes FP; NB the
                        # benchmark does NOT mark the duplicate as visited
                        lo, hi = min(best_score, conf), max(best_score, conf)
                        best_score = hi
                        cur_true.append(0)
                        cur_score.append(lo)
                        cur_match.append(True)
                    else:
                        found = matched_here = True
                        best_score = conf
                        pred_visited[pi] = True
                if matched_here:
                    cur_true.append(1)
                    cur_score.append(best_score)
                    cur_match.append(True)
                if not found:
                    hard_fn += 1

            for p in preds:
                if any(iou > iou_th for (_, _, iou, _) in p["matched"]):
                    continue  # matched somewhere: never an explicit FP row
                num_ignore = p["void_intersection"]
                for (gid, inter, _, gt_vert) in p["matched"]:
                    if gid < 1000 or gt_vert < self.min_region_size:
                        num_ignore += inter
                if num_ignore / p["vert_count"] <= iou_th:
                    cur_true.append(0)
                    cur_score.append(p["confidence"])
                    cur_match.append(True)
            y_true.extend(t for t, m in zip(cur_true, cur_match) if m)
            y_score.extend(s for s, m in zip(cur_score, cur_match) if m)

        if has_gt and has_pred:
            y_true = np.asarray(y_true, np.float64)
            y_score = np.asarray(y_score, np.float64)
            order = np.argsort(y_score)
            y_true, y_score = y_true[order], y_score[order]
            cum = np.cumsum(y_true)
            thresholds, uniq_idx = np.unique(y_score, return_index=True)
            n = len(y_score)
            n_true = cum[-1] if n else 0
            num_pr = len(uniq_idx) + 1
            precision = np.zeros(num_pr)
            recall = np.zeros(num_pr)
            cum_pad = np.append(cum, 0)
            for r, idx in enumerate(uniq_idx):
                c = cum_pad[idx - 1]
                tp = n_true - c
                fp = n - idx - tp
                fn = c + hard_fn
                precision[r] = tp / (tp + fp)
                recall[r] = tp / (tp + fn)
            rc_current = recall[0] if num_pr > 1 else 0.0
            precision[-1] = 1.0
            recall[-1] = 0.0
            rec_conv = np.concatenate([[recall[0]], recall, [0.0]])
            step = np.convolve(rec_conv, [-0.5, 0, 0.5], "valid")
            return float(np.dot(precision, step)), float(rc_current)
        if has_gt:
            return 0.0, 0.0
        return float("nan"), float("nan")

    def evaluate(self, pred_list, gt_list, print_result=False) -> dict:
        assert len(pred_list) == len(gt_list)
        scenes = [self._scene_assoc(p, np.asarray(g)) for p, g in zip(pred_list, gt_list)]
        n_l, n_o = len(self.eval_class_labels), len(self.ious)
        aps = np.zeros((n_l, n_o), np.float64)
        rcs = np.zeros((n_l, n_o), np.float64)
        for li, label in enumerate(self.eval_class_labels):
            for oi, th in enumerate(self.ious):
                aps[li, oi], rcs[li, oi] = self._ap_for(scenes, label, th)

        o50 = np.isclose(self.ious, 0.5)
        o25 = np.isclose(self.ious, 0.25)
        oall = ~o25
        avgs = {
            "all_ap": np.nanmean(aps[:, oall]),
            "all_ap_50%": np.nanmean(aps[:, o50]),
            "all_ap_25%": np.nanmean(aps[:, o25]),
            "all_rc": np.nanmean(rcs[:, oall]),
            "all_rc_50%": np.nanmean(rcs[:, o50]),
            "all_rc_25%": np.nanmean(rcs[:, o25]),
            "classes": {},
        }
        for li, label in enumerate(self.eval_class_labels):
            avgs["classes"][label] = {
                "ap": np.average(aps[li, oall]),
                "ap50%": np.average(aps[li, o50]),
                "ap25%": np.average(aps[li, o25]),
                "rc": np.average(rcs[li, oall]),
                "rc50%": np.average(rcs[li, o50]),
                "rc25%": np.average(rcs[li, o25]),
            }
        if print_result:
            self.print_results(avgs)
        return avgs

    def print_results(self, avgs: dict) -> None:
        line_len = 64
        print("\n" + "#" * line_len)
        header = "{:<15}:".format("what")
        for h in ("AP", "AP_50%", "AP_25%", "AR", "RC_50%", "RC_25%"):
            header += "{:>8}".format(h)
        print(header)
        print("#" * line_len)
        for label in self.eval_class_labels:
            c = avgs["classes"][label]
            row = "{:<15}:".format(label)
            for k in ("ap", "ap50%", "ap25%", "rc", "rc50%", "rc25%"):
                row += "{:>8.3f}".format(c[k])
            print(row)
        print("-" * line_len)
        row = "{:<15}:".format("average")
        for k in ("all_ap", "all_ap_50%", "all_ap_25%", "all_rc", "all_rc_50%", "all_rc_25%"):
            row += "{:>8.3f}".format(avgs[k])
        print(row)
        print("#" * line_len + "\n")
