"""Prediction IO in ScanNet submission format (reference minsu3d/util/io.py):
per-scene ``<scan>.txt`` index + ``predicted_masks/*.txt`` binary masks."""

from __future__ import annotations

import os

import numpy as np

from minsu3d_tpu.evaluation.instance_segmentation import rle_decode, rle_encode


def save_prediction(save_path: str, all_pred_insts: list, mapping_ids: list[int],
                    ignored_classes_indices: list[int]) -> None:
    inst_pred_path = os.path.join(save_path, "instance")
    masks_path = os.path.join(inst_pred_path, "predicted_masks")
    os.makedirs(masks_path, exist_ok=True)
    filtered = [m for i, m in enumerate(mapping_ids) if i + 1 not in ignored_classes_indices]
    counts: dict[str, int] = {}
    for preds in all_pred_insts:
        if not preds:
            continue
        scan_id = preds[0]["scan_id"]
        lines = []
        for pred in preds:
            k = counts.setdefault(scan_id, 0)
            mapped = filtered[pred["label_id"] - 1]
            rel = f"predicted_masks/{scan_id}_{k:03d}.txt"
            lines.append(f"{rel} {mapped} {pred['conf']:.4f}")
            np.savetxt(os.path.join(masks_path, f"{scan_id}_{k:03d}.txt"),
                       rle_decode(pred["pred_mask"]), fmt="%d")
            counts[scan_id] = k + 1
        with open(os.path.join(inst_pred_path, f"{scan_id}.txt"), "w") as f:
            f.write("\n".join(lines))


def read_gt_files_from_disk(data_path: str):
    from minsu3d_tpu.data.dataset import load_scene_file

    scene = load_scene_file(data_path)
    xyz = scene["xyz"] - scene["xyz"].mean(axis=0)
    return xyz, scene["sem_labels"], scene["instance_ids"]


def read_pred_files_from_disk(data_path: str, gt_xyz: np.ndarray, mapping_ids: list[int],
                              ignored_classes_indices: list[int]) -> list[dict]:
    filtered = [m for i, m in enumerate(mapping_ids) if i + 1 not in ignored_classes_indices]
    sem_map = {m: i for i, m in enumerate(filtered, 1)}
    preds = []
    with open(data_path) as f:
        for line in f:
            rel, sem_label, conf = line.strip().split()
            mask = np.loadtxt(os.path.join(os.path.dirname(data_path), rel), dtype=bool)
            pred_xyz = gt_xyz[mask]
            preds.append({
                "scan_id": os.path.basename(data_path),
                "label_id": sem_map[int(sem_label)],
                "conf": float(conf),
                "pred_mask": rle_encode(mask),
                "pred_bbox": np.concatenate((pred_xyz.min(0), pred_xyz.max(0))),
            })
    return preds
