"""Semantic segmentation metrics (reference minsu3d/evaluation/
semantic_segmentation.py:4-21), NumPy-native."""

from __future__ import annotations

import numpy as np


def evaluate_semantic_accuracy(pred: np.ndarray, gt: np.ndarray, ignore_label: int = -1) -> float:
    valid = gt != ignore_label
    if valid.sum() == 0:
        return 0.0
    return float((pred[valid] == gt[valid]).sum() / valid.sum() * 100)


def evaluate_semantic_miou(pred: np.ndarray, gt: np.ndarray, ignore_label: int = -1) -> float:
    valid = gt != ignore_label
    vp, vg = pred[valid], gt[valid]
    ious = []
    for cls in np.unique(vg):
        inter = np.count_nonzero((vg == cls) & (vp == cls))
        union = np.count_nonzero((vg == cls) | (vp == cls))
        ious.append(inter / union if union else 0.0)
    return float(np.mean(ious) * 100) if ious else 0.0
