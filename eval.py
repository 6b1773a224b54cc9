"""Offline evaluation CLI (reference eval.py:9-60): re-reads gt ``.pth`` files
and saved prediction files, recomputes instance-seg AP + bbox AP."""

from __future__ import annotations

import os
import sys

from minsu3d_tpu.config import load_config
from minsu3d_tpu.evaluation.instance_segmentation import (
    GeneralDatasetEvaluator, get_gt_instances)
from minsu3d_tpu.evaluation.object_detection import evaluate_bbox_acc, get_gt_bbox
from minsu3d_tpu.util.io import read_gt_files_from_disk, read_pred_files_from_disk


def main(overrides: list[str]) -> None:
    cfg = load_config(overrides)
    split = cfg.model.inference.split
    with open(getattr(cfg.data.metadata, f"{split}_list")) as f:
        scene_names = [line.strip() for line in f]

    pred_dir = os.path.join(cfg.exp_output_root_path, "inference", split,
                            "predictions", "instance")
    all_preds, all_gts, all_gt_bboxes = [], [], []
    for scene in scene_names:
        gt_path = os.path.join(cfg.data.dataset_path, split, f"{scene}.pth")
        xyz, sem_labels, instance_ids = read_gt_files_from_disk(gt_path)
        all_gts.append(get_gt_instances(sem_labels, instance_ids, cfg.data.ignore_classes))
        all_gt_bboxes.append(get_gt_bbox(xyz, instance_ids, sem_labels, -1,
                                         cfg.data.ignore_classes))
        all_preds.append(read_pred_files_from_disk(
            os.path.join(pred_dir, f"{scene}.txt"), xyz,
            cfg.data.mapping_classes_ids, cfg.data.ignore_classes))

    evaluator = GeneralDatasetEvaluator(cfg.data.class_names, -1, cfg.data.ignore_classes)
    evaluator.evaluate(all_preds, all_gts, print_result=True)
    evaluate_bbox_acc(all_preds, all_gt_bboxes, cfg.data.class_names,
                      cfg.data.ignore_classes, print_result=True)


if __name__ == "__main__":
    main(sys.argv[1:])
