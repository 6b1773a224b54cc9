"""Utility coverage: prediction IO round-trip (the eval.py path), cosine LR
schedule, DataModule iteration, bbox geometry."""

import numpy as np

from helpers import tiny_cfg, tiny_scenes
from minsu3d_tpu.data.datamodule import DataModule
from minsu3d_tpu.evaluation.instance_segmentation import rle_decode, rle_encode
from minsu3d_tpu.util.bbox import get_3d_box, get_aabb3d_iou, get_aabb3d_iou_batch
from minsu3d_tpu.util.io import read_pred_files_from_disk, save_prediction
from minsu3d_tpu.util.lr_decay import cosine_lr

MAPPING = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39]
IGNORE = [1, 2]


def test_prediction_io_roundtrip(tmp_path):
    """save_prediction -> read_pred_files_from_disk reproduces the instances
    (the reference eval.py offline loop, io.py:8-62)."""
    rng = np.random.default_rng(0)
    n = 500
    xyz = rng.uniform(0, 3, (n, 3)).astype(np.float32)
    preds = []
    for i in range(3):
        mask = np.zeros(n, bool)
        mask[i * 150 : i * 150 + 140] = True
        preds.append({
            "scan_id": "sceneX", "label_id": i + 1, "conf": 0.5 + 0.1 * i,
            "pred_mask": rle_encode(mask),
            "pred_bbox": np.concatenate([xyz[mask].min(0), xyz[mask].max(0)]),
        })
    save_prediction(str(tmp_path), [preds], MAPPING, IGNORE)

    loaded = read_pred_files_from_disk(
        str(tmp_path / "instance" / "sceneX.txt"), xyz, MAPPING, IGNORE)
    assert len(loaded) == 3
    for orig, back in zip(preds, loaded):
        assert back["label_id"] == orig["label_id"]
        assert abs(back["conf"] - orig["conf"]) < 1e-3
        np.testing.assert_array_equal(
            rle_decode(back["pred_mask"]), rle_decode(orig["pred_mask"]))


def test_cosine_lr_schedule():
    """Reference lr_decay.py semantics: flat, then half-cosine to clip."""
    base, start, total = 0.01, 100, 200
    assert cosine_lr(base, 50, start, total) == base
    assert cosine_lr(base, 100, start, total) == base  # cos(0)
    mid = cosine_lr(base, 150, start, total)
    assert 1e-6 < mid < base
    end = cosine_lr(base, 200, start, total)
    assert abs(end - 1e-6) < 1e-9


def test_datamodule_iteration():
    cfg = tiny_cfg()
    dm = DataModule(cfg, scenes={"train": tiny_scenes(3), "val": tiny_scenes(1, seed=99)})
    batches = list(dm.train_batches(num_shards=2, seed=0))
    assert len(batches) >= 1
    b = batches[0]
    assert b["point_xyz"].shape[0] == 2  # leading shard axis
    items = list(dm.eval_batches("val"))
    assert len(items) == 1
    scan_id, batch, item = items[0]
    assert batch["point_mask"].sum() == item["point_xyz"].shape[0]


def test_bbox_geometry():
    corners = get_3d_box([0, 0, 0], [2, 2, 2])
    assert corners.shape == (8, 3)
    assert abs(get_aabb3d_iou(corners, corners) - 1.0) < 1e-9
    shifted = get_3d_box([1, 0, 0], [2, 2, 2])
    iou = get_aabb3d_iou(corners, shifted)
    assert abs(iou - (0.5 * 8) / (8 + 8 - 4)) < 1e-6
    batch_iou = get_aabb3d_iou_batch(np.stack([corners, corners]),
                                     np.stack([corners, shifted]))
    np.testing.assert_allclose(batch_iou, [1.0, iou], rtol=1e-6)
