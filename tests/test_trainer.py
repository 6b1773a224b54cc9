"""End-to-end trainer test: fit over a 2-device mesh, validate, checkpoint,
restore, test — the whole reference train.py/test.py flow in miniature."""

import os

import numpy as np

from helpers import tiny_cfg, tiny_scenes
from minsu3d_tpu.data.datamodule import DataModule
from minsu3d_tpu.trainer import Trainer


def test_fit_validate_checkpoint_restore(tmp_path):
    cfg = tiny_cfg("pointgroup", extra=[
        "model.trainer.devices=2",
        "model.trainer.max_epochs=2",
        "model.trainer.check_val_every_n_epoch=2",
        "model.network.prepare_epochs=0",  # heads active from epoch 1
        "data.batch_size=1",
        "model.network.cluster.cluster_npoint_thre=20",
        "model.network.test.TEST_NPOINT_THRESH=20",
        "model.network.test.TEST_SCORE_THRESH=0.0",
    ])
    cfg["exp_output_root_path"] = str(tmp_path)
    cfg.model.checkpoint["dirpath"] = os.path.join(str(tmp_path), "training")

    scenes = {"train": tiny_scenes(2, seed=0), "val": tiny_scenes(1, seed=50)}
    dm = DataModule(cfg, scenes=scenes)
    trainer = Trainer(cfg, dm)
    trainer.fit()
    assert trainer.epoch == 2

    metrics = trainer.validate()
    assert np.isfinite(metrics["semantic_accuracy"])

    # loss history recorded and finite
    import json

    records = [json.loads(line) for line in open(os.path.join(str(tmp_path), "metrics.jsonl"))]
    train_records = [r for r in records if "train/total_loss" in r]
    assert len(train_records) == 2
    assert all(np.isfinite(r["train/total_loss"]) for r in train_records)

    # checkpoint round-trip restores epoch + params
    ck = trainer.save_checkpoint(os.path.join(str(tmp_path), "ck"))
    restored = Trainer(cfg, dm)
    restored.load_checkpoint(ck)
    assert restored.epoch == 2
    m2 = restored.test(print_result=False)
    assert np.isfinite(m2["semantic_accuracy"])
