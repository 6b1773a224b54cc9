"""Inference CLI (reference test.py:9-38): single-device evaluation over
``model.inference.split`` from a checkpoint. The reference's epoch-counter
hack (test.py:32-33) is unnecessary — the epoch is part of saved state."""

from __future__ import annotations

import sys

import numpy as np

from minsu3d_tpu.util.env import setup_jax_cache

setup_jax_cache()

from minsu3d_tpu.csrc.build import ensure_built

ensure_built()  # host grid-plan builder (.so absent on a fresh checkout)

from minsu3d_tpu.config import load_config
from minsu3d_tpu.data.datamodule import DataModule
from minsu3d_tpu.trainer import Trainer


def main(overrides: list[str]) -> None:
    cfg = load_config(overrides)
    np.random.seed(cfg.global_test_seed)
    cfg.model.trainer.devices = 1  # test-time inference is single-device (ref test.py:16)
    dm = DataModule(cfg)
    trainer = Trainer(cfg, dm, ckpt_path=cfg.model.get("ckpt_path"))
    metrics = trainer.test(print_result=True)
    print(f"Semantic Accuracy: {metrics['semantic_accuracy']}")
    print(f"Semantic mean IoU: {metrics['semantic_mean_iou']}")
    # end-to-end wall clock incl. collate/H2D/host NMS+RLE (one-deep pipeline)
    print(f"Eval scenes/s (wall): {metrics['eval_scenes_per_sec_wall']}")


if __name__ == "__main__":
    main(sys.argv[1:])
