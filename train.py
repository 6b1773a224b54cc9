"""Training CLI (reference train.py:10-45), Hydra-style overrides:

    python train.py model=pointgroup data=scannetv2 model.trainer.devices=2
"""

from __future__ import annotations

import sys

import numpy as np

from minsu3d_tpu.util.env import setup_jax_cache

setup_jax_cache()

from minsu3d_tpu.config import load_config
from minsu3d_tpu.data.datamodule import DataModule
from minsu3d_tpu.trainer import Trainer


def main(overrides: list[str]) -> None:
    cfg = load_config(overrides)
    if int(cfg.model.trainer.get("num_nodes", 1)) > 1:
        # multi-host: one process per host, coordinator from the standard env
        # (JAX_COORDINATOR_ADDRESS / TPU metadata); the 1-D data mesh then
        # spans every host's chips and pmeans ride ICI/DCN
        import jax

        jax.distributed.initialize()
    np.random.seed(cfg.global_train_seed)
    dm = DataModule(cfg)
    trainer = Trainer(cfg, dm, ckpt_path=cfg.model.get("ckpt_path"))
    trainer.fit()


if __name__ == "__main__":
    main(sys.argv[1:])
