"""Training CLI (reference train.py:10-45), Hydra-style overrides:

    python train.py model=pointgroup data=scannetv2 model.trainer.devices=2
"""

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
    if int(cfg.model.trainer.get("num_nodes", 1)) > 1:
        # multi-host: one process per host, coordinator from the environment
        # (JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID, or cloud
        # TPU metadata when unset); the 1-D data mesh then spans every host's
        # chips, each process feeds only its own shards
        # (jax.make_array_from_process_local_data in trainer/trainer.py), and
        # pmeans ride ICI/DCN
        import os

        import jax

        nproc = os.environ.get("JAX_NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID")
        jax.distributed.initialize(
            coordinator_address=os.environ.get("JAX_COORDINATOR_ADDRESS"),
            num_processes=int(nproc) if nproc else None,
            process_id=int(pid) if pid else None)
    np.random.seed(cfg.global_train_seed)
    dm = DataModule(cfg)
    trainer = Trainer(cfg, dm, ckpt_path=cfg.model.get("ckpt_path"))
    trainer.fit()


if __name__ == "__main__":
    main(sys.argv[1:])
