from minsu3d_tpu.trainer.trainer import Trainer  # noqa: F401
