from minsu3d_tpu.loss.pt_offset_loss import pt_offset_loss  # noqa: F401
