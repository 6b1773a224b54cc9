from minsu3d_tpu.model.module.blocks import (  # noqa: F401
    Backbone,
    MaskedBatchNorm,
    PointMLP,
    ResidualBlock,
    TinyUnet,
    UBlock,
)
