from minsu3d_tpu.model.registry import MODELS, get_model  # noqa: F401
