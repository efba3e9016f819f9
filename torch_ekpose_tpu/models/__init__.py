from torch_ekpose_tpu.models.factory import (
    MODEL_REGISTRY,
    cast_params,
    get_model,
    init_model,
)
from torch_ekpose_tpu.models.heads import CpmHead, OpenPose

__all__ = [
    "MODEL_REGISTRY", "cast_params", "get_model", "init_model",
    "CpmHead", "OpenPose",
]
