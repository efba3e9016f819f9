from torch_ekpose_tpu.models.factory import (
    MODEL_REGISTRY,
    cast_params,
    get_model,
    init_model,
)
from torch_ekpose_tpu.models.heads import CpmHead, OpenPose
from torch_ekpose_tpu.models.quant import (
    QuantConv,
    calibrate_act_scales,
    has_act_scales,
    quantize_variables,
)

__all__ = [
    "MODEL_REGISTRY", "cast_params", "get_model", "init_model",
    "CpmHead", "OpenPose", "QuantConv", "calibrate_act_scales",
    "has_act_scales", "quantize_variables",
]
