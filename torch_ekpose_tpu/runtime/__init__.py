from torch_ekpose_tpu.runtime.checkpoint import (
    convert_torch_checkpoint,
    export_torch_checkpoint,
    load_checkpoint,
    load_torch_state_dict,
    save_checkpoint,
)
from torch_ekpose_tpu.runtime.estimator import PoseEstimator, padding

__all__ = [
    "PoseEstimator",
    "convert_torch_checkpoint",
    "export_torch_checkpoint",
    "load_checkpoint",
    "load_torch_state_dict",
    "padding",
    "save_checkpoint",
]
