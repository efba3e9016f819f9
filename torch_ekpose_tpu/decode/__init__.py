from torch_ekpose_tpu.decode.api import flatten_peaks, paf_to_pose
from torch_ekpose_tpu.decode.oracle import (
    decode,
    find_peaks,
    humans_from_decode,
    nms,
    paf_to_pose_numpy,
)

__all__ = [
    "decode",
    "find_peaks",
    "flatten_peaks",
    "humans_from_decode",
    "nms",
    "paf_to_pose",
    "paf_to_pose_numpy",
]
