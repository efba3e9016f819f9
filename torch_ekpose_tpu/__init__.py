"""torch_ekpose_tpu — a TPU-native (JAX/XLA/Pallas) re-build of the
ek1den2/torch_ekpose bottom-up multi-person 2D pose estimation framework.

Multi-stage CPM networks emit 19 keypoint heatmaps + 38 part-affinity-field
channels; an on-device decoder assembles per-person skeletons without
leaving the TPU. See README.md for the architecture map onto the reference.
"""

from torch_ekpose_tpu import constants
from torch_ekpose_tpu.config import Config, cfg, get_default_config

__version__ = "0.1.0"

__all__ = ["constants", "Config", "cfg", "get_default_config", "__version__"]
