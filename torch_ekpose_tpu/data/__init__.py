from torch_ekpose_tpu.data import transforms
from torch_ekpose_tpu.data.coco import COCO
from torch_ekpose_tpu.data.dataset import BatchLoader, CocoKeypoints
from torch_ekpose_tpu.data.raw_cache import (
    RawArrayDataset,
    build_raw_cache,
    cache_exists,
)
from torch_ekpose_tpu.data.targets import (
    gen_targets_jax,
    gen_targets_np,
    make_batched_target_fn,
)

__all__ = [
    "COCO",
    "BatchLoader",
    "CocoKeypoints",
    "RawArrayDataset",
    "build_raw_cache",
    "cache_exists",
    "gen_targets_jax",
    "gen_targets_np",
    "make_batched_target_fn",
    "transforms",
]
