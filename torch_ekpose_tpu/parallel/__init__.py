from torch_ekpose_tpu.parallel.mesh import (
    data_sharding,
    field_sharding,
    make_mesh,
    init_distributed,
    place_replicated,
    place_tree,
    replicated,
    shard_batch,
    zero1_sharding_tree,
)

__all__ = [
    "ShardedPoseEstimator",
    "SpatialPoseEstimator",
    "data_sharding",
    "field_sharding",
    "make_mesh",
    "init_distributed",
    "place_replicated",
    "place_tree",
    "replicated",
    "shard_batch",
    "zero1_sharding_tree",
]


def __getattr__(name):
    # lazy: parallel.inference/spatial pull in the decode stack
    if name == "ShardedPoseEstimator":
        from torch_ekpose_tpu.parallel.inference import ShardedPoseEstimator

        return ShardedPoseEstimator
    if name == "SpatialPoseEstimator":
        from torch_ekpose_tpu.parallel.spatial import SpatialPoseEstimator

        return SpatialPoseEstimator
    raise AttributeError(name)
