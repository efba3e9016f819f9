from torch_ekpose_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = ["data_sharding", "make_mesh", "replicated", "shard_batch"]
