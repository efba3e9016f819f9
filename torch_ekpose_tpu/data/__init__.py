from torch_ekpose_tpu.data.targets import (
    gen_targets_jax,
    gen_targets_np,
    make_batched_target_fn,
)

__all__ = ["gen_targets_jax", "gen_targets_np", "make_batched_target_fn"]
