from torch_ekpose_tpu.ops.resize import (
    resize_2d,
    resize_image_jax,
    resize_image_np,
    resize_matrix,
)

__all__ = ["resize_2d", "resize_image_jax", "resize_image_np", "resize_matrix"]
