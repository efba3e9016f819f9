"""Spatially-sharded (sp) single-image inference over a device mesh.

Data parallelism cannot reduce the latency of ONE frame — a live
stream's next frame does not exist yet. The TPU-native answer is to
shard the image's HEIGHT axis across the mesh and let XLA's GSPMD
partitioner split every convolution spatially: each chip computes its
horizontal stripe, and the partitioner inserts the exact halo
exchanges the 3x3/7x7 windows need as `collective-permute`s over ICI.
Parameters replicate (they are read-only and small next to the
activations at high resolution), so the only cross-chip traffic is the
halo rows.

The reference has no equivalent — its estimator is strictly one image
on one GPU (reference lib/evaluate/estimator.py:71-88). Decode runs on
the mesh's first device with the full Pallas kernel set: the stage-6
maps are ~64x smaller than the input image, so gathering them costs a
few hundred KB while the partitioned forward keeps the win.

Validated against the single-device forward bit-for-bit on the CPU
mesh (tests/test_spatial.py); the same program runs unchanged on a
real slice.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from torch_ekpose_tpu.config import Config, cfg as default_cfg
from torch_ekpose_tpu.decode import device as decode_device
from torch_ekpose_tpu.parallel.mesh import (
    DATA_AXIS,
    infer_compute_dtype,
    make_mesh,
    replicated,
)
from torch_ekpose_tpu.utils.human import Human

__all__ = ["SpatialPoseEstimator"]


class SpatialPoseEstimator:
    """Batch-1 pose inference with the image height sharded over a mesh.

    ``estimate(image)`` mirrors ``PoseEstimator.estimate`` (one BGR
    image -> (List[Human], im_scale)) but partitions the forward pass
    spatially. Padded H and W are rounded up to ``8 * mesh.size`` so
    every feature level down to stride 8 divides evenly across the
    mesh (at most ~4% extra rows vs the single-chip x8 padding).
    """

    decode_backend = "jax"

    def __init__(
        self,
        model,
        variables,
        mesh=None,
        config: Optional[Config] = None,
        preprocess: str = "vgg",
        dest_size: int = 368,
    ):
        self.model = model
        self.mesh = mesh if mesh is not None else make_mesh()
        self.config = config or default_cfg
        self.preprocess = preprocess
        self.dest_size = dest_size
        self._replicated = replicated(self.mesh)
        #: [1, H, W, 3] image: H on the mesh axis
        self._spatial = NamedSharding(
            self.mesh, P(None, DATA_AXIS, None, None)
        )
        self.variables = jax.device_put(variables, self._replicated)
        self._forward_cache = {}
        self._decoder = None

    @property
    def num_devices(self) -> int:
        return self.mesh.size

    def _forward_fn(self, h: int, w: int):
        key = (h, w)
        if key not in self._forward_cache:
            from torch_ekpose_tpu.runtime.estimator import preprocess_jax

            mode = self.preprocess
            model = self.model
            compute_dtype = infer_compute_dtype(self.variables["params"])

            @functools.partial(
                jax.jit,
                in_shardings=(
                    jax.tree.map(lambda _: self._replicated, self.variables),
                    self._spatial,
                ),
                # gather the stripes: the stage-6 maps are stride-8 and
                # 57-channel — a few hundred KB against the partitioned
                # conv stack's win
                out_shardings=self._replicated,
            )
            def forward(variables, image):
                x = preprocess_jax(image[0], mode)[None].astype(compute_dtype)
                (paf, heatmap), _ = model.apply(variables, x, train=False)
                return (
                    paf[0].astype(jnp.float32),
                    heatmap[0].astype(jnp.float32),
                )

            self._forward_cache[key] = forward
        return self._forward_cache[key]

    def _decode(self, heatmap, paf):
        # single-device decode on the mesh's first chip with the full
        # Pallas kernels (a partitioned program cannot carry them — XLA
        # cannot infer shardings for custom calls). Gate Pallas on the
        # TARGET device's platform, not the default backend: on a
        # virtual CPU mesh created after a TPU backend initialized, the
        # default-backend gate would lower Pallas for CPU and die with
        # "Only interpret mode is supported on CPU backend".
        if self._decoder is None:
            self._decoder = decode_device.build_packed_decoder(
                self.config,
                pallas=self.mesh.devices.flat[0].platform == "tpu",
            )
        dev = self.mesh.devices.flat[0]
        return self._decoder(
            jax.device_put(heatmap, dev), jax.device_put(paf, dev)
        )

    def pad(self, image: np.ndarray) -> Tuple[np.ndarray, float]:
        """Resize long side to ``dest_size`` and zero-pad H/W up to
        multiples of ``8 * mesh.size``."""
        from torch_ekpose_tpu.runtime.estimator import padding

        im_pad, im_scale, _ = padding(
            image, self.dest_size, 8 * self.mesh.size
        )
        return im_pad, im_scale

    def estimate(self, image: np.ndarray) -> Tuple[List[Human], float]:
        im_pad, im_scale = self.pad(image)
        h, w = im_pad.shape[:2]
        forward = self._forward_fn(h, w)
        x = jax.device_put(jnp.asarray(im_pad)[None], self._spatial)
        paf, heatmap = forward(self.variables, x)
        packed = self._decode(heatmap, paf)
        if hasattr(packed, "copy_to_host_async"):
            packed.copy_to_host_async()  # bulk fetch path (EVAL_BREAKDOWN)
        packed = jax.device_get(packed)
        humans = decode_device.packed_to_humans(packed, h, w, self.config)
        return humans, im_scale
