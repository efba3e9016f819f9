"""MobileNet(v1) backbone with multi-scale feature concat.

Reference: lib/network/mobilenet.py:36-83 — 12 depthwise-separable blocks;
the backbone output is ``concat(maxpool(out_3), out_7, out_11)`` giving
``depth(128)+depth(512)+depth(512)`` channels at stride 8.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from torch_ekpose_tpu.models.layers import (
    ConvBlock,
    DSConv,
    Dtype,
    depth_fn,
    max_pool,
)

#: (features, stride) per block; block 0 is a plain ConvBN, 1..11 DSConv
#: (reference mobilenet.py:49-62).
MOBILENET_PLAN = (
    (32, 2), (64, 1), (128, 2), (128, 1), (256, 2), (256, 1),
    (512, 1), (512, 1), (512, 1), (512, 1), (512, 1), (512, 1),
)


class MobileNetBackbone(nn.Module):
    conv_width: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        depth = depth_fn(self.conv_width)
        taps = {}
        for i, (feats, stride) in enumerate(MOBILENET_PLAN):
            if i == 0:
                x = ConvBlock(
                    depth(feats), kernel=3, stride=stride, use_bias=False,
                    use_bn=True, act="relu", dtype=self.dtype, name=f"block_{i}",
                )(x, train=train)
            else:
                x = DSConv(
                    depth(feats), kernel=3, stride=stride, dtype=self.dtype,
                    name=f"block_{i}",
                )(x, train=train)
            if i in (3, 7, 11):
                taps[i] = x
        # maxpool(out_3) brings the stride-4 tap down to stride 8
        # (reference mobilenet.py:78-80).
        out_pool = max_pool(taps[3], 2, 2)
        return jnp.concatenate([out_pool, taps[7], taps[11]], axis=-1)
