"""VGG19-based flagship backbone ("vgg2016").

Reference: lib/network/vgg2016.py:6-24 — torchvision VGG19 ``features[:23]``
(conv1_1 .. conv4_2 + ReLU, three 2×2 max-pools → stride 8) followed by two
extra 3×3 convs 512→256→128 with ReLU.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from torch_ekpose_tpu.models.layers import ConvBlock, Dtype, max_pool


#: (convs_per_block, out_channels); a 2×2/2 max pool follows each of the
#: first three blocks. This is exactly torchvision vgg19 features[:23].
VGG19_PLAN = ((2, 64), (2, 128), (4, 256), (2, 512))


class VGG19Backbone(nn.Module):
    """VGG19 features[:23] + 3×3(512→256) + 3×3(256→128), stride 8 out."""

    dtype: Dtype = jnp.float32
    #: int8 serving mode: quantize every conv except the input conv
    #: (conv_0 reads raw normalized pixels and is a negligible FLOP
    #: share — standard PTQ practice keeps it high-precision)
    quantize: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        torch_idx = 0  # index into the torch nn.Sequential for ckpt mapping
        for block_i, (n_convs, feats) in enumerate(VGG19_PLAN):
            for _ in range(n_convs):
                x = ConvBlock(
                    feats, kernel=3, act="relu", dtype=self.dtype,
                    quantize=self.quantize and torch_idx > 0,
                    name=f"conv_{torch_idx}",
                )(x, train=train)
                torch_idx += 2  # conv + relu
            if block_i < 3:
                x = max_pool(x, 2, 2)
                torch_idx += 1
        # The two extra convs appended after features[:23]
        # (reference vgg2016.py:16-19): torch indices 23 and 25.
        x = ConvBlock(256, kernel=3, act="relu", dtype=self.dtype,
                      quantize=self.quantize, name="conv_23")(
            x, train=train
        )
        x = ConvBlock(128, kernel=3, act="relu", dtype=self.dtype,
                      quantize=self.quantize, name="conv_25")(
            x, train=train
        )
        return x
