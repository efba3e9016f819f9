"""VGG19-based flagship backbone ("vgg2016").

Reference: lib/network/vgg2016.py:6-24 — torchvision VGG19 ``features[:23]``
(conv1_1 .. conv4_2 + ReLU, three 2×2 max-pools → stride 8) followed by two
extra 3×3 convs 512→256→128 with ReLU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from torch_ekpose_tpu.models.layers import (
    ConvBlock, Dtype, kaiming_out, max_pool,
)


#: (convs_per_block, out_channels); a 2×2/2 max pool follows each of the
#: first three blocks. This is exactly torchvision vgg19 features[:23].
VGG19_PLAN = ((2, 64), (2, 128), (4, 256), (2, 512))


class _ConvParams(nn.Module):
    """Parameters of one ConvBlock conv, without the computation.

    Declares exactly the tree a ``ConvBlock(name=f"conv_{i}")`` would —
    ``conv_{i}/conv/{kernel,bias}`` with the same shapes and inits — so
    checkpoints convert/restore identically whether the block runs
    through flax convs or the space-to-depth decomposition.
    """

    features: int
    in_features: int

    class _Inner(nn.Module):
        features: int
        in_features: int

        @nn.compact
        def __call__(self):
            kernel = self.param(
                "kernel", kaiming_out,
                (3, 3, self.in_features, self.features), jnp.float32,
            )
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,),
                jnp.float32,
            )
            return kernel, bias

    @nn.compact
    def __call__(self):
        return self._Inner(self.features, self.in_features, name="conv")()


class VGG19Backbone(nn.Module):
    """VGG19 features[:23] + 3×3(512→256) + 3×3(256→128), stride 8 out."""

    dtype: Dtype = jnp.float32
    #: int8 serving mode: quantize every conv except the input conv
    #: (conv_0 reads raw normalized pixels and is a negligible FLOP
    #: share — standard PTQ practice keeps it high-precision)
    quantize: Any = False  # False | True (dynamic) | "static" | "folded"
    #: run the first N pooled blocks (N in 0..3) through the weight-exact
    #: space-to-depth decomposition (ops/s2d_conv.py) — the low-channel
    #: full-resolution prefix where XLA's conv emitter runs at 1-13% of
    #: MXU peak (docs/PERF.md; measured win on v5e for block 1, N=1).
    #: Pure XLA, differentiable, works on every backend; the parameter
    #: tree is identical either way. Skipped under int8 serving (the
    #: rearranged kernels would need their own quantization scales).
    s2d_blocks: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        from torch_ekpose_tpu.ops.s2d_conv import s2d_conv_chain

        s2d = 0 if self.quantize else min(self.s2d_blocks, 3)
        torch_idx = 0  # index into the torch nn.Sequential for ckpt mapping
        in_feats = x.shape[-1]
        for block_i, (n_convs, feats) in enumerate(VGG19_PLAN):
            if block_i < s2d:
                params = []
                for _ in range(n_convs):
                    params.append(_ConvParams(
                        feats, in_feats, name=f"conv_{torch_idx}")())
                    in_feats = feats
                    torch_idx += 2
                x = s2d_conv_chain(x.astype(self.dtype), params, pool=True)
                torch_idx += 1
                continue
            for _ in range(n_convs):
                x = ConvBlock(
                    feats, kernel=3, act="relu", dtype=self.dtype,
                    quantize=self.quantize if torch_idx > 0 else False,
                    name=f"conv_{torch_idx}",
                )(x, train=train)
                in_feats = feats
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
        if self.quantize == "folded":
            # folded int8: the backbone features feed many consumers
            # (both stage-1 branches + every stage concat), so
            # materialize the deferred record once here
            from torch_ekpose_tpu.models.quant import realize

            x = realize(x, self.dtype)
        return x
