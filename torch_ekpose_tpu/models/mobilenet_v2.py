"""MobileNetV2 backbone (inverted residual blocks), cut at block 13.

Reference: lib/network/mobilenetV2.py:38-138 — standard MNV2 stem +
irblock1..13; backbone output is ``concat(out_6, bilinear_upsample(out_13))``
at stride 8 with ``depth(32)+depth(96)`` channels.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from torch_ekpose_tpu.models.layers import ConvBlock, Dtype, TorchBatchNorm, depth_fn, kaiming_out


class InvertedResidual(nn.Module):
    """MNV2 inverted residual (reference mobilenetV2.py:38-76)."""

    features: int
    stride: int = 1
    expand_ratio: int = 6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        hidden = int(round(inp * self.expand_ratio))
        use_res = self.stride == 1 and inp == self.features
        y = x
        bn = lambda name: TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        relu6 = lambda v: jnp.minimum(nn.relu(v), jnp.asarray(6.0, v.dtype))
        if self.expand_ratio != 1:
            y = nn.Conv(
                hidden, (1, 1), use_bias=False, dtype=self.dtype,
                param_dtype=jnp.float32, kernel_init=kaiming_out, name="expand",
            )(y)
            y = relu6(bn("expand_bn")(y))
        y = nn.Conv(
            hidden, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], feature_group_count=hidden,
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=kaiming_out, name="depthwise",
        )(y)
        y = relu6(bn("depthwise_bn")(y))
        y = nn.Conv(
            self.features, (1, 1), use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, kernel_init=kaiming_out, name="project",
        )(y)
        y = bn("project_bn")(y)  # linear bottleneck: no activation
        return x + y if use_res else y


#: (features, stride, expand_ratio) for irblock1..13
#: (reference mobilenetV2.py:91-112).
MNV2_PLAN = (
    (16, 1, 1), (24, 2, 6), (24, 1, 6), (32, 2, 6), (32, 1, 6), (32, 1, 6),
    (64, 2, 6), (64, 1, 6), (64, 1, 6), (64, 1, 6), (96, 1, 6), (96, 1, 6),
    (96, 1, 6),
)


class MobileNetV2Backbone(nn.Module):
    conv_width: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        depth = depth_fn(self.conv_width)
        x = ConvBlock(
            depth(32), kernel=3, stride=2, use_bias=False, use_bn=True,
            act="relu6", dtype=self.dtype, name="stem",
        )(x, train=train)
        out6 = None
        for i, (feats, stride, expand) in enumerate(MNV2_PLAN, start=1):
            x = InvertedResidual(
                depth(feats), stride=stride, expand_ratio=expand,
                dtype=self.dtype, name=f"irblock_{i}",
            )(x, train=train)
            if i == 6:
                out6 = x  # stride-8 tap (reference mobilenetV2.py:125)
        # bilinear upsample of the stride-16 out13 back to out6's spatial
        # size, align_corners=False (reference mobilenetV2.py:136-137).
        up = jax.image.resize(
            x, out6.shape[:1] + out6.shape[1:3] + x.shape[3:], method="bilinear"
        ).astype(x.dtype)
        return jnp.concatenate([out6, up], axis=-1)
