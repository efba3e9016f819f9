"""ShuffleNetV2 backbone, stages 2-3 only.

Reference: lib/network/shufflenetV2.py:7-168 — conv1 (stride 2) + 3×3/2
maxpool + stage2 (stride 8) + stage3 (stride 16); output is
``concat(out2, bilinear_upsample(out3))`` at stride 8 with
``settings[w][1]+settings[w][2]`` channels.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from torch_ekpose_tpu.models.layers import Dtype, TorchBatchNorm, kaiming_out, max_pool

#: width -> per-stage output channels (reference shufflenetV2.py:116-121).
SHUFFLENET_SETTINGS = {
    0.5: (24, 48, 96, 192, 1024),
    1.0: (24, 116, 232, 464, 1024),
    1.5: (24, 176, 352, 704, 1024),
    2.0: (24, 244, 488, 976, 2048),
}


def channel_shuffle(x, groups: int):
    """NHWC channel shuffle (reference shufflenetV2.py:7-19, NCHW there)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(n, h, w, c)


class ShuffleUnit(nn.Module):
    """ShuffleNetV2 unit (reference shufflenetV2.py:56-105).

    stride 1: split channels, right half goes through the branch;
    stride 2: both branches process the full input. Always followed by a
    2-group channel shuffle.
    """

    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        branch_features = self.features // 2
        bn = lambda name: TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        conv = lambda feats, k, s, groups, name: nn.Conv(
            feats, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
            feature_group_count=groups, use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, kernel_init=kaiming_out, name=name,
        )

        def branch2(v):
            v = conv(branch_features, 1, 1, 1, "b2_pw1")(v)
            v = nn.relu(bn("b2_pw1_bn")(v))
            v = conv(branch_features, 3, self.stride, branch_features, "b2_dw")(v)
            v = bn("b2_dw_bn")(v)
            v = conv(branch_features, 1, 1, 1, "b2_pw2")(v)
            v = nn.relu(bn("b2_pw2_bn")(v))
            return v

        if self.stride == 1:
            x1, x2 = jnp.split(x, 2, axis=-1)
            out = jnp.concatenate([x1, branch2(x2)], axis=-1)
        else:
            b1 = conv(x.shape[-1], 3, self.stride, x.shape[-1], "b1_dw")(x)
            b1 = bn("b1_dw_bn")(b1)
            b1 = conv(branch_features, 1, 1, 1, "b1_pw")(b1)
            b1 = nn.relu(bn("b1_pw_bn")(b1))
            out = jnp.concatenate([b1, branch2(x)], axis=-1)
        return channel_shuffle(out, 2)


class ShuffleNetV2Backbone(nn.Module):
    conv_width: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        settings = SHUFFLENET_SETTINGS[self.conv_width]
        x = nn.Conv(
            settings[0], (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=kaiming_out, name="conv1",
        )(x)
        x = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32, name="conv1_bn",
        )(x)
        x = nn.relu(x)
        x = max_pool(x, 3, 2, padding=1)

        def stage(v, feats, repeats, name):
            v = ShuffleUnit(feats, stride=2, dtype=self.dtype, name=f"{name}_0")(
                v, train=train
            )
            for i in range(1, repeats):
                v = ShuffleUnit(
                    feats, stride=1, dtype=self.dtype, name=f"{name}_{i}"
                )(v, train=train)
            return v

        out2 = stage(x, settings[1], 4, "stage2")   # stride 8
        out3 = stage(out2, settings[2], 8, "stage3")  # stride 16
        up = jax.image.resize(
            out3, out2.shape[:3] + out3.shape[3:], method="bilinear"
        ).astype(out3.dtype)
        return jnp.concatenate([out2, up], axis=-1)
