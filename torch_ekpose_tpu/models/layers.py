"""Shared conv building blocks (flax.linen, NHWC).

TPU-native design notes:
- NHWC layout throughout; XLA's TPU conv emitter maps these onto the MXU
  as implicit GEMMs.
- Parameters live in float32; activations are computed in a configurable
  ``dtype`` (bfloat16 by default at inference) so matmuls run at full MXU
  rate while the parameter store stays full precision.
- Initialization mirrors the reference: Kaiming-normal fan-out for convs
  with zero bias (reference lib/network/vgg2016.py:107-113), N(0, 0.01)
  for each stage's final projection (reference vgg2016.py:115-126).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

Dtype = Any


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch's exact TRAINING semantics.

    Identical to ``flax.linen.BatchNorm`` in eval mode and in the
    train-mode forward math (normalize with the biased batch variance,
    stats reduced in float32), but the running-variance update uses the
    UNBIASED batch variance (Bessel ``n/(n-1)``) — torch
    ``_BatchNorm``'s rule, which every reference backbone trains through
    (reference lib/network/mobilenet.py:10,25, mobilenetV2.py:13-69,
    shufflenetV2.py via ``nn.BatchNorm2d`` defaults). flax stores the
    biased variance instead, so after k train steps a converted
    checkpoint's ``running_var`` would drift by ``(n/(n-1))`` per
    accumulated batch term and eval-mode outputs would diverge from a
    torch run. Parameter/collection names match flax ``BatchNorm``
    (``scale``/``bias`` params, ``batch_stats`` ``mean``/``var``), so
    checkpoint converters and existing variables are unaffected.

    ``momentum`` uses the FLAX convention (0.9 here == torch's 0.1):
    ``ra = momentum * ra + (1 - momentum) * batch``.
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = self.param(
            "scale", nn.initializers.ones, (feat,), self.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (feat,), self.param_dtype
        )
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda s: jnp.zeros(s, jnp.float32), (feat,),
        )
        ra_var = self.variable(
            "batch_stats", "var",
            lambda s: jnp.ones(s, jnp.float32), (feat,),
        )
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
            mean = jnp.mean(xf, axes)
            # fast variance + negative clip, as flax _compute_stats does
            var = jnp.maximum(
                jnp.mean(jnp.square(xf), axes) - jnp.square(mean), 0.0
            )
            n = 1
            for ax in axes:
                n *= x.shape[ax]
            unbiased = var * (n / (n - 1)) if n > 1 else var
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value
                    + (1.0 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value
                    + (1.0 - self.momentum) * unbiased
                )
        # normalize exactly as flax _normalize: y = (x - mean) * (rsqrt *
        # scale) + bias, promoted, then cast to dtype
        y = x - mean.reshape((1,) * (x.ndim - 1) + (feat,))
        mul = lax.rsqrt(var + self.epsilon) * scale
        y = y * mul.reshape((1,) * (x.ndim - 1) + (feat,))
        y = y + bias.reshape((1,) * (x.ndim - 1) + (feat,))
        from flax.linen import dtypes as _dtypes

        out_dtype = _dtypes.canonicalize_dtype(
            x, scale, bias, dtype=self.dtype
        )
        return jnp.asarray(y, out_dtype)

#: Kaiming-normal, fan_out, relu gain — matches
#: ``torch.nn.init.kaiming_normal_(w, mode='fan_out', nonlinearity='relu')``.
kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

#: N(0, 0.01) init for final stage projections (reference vgg2016.py:126).
final_layer_init = nn.initializers.normal(stddev=0.01)


class ConvBlock(nn.Module):
    """Conv2D [+ BatchNorm] [+ ReLU/ReLU6].

    Equivalent of the reference's ``ConvBN`` (lib/network/mobilenet.py:6-17,
    lib/network/mobilenetV2.py:23-35) and of plain conv+ReLU pairs in the
    VGG head.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = True
    use_bn: bool = False
    act: Optional[str] = "relu"  # None | "relu" | "relu6"
    dtype: Dtype = jnp.float32
    kernel_init: Any = kaiming_out
    #: swap the conv for an int8-weight QuantConv (see models/quant.py);
    #: the surrounding act stays identical, the param path stays "conv".
    #: False | True (dynamic activation scales) | "static" (calibrated)
    #: | "folded" (static + deferred dequant — tested negative result)
    quantize: Any = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.quantize:
            from torch_ekpose_tpu.models.quant import QuantAcc, QuantConv

            x = QuantConv(
                self.features,
                kernel=self.kernel,
                stride=self.stride,
                use_bias=self.use_bias,
                dtype=self.dtype,
                static_act=self.quantize in ("static", "folded"),
                fold=self.quantize == "folded",
                name="conv",
            )(x)
            if isinstance(x, QuantAcc):
                # folded integer pipeline (quantize="folded", a measured
                # negative result — see docs/PERF.md): the relu is
                # deferred into the record; the consumer (next folded
                # QuantConv, max_pool, or quant.realize) applies it
                # fused with its own pass
                if self.use_bn or self.act not in (None, "relu"):
                    raise ValueError(
                        "folded int8 supports plain conv+relu blocks only"
                    )
                return x.replace(relu=self.act == "relu")
        else:
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=[(self.kernel // 2, self.kernel // 2)] * 2,
                use_bias=self.use_bias,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=self.kernel_init,
                bias_init=nn.initializers.zeros,
                name="conv",
            )(x)
        if self.use_bn:
            x = TorchBatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="bn",
            )(x)
        if self.act == "relu":
            x = nn.relu(x)
        elif self.act == "relu6":
            x = jnp.minimum(nn.relu(x), jnp.asarray(6.0, x.dtype))
        return x


class DSConv(nn.Module):
    """Depthwise-separable conv: depthwise k×k → pointwise 1×1 → BN → ReLU.

    Mirrors the reference ``DSConv`` used by every non-VGG backbone and head
    (lib/network/mobilenet.py:20-33): BN sits after the pointwise conv only,
    and ``relu=False`` disables the final activation (used on each stage's
    output projection).
    """

    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    dtype: Dtype = jnp.float32
    pointwise_init: Any = kaiming_out

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_features = x.shape[-1]
        x = nn.Conv(
            in_features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.kernel // 2, self.kernel // 2)] * 2,
            feature_group_count=in_features,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=kaiming_out,
            name="depthwise",
        )(x)
        x = nn.Conv(
            self.features,
            (1, 1),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=self.pointwise_init,
            name="pointwise",
        )(x)
        x = TorchBatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        if self.relu:
            x = nn.relu(x)
        return x


def max_pool(x, window: int, stride: int, padding=0):
    """2D max pool over NHWC.

    Accepts a folded-int8 ``QuantAcc`` record too: the int32 -> s8
    requantize (positive per-channel scale, round, clip) is monotone,
    so max pooling commutes with it — the pool is DEFERRED into the
    record and the consumer pools 1-byte int8 data after its fused
    requantize, instead of 4-byte accumulators or 2-byte bf16 here.
    """
    from torch_ekpose_tpu.models.quant import QuantAcc

    if isinstance(x, QuantAcc):
        return x.replace(pools=x.pools + ((window, stride, padding),))
    pad = [(padding, padding), (padding, padding)]
    return nn.max_pool(
        x, (window, window), strides=(stride, stride), padding=pad
    )


def depth_fn(conv_width: float, min_depth: int = 8):
    """Width-multiplier helper (reference lib/network/mobilenet.py:45-46)."""

    def depth(d: int) -> int:
        return max(round(d * conv_width), min_depth)

    return depth
