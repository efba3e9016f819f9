"""The shared 6-stage, 2-branch CPM head and the OpenPose network wrapper.

Every backbone in the family feeds the same head topology (reference
SURVEY §3.5): stage 1 consumes backbone features; stages 2..6 consume
``concat(paf_{s-1}, heatmap_{s-1}, features)``; each stage has an L1
branch (38 PAF channels) and an L2 branch (19 heatmap channels).

Two branch flavors exist:
- "vgg": plain convs — 3×(3×3,128)+1×1(512)+1×1(out) at stage 1 and
  5×(7×7,128)+1×1(128)+1×1(out) at stages 2-6
  (reference lib/network/vgg2016.py:37-76).
- "ds": depthwise-separable convs with BN —
  3×(3×3 DSConv)+1×1 DSConv(512 or 128)+1×1 DSConv(out, no relu)
  (reference lib/network/mobilenet.py:100-134 and the identical heads in
  mobilenetV2.py:156-191 / shufflenetV2.py:192-228).

The forward contract matches the reference exactly: the network returns
``((paf_6, heatmap_6), [paf_1, ht_1, ..., paf_6, ht_6])``
(reference lib/network/vgg2016.py:79-105).
"""

from __future__ import annotations

from typing import Any, Callable, List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from torch_ekpose_tpu import constants
from torch_ekpose_tpu.models.layers import (
    ConvBlock,
    DSConv,
    Dtype,
    final_layer_init,
)


class VggBranch(nn.Module):
    """One plain-conv CPM branch (reference vgg2016.py:37-76).

    Layer names index into the torch ``nn.Sequential`` so the checkpoint
    converter can map ``modelS_B.<idx>.weight`` 1:1.
    """

    out_channels: int
    first_stage: bool
    dtype: Dtype = jnp.float32
    #: int8 serving mode: quantize the relu convs (where the 7x7 FLOPs
    #: are); the final 1x1 projection stays bf16 — it writes the
    #: PAF/heatmap values the decoder reads directly.
    #: False | True (dynamic activation scales) | "static" (calibrated)
    quantize: Any = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.first_stage:
            plan = [(3, 128), (3, 128), (3, 128), (1, 512)]
        else:
            plan = [(7, 128), (7, 128), (7, 128), (7, 128), (7, 128), (1, 128)]
        torch_idx = 0
        for kernel, feats in plan:
            x = ConvBlock(
                feats, kernel=kernel, act="relu", dtype=self.dtype,
                quantize=self.quantize, name=f"conv_{torch_idx}",
            )(x, train=train)
            torch_idx += 2  # conv + relu in the torch Sequential
        if self.quantize == "folded":
            # folded int8: materialize the last deferred record — the
            # final 1x1 projection runs bf16 (it writes the PAF/heatmap
            # values the decoder reads)
            from torch_ekpose_tpu.models.quant import realize

            x = realize(x, self.dtype)
        x = ConvBlock(
            self.out_channels, kernel=1, act=None, dtype=self.dtype,
            kernel_init=final_layer_init, name=f"conv_{torch_idx}",
        )(x, train=train)
        return x


class DSBranch(nn.Module):
    """One depthwise-separable CPM branch (reference mobilenet.py:100-134)."""

    out_channels: int
    first_stage: bool
    width: Callable[[int], int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d2 = self.width
        mid = d2(512) if self.first_stage else d2(128)
        plan = [(3, d2(128)), (3, d2(128)), (3, d2(128)), (1, mid)]
        for i, (kernel, feats) in enumerate(plan):
            x = DSConv(feats, kernel=kernel, dtype=self.dtype, name=f"ds_{i}")(
                x, train=train
            )
        x = DSConv(
            self.out_channels, kernel=1, relu=False, dtype=self.dtype,
            pointwise_init=final_layer_init, name="ds_4",
        )(x, train=train)
        return x


class CpmHead(nn.Module):
    """Six refinement stages, two branches each.

    ``branch`` selects the flavor; ``width`` is the head width multiplier
    (``conv_width2`` in the reference factories).
    """

    branch: str = "vgg"  # "vgg" | "ds"
    width: Callable[[int], int] = lambda d: d
    num_stages: int = 6
    paf_channels: int = constants.NUM_PAF_CHANNELS
    heatmap_channels: int = constants.NUM_HEATMAP_CHANNELS
    dtype: Dtype = jnp.float32
    quantize: Any = False  # int8 ("vgg" only): False|True|"static"|"folded"

    def _branch(self, out_channels: int, first_stage: bool, name: str):
        if self.branch == "vgg":
            return VggBranch(
                out_channels, first_stage=first_stage, dtype=self.dtype,
                quantize=self.quantize, name=name,
            )
        if self.branch == "ds":
            return DSBranch(
                out_channels, first_stage=first_stage, width=self.width,
                dtype=self.dtype, name=name,
            )
        raise ValueError(f"unknown branch flavor {self.branch!r}")

    @nn.compact
    def __call__(self, features, train: bool = False) -> List[Any]:
        saved_for_loss = []
        paf = self._branch(self.paf_channels, True, "model1_1")(
            features, train=train
        )
        heatmap = self._branch(self.heatmap_channels, True, "model1_2")(
            features, train=train
        )
        saved_for_loss += [paf, heatmap]

        x = jnp.concatenate([paf, heatmap, features], axis=-1)
        for stage in range(2, self.num_stages + 1):
            paf = self._branch(self.paf_channels, False, f"model{stage}_1")(
                x, train=train
            )
            heatmap = self._branch(
                self.heatmap_channels, False, f"model{stage}_2"
            )(x, train=train)
            saved_for_loss += [paf, heatmap]
            if stage < self.num_stages:
                x = jnp.concatenate([paf, heatmap, features], axis=-1)
        return saved_for_loss


class OpenPose(nn.Module):
    """Backbone + CPM head with the reference's forward contract.

    ``__call__(x)`` takes NHWC float input and returns
    ``((paf_last, heatmap_last), saved_for_loss)`` where ``saved_for_loss``
    is the 12-element per-stage output list
    (reference lib/network/vgg2016.py:79-105).
    """

    backbone: Callable[..., nn.Module]
    head: Callable[..., nn.Module]

    @nn.compact
    def __call__(
        self, x, train: bool = False
    ) -> Tuple[Tuple[Any, Any], List[Any]]:
        features = self.backbone(name="model0")(x, train=train)
        saved_for_loss = self.head(name="head")(features, train=train)
        return (saved_for_loss[-2], saved_for_loss[-1]), saved_for_loss
