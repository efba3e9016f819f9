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

import functools
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


def remat_ctor(ctor):
    """Wrap a Module class (or a ``functools.partial`` of one) in
    :func:`flax.linen.remat` so its forward activations are NOT saved
    for the backward pass — the backward recomputes them from the
    module's inputs (``jax.checkpoint``: trades ~1 extra forward of
    FLOPs inside the wrapped scope for its activation HBM).

    ``static_argnums=(2,)`` marks the ``train`` flag static (argument 0
    is the module instance); every wrapped module here has the uniform
    ``__call__(x, train=False)`` signature and must be CALLED with
    ``train`` positional.
    """
    if isinstance(ctor, functools.partial):
        return functools.partial(
            nn.remat(ctor.func, static_argnums=(2,)),
            *ctor.args, **ctor.keywords,
        )
    return nn.remat(ctor, static_argnums=(2,))


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
    #: rematerialize each branch in the backward pass (see `remat_ctor`):
    #: only the 185-ch stage inputs and 38/19-ch outputs are saved; the
    #: five 128-ch (or 512-ch) intra-branch maps recompute. Exact same
    #: gradients, identical param tree.
    remat: bool = False

    def _branch(self, out_channels: int, first_stage: bool, name: str):
        if self.branch == "vgg":
            ctor, kwargs = VggBranch, dict(quantize=self.quantize)
        elif self.branch == "ds":
            ctor, kwargs = DSBranch, dict(width=self.width)
        else:
            raise ValueError(f"unknown branch flavor {self.branch!r}")
        if self.remat:
            ctor = remat_ctor(ctor)
        return ctor(
            out_channels, first_stage=first_stage, dtype=self.dtype,
            name=name, **kwargs,
        )

    @nn.compact
    def __call__(self, features, train: bool = False) -> List[Any]:
        saved_for_loss = []
        paf = self._branch(self.paf_channels, True, "model1_1")(
            features, train
        )
        heatmap = self._branch(self.heatmap_channels, True, "model1_2")(
            features, train
        )
        saved_for_loss += [paf, heatmap]

        x = jnp.concatenate([paf, heatmap, features], axis=-1)
        for stage in range(2, self.num_stages + 1):
            paf = self._branch(self.paf_channels, False, f"model{stage}_1")(
                x, train
            )
            heatmap = self._branch(
                self.heatmap_channels, False, f"model{stage}_2"
            )(x, train)
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
    #: gradient rematerialization (``jax.checkpoint``): the whole
    #: backbone recomputes in the backward pass (only the input image
    #: and the 185-ch feature map are saved — the full-resolution
    #: backbone activations, the bulk of a CNN's HBM, are not), and the
    #: head remats per branch (``CpmHead.remat``). Exact gradients;
    #: costs roughly one extra forward of FLOPs.
    remat: bool = False

    @nn.compact
    def __call__(
        self, x, train: bool = False
    ) -> Tuple[Tuple[Any, Any], List[Any]]:
        backbone, head = self.backbone, self.head
        if self.remat:
            backbone = remat_ctor(backbone)
            head = functools.partial(head, remat=True)
        features = backbone(name="model0")(x, train)
        saved_for_loss = head(name="head")(features, train)
        return (saved_for_loss[-2], saved_for_loss[-1]), saved_for_loss
