"""Model factory: name → OpenPose network.

Mirrors the eight named variants of the reference factory
(lib/network/networks.py:10-68) including their width multipliers.
Checkpoint loading is handled separately by
:mod:`torch_ekpose_tpu.runtime.checkpoint` (the reference folds it into
the factory via ``pretrained_path`` / ``imagenet_pretrained``).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torch_ekpose_tpu.models.heads import CpmHead, OpenPose
from torch_ekpose_tpu.models.layers import depth_fn
from torch_ekpose_tpu.models.mobilenet import MobileNetBackbone
from torch_ekpose_tpu.models.mobilenet_v2 import MobileNetV2Backbone
from torch_ekpose_tpu.models.shufflenet_v2 import ShuffleNetV2Backbone
from torch_ekpose_tpu.models.vgg import VGG19Backbone


def _vgg(dtype, quantize: Any = False, s2d_blocks: int = 0) -> OpenPose:
    return OpenPose(
        backbone=functools.partial(
            VGG19Backbone, dtype=dtype, quantize=quantize,
            s2d_blocks=s2d_blocks,
        ),
        head=functools.partial(
            CpmHead, branch="vgg", dtype=dtype, quantize=quantize
        ),
    )


def _mobilenet(dtype, conv_width: float, conv_width2: float) -> OpenPose:
    return OpenPose(
        backbone=functools.partial(
            MobileNetBackbone, conv_width=conv_width, dtype=dtype
        ),
        head=functools.partial(
            CpmHead, branch="ds", width=depth_fn(conv_width2), dtype=dtype
        ),
    )


def _mobilenet_v2(dtype, conv_width: float, conv_width2: float) -> OpenPose:
    return OpenPose(
        backbone=functools.partial(
            MobileNetV2Backbone, conv_width=conv_width, dtype=dtype
        ),
        head=functools.partial(
            CpmHead, branch="ds", width=depth_fn(conv_width2), dtype=dtype
        ),
    )


def _shufflenet_v2(dtype, conv_width: float, conv_width2: float) -> OpenPose:
    return OpenPose(
        backbone=functools.partial(
            ShuffleNetV2Backbone, conv_width=conv_width, dtype=dtype
        ),
        head=functools.partial(
            CpmHead, branch="ds", width=depth_fn(conv_width2), dtype=dtype
        ),
    )


#: name -> builder(dtype) (reference lib/network/networks.py:15-68).
MODEL_REGISTRY = {
    "vgg2016": _vgg,
    "mobilenet": functools.partial(_mobilenet, conv_width=1.0, conv_width2=1.0),
    "mobilenet_thin": functools.partial(
        _mobilenet, conv_width=0.75, conv_width2=0.50
    ),
    "mobilenetV2": functools.partial(
        _mobilenet_v2, conv_width=1.0, conv_width2=1.0
    ),
    "mobilenetV2_large": functools.partial(
        _mobilenet_v2, conv_width=1.4, conv_width2=1.0
    ),
    "mobilenetV2_small": functools.partial(
        _mobilenet_v2, conv_width=0.50, conv_width2=0.50
    ),
    "shufflenetV2_1.0x": functools.partial(
        _shufflenet_v2, conv_width=1.0, conv_width2=1.0
    ),
    "shufflenetV2_0.5x": functools.partial(
        _shufflenet_v2, conv_width=0.5, conv_width2=0.5
    ),
}


def get_model(
    model_name: str = "vgg2016", dtype=jnp.float32, quantize: Any = False,
    s2d_blocks: int = 0, remat: bool = False,
) -> OpenPose:
    """Build an OpenPose network by name.

    ``dtype`` is the activation/compute dtype; parameters are always
    float32. Raises KeyError with the known names on a typo (the reference
    silently returns None, networks.py:10-68).

    ``quantize=True`` builds the int8 serving variant with dynamic
    activation scales; ``quantize="static"`` the variant with calibrated
    per-layer ``act_scale`` parameters (dense-conv "vgg" family only —
    see :mod:`torch_ekpose_tpu.models.quant`). Convert a float tree with
    :func:`models.quant.quantize_variables`, and calibrate static scales
    with :func:`models.quant.calibrate_act_scales`.
    ``quantize="folded"`` is the static variant running the folded
    integer pipeline (identical param tree, deferred dequantization) —
    measured SLOWER than "static" on v5e, kept as a tested negative
    result (docs/PERF.md).

    ``remat=True`` wraps the backbone and each CPM branch in
    ``jax.checkpoint`` (gradient rematerialization: the backward pass
    recomputes those activations instead of keeping them in HBM).
    Identical param tree and exact same gradients — a training-memory
    knob only (``cli.train --remat``; measured in docs/PERF.md).
    """
    try:
        builder = MODEL_REGISTRY[model_name]
    except KeyError:
        raise KeyError(
            f"unknown model {model_name!r}; available: {sorted(MODEL_REGISTRY)}"
        ) from None
    if quantize:
        if builder is not _vgg:
            raise ValueError(
                f"int8 quantization supports the dense-conv vgg family "
                f"only, not {model_name!r} (its FLOPs sit in BN-folded "
                f"depthwise-separable convs; run it in bfloat16)"
            )
        if s2d_blocks:
            # refuse rather than silently drop one of the two requests:
            # the space-to-depth parity kernels are a rearrangement of
            # the float weights and would need their own int8 scales
            raise ValueError(
                "s2d_blocks is incompatible with the int8 serving modes"
            )
        if remat:
            # remat is a training knob, the int8 modes are serving-only
            raise ValueError("remat does not apply to the int8 modes")
        return builder(dtype, quantize=quantize)
    if s2d_blocks:
        if builder is not _vgg:
            raise ValueError(
                "s2d_blocks applies to the vgg family only "
                f"(requested {model_name!r})"
            )
        model = builder(dtype, s2d_blocks=s2d_blocks)
    else:
        model = builder(dtype)
    if remat:
        model = OpenPose(
            backbone=model.backbone, head=model.head, remat=True
        )
    return model


def cast_params(variables: Dict, dtype) -> Dict:
    """Cast the ``params`` collection to ``dtype``, leaving other
    collections (e.g. BN ``batch_stats``) in float32.

    For a bf16 inference path this halves per-call weight streaming from
    HBM and removes the per-call f32->bf16 converts flax otherwise inserts
    (weights are used exactly once per frame at batch 1, so weight traffic
    is pure overhead). The conv results are identical to casting at call
    time.

    Host (numpy) params are cast on the host — so a later device upload
    moves half the bytes, which matters when the accelerator sits behind a
    slow transfer link. Device params are cast in ONE jitted program
    instead of one dispatch per parameter.
    """
    out = dict(variables)
    params = variables["params"]
    if all(
        isinstance(leaf, np.ndarray) for leaf in jax.tree.leaves(params)
    ):
        out["params"] = jax.tree.map(_cast_leaf_builder(dtype), params)
    else:
        out["params"] = _device_cast(dtype)(params)
    return out


def _cast_leaf_builder(dtype):
    def cast(x):
        return (
            x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x
        )
    return cast


@functools.lru_cache(maxsize=None)
def _device_cast(dtype):
    # one cached jitted program per dtype — a fresh jax.jit wrapper per
    # call would retrace and recompile the whole-tree cast every time
    return jax.jit(
        functools.partial(jax.tree.map, _cast_leaf_builder(dtype))
    )


def init_model(
    model_name: str,
    rng: Optional[jax.Array] = None,
    input_shape: Tuple[int, int, int, int] = (1, 368, 368, 3),
    dtype=jnp.float32,
) -> Tuple[Any, Dict]:
    """Build and initialize; returns (module, variables).

    ``variables`` contains ``params`` and, for BN-using backbones,
    ``batch_stats``.
    """
    model = get_model(model_name, dtype=dtype)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    # jit the whole init so XLA compiles one fused program instead of one
    # tiny program per parameter initializer (orders of magnitude faster),
    # and keep the results on the device that ran it: a host round-trip
    # here costs nothing on a co-located accelerator but minutes on an
    # accelerator behind a slow device tunnel (~200 MB of VGG19 params
    # each way). Callers that need host copies (checkpoint save) fetch
    # explicitly.
    init_fn = jax.jit(functools.partial(model.init, train=False))
    variables = init_fn(rng, jnp.zeros(input_shape, dtype))
    return model, dict(variables)
