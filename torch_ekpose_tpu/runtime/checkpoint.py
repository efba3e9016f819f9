"""Checkpoint I/O and PyTorch -> JAX weight conversion.

Native checkpoints are flax msgpack files of the full variables pytree.
For cross-validation against the reference, :func:`convert_torch_checkpoint`
maps a reference ``state_dict`` (reference lib/network/vgg2016.py layer
layout; ``module.``-prefixed when saved from DataParallel, see reference
lib/evaluate/estimator.py:22-42) onto our flax parameter tree, transposing
conv kernels OIHW -> HWIO.

Unlike the reference loader — which unconditionally strips the first seven
characters of every key and therefore only loads DataParallel checkpoints —
the prefix is stripped only when actually present.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "load_torch_state_dict",
    "convert_torch_checkpoint",
]


def save_checkpoint(path: str, variables: Dict[str, Any]) -> None:
    """Serialize a flax variables pytree to ``path`` (msgpack)."""
    from flax import serialization

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(variables))


def load_checkpoint(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Load a msgpack checkpoint into the structure of ``template``
    (e.g. freshly initialized variables)."""
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a PyTorch checkpoint into {name: numpy array}, stripping a
    DataParallel ``module.`` prefix when every key carries one."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if all(k.startswith("module.") for k in state):
        state = {k[len("module."):]: v for k, v in state.items()}
    return {k: v.detach().cpu().numpy() for k, v in state.items()}


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW (torch) -> HWIO (flax)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


#: torch Sequential conv indices of the vgg2016 backbone
#: (reference lib/network/vgg2016.py:14-20: vgg19 features[:23] convs at
#: 0,2,5,7,10,12,14,16,19,21 + the two appended convs at 23, 25).
_VGG_BACKBONE_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25)

#: per-branch conv indices (reference vgg2016.py:37-76).
_VGG_STAGE1_CONV_IDX = (0, 2, 4, 6, 8)
_VGG_REFINE_CONV_IDX = (0, 2, 4, 6, 8, 10, 12)


def _convert_vgg2016(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    params: Dict[str, Any] = {"model0": {}, "head": {}}

    def take(name: str, dst: Dict[str, Any], key: str):
        w = state.pop(f"{name}.weight")
        b = state.pop(f"{name}.bias")
        dst[key] = {"conv": {"kernel": _conv_kernel(w), "bias": b}}

    for idx in _VGG_BACKBONE_CONV_IDX:
        take(f"model0.backbone.{idx}", params["model0"], f"conv_{idx}")

    for stage in range(1, 7):
        idxs = _VGG_STAGE1_CONV_IDX if stage == 1 else _VGG_REFINE_CONV_IDX
        for branch in (1, 2):
            name = f"model{stage}_{branch}"
            dst: Dict[str, Any] = {}
            for idx in idxs:
                take(f"{name}.{idx}", dst, f"conv_{idx}")
            params["head"][name] = dst

    if state:
        raise ValueError(
            f"unconsumed reference parameters: {sorted(state)[:8]}..."
        )
    return {"params": params}


# ---------------------------------------------------------------------------
# depthwise-separable model families (mobilenet / mobilenetV2 / shufflenetV2)
# ---------------------------------------------------------------------------

def _dw_kernel(w: np.ndarray) -> np.ndarray:
    """torch depthwise [C, 1, k, k] -> flax grouped-conv [k, k, 1, C]."""
    return _conv_kernel(w)


def _take_bn(state: Dict[str, np.ndarray], tname: str):
    """Consume a torch BatchNorm2d -> (params, stats)."""
    params = {
        "scale": state.pop(f"{tname}.weight"),
        "bias": state.pop(f"{tname}.bias"),
    }
    stats = {
        "mean": state.pop(f"{tname}.running_mean"),
        "var": state.pop(f"{tname}.running_var"),
    }
    state.pop(f"{tname}.num_batches_tracked", None)
    return params, stats


def _take_dsconv(state, tname: str):
    """Consume a reference DSConv (reference lib/network/mobilenet.py:20-33:
    depthwise -> pointwise -> bn)."""
    params = {
        "depthwise": {"kernel": _dw_kernel(state.pop(f"{tname}.depthwise.weight"))},
        "pointwise": {"kernel": _conv_kernel(state.pop(f"{tname}.pointwise.weight"))},
    }
    bn_p, bn_s = _take_bn(state, f"{tname}.bn")
    params["bn"] = bn_p
    return params, {"bn": bn_s}


def _convert_ds_head(state) -> tuple:
    """The shared 5-DSConv-per-branch head (reference mobilenet.py:98-134,
    identical in mobilenetV2.py:156-191 / shufflenetV2.py:192-228)."""
    params, stats = {}, {}
    for stage in range(1, 7):
        for branch in (1, 2):
            name = f"model{stage}_{branch}"
            bp, bs = {}, {}
            for j in range(5):
                p, s = _take_dsconv(state, f"{name}.{j}")
                bp[f"ds_{j}"] = p
                bs[f"ds_{j}"] = s
            params[name] = bp
            stats[name] = bs
    return params, stats


def _drop_prefixes(state, prefixes) -> None:
    """Remove parameters the reference constructs but never uses in its
    forward pass (they still appear in its checkpoints)."""
    for k in [k for k in state if k.startswith(tuple(prefixes))]:
        state.pop(k)


def _convert_mobilenet(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """reference lib/network/mobilenet.py: model0 is a 12-block ModuleList
    nested inside the OpenPose's model0 attribute."""
    params = {"model0": {}, "head": {}}
    stats = {"model0": {}, "head": {}}
    # block 0: ConvBN (conv + bn)
    p0 = {"conv": {"kernel": _conv_kernel(
        state.pop("model0.model0.0.conv.weight"))}}
    bn_p, bn_s = _take_bn(state, "model0.model0.0.bn")
    p0["bn"] = bn_p
    params["model0"]["block_0"] = p0
    stats["model0"]["block_0"] = {"bn": bn_s}
    for i in range(1, 12):
        p, s = _take_dsconv(state, f"model0.model0.{i}")
        params["model0"][f"block_{i}"] = p
        stats["model0"][f"block_{i}"] = s
    params["head"], stats["head"] = _convert_ds_head(state)
    if state:
        raise ValueError(
            f"unconsumed reference parameters: {sorted(state)[:8]}..."
        )
    return {"params": params, "batch_stats": stats}


def _convert_mobilenet_v2(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """reference lib/network/mobilenetV2.py. irblock14-17, avgpool, and
    last_layer are constructed but unused by the forward pass
    (mobilenetV2.py:107-114 vs :118-138) and are dropped."""
    _drop_prefixes(state, [
        "model0.irblock14.", "model0.irblock15.", "model0.irblock16.",
        "model0.irblock17.", "model0.last_layer.",
    ])
    params = {"model0": {}, "head": {}}
    stats = {"model0": {}, "head": {}}
    # stem ConvBN is an nn.Sequential: conv at .0, bn at .1
    stem = {"conv": {"kernel": _conv_kernel(
        state.pop("model0.features.0.weight"))}}
    bn_p, bn_s = _take_bn(state, "model0.features.1")
    stem["bn"] = bn_p
    params["model0"]["stem"] = stem
    stats["model0"]["stem"] = {"bn": bn_s}

    for k in range(1, 14):
        base = f"model0.irblock{k}.conv"
        p, s = {}, {}
        if k == 1:  # expand_ratio == 1: dw at .0/.1, project at .3/.4
            p["depthwise"] = {"kernel": _dw_kernel(
                state.pop(f"{base}.0.weight"))}
            bp, bs = _take_bn(state, f"{base}.1")
            p["depthwise_bn"], s["depthwise_bn"] = bp, bs
            p["project"] = {"kernel": _conv_kernel(
                state.pop(f"{base}.3.weight"))}
            bp, bs = _take_bn(state, f"{base}.4")
            p["project_bn"], s["project_bn"] = bp, bs
        else:  # expand at .0/.1, dw at .3/.4, project at .6/.7
            p["expand"] = {"kernel": _conv_kernel(
                state.pop(f"{base}.0.weight"))}
            bp, bs = _take_bn(state, f"{base}.1")
            p["expand_bn"], s["expand_bn"] = bp, bs
            p["depthwise"] = {"kernel": _dw_kernel(
                state.pop(f"{base}.3.weight"))}
            bp, bs = _take_bn(state, f"{base}.4")
            p["depthwise_bn"], s["depthwise_bn"] = bp, bs
            p["project"] = {"kernel": _conv_kernel(
                state.pop(f"{base}.6.weight"))}
            bp, bs = _take_bn(state, f"{base}.7")
            p["project_bn"], s["project_bn"] = bp, bs
        params["model0"][f"irblock_{k}"] = p
        stats["model0"][f"irblock_{k}"] = s

    params["head"], stats["head"] = _convert_ds_head(state)
    if state:
        raise ValueError(
            f"unconsumed reference parameters: {sorted(state)[:8]}..."
        )
    return {"params": params, "batch_stats": stats}


def _convert_shufflenet_v2(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """reference lib/network/shufflenetV2.py. stage4 and conv5 are
    constructed but unused by the forward pass (shufflenetV2.py:140-152 vs
    :155-168) and are dropped."""
    _drop_prefixes(state, ["model0.stage4.", "model0.conv5."])
    params = {"model0": {}, "head": {}}
    stats = {"model0": {}, "head": {}}
    params["model0"]["conv1"] = {"kernel": _conv_kernel(
        state.pop("model0.conv1.0.weight"))}
    bn_p, bn_s = _take_bn(state, "model0.conv1.1")
    params["model0"]["conv1_bn"] = bn_p
    stats["model0"]["conv1_bn"] = bn_s

    def take_branch2(base, p, s):
        p["b2_pw1"] = {"kernel": _conv_kernel(state.pop(f"{base}.0.weight"))}
        bp, bs = _take_bn(state, f"{base}.1")
        p["b2_pw1_bn"], s["b2_pw1_bn"] = bp, bs
        p["b2_dw"] = {"kernel": _dw_kernel(state.pop(f"{base}.3.weight"))}
        bp, bs = _take_bn(state, f"{base}.4")
        p["b2_dw_bn"], s["b2_dw_bn"] = bp, bs
        p["b2_pw2"] = {"kernel": _conv_kernel(state.pop(f"{base}.5.weight"))}
        bp, bs = _take_bn(state, f"{base}.6")
        p["b2_pw2_bn"], s["b2_pw2_bn"] = bp, bs

    for stage, repeats in (("stage2", 4), ("stage3", 8)):
        for i in range(repeats):
            base = f"model0.{stage}.{i}"
            p, s = {}, {}
            if i == 0:  # stride-2 unit has branch1: dw@0, bn@1, pw@2, bn@3
                # (no activation between dw-bn and pw, shufflenetV2.py:64-73)
                p["b1_dw"] = {"kernel": _dw_kernel(
                    state.pop(f"{base}.branch1.0.weight"))}
                bp, bs = _take_bn(state, f"{base}.branch1.1")
                p["b1_dw_bn"], s["b1_dw_bn"] = bp, bs
                p["b1_pw"] = {"kernel": _conv_kernel(
                    state.pop(f"{base}.branch1.2.weight"))}
                bp, bs = _take_bn(state, f"{base}.branch1.3")
                p["b1_pw_bn"], s["b1_pw_bn"] = bp, bs
            take_branch2(f"{base}.branch2", p, s)
            params["model0"][f"{stage}_{i}"] = p
            stats["model0"][f"{stage}_{i}"] = s

    params["head"], stats["head"] = _convert_ds_head(state)
    if state:
        raise ValueError(
            f"unconsumed reference parameters: {sorted(state)[:8]}..."
        )
    return {"params": params, "batch_stats": stats}


_CONVERTERS = {
    "vgg2016": _convert_vgg2016,
    "mobilenet": _convert_mobilenet,
    "mobilenet_thin": _convert_mobilenet,
    "mobilenetV2": _convert_mobilenet_v2,
    "mobilenetV2_large": _convert_mobilenet_v2,
    "mobilenetV2_small": _convert_mobilenet_v2,
    "shufflenetV2_1.0x": _convert_shufflenet_v2,
    "shufflenetV2_0.5x": _convert_shufflenet_v2,
}


def convert_torch_checkpoint(
    path_or_state: Any, model_name: str = "vgg2016"
) -> Dict[str, Any]:
    """Convert a reference PyTorch checkpoint to our flax variables.

    ``path_or_state``: a filesystem path or an in-memory
    {name: array} dict. Returns ``{"params": ...}`` ready for
    ``model.apply``. Every reference parameter must be consumed, so a
    mismatched architecture fails loudly instead of silently dropping
    weights.
    """
    if isinstance(path_or_state, (str, os.PathLike)):
        state = load_torch_state_dict(os.fspath(path_or_state))
    else:
        state = {k: np.asarray(v) for k, v in path_or_state.items()}
    try:
        converter = _CONVERTERS[model_name]
    except KeyError:
        raise NotImplementedError(
            f"no torch-checkpoint converter for {model_name!r}; "
            f"available: {sorted(_CONVERTERS)}"
        ) from None
    return converter(dict(state))
