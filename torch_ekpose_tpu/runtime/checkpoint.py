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


_CONVERTERS = {
    "vgg2016": _convert_vgg2016,
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
