"""Checkpoint I/O and two-way PyTorch <-> JAX weight conversion.

Native checkpoints are flax msgpack files of the full variables pytree.
For cross-validation against the reference, :func:`convert_torch_checkpoint`
maps a reference ``state_dict`` (reference lib/network/vgg2016.py layer
layout; ``module.``-prefixed when saved from DataParallel, see reference
lib/evaluate/estimator.py:22-42) onto our flax parameter tree, transposing
conv kernels OIHW -> HWIO. :func:`export_torch_checkpoint` runs the same
mapping backwards, producing a state_dict the reference implementation
loads and runs — so models trained here flow back to the reference
ecosystem.

Each model family's layout is ONE declarative table of
(kind, torch name, flax tree path) entries, interpreted in either
direction; the two converters cannot drift apart.

Unlike the reference loader — which unconditionally strips the first seven
characters of every key and therefore only loads DataParallel checkpoints —
the prefix is stripped only when actually present.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Iterable, List, Optional, Tuple

import numpy as np

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "load_torch_state_dict",
    "convert_torch_checkpoint",
    "export_torch_checkpoint",
    "import_imagenet_vgg19",
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
    """OIHW (torch) -> HWIO (flax). The same transpose maps torch
    depthwise [C, 1, k, k] onto flax grouped-conv [k, k, 1, C]."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _conv_kernel_inv(w: np.ndarray) -> np.ndarray:
    """HWIO (flax) -> OIHW (torch)."""
    return np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))


# ---------------------------------------------------------------------------
# declarative mapping tables
#
# Entry = (kind, torch_module_name, flax_path)
#   "conv_wb": {t}.weight (OIHW) -> params path/kernel, {t}.bias -> path/bias
#   "conv_w" : {t}.weight (OIHW) -> params path/kernel (bias-free conv; also
#              depthwise kernels — same transpose)
#   "bn"     : {t}.weight/.bias -> params path/scale,bias;
#              {t}.running_mean/.running_var -> batch_stats path/mean,var;
#              {t}.num_batches_tracked dropped on import, emitted as 0 on
#              export
# ---------------------------------------------------------------------------

Entry = Tuple[str, str, Tuple[str, ...]]


#: torch Sequential conv indices of the vgg2016 backbone
#: (reference lib/network/vgg2016.py:14-20: vgg19 features[:23] convs at
#: 0,2,5,7,10,12,14,16,19,21 + the two appended convs at 23, 25).
_VGG_BACKBONE_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25)

#: per-branch conv indices (reference vgg2016.py:37-76).
_VGG_STAGE1_CONV_IDX = (0, 2, 4, 6, 8)
_VGG_REFINE_CONV_IDX = (0, 2, 4, 6, 8, 10, 12)


def _vgg_entries() -> List[Entry]:
    entries: List[Entry] = []
    for idx in _VGG_BACKBONE_CONV_IDX:
        entries.append((
            "conv_wb", f"model0.backbone.{idx}",
            ("model0", f"conv_{idx}", "conv"),
        ))
    for stage in range(1, 7):
        idxs = _VGG_STAGE1_CONV_IDX if stage == 1 else _VGG_REFINE_CONV_IDX
        for branch in (1, 2):
            name = f"model{stage}_{branch}"
            for idx in idxs:
                entries.append((
                    "conv_wb", f"{name}.{idx}",
                    ("head", name, f"conv_{idx}", "conv"),
                ))
    return entries


def _dsconv_entries(tname: str, path: Tuple[str, ...]) -> List[Entry]:
    """A reference DSConv (reference lib/network/mobilenet.py:20-33:
    depthwise -> pointwise -> bn)."""
    return [
        ("conv_w", f"{tname}.depthwise", path + ("depthwise",)),
        ("conv_w", f"{tname}.pointwise", path + ("pointwise",)),
        ("bn", f"{tname}.bn", path + ("bn",)),
    ]


def _ds_head_entries() -> List[Entry]:
    """The shared 5-DSConv-per-branch head (reference mobilenet.py:98-134,
    identical in mobilenetV2.py:156-191 / shufflenetV2.py:192-228)."""
    entries: List[Entry] = []
    for stage in range(1, 7):
        for branch in (1, 2):
            name = f"model{stage}_{branch}"
            for j in range(5):
                entries.extend(
                    _dsconv_entries(f"{name}.{j}", ("head", name, f"ds_{j}"))
                )
    return entries


def _mobilenet_entries() -> List[Entry]:
    """reference lib/network/mobilenet.py: model0 is a 12-block ModuleList
    nested inside the OpenPose's model0 attribute; block 0 is a ConvBN."""
    entries: List[Entry] = [
        ("conv_w", "model0.model0.0.conv", ("model0", "block_0", "conv")),
        ("bn", "model0.model0.0.bn", ("model0", "block_0", "bn")),
    ]
    for i in range(1, 12):
        entries.extend(
            _dsconv_entries(f"model0.model0.{i}", ("model0", f"block_{i}"))
        )
    entries.extend(_ds_head_entries())
    return entries


def _mobilenet_v2_entries() -> List[Entry]:
    """reference lib/network/mobilenetV2.py. The stem ConvBN is an
    nn.Sequential (conv at .0, bn at .1); irblock1 has expand_ratio 1 (no
    expand conv, mobilenetV2.py:45-56)."""
    entries: List[Entry] = [
        ("conv_w", "model0.features.0", ("model0", "stem", "conv")),
        ("bn", "model0.features.1", ("model0", "stem", "bn")),
    ]
    for k in range(1, 14):
        base = f"model0.irblock{k}.conv"
        path = ("model0", f"irblock_{k}")
        if k == 1:  # expand_ratio == 1: dw at .0/.1, project at .3/.4
            entries.extend([
                ("conv_w", f"{base}.0", path + ("depthwise",)),
                ("bn", f"{base}.1", path + ("depthwise_bn",)),
                ("conv_w", f"{base}.3", path + ("project",)),
                ("bn", f"{base}.4", path + ("project_bn",)),
            ])
        else:  # expand at .0/.1, dw at .3/.4, project at .6/.7
            entries.extend([
                ("conv_w", f"{base}.0", path + ("expand",)),
                ("bn", f"{base}.1", path + ("expand_bn",)),
                ("conv_w", f"{base}.3", path + ("depthwise",)),
                ("bn", f"{base}.4", path + ("depthwise_bn",)),
                ("conv_w", f"{base}.6", path + ("project",)),
                ("bn", f"{base}.7", path + ("project_bn",)),
            ])
    entries.extend(_ds_head_entries())
    return entries


def _shufflenet_v2_entries() -> List[Entry]:
    """reference lib/network/shufflenetV2.py. Stride-2 units (i == 0) have
    a branch1: dw@0, bn@1, pw@2, bn@3 (no activation between dw-bn and pw,
    shufflenetV2.py:64-73)."""
    entries: List[Entry] = [
        ("conv_w", "model0.conv1.0", ("model0", "conv1")),
        ("bn", "model0.conv1.1", ("model0", "conv1_bn")),
    ]
    for stage, repeats in (("stage2", 4), ("stage3", 8)):
        for i in range(repeats):
            base = f"model0.{stage}.{i}"
            path = ("model0", f"{stage}_{i}")
            if i == 0:
                entries.extend([
                    ("conv_w", f"{base}.branch1.0", path + ("b1_dw",)),
                    ("bn", f"{base}.branch1.1", path + ("b1_dw_bn",)),
                    ("conv_w", f"{base}.branch1.2", path + ("b1_pw",)),
                    ("bn", f"{base}.branch1.3", path + ("b1_pw_bn",)),
                ])
            entries.extend([
                ("conv_w", f"{base}.branch2.0", path + ("b2_pw1",)),
                ("bn", f"{base}.branch2.1", path + ("b2_pw1_bn",)),
                ("conv_w", f"{base}.branch2.3", path + ("b2_dw",)),
                ("bn", f"{base}.branch2.4", path + ("b2_dw_bn",)),
                ("conv_w", f"{base}.branch2.5", path + ("b2_pw2",)),
                ("bn", f"{base}.branch2.6", path + ("b2_pw2_bn",)),
            ])
    entries.extend(_ds_head_entries())
    return entries


#: parameters the reference constructs but never uses in its forward pass
#: (they still appear in its checkpoints and must be dropped on import)
_UNUSED_PREFIXES = {
    "mobilenetV2": (
        "model0.irblock14.", "model0.irblock15.", "model0.irblock16.",
        "model0.irblock17.", "model0.last_layer.",
    ),
    "shufflenetV2": ("model0.stage4.", "model0.conv5."),
}

_FAMILIES = {
    "vgg2016": ("vgg2016", _vgg_entries),
    "mobilenet": ("mobilenet", _mobilenet_entries),
    "mobilenet_thin": ("mobilenet", _mobilenet_entries),
    "mobilenetV2": ("mobilenetV2", _mobilenet_v2_entries),
    "mobilenetV2_large": ("mobilenetV2", _mobilenet_v2_entries),
    "mobilenetV2_small": ("mobilenetV2", _mobilenet_v2_entries),
    "shufflenetV2_1.0x": ("shufflenetV2", _shufflenet_v2_entries),
    "shufflenetV2_0.5x": ("shufflenetV2", _shufflenet_v2_entries),
}


def _family(model_name: str) -> Tuple[str, List[Entry]]:
    try:
        family, build = _FAMILIES[model_name]
    except KeyError:
        raise NotImplementedError(
            f"no torch-checkpoint mapping for {model_name!r}; "
            f"available: {sorted(_FAMILIES)}"
        ) from None
    return family, build()


# ---------------------------------------------------------------------------
# the two interpreters
# ---------------------------------------------------------------------------

def _set_in(tree: Dict[str, Any], path: Iterable[str], leaf) -> None:
    d = tree
    *parents, last = path
    for k in parents:
        d = d.setdefault(k, {})
    d[last] = leaf


def _get_in(tree: Dict[str, Any], path: Iterable[str]):
    d = tree
    for k in path:
        d = d[k]
    return np.asarray(d)


def _import_entries(
    entries: List[Entry], state: Dict[str, np.ndarray]
) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for kind, tname, path in entries:
        if kind == "conv_wb":
            _set_in(params, path + ("kernel",),
                    _conv_kernel(state.pop(f"{tname}.weight")))
            _set_in(params, path + ("bias",), state.pop(f"{tname}.bias"))
        elif kind == "conv_w":
            _set_in(params, path + ("kernel",),
                    _conv_kernel(state.pop(f"{tname}.weight")))
        elif kind == "bn":
            _set_in(params, path + ("scale",), state.pop(f"{tname}.weight"))
            _set_in(params, path + ("bias",), state.pop(f"{tname}.bias"))
            _set_in(stats, path + ("mean",),
                    state.pop(f"{tname}.running_mean"))
            _set_in(stats, path + ("var",),
                    state.pop(f"{tname}.running_var"))
            state.pop(f"{tname}.num_batches_tracked", None)
        else:  # pragma: no cover
            raise AssertionError(kind)
    if state:
        raise ValueError(
            f"unconsumed reference parameters: {sorted(state)[:8]}..."
        )
    out: Dict[str, Any] = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def _export_entries(
    entries: List[Entry], variables: Dict[str, Any]
) -> Dict[str, np.ndarray]:
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: Dict[str, np.ndarray] = {}
    for kind, tname, path in entries:
        if kind == "conv_wb":
            out[f"{tname}.weight"] = _conv_kernel_inv(
                _get_in(params, path + ("kernel",))
            )
            out[f"{tname}.bias"] = _get_in(params, path + ("bias",))
        elif kind == "conv_w":
            out[f"{tname}.weight"] = _conv_kernel_inv(
                _get_in(params, path + ("kernel",))
            )
        elif kind == "bn":
            out[f"{tname}.weight"] = _get_in(params, path + ("scale",))
            out[f"{tname}.bias"] = _get_in(params, path + ("bias",))
            out[f"{tname}.running_mean"] = _get_in(stats, path + ("mean",))
            out[f"{tname}.running_var"] = _get_in(stats, path + ("var",))
            out[f"{tname}.num_batches_tracked"] = np.asarray(0, np.int64)
    return out


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def convert_torch_checkpoint(
    path_or_state: Any, model_name: str = "vgg2016"
) -> Dict[str, Any]:
    """Convert a reference PyTorch checkpoint to our flax variables.

    ``path_or_state``: a filesystem path or an in-memory
    {name: array} dict. Returns ``{"params": ...}`` (plus
    ``batch_stats`` for BN families) ready for ``model.apply``. Every
    reference parameter must be consumed, so a mismatched architecture
    fails loudly instead of silently dropping weights.
    """
    if isinstance(path_or_state, (str, os.PathLike)):
        state = load_torch_state_dict(os.fspath(path_or_state))
    else:
        state = {k: np.asarray(v) for k, v in path_or_state.items()}
    family, entries = _family(model_name)
    state = dict(state)
    for prefix in _UNUSED_PREFIXES.get(family, ()):
        for k in [k for k in state if k.startswith(prefix)]:
            state.pop(k)
    return _import_entries(entries, state)


def import_imagenet_vgg19(
    path_or_state: Any, variables: Dict[str, Any]
) -> Dict[str, Any]:
    """The reference's ``--imagenet_pretrained`` initialization: copy a
    torchvision ImageNet VGG19 *classifier* checkpoint's first ten convs
    (``features.{0,2,5,7,10,12,14,16,19,21}.weight/bias`` — exactly
    ``features[:23]``) into a freshly initialized vgg2016 variables tree
    (reference lib/network/vgg2016.py:137-143: a partial copy of the
    first 23 feature layers; train.py:48 wires the flag).

    The two appended convs (torch indices 23, 25) and the whole CPM head
    keep their existing initialization, and all other checkpoint keys
    (``classifier.*``, the deeper feature convs) are ignored — the same
    partial-copy semantics as the reference. Returns a new variables
    tree; shapes are validated against the existing leaves so a wrong
    file fails loudly.

    torchvision cannot be downloaded in airgapped environments; any
    locally available ``vgg19-*.pth`` in torchvision's format works.
    """
    import jax
    from flax.core import unfreeze

    if isinstance(path_or_state, (str, os.PathLike)):
        state = load_torch_state_dict(os.fspath(path_or_state))
    else:
        state = {k: np.asarray(v) for k, v in path_or_state.items()}
    # rebuild containers (plain, mutable) so the caller's tree is not
    # mutated; leaves stay shared except the ten we replace
    out = jax.tree_util.tree_map(lambda x: x, unfreeze(variables))
    backbone = out["params"]["model0"]
    for idx in _VGG_BACKBONE_CONV_IDX[:10]:  # features[:23] convs only
        for torch_key, leaf_key, conv in (
            (f"features.{idx}.weight", "kernel", _conv_kernel),
            (f"features.{idx}.bias", "bias", lambda b: b),
        ):
            if torch_key not in state:
                raise ValueError(
                    f"{torch_key} missing: not a torchvision VGG19 "
                    "classifier checkpoint"
                )
            new = conv(np.asarray(state[torch_key]))
            old = backbone[f"conv_{idx}"]["conv"][leaf_key]
            if tuple(new.shape) != tuple(np.shape(old)):
                raise ValueError(
                    f"{torch_key}: shape {new.shape} does not match "
                    f"model0/conv_{idx} {tuple(np.shape(old))}"
                )
            backbone[f"conv_{idx}"]["conv"][leaf_key] = new.astype(
                np.asarray(old).dtype
            )
    return out


def export_torch_checkpoint(
    variables: Dict[str, Any],
    model_name: str = "vgg2016",
    path: Optional[str] = None,
    prefix: str = "module.",
    template: Optional[Dict[str, np.ndarray]] = None,
) -> Dict[str, np.ndarray]:
    """Export our flax variables as a reference-format state_dict.

    ``prefix`` defaults to ``module.`` because the reference loader
    unconditionally strips the first seven characters of every key
    (reference lib/evaluate/estimator.py:30-33) — only DataParallel-style
    checkpoints survive it.

    The reference models also CONTAIN parameters their forward pass never
    touches (mobilenetV2 irblock14-17/last_layer, shufflenetV2
    stage4/conv5); a strict ``load_state_dict`` wants values for those
    too. Pass ``template`` (e.g. ``load_torch_state_dict`` of any
    reference checkpoint of the same architecture, or a fresh reference
    model's state_dict) to fill them; without one the export contains
    exactly the forward-relevant parameters and the reference must load
    with ``strict=False``.

    If ``path`` is given the state_dict is written with ``torch.save``.
    Returns the (un-prefixed keys aside) state_dict as numpy arrays.
    """
    import jax

    family, entries = _family(model_name)
    host_vars = jax.device_get(variables)
    out = _export_entries(entries, host_vars)
    if template is not None:
        tmpl = {
            (k[len("module."):] if k.startswith("module.") else k):
                np.asarray(v)
            for k, v in template.items()
        }
        for k, v in tmpl.items():
            # num_batches_tracked is bookkeeping our variables don't
            # carry — the template's real value beats the synthesized 0
            if k not in out or k.endswith("num_batches_tracked"):
                out[k] = v
    out = {f"{prefix}{k}": v for k, v in out.items()}
    if path is not None:
        import torch

        os.makedirs(
            os.path.dirname(os.path.abspath(path)), exist_ok=True
        )
        torch.save(
            {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
             out.items()},
            path,
        )
    return out
