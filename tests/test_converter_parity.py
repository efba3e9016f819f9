"""Numeric conversion parity against the actual reference PyTorch models.

These tests import the reference implementation from /root/reference (the
upstream snapshot mounted read-only), instantiate each DS-family model,
convert its real state_dict with our converter, and require the flax
forward pass to reproduce the torch forward pass on the same input.

Skipped wherever the reference tree or torch is unavailable — all other
converter behavior is covered by shape-level tests in test_runtime.py.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "lib", "network")),
    reason="reference tree unavailable",
)


def _vgg19_features_standin():
    """A faithful plain-torch stand-in for ``torchvision.models.vgg19()``:
    the public VGG19 configuration-E feature plan (convs 3x3 pad 1 + ReLU,
    'M' = 2x2 max-pool). The reference only consumes
    ``models.vgg19().features.children()[:23]``
    (reference lib/network/vgg2016.py:14-15), so an object exposing a
    structurally identical ``.features`` Sequential is sufficient — and
    makes the reference OpenPose2016 constructible without torchvision."""
    import torch.nn as nn

    plan = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
            512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers, in_ch = [], 3
    for v in plan:
        if v == "M":
            layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers.append(nn.Conv2d(in_ch, v, kernel_size=3, padding=1))
            layers.append(nn.ReLU(inplace=True))
            in_ch = v
    return types.SimpleNamespace(features=nn.Sequential(*layers))


@pytest.fixture(scope="module")
def reference_modules():
    """Import reference network modules with torchvision stubbed out —
    including a functional ``models.vgg19`` so the flagship vgg2016 is
    constructible and numerically testable."""
    if "torchvision" not in sys.modules:
        stub = types.ModuleType("torchvision")
        stub.models = types.ModuleType("torchvision.models")
        stub.models.vgg19 = lambda **kw: _vgg19_features_standin()
        sys.modules["torchvision"] = stub
        sys.modules["torchvision.models"] = stub.models
    sys.path.insert(0, REFERENCE)
    try:
        from lib.network import mobilenet, mobilenetV2, shufflenetV2, vgg2016
    finally:
        sys.path.remove(REFERENCE)
    return {
        "mobilenet": mobilenet,
        "mobilenetV2": mobilenetV2,
        "shufflenetV2": shufflenetV2,
        "vgg2016": vgg2016,
    }


CASES = [
    ("vgg2016", "vgg2016", {}),
    ("mobilenet", "mobilenet", dict(conv_width=1.0, conv_width2=1.0)),
    ("mobilenet_thin", "mobilenet", dict(conv_width=0.75, conv_width2=0.50)),
    ("mobilenetV2", "mobilenetV2", dict(conv_width=1.0, conv_width2=1.0)),
    ("mobilenetV2_small", "mobilenetV2",
     dict(conv_width=0.50, conv_width2=0.50)),
    ("shufflenetV2_1.0x", "shufflenetV2",
     dict(conv_width=1.0, conv_width2=1.0)),
    ("shufflenetV2_0.5x", "shufflenetV2",
     dict(conv_width=0.5, conv_width2=0.5)),
]


@pytest.mark.parametrize("our_name,ref_mod,kwargs", CASES)
def test_forward_parity(reference_modules, our_name, ref_mod, kwargs):
    import jax.numpy as jnp

    from torch_ekpose_tpu.models import get_model
    from torch_ekpose_tpu.runtime import convert_torch_checkpoint

    torch.manual_seed(0)
    ref = reference_modules[ref_mod].OpenPose(**kwargs)
    ref.eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    variables = convert_torch_checkpoint(state, our_name)
    model = get_model(our_name)

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        (paf_t, ht_t), _ = ref(torch.from_numpy(x))
    paf_ref = paf_t.numpy().transpose(0, 2, 3, 1)
    ht_ref = ht_t.numpy().transpose(0, 2, 3, 1)

    (paf, ht), _ = model.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False
    )
    np.testing.assert_allclose(
        np.asarray(paf), paf_ref, rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(ht), ht_ref, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("our_name,ref_mod,kwargs", CASES)
def test_export_roundtrip_strict_load(
    reference_modules, our_name, ref_mod, kwargs
):
    """convert -> export(template) must reproduce the reference
    state_dict exactly and strict-load into the reference model."""
    from torch_ekpose_tpu.runtime import (
        convert_torch_checkpoint,
        export_torch_checkpoint,
    )

    torch.manual_seed(0)
    ref = reference_modules[ref_mod].OpenPose(**kwargs)
    ref.eval()
    state = {
        # nonzero num_batches_tracked, as in any trained checkpoint: the
        # export must take it from the template, not synthesize 0
        k: (np.full_like(v.detach().numpy(), 7)
            if k.endswith("num_batches_tracked") else v.detach().numpy())
        for k, v in ref.state_dict().items()
    }

    variables = convert_torch_checkpoint(state, our_name)
    exported = export_torch_checkpoint(
        variables, our_name, prefix="", template=state
    )

    assert set(exported) == set(state)
    for k in state:
        np.testing.assert_array_equal(
            exported[k], state[k], err_msg=k
        )
    ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))
         for k, v in exported.items()},
        strict=True,
    )


def test_export_default_prefix_survives_reference_loader(
    reference_modules
):
    """The default module. prefix composes with the reference's
    strip-first-7-chars loader convention (estimator.py:30-33)."""
    from torch_ekpose_tpu.runtime import (
        convert_torch_checkpoint,
        export_torch_checkpoint,
    )

    torch.manual_seed(0)
    ref = reference_modules["mobilenet"].OpenPose(
        conv_width=1.0, conv_width2=1.0
    )
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_torch_checkpoint(state, "mobilenet")
    exported = export_torch_checkpoint(variables, "mobilenet")
    assert all(k.startswith("module.") for k in exported)
    stripped = {k[7:]: v for k, v in exported.items()}
    assert set(stripped) == set(state)
