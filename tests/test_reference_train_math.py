"""Training-math parity against the reference's *executed* code.

Round-2 verified ``cpm_loss`` against a hand re-expression only; here the
reference's own ``get_loss`` (/root/reference/train.py:311-339) is imported
and executed (torch CPU) on identical 12-output tensors, and a full
forward + loss + backward + Adam(1e-4, betas 0.9/0.999, wd 5e-4) step
(/root/reference/train.py:145-149) is run through both stacks from
converted-identical parameters, asserting post-step parameter agreement.

The reference ``train.py`` module pulls in yacs (absent) and torchvision
(absent) at import time; both are stubbed the same way
``test_converter_parity`` stubs torchvision — the stand-ins are functional,
not mocks, so the executed code is the reference's own.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REFERENCE, "train.py")),
    reason="reference tree unavailable",
)

BATCH = 2
SIZE = 64          # input px; output grid = SIZE/8
GRID = SIZE // 8


def _install_stubs():
    from test_converter_parity import _vgg19_features_standin

    if "torchvision" not in sys.modules:
        stub = types.ModuleType("torchvision")
        stub.models = types.ModuleType("torchvision.models")
        stub.models.vgg19 = lambda **kw: _vgg19_features_standin()
        sys.modules["torchvision"] = stub
        sys.modules["torchvision.models"] = stub.models
    stub = sys.modules["torchvision"]
    if not hasattr(stub, "transforms"):
        # reference lib/datasets/transforms.py constructs these at module
        # import; the training-math tests never execute them, so
        # constructible placeholders suffice.
        class _TVOp:
            def __init__(self, *a, **kw):
                pass

            def __call__(self, *a, **kw):  # pragma: no cover
                raise NotImplementedError("torchvision stub op executed")

        tv_t = types.ModuleType("torchvision.transforms")
        for name in ("Normalize", "Compose", "ToTensor", "ColorJitter",
                     "RandomApply", "Lambda", "RandomGrayscale"):
            setattr(tv_t, name, _TVOp)
        tv_f = types.ModuleType("torchvision.transforms.functional")
        tv_f.to_tensor = _TVOp()
        tv_f.pad = _TVOp()
        tv_t.functional = tv_f
        stub.transforms = tv_t
        sys.modules["torchvision.transforms"] = tv_t
        sys.modules["torchvision.transforms.functional"] = tv_f
    if "yacs" not in sys.modules:
        class CfgNode(dict):
            # attribute-style access is all lib/config/default.py uses
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:  # pragma: no cover
                    raise AttributeError(k) from e

            def __setattr__(self, k, v):
                self[k] = v

        yacs = types.ModuleType("yacs")
        yacs.config = types.ModuleType("yacs.config")
        yacs.config.CfgNode = CfgNode
        sys.modules["yacs"] = yacs
        sys.modules["yacs.config"] = yacs.config


@pytest.fixture(scope="module")
def ref_train():
    """The reference's train.py, imported as a module (its main() is
    __main__-guarded) with torch.nn.Module.cuda() made a CPU no-op so
    ``get_loss``'s ``criterion.cuda()`` (train.py:315) executes here."""
    _install_stubs()
    orig_cuda = torch.nn.Module.cuda
    torch.nn.Module.cuda = lambda self, *a, **kw: self
    sys.path.insert(0, REFERENCE)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_train", os.path.join(REFERENCE, "train.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        sys.path.remove(REFERENCE)
        torch.nn.Module.cuda = orig_cuda


def _random_problem(rng):
    """Images + plausible target maps (values in the maps' real ranges:
    heatmaps 0..1 with a background channel, PAFs -1..1)."""
    images = rng.normal(0.0, 0.5, (BATCH, 3, SIZE, SIZE)).astype(np.float32)
    heat = rng.uniform(0.0, 1.0, (BATCH, 19, GRID, GRID)).astype(np.float32)
    paf = rng.uniform(-1.0, 1.0, (BATCH, 38, GRID, GRID)).astype(np.float32)
    return images, heat, paf


def test_get_loss_executed_parity(ref_train, rng):
    """Identical 12-output lists through the reference's executed
    get_loss vs our cpm_loss: equal total and all 16 logged series."""
    import jax.numpy as jnp

    from torch_ekpose_tpu.training.loss import cpm_loss

    _, heat, paf = _random_problem(rng)
    saved_np = []
    for _ in range(6):
        saved_np.append(
            rng.normal(0, 1, (BATCH, 38, GRID, GRID)).astype(np.float32))
        saved_np.append(
            rng.normal(0, 1, (BATCH, 19, GRID, GRID)).astype(np.float32))

    args = types.SimpleNamespace(batch_size=BATCH)
    ref_total, ref_log = ref_train.get_loss(
        [torch.from_numpy(t) for t in saved_np],
        torch.from_numpy(heat),
        torch.from_numpy(paf),
        args,
    )

    saved_j = [jnp.asarray(t.transpose(0, 2, 3, 1)) for t in saved_np]
    total, logs = cpm_loss(
        saved_j,
        jnp.asarray(heat.transpose(0, 2, 3, 1)),
        jnp.asarray(paf.transpose(0, 2, 3, 1)),
    )

    np.testing.assert_allclose(
        float(total), float(ref_total), rtol=1e-6)
    assert set(ref_log) == set(logs)
    for name, ref_val in ref_log.items():
        np.testing.assert_allclose(
            float(logs[name]), float(ref_val), rtol=1e-5,
            err_msg=f"series {name}")


def test_adam_step_executed_parity(ref_train):
    """Converted-identical vgg2016 params, identical batch: the
    reference's forward + get_loss + backward + Adam step (torch CPU)
    vs our jitted train step must land on the same parameters.

    Tolerance note: at step 1 Adam's update is ~lr*sign(g) elementwise, so
    a gradient that crosses zero between the two stacks' fp32 roundings
    flips its element by up to 2*lr. The assertions are therefore: all 16
    loss series equal, the per-element updates equal for >=99.9% of
    elements, the mean |diff| tiny, and the max bounded by the sign-flip
    envelope — run for TWO steps so the Adam moments accumulate.
    """
    import jax.numpy as jnp

    from torch_ekpose_tpu.models import get_model
    from torch_ekpose_tpu.runtime import (
        convert_torch_checkpoint,
        export_torch_checkpoint,
    )
    from torch_ekpose_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    _install_stubs()
    sys.path.insert(0, REFERENCE)
    try:
        from lib.network import vgg2016
    finally:
        sys.path.remove(REFERENCE)

    LR, WD = 1e-4, 5e-4

    torch.manual_seed(0)
    ref = vgg2016.OpenPose()
    ref.train()
    state0 = {k: v.detach().numpy().copy()
              for k, v in ref.state_dict().items()}
    optimizer = torch.optim.Adam(
        ref.parameters(), lr=LR, betas=(0.9, 0.999), weight_decay=WD)
    args = types.SimpleNamespace(batch_size=BATCH)

    variables = convert_torch_checkpoint(state0, "vgg2016")
    model = get_model("vgg2016")
    tx = make_optimizer(LR, WD)
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, targets="host")

    rng = np.random.default_rng(7)
    ref_logs, our_logs = [], []
    for _ in range(2):
        images, heat, paf = _random_problem(rng)

        _, saved = ref(torch.from_numpy(images))
        total, log = ref_train.get_loss(
            saved, torch.from_numpy(heat), torch.from_numpy(paf), args)
        optimizer.zero_grad()
        total.backward()
        optimizer.step()
        log["Loss"] = total.item()
        ref_logs.append(log)

        state, logs = step(
            state,
            jnp.asarray(images.transpose(0, 2, 3, 1)),
            jnp.asarray(heat.transpose(0, 2, 3, 1)),
            jnp.asarray(paf.transpose(0, 2, 3, 1)),
        )
        our_logs.append({k: float(v) for k, v in logs.items()})

    for step_i, (rl, ol) in enumerate(zip(ref_logs, our_logs)):
        assert set(rl) == set(ol)
        for name, ref_val in rl.items():
            np.testing.assert_allclose(
                ol[name], float(ref_val), rtol=5e-4,
                err_msg=f"step {step_i} series {name}")

    exported = export_torch_checkpoint(
        {"params": state.params}, "vgg2016", prefix="")
    ref_after = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    diffs, updates = [], []
    for key, ref_val in ref_after.items():
        ours = exported[key]
        assert ours.shape == ref_val.shape, key
        diffs.append(np.abs(ours - ref_val).ravel())
        updates.append(np.abs(ref_val - state0[key]).ravel())
    diffs = np.concatenate(diffs)
    updates = np.concatenate(updates)

    # the reference actually moved its parameters (the test isn't vacuous)
    assert np.median(updates) > 1e-5

    frac_tight = np.mean(diffs <= 1e-5)
    assert frac_tight >= 0.999, f"only {frac_tight:.5f} of params within 1e-5"
    assert diffs.mean() < 2e-6, diffs.mean()
    # 2 steps * 2*lr sign-flip envelope
    assert diffs.max() <= 4 * LR + 1e-6, diffs.max()


def test_warmup_frozen_backbone_executed_parity(ref_train):
    """The reference's imagenet warmup freezes model0's backbone and
    builds Adam over only the still-trainable parameters
    (/root/reference/train.py:130-166). From converted-identical
    weights, two warmup steps through both stacks must leave every
    frozen leaf BIT-identical to its initial value while the head
    updates agree like the main-training Adam step does — i.e. our
    make_optimizer(freeze_backbone=True) masking is the same training
    program, not merely a similar one."""
    import jax.numpy as jnp

    from torch_ekpose_tpu.models import get_model
    from torch_ekpose_tpu.runtime import (
        convert_torch_checkpoint,
        export_torch_checkpoint,
    )
    from torch_ekpose_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    _install_stubs()
    sys.path.insert(0, REFERENCE)
    try:
        from lib.network import vgg2016
    finally:
        sys.path.remove(REFERENCE)

    LR, WD = 1e-4, 5e-4

    torch.manual_seed(0)
    ref = vgg2016.OpenPose()
    ref.train()
    state0 = {k: v.detach().numpy().copy()
              for k, v in ref.state_dict().items()}
    # the reference's warmup freeze (train.py:131-133) + optimizer over
    # trainable params only (train.py:137-149)
    for param in ref.model0.backbone.parameters():
        param.requires_grad = False
    trainable = [p for p in ref.parameters() if p.requires_grad]
    optimizer = torch.optim.Adam(
        trainable, lr=LR, betas=(0.9, 0.999), weight_decay=WD)
    args = types.SimpleNamespace(batch_size=BATCH)

    variables = convert_torch_checkpoint(state0, "vgg2016")
    model = get_model("vgg2016")
    state = create_train_state(
        model, variables, make_optimizer(LR, WD, freeze_backbone=True))
    step = make_train_step(model, targets="host")

    rng = np.random.default_rng(21)
    for _ in range(2):
        images, heat, paf = _random_problem(rng)
        _, saved = ref(torch.from_numpy(images))
        total, _ = ref_train.get_loss(
            saved, torch.from_numpy(heat), torch.from_numpy(paf), args)
        optimizer.zero_grad()
        total.backward()
        optimizer.step()
        state, _ = step(
            state,
            jnp.asarray(images.transpose(0, 2, 3, 1)),
            jnp.asarray(heat.transpose(0, 2, 3, 1)),
            jnp.asarray(paf.transpose(0, 2, 3, 1)),
        )

    exported = export_torch_checkpoint(
        {"params": state.params}, "vgg2016", prefix="")
    ref_after = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    frozen_keys = [k for k in state0 if k.startswith("model0.")]
    assert frozen_keys
    for key in frozen_keys:
        # bit-identical on BOTH stacks: torch never touched them, and
        # our multi_transform masked them to zero updates
        np.testing.assert_array_equal(ref_after[key], state0[key],
                                      err_msg=f"torch moved {key}")
        np.testing.assert_array_equal(exported[key], state0[key],
                                      err_msg=f"ours moved {key}")

    diffs, updates = [], []
    for key, ref_val in ref_after.items():
        if key in frozen_keys:
            continue
        diffs.append(np.abs(exported[key] - ref_val).ravel())
        updates.append(np.abs(ref_val - state0[key]).ravel())
    diffs = np.concatenate(diffs)
    updates = np.concatenate(updates)
    assert np.median(updates) > 1e-5   # the heads actually trained
    frac_tight = np.mean(diffs <= 1e-5)
    assert frac_tight >= 0.999, f"only {frac_tight:.5f} of params within 1e-5"
    assert diffs.mean() < 2e-6, diffs.mean()
    assert diffs.max() <= 4 * LR + 1e-6, diffs.max()
