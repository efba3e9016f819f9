"""Runtime tests: padding math, torch->flax conversion, conv-layout parity,
and the estimator surface (with a small dest_size to keep CPU compiles
cheap)."""

import numpy as np
import pytest

import jax.numpy as jnp

from torch_ekpose_tpu.models import init_model
from torch_ekpose_tpu.runtime import (
    PoseEstimator,
    convert_torch_checkpoint,
    padding,
)


def test_padding_shapes_and_scale(rng):
    im = (rng.uniform(0, 255, (480, 640, 3))).astype(np.uint8)
    im_pad, scale, shape = padding(im, 368, 8)
    # long side 640 -> 368 => scale 0.575 => 480*0.575 = 276 -> pad to 280
    assert scale == pytest.approx(368 / 640)
    assert im_pad.shape[1] == 368
    assert im_pad.shape[0] == 280
    assert shape == (276, 368, 3)
    # padded region is zeros
    assert np.all(im_pad[276:] == 0)


def _fake_vgg_state():
    """Random state_dict with the reference vgg2016 names/shapes
    (reference lib/network/vgg2016.py:14-76)."""
    rng = np.random.default_rng(0)
    state = {}

    def conv(name, cin, cout, k):
        state[f"{name}.weight"] = rng.normal(
            0, 0.01, (cout, cin, k, k)
        ).astype(np.float32)
        state[f"{name}.bias"] = rng.normal(0, 0.01, (cout,)).astype(np.float32)

    backbone = [
        (0, 3, 64, 3), (2, 64, 64, 3), (5, 64, 128, 3), (7, 128, 128, 3),
        (10, 128, 256, 3), (12, 256, 256, 3), (14, 256, 256, 3),
        (16, 256, 256, 3), (19, 256, 512, 3), (21, 512, 512, 3),
        (23, 512, 256, 3), (25, 256, 128, 3),
    ]
    for idx, cin, cout, k in backbone:
        conv(f"model0.backbone.{idx}", cin, cout, k)
    for branch, out in ((1, 38), (2, 19)):
        name = f"model1_{branch}"
        conv(f"{name}.0", 128, 128, 3)
        conv(f"{name}.2", 128, 128, 3)
        conv(f"{name}.4", 128, 128, 3)
        conv(f"{name}.6", 128, 512, 1)
        conv(f"{name}.8", 512, out, 1)
    for stage in range(2, 7):
        for branch, out in ((1, 38), (2, 19)):
            name = f"model{stage}_{branch}"
            conv(f"{name}.0", 185, 128, 7)
            for i in (2, 4, 6, 8):
                conv(f"{name}.{i}", 128, 128, 7)
            conv(f"{name}.10", 128, 128, 1)
            conv(f"{name}.12", 128, out, 1)
    return state


def test_convert_vgg_checkpoint_shapes():
    import jax

    state = _fake_vgg_state()
    converted = convert_torch_checkpoint(state, "vgg2016")
    _, variables = init_model("vgg2016", input_shape=(1, 64, 64, 3))
    want_shapes = jax.tree.map(lambda a: a.shape, variables["params"])
    got_shapes = jax.tree.map(lambda a: a.shape, converted["params"])
    assert want_shapes == got_shapes


def test_convert_rejects_leftover_keys():
    state = _fake_vgg_state()
    state["extra.weight"] = np.zeros((1,))
    with pytest.raises(ValueError, match="unconsumed"):
        convert_torch_checkpoint(state, "vgg2016")


def test_convert_module_prefix_stripped(tmp_path):
    torch = pytest.importorskip("torch")
    state = {f"module.{k}": torch.from_numpy(v) for k, v in
             _fake_vgg_state().items()}
    p = tmp_path / "dp.pth"
    torch.save(state, p)
    converted = convert_torch_checkpoint(str(p), "vgg2016")
    assert "model0" in converted["params"]


def test_conv_layout_parity_with_torch(rng):
    """Converted OIHW->HWIO kernels must reproduce torch's conv2d."""
    torch = pytest.importorskip("torch")
    import flax.linen as nn

    w = rng.normal(0, 0.1, (38, 17, 7, 7)).astype(np.float32)
    b = rng.normal(0, 0.1, (38,)).astype(np.float32)
    x = rng.normal(0, 1, (1, 9, 11, 17)).astype(np.float32)

    with torch.no_grad():
        ref = torch.nn.functional.conv2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(w), torch.from_numpy(b), padding=3,
        ).numpy().transpose(0, 2, 3, 1)

    conv = nn.Conv(38, (7, 7), padding=[(3, 3), (3, 3)])
    variables = {
        "params": {
            "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "bias": jnp.asarray(b),
        }
    }
    ours = np.asarray(conv.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_estimator_end_to_end_small():
    est = PoseEstimator(
        "vgg2016", preprocess="vgg", decode_backend="numpy", dest_size=64,
        compute_dtype=jnp.float32,
    )
    img = np.zeros((100, 80, 3), dtype=np.uint8)
    pafs, heatmaps, scale = est.get_outputs(img)
    assert pafs.shape[-1] == 38 and heatmaps.shape[-1] == 19
    assert pafs.shape[0] == heatmaps.shape[0] == 8  # 64 / stride 8
    humans, scale2 = est.estimate(img)
    assert isinstance(humans, list)
    assert scale == scale2


def test_estimator_precision_knob():
    """--precision plumbing: 'highest' serves identical results to 'fast'
    on CPU (where DEFAULT matmul precision is already exact f32 — the
    knob only changes TPU MXU lowering, measured in PERF.md), both the
    unfused and jax-decode paths run under it, and bad values are
    rejected eagerly."""
    from torch_ekpose_tpu.runtime.estimator import matmul_precision

    with pytest.raises(ValueError):
        matmul_precision("high")  # only fast|highest are the knob's API

    _, variables = init_model("mobilenet_thin", input_shape=(1, 64, 64, 3))
    img = (np.arange(100 * 80 * 3) % 255).reshape(100, 80, 3).astype(np.uint8)
    outs = {}
    for prec in ("fast", "highest"):
        est = PoseEstimator(
            "mobilenet_thin", variables=variables, decode_backend="jax",
            dest_size=64, compute_dtype=jnp.float32, precision=prec,
        )
        pafs, heatmaps, _ = est.get_outputs(img)
        humans, _ = est.estimate(img)  # jax decode path under the knob
        outs[prec] = (pafs, heatmaps)
    np.testing.assert_array_equal(outs["fast"][0], outs["highest"][0])
    np.testing.assert_array_equal(outs["fast"][1], outs["highest"][1])

    with pytest.raises(ValueError):
        PoseEstimator("mobilenet_thin", variables=variables,
                      precision="float64")


def test_cli_precision_resolves_dtype():
    """--precision highest flips the unset --dtype default to float32;
    an explicit --dtype wins; int8+highest is rejected."""
    import argparse

    from torch_ekpose_tpu.cli import common

    def parse(argv):
        p = argparse.ArgumentParser()
        common.add_model_args(p)
        args = p.parse_args(argv)
        common._resolve_dtype(args)
        return args

    assert parse([]).dtype == "bfloat16"
    assert parse(["--precision", "highest"]).dtype == "float32"
    assert parse(["--precision", "highest", "--dtype", "bfloat16"]
                 ).dtype == "bfloat16"
    with pytest.raises(SystemExit):
        parse(["--precision", "highest", "--dtype", "int8"])


def test_export_vgg_roundtrip(tmp_path):
    """convert -> export -> convert is the identity, and the .pth written
    by export loads back through the normal torch path."""
    from torch_ekpose_tpu.runtime import export_torch_checkpoint

    state = _fake_vgg_state()
    variables = convert_torch_checkpoint(state, "vgg2016")
    exported = export_torch_checkpoint(variables, "vgg2016", prefix="")
    assert set(exported) == set(state)
    for k in state:
        np.testing.assert_array_equal(exported[k], state[k], err_msg=k)

    import jax

    torch = pytest.importorskip("torch")
    p = str(tmp_path / "exported.pth")
    export_torch_checkpoint(variables, "vgg2016", path=p)
    again = convert_torch_checkpoint(p, "vgg2016")
    a = jax.tree.leaves(jax.tree.map(np.asarray, variables))
    b = jax.tree.leaves(jax.tree.map(np.asarray, again))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def _fake_torchvision_vgg19_state():
    """Random state_dict in torchvision VGG19 *classifier* format:
    ``features.{i}.weight/bias`` for every config-E conv plus
    ``classifier.*`` heads (all ignored by the backbone import except
    features[:23])."""
    rng = np.random.default_rng(3)
    state = {}
    plan = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
            512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    idx, cin = 0, 3
    for v in plan:
        if v == "M":
            idx += 1
            continue
        state[f"features.{idx}.weight"] = rng.normal(
            0, 0.01, (v, cin, 3, 3)).astype(np.float32)
        state[f"features.{idx}.bias"] = rng.normal(
            0, 0.01, (v,)).astype(np.float32)
        cin = v
        idx += 2
    state["classifier.0.weight"] = rng.normal(
        0, 0.01, (4096, 25088)).astype(np.float32)
    state["classifier.0.bias"] = np.zeros((4096,), np.float32)
    return state


def test_import_imagenet_vgg19():
    """The reference's --imagenet_pretrained partial copy
    (vgg2016.py:137-143): features[:23] convs land in the backbone,
    everything else (appended convs, head, classifier keys) untouched."""
    from torch_ekpose_tpu.runtime.checkpoint import import_imagenet_vgg19

    state = _fake_torchvision_vgg19_state()
    _, variables = init_model("vgg2016", input_shape=(1, 64, 64, 3))
    out = import_imagenet_vgg19(state, variables)

    copied = (0, 2, 5, 7, 10, 12, 14, 16, 19, 21)
    for idx in copied:
        got = np.asarray(out["params"]["model0"][f"conv_{idx}"]["conv"]
                         ["kernel"])
        want = np.transpose(state[f"features.{idx}.weight"], (2, 3, 1, 0))
        np.testing.assert_array_equal(got, want, err_msg=f"conv_{idx}")
        np.testing.assert_array_equal(
            np.asarray(out["params"]["model0"][f"conv_{idx}"]["conv"]
                       ["bias"]),
            state[f"features.{idx}.bias"],
        )
        # the caller's tree is not mutated
        assert not np.array_equal(
            np.asarray(variables["params"]["model0"][f"conv_{idx}"]
                       ["conv"]["kernel"]), got)
    # appended convs (23, 25) and the CPM head keep their fresh init
    for idx in (23, 25):
        np.testing.assert_array_equal(
            np.asarray(out["params"]["model0"][f"conv_{idx}"]["conv"]
                       ["kernel"]),
            np.asarray(variables["params"]["model0"][f"conv_{idx}"]
                       ["conv"]["kernel"]),
        )
    import jax

    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(out["params"]["head"])[0]),
        np.asarray(jax.tree.leaves(variables["params"]["head"])[0]),
    )


def test_import_imagenet_vgg19_rejects_bad_shapes():
    from torch_ekpose_tpu.runtime.checkpoint import import_imagenet_vgg19

    state = _fake_torchvision_vgg19_state()
    state["features.0.weight"] = state["features.0.weight"][:, :2]
    _, variables = init_model("vgg2016", input_shape=(1, 64, 64, 3))
    with pytest.raises(ValueError, match="shape"):
        import_imagenet_vgg19(state, variables)


def test_import_imagenet_vgg19_rejects_non_vgg19_file():
    from torch_ekpose_tpu.runtime.checkpoint import import_imagenet_vgg19

    _, variables = init_model("vgg2016", input_shape=(1, 64, 64, 3))
    with pytest.raises(ValueError, match="missing"):
        import_imagenet_vgg19({"classifier.0.bias": np.zeros(1)}, variables)
