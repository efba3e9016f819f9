"""Int8 serving mode (models/quant.py): QuantConv numerics, float->int8
tree conversion, closeness of the quantized vgg2016 forward to the f32
forward, and estimator/CLI wiring. The reference has no quantized path
(its serving story is the fp32 torch model, lib/evaluate/estimator.py);
this is a beyond-parity TPU serving feature."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_ekpose_tpu.models import (
    get_model,
    init_model,
    quantize_variables,
)
from torch_ekpose_tpu.models.quant import QuantConv, quantize_kernel


def test_quant_conv_matches_manual_dequant():
    """QuantConv == round-to-int8 conv recomputed by hand in numpy."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 6, 6, 5)).astype(np.float32)
    kernel = rng.normal(size=(3, 3, 5, 7)).astype(np.float32)
    bias = rng.normal(size=(7,)).astype(np.float32)

    q, scale = quantize_kernel(kernel)
    variables = {"params": {
        "kernel_q": jnp.asarray(q), "scale": jnp.asarray(scale),
        "bias": jnp.asarray(bias),
    }}
    out = QuantConv(7, kernel=3, dtype=jnp.float32).apply(
        variables, jnp.asarray(x)
    )

    sx = np.abs(x).max() / 127.0
    xq = np.clip(np.round(x / sx), -127, 127)
    pad = np.pad(xq[0], ((1, 1), (1, 1), (0, 0)))
    want = np.zeros((6, 6, 7), np.float32)
    for i in range(6):
        for j in range(6):
            patch = pad[i:i + 3, j:j + 3, :]
            acc = np.einsum("hwc,hwco->o", patch, q.astype(np.float32))
            want[i, j] = acc * (sx * scale) + bias
    np.testing.assert_allclose(np.asarray(out[0]), want, rtol=1e-5, atol=1e-4)


def test_folded_static_realize_matches_dynamic_exactly():
    """The folded pipeline defers the dequant math, it does not change
    it: a single static QuantConv's record realized to f32 is
    bit-identical to the dynamic QuantConv's output when ``act_scale``
    equals the dynamic per-example scale."""
    from torch_ekpose_tpu.models.quant import QuantAcc, realize

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 5, 5, 3)).astype(np.float32)
    kernel = rng.normal(size=(3, 3, 3, 4)).astype(np.float32)
    bias = rng.normal(size=(4,)).astype(np.float32)
    q, scale = quantize_kernel(kernel)
    base = {"kernel_q": jnp.asarray(q), "scale": jnp.asarray(scale),
            "bias": jnp.asarray(bias)}

    dyn = QuantConv(4, kernel=3, dtype=jnp.float32).apply(
        {"params": base}, jnp.asarray(x)
    )
    sx = np.abs(x).max() / 127.0
    rec = QuantConv(4, kernel=3, dtype=jnp.float32, static_act=True,
                    fold=True).apply(
        {"params": {**base, "act_scale": jnp.asarray(sx, jnp.float32)}},
        jnp.asarray(x),
    )
    assert isinstance(rec, QuantAcc) and not rec.relu
    np.testing.assert_array_equal(
        np.asarray(realize(rec, jnp.float32)), np.asarray(dyn)
    )


def test_folded_chain_matches_manual_requantize():
    """A folded conv->conv edge (one int32 -> s8 pass) matches the
    manual f32 dequant -> relu -> requant -> conv recomputation to
    within one rounding quantum of the final output scale (f32
    associativity can flip isolated round() calls; the math is
    otherwise identical)."""
    import flax.linen as nn

    from torch_ekpose_tpu.models.quant import realize

    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    k1 = rng.normal(size=(3, 3, 3, 4)).astype(np.float32)
    k2 = rng.normal(size=(3, 3, 4, 6)).astype(np.float32)
    b1 = rng.normal(size=(4,)).astype(np.float32)
    b2 = rng.normal(size=(6,)).astype(np.float32)
    q1, s1 = quantize_kernel(k1)
    q2, s2 = quantize_kernel(k2)
    sx1 = np.float32(np.abs(x).max() / 127.0)

    # manual mid-chain activations (f32 dequant + relu), then their scale
    xq = np.clip(np.round(x / sx1), -127, 127).astype(np.float32)
    pad = np.pad(xq[0], ((1, 1), (1, 1), (0, 0)))
    mid = np.zeros((8, 8, 4), np.float32)
    for i in range(8):
        for j in range(8):
            mid[i, j] = np.einsum(
                "hwc,hwco->o", pad[i:i + 3, j:j + 3], q1.astype(np.float32)
            ) * (sx1 * s1) + b1
    mid = np.maximum(mid, 0.0)
    sx2 = np.float32(np.abs(mid).max() / 127.0)

    class Chain(nn.Module):
        @nn.compact
        def __call__(self, x):
            r = QuantConv(4, kernel=3, dtype=jnp.float32, static_act=True,
                          fold=True, name="c1")(x)
            r = r.replace(relu=True)
            r = QuantConv(6, kernel=3, dtype=jnp.float32, static_act=True,
                          fold=True, name="c2")(r)
            return realize(r, jnp.float32)

    variables = {"params": {
        "c1": {"kernel_q": jnp.asarray(q1), "scale": jnp.asarray(s1),
               "bias": jnp.asarray(b1),
               "act_scale": jnp.asarray(sx1, jnp.float32)},
        "c2": {"kernel_q": jnp.asarray(q2), "scale": jnp.asarray(s2),
               "bias": jnp.asarray(b2),
               "act_scale": jnp.asarray(sx2, jnp.float32)},
    }}
    got = np.asarray(Chain().apply(variables, jnp.asarray(x)))

    mq = np.clip(np.round(mid / sx2), 0, 127).astype(np.float32)
    pad2 = np.pad(mq, ((1, 1), (1, 1), (0, 0)))
    want = np.zeros((8, 8, 6), np.float32)
    for i in range(8):
        for j in range(8):
            want[i, j] = np.einsum(
                "hwc,hwco->o", pad2[i:i + 3, j:j + 3], q2.astype(np.float32)
            ) * (sx2 * s2) + b2
    # one mid-chain quantum propagated through conv2's int8 weights
    quantum = float(sx2 * np.abs(s2).max()) * 127 * 9
    np.testing.assert_allclose(got[0], want, atol=quantum * 0.02 + 1e-4)
    # and the overwhelming majority of requantized values agree exactly
    frac_exact = float(
        np.isclose(got[0], want, atol=1e-4).mean()
    )
    assert frac_exact > 0.95, frac_exact


def test_max_pool_commutes_with_quant_acc():
    """max pooling the raw int32 accumulator == realizing first and
    pooling the activations — exactly (the per-channel affine + relu are
    monotone, so the same element wins either way)."""
    from torch_ekpose_tpu.models.layers import max_pool
    from torch_ekpose_tpu.models.quant import QuantAcc, realize

    rng = np.random.default_rng(7)
    rec = QuantAcc(
        acc=jnp.asarray(rng.integers(-500, 500, (1, 6, 6, 4)), jnp.int32),
        mult=jnp.asarray(rng.uniform(0.01, 2.0, (4,)), jnp.float32),
        bias=jnp.asarray(rng.normal(size=(4,)), jnp.float32),
        relu=True,
    )
    pooled_rec = max_pool(rec, 2, 2)
    assert isinstance(pooled_rec, QuantAcc) and pooled_rec.relu
    got = np.asarray(realize(pooled_rec, jnp.float32))
    want = np.asarray(max_pool(realize(rec, jnp.float32), 2, 2))
    np.testing.assert_array_equal(got, want)


def test_quantize_kernel_per_channel_roundtrip():
    """Per-output-channel scales: a channel scaled 100x quantizes to the
    same int grid as its unscaled twin; all-zero channels are safe."""
    rng = np.random.default_rng(1)
    k = rng.normal(size=(3, 3, 4, 3)).astype(np.float32)
    k[..., 1] = k[..., 0] * 100.0
    k[..., 2] = 0.0
    q, s = quantize_kernel(k)
    assert q.dtype == np.int8 and s.shape == (3,)
    np.testing.assert_array_equal(q[..., 0], q[..., 1])
    np.testing.assert_allclose(s[1], s[0] * 100.0, rtol=1e-6)
    assert np.all(q[..., 2] == 0)
    # dequantized error bounded by scale/2 per weight
    deq = q.astype(np.float32) * s
    assert np.abs(deq - k).max() <= (s.max() / 2) + 1e-6


def test_quantized_tree_matches_model_structure(vgg_model_and_vars):
    _, variables = vgg_model_and_vars
    qmodel = get_model("vgg2016", dtype=jnp.bfloat16, quantize=True)
    qvars = quantize_variables(variables, qmodel)

    want = jax.eval_shape(
        lambda r, x: qmodel.init(r, x, train=False),
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.bfloat16),
    )
    got_tree = jax.tree.map(lambda x: (x.shape, str(x.dtype)), qvars["params"])
    want_tree = jax.tree.map(
        lambda x: (x.shape, str(x.dtype)), dict(want)["params"]
    )
    assert jax.tree.structure(got_tree) == jax.tree.structure(want_tree)
    assert jax.tree.leaves(got_tree) == jax.tree.leaves(want_tree)

    # idempotent: re-quantizing an already-quantized tree passes through
    qvars2 = quantize_variables(qvars, qmodel)
    chex_equal = jax.tree.map(
        lambda a, b: bool((np.asarray(a) == np.asarray(b)).all()),
        qvars["params"], qvars2["params"],
    )
    assert all(jax.tree.leaves(chex_equal))


def test_int8_forward_close_to_f32(vgg_model_and_vars):
    """End-to-end vgg2016: the int8 forward's stage-6 maps stay close to
    the f32 forward's (first conv + final projections unquantized)."""
    model, variables = vgg_model_and_vars
    qmodel = get_model("vgg2016", dtype=jnp.bfloat16, quantize=True)
    qvars = quantize_variables(variables, qmodel)

    x = jax.random.normal(jax.random.PRNGKey(7), (1, 64, 64, 3))
    (paf, ht), _ = model.apply(variables, x, train=False)
    (qpaf, qht), _ = qmodel.apply(qvars, x, train=False)

    for a, b in ((paf, qpaf), (ht, qht)):
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b, np.float32).ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos > 0.99, cos
        rel = float(np.abs(a - b).max() / (np.abs(a).max() + 1e-12))
        assert rel < 0.2, rel


def test_estimator_int8_mode(vgg_model_and_vars):
    from torch_ekpose_tpu.runtime import PoseEstimator

    _, variables = vgg_model_and_vars
    est = PoseEstimator(
        model_name="vgg2016", variables=variables, compute_dtype="int8",
        dest_size=64,
    )
    # params actually stored int8
    kinds = {
        str(leaf.dtype) for leaf in jax.tree.leaves(est.variables["params"])
    }
    assert "int8" in kinds
    img = np.random.default_rng(3).integers(
        0, 255, (48, 64, 3)
    ).astype(np.uint8)
    humans, im_scale = est.estimate(img)
    assert isinstance(humans, list) and im_scale == 1.0


def test_int8_checkpoint_roundtrip(vgg_model_and_vars, tmp_path):
    """Quantize once, save, serve: an int8 tree saves/loads through the
    native msgpack checkpoint with dtypes and values intact, and the
    estimator accepts the pre-quantized tree without re-quantizing."""
    from torch_ekpose_tpu.runtime import PoseEstimator
    from torch_ekpose_tpu.runtime.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    _, variables = vgg_model_and_vars
    qmodel = get_model("vgg2016", dtype=jnp.bfloat16, quantize=True)
    qvars = quantize_variables(variables, qmodel)

    path = str(tmp_path / "vgg_int8.msgpack")
    save_checkpoint(path, qvars)
    template = jax.tree.map(np.zeros_like, jax.tree.map(np.asarray, qvars))
    restored = load_checkpoint(path, template)
    same = jax.tree.map(
        lambda a, b: bool((np.asarray(a) == np.asarray(b)).all())
        and a.dtype == np.asarray(b).dtype,
        restored["params"], qvars["params"],
    )
    assert all(jax.tree.leaves(same))

    est = PoseEstimator(
        model_name="vgg2016", variables=restored, compute_dtype="int8",
        dest_size=64,
    )
    img = np.full((64, 64, 3), 127, np.uint8)
    humans, _ = est.estimate(img)
    assert isinstance(humans, list)


def test_quantize_rejects_ds_family():
    with pytest.raises(ValueError, match="vgg family"):
        get_model("mobilenetV2_small", quantize=True)
    with pytest.raises(ValueError, match="vgg family"):
        get_model("mobilenetV2_small", quantize="static")


def test_quantize_rejects_s2d_combination():
    """int8 + s2d is an explicit conflict, never a silent drop of one."""
    for quantize in (True, "static"):
        with pytest.raises(ValueError, match="s2d_blocks"):
            get_model("vgg2016", quantize=quantize, s2d_blocks=1)


def test_static_scales_calibrate_to_observed_absmax(vgg_model_and_vars):
    """calibrate_act_scales writes max|input|/127 per quantized conv —
    calibrating on one batch then forwarding that same batch through the
    static model reproduces the dynamic model's output almost exactly
    (the scales are identical up to one float rounding)."""
    from torch_ekpose_tpu.models import calibrate_act_scales

    _, variables = vgg_model_and_vars
    dyn_model = get_model("vgg2016", dtype=jnp.bfloat16, quantize=True)
    static_model = get_model("vgg2016", dtype=jnp.bfloat16, quantize="static")
    qvars = quantize_variables(variables, dyn_model)

    x = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 64, 3))
    svars = calibrate_act_scales(qvars, dyn_model, [x])

    # every quantized conv gained a positive scalar act_scale
    scales = [
        leaf for path, leaf in jax.tree_util.tree_flatten_with_path(
            svars["params"]
        )[0] if "act_scale" in jax.tree_util.keystr(path)
    ]
    assert len(scales) > 50  # vgg2016 quantizes most of its ~80 convs
    assert all(np.asarray(s).shape == () and float(s) > 0 for s in scales)

    (dpaf, dht), _ = dyn_model.apply(qvars, x, train=False)
    (spaf, sht), _ = static_model.apply(svars, x, train=False)
    for a, b in ((dpaf, spaf), (dht, sht)):
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b, np.float32).ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
        assert cos > 0.999, cos


def test_static_forward_close_to_f32(vgg_model_and_vars):
    """End-to-end: the calibrated static-scale int8 forward stays close
    to the f32 forward (same bar as the dynamic mode)."""
    from torch_ekpose_tpu.models import calibrate_act_scales

    model, variables = vgg_model_and_vars
    dyn_model = get_model("vgg2016", dtype=jnp.bfloat16, quantize=True)
    static_model = get_model("vgg2016", dtype=jnp.bfloat16, quantize="static")
    qvars = quantize_variables(variables, dyn_model)

    calib = jax.random.normal(jax.random.PRNGKey(5), (2, 64, 64, 3))
    svars = calibrate_act_scales(qvars, dyn_model, [calib])

    x = calib[:1]
    (paf, ht), _ = model.apply(variables, x, train=False)
    (qpaf, qht), _ = static_model.apply(svars, x, train=False)
    for a, b in ((paf, qpaf), (ht, qht)):
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b, np.float32).ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
        assert cos > 0.99, cos


def test_folded_model_matches_static_model(vgg_model_and_vars):
    """quantize="folded" (the deferred-dequant integer pipeline — a
    measured perf negative result kept opt-in, docs/PERF.md) shares the
    static model's param tree and reproduces its output to quantization
    precision. The only numeric difference: folded edges skip the
    per-conv bf16 materialization, so isolated requantize roundings
    flip by one quantum."""
    from torch_ekpose_tpu.models import calibrate_act_scales

    _, variables = vgg_model_and_vars
    dyn_model = get_model("vgg2016", dtype=jnp.bfloat16, quantize=True)
    static_model = get_model("vgg2016", dtype=jnp.bfloat16, quantize="static")
    folded_model = get_model("vgg2016", dtype=jnp.bfloat16, quantize="folded")
    qvars = quantize_variables(variables, dyn_model)
    calib = jax.random.normal(jax.random.PRNGKey(5), (2, 64, 64, 3))
    svars = calibrate_act_scales(qvars, dyn_model, [calib])

    # identical tree: the same calibrated variables drive both modes
    assert jax.tree.structure(
        jax.eval_shape(
            lambda v: folded_model.apply(v, calib[:1], train=False), svars
        )
    ) == jax.tree.structure(
        jax.eval_shape(
            lambda v: static_model.apply(v, calib[:1], train=False), svars
        )
    )
    x = calib[:1]
    (spaf, sht), _ = static_model.apply(svars, x, train=False)
    (fpaf, fht), _ = folded_model.apply(svars, x, train=False)
    for a, b in ((spaf, fpaf), (sht, fht)):
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b, np.float32).ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
        assert cos > 0.99, cos


def test_estimator_int8_static_auto_calibrates(vgg_model_and_vars):
    """int8_static serving: the estimator calibrates on the first frame,
    swaps in calibrated scales, and keeps serving."""
    from torch_ekpose_tpu.models import has_act_scales
    from torch_ekpose_tpu.runtime import PoseEstimator

    _, variables = vgg_model_and_vars
    est = PoseEstimator(
        model_name="vgg2016", variables=variables,
        compute_dtype="int8_static", dest_size=64,
    )
    assert est._needs_calib
    img = np.random.default_rng(4).integers(
        0, 255, (48, 64, 3)
    ).astype(np.uint8)
    humans, im_scale = est.estimate(img)
    assert isinstance(humans, list) and im_scale == 1.0
    assert not est._needs_calib
    assert has_act_scales(est.variables["params"])
    # a second frame serves through the calibrated compiled program
    humans2, _ = est.estimate(img)
    assert isinstance(humans2, list)


def test_static_tree_loads_into_dynamic_model(vgg_model_and_vars):
    """A calibrated static tree converts back for the dynamic model
    (act_scale leaves dropped) — so one exported int8_static checkpoint
    serves under either --dtype int8 flavor."""
    from torch_ekpose_tpu.models import calibrate_act_scales

    _, variables = vgg_model_and_vars
    dyn_model = get_model("vgg2016", dtype=jnp.bfloat16, quantize=True)
    qvars = quantize_variables(variables, dyn_model)
    svars = calibrate_act_scales(
        qvars, dyn_model,
        [jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 3))],
    )

    back = quantize_variables(svars, dyn_model)
    got = jax.tree.map(lambda x: x.shape, back["params"])
    want = jax.tree.map(lambda x: x.shape, qvars["params"])
    assert jax.tree.structure(got) == jax.tree.structure(want)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 64, 3))
    (paf, _), _ = dyn_model.apply(back, x, train=False)
    assert np.isfinite(np.asarray(paf, np.float32)).all()


def test_calibration_max_reduces_across_batches():
    """Scales are the max |input| over ALL calibration batches, not the
    last one's."""
    import flax.linen as nn

    from torch_ekpose_tpu.models import calibrate_act_scales
    from torch_ekpose_tpu.models.quant import quantize_kernel

    class Wrap(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return QuantConv(4, kernel=3, dtype=jnp.float32, name="conv")(x)

    rng = np.random.default_rng(0)
    q, s = quantize_kernel(rng.normal(size=(3, 3, 2, 4)).astype(np.float32))
    variables = {"params": {"conv": {
        "kernel_q": jnp.asarray(q), "scale": jnp.asarray(s),
        "bias": jnp.zeros((4,), jnp.float32),
    }}}
    small = jnp.full((1, 4, 4, 2), 0.5, jnp.float32)
    big = jnp.full((1, 4, 4, 2), 8.0, jnp.float32)
    model = Wrap()
    for order in ([small, big], [big, small]):
        out = calibrate_act_scales(variables, model, order)
        np.testing.assert_allclose(
            np.asarray(out["params"]["conv"]["act_scale"]), 8.0 / 127.0,
            rtol=1e-6,
        )


def test_calibrate_rejects_non_static_estimator(vgg_model_and_vars):
    from torch_ekpose_tpu.runtime import PoseEstimator

    _, variables = vgg_model_and_vars
    est = PoseEstimator(
        model_name="vgg2016", variables=variables, compute_dtype="int8",
        dest_size=64,
    )
    with pytest.raises(RuntimeError, match="int8_static"):
        est.calibrate([np.zeros((64, 64, 3), np.uint8)])


def test_int8_static_checkpoint_roundtrip(vgg_model_and_vars, tmp_path):
    """Calibrate once offline, save, serve: act_scale leaves survive the
    msgpack roundtrip and the estimator skips re-calibration."""
    from torch_ekpose_tpu.models import calibrate_act_scales
    from torch_ekpose_tpu.runtime import PoseEstimator
    from torch_ekpose_tpu.runtime.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    _, variables = vgg_model_and_vars
    dyn_model = get_model("vgg2016", dtype=jnp.bfloat16, quantize=True)
    qvars = quantize_variables(variables, dyn_model)
    svars = calibrate_act_scales(
        qvars, dyn_model,
        [jax.random.normal(jax.random.PRNGKey(9), (1, 64, 64, 3))],
    )

    path = str(tmp_path / "vgg_int8_static.msgpack")
    save_checkpoint(path, svars)
    template = jax.tree.map(np.zeros_like, jax.tree.map(np.asarray, svars))
    restored = load_checkpoint(path, template)

    est = PoseEstimator(
        model_name="vgg2016", variables=restored,
        compute_dtype="int8_static", dest_size=64,
    )
    assert not est._needs_calib  # calibrated tree detected
    img = np.full((64, 64, 3), 127, np.uint8)
    humans, _ = est.estimate(img)
    assert isinstance(humans, list)


def test_quantize_variables_on_device_tree():
    """Device (jitted-init) trees quantize as one jitted program, no
    host round-trip, same result as the numpy path."""
    _, dev_vars = init_model("vgg2016", input_shape=(1, 32, 32, 3))
    host_vars = {"params": jax.tree.map(np.asarray, dev_vars["params"])}
    qmodel = get_model("vgg2016", dtype=jnp.bfloat16, quantize=True)
    q_dev = quantize_variables(dev_vars, qmodel)
    q_host = quantize_variables(host_vars, qmodel)
    same = jax.tree.map(
        lambda a, b: bool((np.asarray(a) == np.asarray(b)).all()),
        q_dev["params"], q_host["params"],
    )
    assert all(jax.tree.leaves(same))
