"""Model shape/contract tests for all eight factory variants.

Output contract pinned from reference lib/network/vgg2016.py:79-105:
((paf6, ht6), [paf1, ht1, ..., paf6, ht6]) with 38/19 channels at stride 8.

Shape contracts for all eight variants are checked with ``jax.eval_shape``
(no compilation — this host may have a single CPU core); real numerics are
exercised for the flagship vgg2016 and one BN-using variant.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_ekpose_tpu.models import MODEL_REGISTRY, get_model, init_model

SMALL = (1, 64, 64, 3)  # stride 8 -> 8x8 maps; keeps CPU tests quick


@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
def test_forward_contract_shapes(name):
    model = get_model(name)
    x = jax.ShapeDtypeStruct(SMALL, jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = jax.eval_shape(
        functools.partial(model.init, train=False), rng, x
    )
    (paf, ht), saved = jax.eval_shape(
        functools.partial(model.apply, train=False), variables, x
    )
    assert len(saved) == 12
    assert paf.shape == (1, 8, 8, 38)
    assert ht.shape == (1, 8, 8, 19)
    for i in range(0, 12, 2):
        assert saved[i].shape == (1, 8, 8, 38)
        assert saved[i + 1].shape == (1, 8, 8, 19)
    # params stay fp32 regardless of compute dtype
    leaves = jax.tree.leaves(variables["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)


def test_vgg_forward_numerics(vgg_model_and_vars):
    model, variables = vgg_model_and_vars
    fwd = jax.jit(functools.partial(model.apply, train=False))
    x = jnp.zeros(SMALL, jnp.float32)
    (paf, ht), saved = fwd(variables, x)
    assert np.all(np.isfinite(np.asarray(paf)))
    assert np.all(np.isfinite(np.asarray(ht)))
    # last stage outputs are aliases of the tuple outputs
    np.testing.assert_array_equal(np.asarray(saved[-2]), np.asarray(paf))
    np.testing.assert_array_equal(np.asarray(saved[-1]), np.asarray(ht))


def test_mobilenet_forward_numerics():
    model, variables = init_model("mobilenet_thin", input_shape=SMALL)
    assert "batch_stats" in variables
    fwd = jax.jit(functools.partial(model.apply, train=False))
    (paf, ht), _ = fwd(variables, jnp.ones(SMALL, jnp.float32))
    assert paf.shape == (1, 8, 8, 38)
    assert np.all(np.isfinite(np.asarray(ht)))


def test_vgg_param_count_matches_reference():
    # Computed analytically from the torch layer plan
    # (reference lib/network/vgg2016.py): VGG19 features[:23] + 2 extra
    # convs + stage1 branches + 5 refinement stages x 2 branches.
    model = get_model("vgg2016")
    variables = jax.eval_shape(
        functools.partial(model.init, train=False),
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct(SMALL, jnp.float32),
    )
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))

    def conv(cin, cout, k):
        return cin * cout * k * k + cout

    expected = 0
    # backbone: vgg19 features[:23]
    plan = [(3, 64), (64, 64), (64, 128), (128, 128),
            (128, 256), (256, 256), (256, 256), (256, 256),
            (256, 512), (512, 512)]
    for cin, cout in plan:
        expected += conv(cin, cout, 3)
    expected += conv(512, 256, 3) + conv(256, 128, 3)
    # stage 1 branches
    for out in (38, 19):
        expected += conv(128, 128, 3) * 3 + conv(128, 512, 1) + conv(512, out, 1)
    # stages 2-6 branches
    for _ in range(5):
        for out in (38, 19):
            expected += (
                conv(185, 128, 7) + conv(128, 128, 7) * 4
                + conv(128, 128, 1) + conv(128, out, 1)
            )
    assert n == expected


def test_vgg_has_no_batch_stats_but_mobilenet_does():
    def shapes(name):
        model = get_model(name)
        return jax.eval_shape(
            functools.partial(model.init, train=False),
            jax.random.PRNGKey(0),
            jax.ShapeDtypeStruct(SMALL, jnp.float32),
        )

    assert "batch_stats" not in shapes("vgg2016")
    assert "batch_stats" in shapes("mobilenet")


def test_bfloat16_compute_dtype():
    model = get_model("vgg2016", dtype=jnp.bfloat16)
    variables = jax.eval_shape(
        functools.partial(model.init, train=False),
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct(SMALL, jnp.bfloat16),
    )
    (paf, _), _ = jax.eval_shape(
        functools.partial(model.apply, train=False),
        variables,
        jax.ShapeDtypeStruct(SMALL, jnp.bfloat16),
    )
    assert paf.dtype == jnp.bfloat16
    leaf = jax.tree.leaves(variables["params"])[0]
    assert leaf.dtype == jnp.float32


def test_unknown_name_raises():
    with pytest.raises(KeyError):
        get_model("vgg2017")


def test_cast_params_host_and_device_leaves():
    """cast_params casts floating params to the target dtype on both host
    (numpy) and device pytrees, leaves non-float leaves and non-params
    collections untouched, and the two paths agree."""
    from torch_ekpose_tpu.models import cast_params

    host = {
        "params": {
            "conv": {"kernel": np.ones((3, 3, 4, 8), np.float32)},
            "idx": np.arange(4, dtype=np.int32),
        },
        "batch_stats": {"mean": np.zeros(8, np.float32)},
    }
    out_h = cast_params(host, jnp.bfloat16)
    assert out_h["params"]["conv"]["kernel"].dtype == jnp.bfloat16
    assert isinstance(out_h["params"]["conv"]["kernel"], np.ndarray)
    assert out_h["params"]["idx"].dtype == np.int32
    assert out_h["batch_stats"]["mean"].dtype == np.float32

    dev = jax.tree.map(jnp.asarray, host)
    out_d = cast_params(dev, jnp.bfloat16)
    assert out_d["params"]["conv"]["kernel"].dtype == jnp.bfloat16
    assert out_d["params"]["idx"].dtype == jnp.int32
    assert out_d["batch_stats"]["mean"].dtype == jnp.float32
    np.testing.assert_array_equal(
        np.asarray(out_d["params"]["conv"]["kernel"], np.float32),
        np.asarray(out_h["params"]["conv"]["kernel"], np.float32),
    )
