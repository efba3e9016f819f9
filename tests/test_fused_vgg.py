"""vgg2016 with fused_blocks: identical param tree, equivalent forward.

The fused-prefix path (models/vgg.py::VGG19Backbone.fused_blocks) must
be a drop-in for the flax conv path: same checkpoint tree, same
numbers. On the CPU backend conv_chain routes to its XLA expression, so
this validates the wiring + parameter plumbing; the kernel itself is
covered by tests/test_pallas_conv.py and certified on real TPU by
scripts/profile_fused_conv.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_ekpose_tpu.models import get_model, init_model


@pytest.mark.parametrize("fused", [1, 2, 3])
def test_param_tree_identical(fused):
    model_std = get_model("vgg2016")
    model_fused = get_model("vgg2016", fused_blocks=fused)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v_std = model_std.init(jax.random.PRNGKey(0), x, train=False)
    v_fused = model_fused.init(jax.random.PRNGKey(0), x, train=False)
    paths_std = {
        "/".join(str(k) for k in p): leaf.shape
        for p, leaf in jax.tree_util.tree_leaves_with_path(v_std)
    }
    paths_fused = {
        "/".join(str(k) for k in p): leaf.shape
        for p, leaf in jax.tree_util.tree_leaves_with_path(v_fused)
    }
    assert paths_std == paths_fused


def test_forward_matches_standard():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    model_std = get_model("vgg2016")
    variables = model_std.init(jax.random.PRNGKey(0), x, train=False)
    (paf_s, ht_s), _ = model_std.apply(variables, x, train=False)
    model_fused = get_model("vgg2016", fused_blocks=2)
    (paf_f, ht_f), _ = model_fused.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(paf_f), np.asarray(paf_s), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ht_f), np.asarray(ht_s), atol=1e-5, rtol=1e-5
    )


def test_fused_rejected_for_ds_family():
    with pytest.raises(ValueError):
        get_model("mobilenet", fused_blocks=2)


def test_quantize_overrides_fused():
    """int8 serving keeps the flax convs (kernel has no quant path)."""
    model = get_model("vgg2016", fused_blocks=0, quantize=True)
    assert model is not None
