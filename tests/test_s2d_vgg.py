"""vgg2016 with s2d_blocks: identical param tree, equivalent forward.

The space-to-depth prefix (models/vgg.py::VGG19Backbone.s2d_blocks)
must be a drop-in for the flax conv path: same checkpoint tree, same
numbers. The decomposition is pure XLA and exact on every backend
(tests/test_s2d_conv.py covers the op; scripts/profile_s2d.py A/Bs it
on real TPU — block 1 measures ~19% faster on v5e).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_ekpose_tpu.models import get_model, init_model


@pytest.mark.parametrize("n", [1, 2, 3])
def test_param_tree_identical(n):
    model_std = get_model("vgg2016")
    model_s2d = get_model("vgg2016", s2d_blocks=n)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v_std = model_std.init(jax.random.PRNGKey(0), x, train=False)
    v_s2d = model_s2d.init(jax.random.PRNGKey(0), x, train=False)
    paths_std = {
        "/".join(str(k) for k in p): leaf.shape
        for p, leaf in jax.tree_util.tree_leaves_with_path(v_std)
    }
    paths_s2d = {
        "/".join(str(k) for k in p): leaf.shape
        for p, leaf in jax.tree_util.tree_leaves_with_path(v_s2d)
    }
    assert paths_std == paths_s2d


def test_forward_matches_standard():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    model_std = get_model("vgg2016")
    variables = model_std.init(jax.random.PRNGKey(0), x, train=False)
    (paf_s, ht_s), _ = model_std.apply(variables, x, train=False)
    model_s2d = get_model("vgg2016", s2d_blocks=2)
    (paf_f, ht_f), _ = model_s2d.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(paf_f), np.asarray(paf_s), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ht_f), np.asarray(ht_s), atol=1e-5, rtol=1e-5
    )


def test_s2d_rejected_for_ds_family():
    with pytest.raises(ValueError):
        get_model("mobilenet", s2d_blocks=2)


def test_quantize_overrides_s2d():
    """int8 serving keeps the flax convs (the rearranged s2d kernels
    would need their own quantization scales)."""
    model = get_model("vgg2016", s2d_blocks=0, quantize=True)
    assert model is not None
