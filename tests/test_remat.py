"""--remat (gradient rematerialization) parity.

``get_model(name, remat=True)`` wraps the backbone and each CPM branch
in ``jax.checkpoint`` (models/factory.py) to trade recompute FLOPs for
activation memory — the TPU-native answer to the reference's
fits-in-VRAM assumption (reference train.py:341-393 holds every stage's
activations live). Rematerialization must be invisible to training
numerics: the parameter tree is identical, and one optimizer step
produces bitwise-identical parameters (and batch_stats for BN models)
because the backward pass re-executes the *same* forward computation.

These pins protect the claim against flax/jax upgrades silently
changing ``nn.remat``'s static_argnums or mutable-collection handling.
"""

import numpy as np
import pytest

import jax
import optax

from torch_ekpose_tpu.models import get_model, init_model
from torch_ekpose_tpu.training import create_train_state, make_train_step

S = 64            # square size -> 8x8 stride-8 grids
GRID = (8, 8)


def _batch(n=2, seed=7, people=2):
    rng = np.random.default_rng(seed)
    images = rng.normal(0, 1, (n, S, S, 3)).astype(np.float32)
    kpts = np.zeros((n, people, 18, 3), dtype=np.float32)
    kpts[:, 0, :, 0] = rng.uniform(10, 54, (n, 18))
    kpts[:, 0, :, 1] = rng.uniform(10, 54, (n, 18))
    kpts[:, 0, :, 2] = 2
    return images, kpts


def _one_step(model, variables):
    state = create_train_state(model, variables, optax.sgd(1e-3))
    step = make_train_step(model, targets="device", grid=GRID)
    images, kpts = _batch()
    state, logs = step(state, images, kpts)
    return (
        float(logs["Loss"]),
        jax.tree.map(np.asarray, state.params),
        jax.tree.map(np.asarray, state.batch_stats),
    )


@pytest.mark.parametrize("name", ["vgg2016", "mobilenet"])
def test_remat_step_bitwise_identical(name):
    """One SGD step with and without remat=True: identical param tree
    structure, bitwise-equal loss, params, and batch_stats (mobilenet
    covers the BN/mutable-collection path through nn.remat)."""
    plain, variables = init_model(name, input_shape=(1, S, S, 3))
    remat = get_model(name, remat=True)

    loss_p, params_p, stats_p = _one_step(plain, variables)
    loss_r, params_r, stats_r = _one_step(remat, variables)

    assert loss_p == loss_r
    tp, tr = jax.tree.structure(params_p), jax.tree.structure(params_r)
    assert tp == tr, "remat changed the parameter tree"
    for a, b in zip(jax.tree.leaves(params_p), jax.tree.leaves(params_r)):
        np.testing.assert_array_equal(a, b)
    assert jax.tree.structure(stats_p) == jax.tree.structure(stats_r)
    for a, b in zip(jax.tree.leaves(stats_p), jax.tree.leaves(stats_r)):
        np.testing.assert_array_equal(a, b)
    if name == "mobilenet":
        assert jax.tree.leaves(stats_p), "BN fixture lost its batch stats"


def test_remat_rejected_for_int8():
    with pytest.raises(ValueError):
        get_model("vgg2016", quantize=True, remat=True)
