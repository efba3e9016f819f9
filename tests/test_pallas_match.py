"""Pallas greedy-match kernel (interpret mode) vs the XLA while_loop."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torch_ekpose_tpu.decode import device as D
from torch_ekpose_tpu.ops.pallas_match import greedy_match_pallas

K = 16


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("density", [0.0, 0.1, 0.6])
def test_pallas_match_matches_xla(seed, density):
    rng = np.random.default_rng(seed)
    scores = rng.uniform(0.05, 3.0, (19, K, K)).astype(np.float32)
    valid = rng.random((19, K, K)) < density
    scores = np.where(valid, scores, -np.inf).astype(np.float32)

    ia_x, ib_x, s_x, v_x = jax.vmap(
        functools.partial(D._greedy_match_one, k=K)
    )(jnp.asarray(scores))
    ia_p, ib_p, s_p, v_p = greedy_match_pallas(
        jnp.asarray(scores), interpret=True
    )

    np.testing.assert_array_equal(np.asarray(v_p), np.asarray(v_x))
    # unfilled slots after the XLA loop's early exit hold the same
    # sentinel values the kernel writes (-1 / 0 / False)
    np.testing.assert_array_equal(np.asarray(ia_p), np.asarray(ia_x))
    np.testing.assert_array_equal(np.asarray(ib_p), np.asarray(ib_x))
    np.testing.assert_array_equal(np.asarray(s_p), np.asarray(s_x))
