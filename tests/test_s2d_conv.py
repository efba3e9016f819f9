"""Space-to-depth conv chain (ops/s2d_conv.py) vs the plain XLA chain.

The s2d decomposition must be EXACT (same function, different schedule):
pure XLA ops, so the parity kernels, border padding, chained repacking,
and parity-max pooling are all fully testable on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_ekpose_tpu.ops.pallas_conv import conv_chain_xla
from torch_ekpose_tpu.ops.s2d_conv import (
    depth_to_space,
    s2d_conv_chain,
    space_to_depth,
)


def _params(rng, chain):
    return [
        (
            jnp.asarray(rng.standard_normal((3, 3, ci, co)), jnp.float32)
            * 0.2,
            jnp.asarray(rng.standard_normal((co,)), jnp.float32) * 0.1,
        )
        for ci, co in chain
    ]


def test_s2d_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 6, 5)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x)
    )


@pytest.mark.parametrize(
    "h,w,chain,pool",
    [
        (16, 12, [(3, 8), (8, 8)], True),      # block1-like
        (10, 8, [(4, 8)], False),              # single conv, d2s output
        (12, 16, [(8, 16), (16, 16)], False),  # widening, full-res out
        (8, 8, [(8, 8), (8, 8), (8, 8)], True),  # 3-deep chain + pool
    ],
)
def test_matches_plain_chain(rng, h, w, chain, pool):
    x = jnp.asarray(
        rng.standard_normal((2, h, w, chain[0][0])), jnp.float32
    )
    params = _params(rng, chain)
    ref = conv_chain_xla(x, params, pool)
    out = s2d_conv_chain(x, params, pool=pool)
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


def test_border_semantics(rng):
    """Large bias: any halo/padding mistake shows up loudly at borders."""
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 4, 8)), jnp.float32)
    b1 = jnp.full((8,), 50.0, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 8, 8)), jnp.float32)
    b2 = jnp.zeros((8,), jnp.float32)
    params = [(w1, b1), (w2, b2)]
    ref = conv_chain_xla(x, params, pool=False)
    out = s2d_conv_chain(x, params, pool=False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-5
    )


def test_odd_size_rejected(rng):
    x = jnp.zeros((1, 7, 8, 3), jnp.float32)
    with pytest.raises(ValueError):
        s2d_conv_chain(x, _params(rng, [(3, 8)]))


def test_bfloat16(rng):
    x32 = jnp.asarray(rng.standard_normal((1, 12, 8, 3)), jnp.float32)
    params = _params(rng, [(3, 8), (8, 8)])
    ref = conv_chain_xla(x32, params, pool=True)
    out = s2d_conv_chain(x32.astype(jnp.bfloat16), params, pool=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=0.35, rtol=0.05
    )
