"""Fused conv-chain kernel (ops/pallas_conv.py) vs the unfused XLA chain.

The kernel must reproduce the unfused flax path exactly (up to dtype
rounding), including the subtle border semantics: a chained SAME conv
zero-pads its input at IMAGE borders, so the fused kernel has to mask
each intermediate's halo outside the true image extent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_ekpose_tpu.ops.pallas_conv import conv_chain, conv_chain_xla


def _params(rng, chain):
    out = []
    for ci, co in chain:
        out.append((
            jnp.asarray(rng.standard_normal((3, 3, ci, co)), jnp.float32)
            * 0.2,
            jnp.asarray(rng.standard_normal((co,)), jnp.float32) * 0.1,
        ))
    return out


@pytest.mark.parametrize(
    "h,w,chain,pool",
    [
        (36, 24, [(3, 16), (16, 16)], True),    # block1-like, ragged tiles
        (20, 16, [(8, 8)], False),              # single conv
        (34, 20, [(4, 8), (8, 8)], False),      # H not a tile multiple
        (32, 24, [(16, 24), (24, 32)], True),   # widening chain + pool
        (16, 16, [(8, 8), (8, 8), (8, 8)], False),  # 3-deep chain
    ],
)
def test_matches_xla_chain(rng, h, w, chain, pool):
    x = jnp.asarray(rng.standard_normal((2, h, w, chain[0][0])), jnp.float32)
    params = _params(rng, chain)
    ref = conv_chain_xla(x, params, pool)
    out = conv_chain(x, params, pool=pool, row_tile=8, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_border_zero_padding_semantics(rng):
    """The halo outside the image must act as ZEROS for the next conv.

    Use a large bias so relu(bias) at the border would be far from zero
    if the kernel leaked conv-of-padding values into the chained halo.
    """
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 4, 8)), jnp.float32)
    b1 = jnp.full((8,), 50.0, jnp.float32)  # relu(b1) = 50 outside image
    w2 = jnp.asarray(rng.standard_normal((3, 3, 8, 8)), jnp.float32)
    b2 = jnp.zeros((8,), jnp.float32)
    params = [(w1, b1), (w2, b2)]
    ref = conv_chain_xla(x, params, pool=False)
    out = conv_chain(x, params, pool=False, row_tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-5)


def test_bfloat16_close_to_f32(rng):
    x32 = jnp.asarray(rng.standard_normal((1, 24, 16, 3)), jnp.float32)
    params = _params(rng, [(3, 16), (16, 16)])
    ref = conv_chain_xla(x32, params, pool=True)
    out = conv_chain(
        x32.astype(jnp.bfloat16), params, pool=True, row_tile=8,
        interpret=True,
    )
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=0.35, rtol=0.05
    )


def test_xla_fallback_off_tpu(rng):
    """On the CPU backend (no interpret), conv_chain routes to XLA."""
    x = jnp.asarray(rng.standard_normal((1, 12, 12, 3)), jnp.float32)
    params = _params(rng, [(3, 8)])
    out = conv_chain(x, params, pool=False)
    ref = conv_chain_xla(x, params, pool=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))
