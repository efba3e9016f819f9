"""Pallas TPU kernel: fused 4-neighbor local-max masking for peak NMS.

Stage 1 of the on-device decoder (see
:func:`torch_ekpose_tpu.decode.device._find_topk_peaks`) needs, per part
channel, the map with non-peak positions masked to -inf:

    out[y, x] = m[y, x]  if m[y, x] >= max(4-neighbors) and m[y, x] > t
                -inf     otherwise

(the local-max + threshold test of reference lib/utils/paf_to_pose.py:34-36).
This kernel computes it in a single VMEM pass per channel: the [H, W] map
is the block, neighbor maxes are built with static shifts, and the masked
select happens in-register — one HBM read and one write per element, no
intermediate pad/shift buffers.

Falls back transparently to the XLA expression on non-TPU backends (or via
``interpret=True`` in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["masked_peak_scores", "masked_peak_scores_xla"]

_NEG = float("-inf")


def _nms_kernel(m_ref, out_ref, *, thresh: float):
    m = m_ref[0, :, :]                             # [H, W] in VMEM
    h, w = m.shape
    neg_row = jnp.full((1, w), _NEG, m.dtype)
    neg_col = jnp.full((h, 1), _NEG, m.dtype)
    up = jnp.concatenate([neg_row, m[:-1, :]], axis=0)
    down = jnp.concatenate([m[1:, :], neg_row], axis=0)
    left = jnp.concatenate([neg_col, m[:, :-1]], axis=1)
    right = jnp.concatenate([m[:, 1:], neg_col], axis=1)
    neigh = jnp.maximum(jnp.maximum(up, down), jnp.maximum(left, right))
    is_peak = (m >= neigh) & (m > thresh)
    out_ref[0, :, :] = jnp.where(is_peak, m, _NEG)


def masked_peak_scores_xla(maps: jax.Array, thresh: float) -> jax.Array:
    """Reference XLA expression: [C, H, W] -> [C, H, W] masked scores."""
    neg = jnp.asarray(_NEG, maps.dtype)
    padded = jnp.pad(maps, ((0, 0), (1, 1), (1, 1)), constant_values=neg)
    neigh = jnp.maximum(
        jnp.maximum(padded[:, :-2, 1:-1], padded[:, 2:, 1:-1]),
        jnp.maximum(padded[:, 1:-1, :-2], padded[:, 1:-1, 2:]),
    )
    is_peak = (maps >= neigh) & (maps > thresh)
    return jnp.where(is_peak, maps, neg)


@functools.partial(jax.jit, static_argnames=("thresh", "interpret"))
def masked_peak_scores(
    maps: jax.Array, thresh: float, interpret: bool = False
) -> jax.Array:
    """[C, H, W] float32 part maps -> masked peak scores, Pallas on TPU.

    Non-TPU backends use the XLA expression (Pallas TPU kernels do not
    lower there outside interpret mode).
    """
    if not interpret and jax.default_backend() != "tpu":
        return masked_peak_scores_xla(maps, thresh)

    from jax.experimental import pallas as pl

    c, h, w = maps.shape
    return pl.pallas_call(
        functools.partial(_nms_kernel, thresh=thresh),
        out_shape=jax.ShapeDtypeStruct((c, h, w), maps.dtype),
        grid=(c,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(maps)
