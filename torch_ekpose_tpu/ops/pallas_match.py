"""Pallas TPU kernel: greedy 1:1 limb matching for all 19 pairs at once.

Equivalent of the vmapped XLA while_loop in
:func:`torch_ekpose_tpu.decode.device._greedy_match_one` (reference
pafprocess.cpp:96-124: process candidates best-first, accept a pair iff
both peaks are unused — identical to repeated masked argmax for distinct
scores). One program holds all 19 [K, K] score matrices in VMEM and runs
K lock-step rounds of per-limb masked argmax; every op is [19, K]-shaped
vector work, so the whole match costs a few tens of microseconds instead
of an XLA loop's per-iteration scheduling overhead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["greedy_match_pallas"]

_NEG = float("-inf")
_BIG = 2**30


def _argmax_last(vals, iota):
    """(first) argmax along the last axis via the max+iota-min trick
    (Mosaic-safe; ties resolve to the lowest index, matching jnp.argmax)."""
    m = jnp.max(vals, axis=-1, keepdims=True)
    cand = jnp.where(vals == m, iota, _BIG)
    return jnp.min(cand, axis=-1)


def _match_kernel(score_ref, ia_ref, ib_ref, s_ref, v_ref, *, k: int):
    f32 = jnp.float32
    scores = score_ref[:, :, :]                      # [19, K, K]
    iota_k1 = jax.lax.broadcasted_iota(jnp.int32, (19, k), 1)
    lane19k = iota_k1

    def body(t, carry):
        used_a, used_b = carry                       # [19, K] f32 0/1
        masked = jnp.where(
            (used_a[:, :, None] > 0) | (used_b[:, None, :] > 0),
            _NEG, scores,
        )
        row_max = jnp.max(masked, axis=2)            # [19, K]
        val = jnp.max(row_max, axis=1)               # [19]
        ia = _argmax_last(row_max, iota_k1)          # [19]
        # row = masked[l, ia[l], :] via one-hot row select over axis 1
        oh_a = (iota_k1 == ia[:, None]).astype(f32)  # [19, K]
        row = jnp.max(
            jnp.where(oh_a[:, :, None] > 0, masked, _NEG), axis=1
        )                                            # [19, K]
        ib = _argmax_last(row, lane19k)              # [19]
        accept = val > _NEG                          # [19]

        oh_b = (lane19k == ib[:, None]).astype(f32)
        acc_f = accept.astype(f32)[:, None]
        used_a = jnp.maximum(used_a, oh_a * acc_f)
        used_b = jnp.maximum(used_b, oh_b * acc_f)

        slot = lane19k == t
        ia_ref[:, :] = jnp.where(
            slot, jnp.where(accept, ia, -1)[:, None], ia_ref[:, :]
        )
        ib_ref[:, :] = jnp.where(
            slot, jnp.where(accept, ib, -1)[:, None], ib_ref[:, :]
        )
        s_ref[:, :] = jnp.where(
            slot, jnp.where(accept, val, 0.0)[:, None], s_ref[:, :]
        )
        v_ref[:, :] = jnp.where(
            slot, acc_f, v_ref[:, :]
        )
        return used_a, used_b

    ia_ref[:, :] = jnp.full((19, k), -1, jnp.int32)
    ib_ref[:, :] = jnp.full((19, k), -1, jnp.int32)
    s_ref[:, :] = jnp.zeros((19, k), f32)
    v_ref[:, :] = jnp.zeros((19, k), f32)
    jax.lax.fori_loop(
        0, k, body,
        (jnp.zeros((19, k), f32), jnp.zeros((19, k), f32)),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def greedy_match_pallas(limb_scores, interpret: bool = False):
    """[19, K, K] masked candidate scores (-inf = invalid) ->
    (ia, ib, score, valid), each [19, K], in reference acceptance order."""
    from jax.experimental import pallas as pl

    _, k, _ = limb_scores.shape
    full = lambda: (0, 0)
    ia, ib, s, v = pl.pallas_call(
        functools.partial(_match_kernel, k=k),
        out_shape=(
            jax.ShapeDtypeStruct((19, k), jnp.int32),
            jax.ShapeDtypeStruct((19, k), jnp.int32),
            jax.ShapeDtypeStruct((19, k), jnp.float32),
            jax.ShapeDtypeStruct((19, k), jnp.float32),
        ),
        out_specs=(
            pl.BlockSpec((19, k), full),
            pl.BlockSpec((19, k), full),
            pl.BlockSpec((19, k), full),
            pl.BlockSpec((19, k), full),
        ),
        interpret=interpret,
    )(limb_scores.astype(jnp.float32))
    return ia, ib, s, v > 0.0
