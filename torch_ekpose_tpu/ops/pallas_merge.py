"""Pallas TPU kernel: the sequential person-merge loop of the decoder.

The merge (reference lib/pafprocess/pafprocess.cpp:127-185) is inherently
sequential — each accepted limb connection reads the person table built by
the previous ones. As an XLA ``while_loop`` every iteration pays the
scheduler's latency chain across ~30 tiny ops (~11 us/connection on v5e),
which dominates decode on crowded scenes. This kernel runs the whole loop
in one Pallas program with the person table resident in VMEM and the
per-connection scalars in SMEM, so an iteration is a handful of in-register
vector ops.

Semantics are identical to
:func:`torch_ekpose_tpu.decode.device._merge_people` (the XLA fallback,
used on non-TPU backends and as the parity oracle): connections arrive
pre-compacted (valid-first, stable order) and each one either extends a
row, merges two rows, or opens a new row, with the reference's found==1
``!= cid2`` guard and found==2 overlap behavior.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["merge_people_pallas"]


def _merge_kernel(
    pair_ref, p1_ref, p2_ref, cid1_ref, cid2_ref, score_ref, nvalid_ref,
    peak_ref, subset_ref, active_ref, *, cap: int,
):
    f32 = jnp.float32
    lane = jax.lax.broadcasted_iota(jnp.int32, (cap, 20), 1)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)
    # exclusive of row r: ones below the diagonal -> running count via MXU
    tril = (
        jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 0)
        >= jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 1)
    ).astype(f32)

    subset_ref[:, :] = jnp.full((cap, 20), -1.0, f32)
    active_ref[:, :] = jnp.zeros((cap, 1), f32)

    def body(s, n_rows):
        pair = pair_ref[s]
        p1 = p1_ref[s]
        p2 = p2_ref[s]
        cid1 = cid1_ref[s]
        cid2 = cid2_ref[s]
        score = score_ref[s]
        c1f = cid1.astype(f32)
        c2f = cid2.astype(f32)
        sc1 = peak_ref[jnp.clip(cid1, 0, None)]
        sc2 = peak_ref[jnp.clip(cid2, 0, None)]

        subset = subset_ref[:, :]                       # [cap, 20]
        active = active_ref[:, :] > 0.0                 # [cap, 1]
        col1 = (lane == p1).astype(f32)
        col2 = (lane == p2).astype(f32)
        vals1 = jnp.sum(subset * col1, axis=1, keepdims=True)
        vals2 = jnp.sum(subset * col2, axis=1, keepdims=True)
        match = active & ((vals1 == c1f) | (vals2 == c2f))
        match_f = match.astype(f32)
        found = jnp.sum(match_f).astype(jnp.int32)
        cum = jnp.dot(
            tril, match_f, preferred_element_type=f32
        )                                               # inclusive count
        m1 = match & (cum == 1.0)                       # one-hot of row 1
        m2 = match & (cum == 2.0)
        row1 = jnp.sum(subset * m1.astype(f32), axis=0, keepdims=True)
        row2 = jnp.sum(subset * m2.astype(f32), axis=0, keepdims=True)

        lane1 = lane[0:1, :]                            # [1, 20]
        is18 = (lane1 < 18).astype(f32)
        at18 = (lane1 == 18).astype(f32)
        at19 = (lane1 == 19).astype(f32)
        col1r = col1[0:1, :]
        col2r = col2[0:1, :]

        # set_p2: row[p2] = cid2; score += peak2 + conn; count += 1
        p2row = row1 * (1.0 - col2r) + c2f * col2r
        p2row = p2row + at18 * (sc2 + score) + at19
        changed = jnp.sum(row1 * col2r) != c2f
        p2row_guarded = jnp.where(changed, p2row, row1)

        overlap = jnp.any((row1 * is18 > 0.0) & (row2 * is18 > 0.0))
        row2_18 = jnp.sum(row2 * at18)
        row2_19 = jnp.sum(row2 * at19)
        merged = row1 + is18 * (row2 + 1.0)
        merged = merged + at18 * (row2_18 + score) + at19 * row2_19
        f2row = jnp.where(overlap, p2row, merged)

        is_f1 = found == 1
        is_f2 = found == 2
        is_new = found == 0
        can_new = is_new & (pair < 18) & (n_rows < cap)

        fresh = -1.0 * (1.0 - col1r) * (1.0 - col2r) \
            + c1f * col1r + c2f * col2r
        fresh = fresh * (1.0 - at18 - at19) \
            + (sc1 + sc2 + score) * at18 + 2.0 * at19
        slot = jnp.clip(n_rows, 0, cap - 1)

        row1_final = jnp.where(
            is_f1, p2row_guarded, jnp.where(is_f2, f2row, row1)
        )
        write1 = m1 & (is_f1 | is_f2)                   # [cap, 1]
        new_subset = jnp.where(write1, row1_final, subset)
        write_new = (row_idx == slot) & can_new
        new_subset = jnp.where(write_new, fresh, new_subset)
        subset_ref[:, :] = new_subset

        deact2 = m2 & is_f2 & jnp.logical_not(overlap)
        new_active = (active & jnp.logical_not(deact2)) | write_new
        active_ref[:, :] = new_active.astype(f32)
        return n_rows + can_new.astype(jnp.int32)

    jax.lax.fori_loop(0, nvalid_ref[0], body, jnp.asarray(0, jnp.int32))


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def merge_people_pallas(
    pair_flat, p1_flat, p2_flat, cid1_flat, cid2_flat, score_flat, n_valid,
    peak_score_flat, *, cap: int, interpret: bool = False,
):
    """Run the person merge as one Pallas program.

    All connection arrays are [n_slots], pre-compacted valid-first;
    ``n_valid`` bounds the loop. Returns (subset [cap, 20] f32,
    active [cap] bool).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    subset, active = pl.pallas_call(
        functools.partial(_merge_kernel, cap=cap),
        out_shape=(
            jax.ShapeDtypeStruct((cap, 20), jnp.float32),
            jax.ShapeDtypeStruct((cap, 1), jnp.float32),
        ),
        in_specs=[smem] * 8,
        out_specs=(
            pl.BlockSpec((cap, 20), lambda: (0, 0)),
            pl.BlockSpec((cap, 1), lambda: (0, 0)),
        ),
        interpret=interpret,
    )(
        pair_flat.astype(jnp.int32),
        p1_flat.astype(jnp.int32),
        p2_flat.astype(jnp.int32),
        cid1_flat.astype(jnp.int32),
        cid2_flat.astype(jnp.int32),
        score_flat.astype(jnp.float32),
        jnp.asarray(n_valid, jnp.int32).reshape(1),
        peak_score_flat.astype(jnp.float32),
    )
    return subset, active[:, 0] > 0.0
