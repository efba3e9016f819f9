"""Pallas TPU kernel: the sequential person-merge loop of the decoder.

The merge (reference lib/pafprocess/pafprocess.cpp:127-185) is inherently
sequential — each accepted limb connection reads the person table built by
the previous ones. As an XLA ``while_loop`` every iteration pays the
scheduler's latency chain across ~30 tiny ops (~11 us/connection on v5e),
which dominates decode on crowded scenes. This kernel runs the whole loop
in one Pallas program with the person table resident in VMEM and the
per-connection scalars in SMEM, so an iteration is a handful of in-register
vector ops.

The kernel is written over a leading batch axis mapped to the Pallas grid
(one program instance per image), which is what lets the batched decode
path (eval / video / serve) use it directly: ``pallas_call``'s automatic
vmap rule cannot batch SMEM operands, so batching is expressed as an
explicit grid dimension here instead. The single-image entry point is the
B=1 special case of the same kernel.

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

__all__ = ["merge_people_pallas", "merge_people_pallas_batched"]


def _merge_kernel(
    pair_ref, p1_ref, p2_ref, cid1_ref, cid2_ref, score_ref, nvalid_ref,
    peak_ref, subset_ref, active_ref, *, cap: int,
):
    # every ref carries a leading block dim of 1 (one grid step == one
    # image); scalars live in SMEM, the person table in VMEM
    f32 = jnp.float32
    lane = jax.lax.broadcasted_iota(jnp.int32, (cap, 20), 1)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)
    # exclusive of row r: ones below the diagonal -> running count via MXU
    tril = (
        jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 0)
        >= jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 1)
    ).astype(f32)

    subset_ref[0, :, :] = jnp.full((cap, 20), -1.0, f32)
    active_ref[0, :, :] = jnp.zeros((cap, 1), f32)

    def body(s, n_rows):
        pair = pair_ref[0, 0, s]
        p1 = p1_ref[0, 0, s]
        p2 = p2_ref[0, 0, s]
        cid1 = cid1_ref[0, 0, s]
        cid2 = cid2_ref[0, 0, s]
        score = score_ref[0, 0, s]
        c1f = cid1.astype(f32)
        c2f = cid2.astype(f32)
        sc1 = peak_ref[0, 0, jnp.clip(cid1, 0, None)]
        sc2 = peak_ref[0, 0, jnp.clip(cid2, 0, None)]

        subset = subset_ref[0, :, :]                    # [cap, 20]
        active = active_ref[0, :, :] > 0.0              # [cap, 1]
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
        subset_ref[0, :, :] = new_subset

        deact2 = m2 & is_f2 & jnp.logical_not(overlap)
        new_active = (active & jnp.logical_not(deact2)) | write_new
        active_ref[0, :, :] = new_active.astype(f32)
        return n_rows + can_new.astype(jnp.int32)

    jax.lax.fori_loop(0, nvalid_ref[0, 0, 0], body, jnp.asarray(0, jnp.int32))


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def merge_people_pallas_batched(
    pair_flat, p1_flat, p2_flat, cid1_flat, cid2_flat, score_flat, n_valid,
    peak_score_flat, *, cap: int, interpret: bool = False,
):
    """Run the person merge for a whole batch, one grid step per image.

    Connection arrays are [B, n_slots], pre-compacted valid-first;
    ``n_valid`` [B] bounds each image's loop (so empty frames cost one
    no-iteration program). ``peak_score_flat`` is [B, 18*K]. Returns
    (subset [B, cap, 20] f32, active [B, cap] bool).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n = pair_flat.shape
    m = peak_score_flat.shape[1]

    def smem(width):
        # Mosaic requires the last two block dims to match the array's,
        # so the scalar arrays carry a singleton middle axis: [B, 1, n]
        # blocked as (1, 1, n)
        return pl.BlockSpec(
            (1, 1, width), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
        )

    subset, active = pl.pallas_call(
        functools.partial(_merge_kernel, cap=cap),
        grid=(b,),
        out_shape=(
            jax.ShapeDtypeStruct((b, cap, 20), jnp.float32),
            jax.ShapeDtypeStruct((b, cap, 1), jnp.float32),
        ),
        in_specs=[smem(n)] * 6 + [smem(1), smem(m)],
        out_specs=(
            pl.BlockSpec((1, cap, 20), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, cap, 1), lambda i: (i, 0, 0)),
        ),
        interpret=interpret,
    )(
        pair_flat.astype(jnp.int32)[:, None],
        p1_flat.astype(jnp.int32)[:, None],
        p2_flat.astype(jnp.int32)[:, None],
        cid1_flat.astype(jnp.int32)[:, None],
        cid2_flat.astype(jnp.int32)[:, None],
        score_flat.astype(jnp.float32)[:, None],
        jnp.asarray(n_valid, jnp.int32).reshape(b, 1, 1),
        peak_score_flat.astype(jnp.float32)[:, None],
    )
    return subset, active[:, :, 0] > 0.0


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def merge_people_pallas(
    pair_flat, p1_flat, p2_flat, cid1_flat, cid2_flat, score_flat, n_valid,
    peak_score_flat, *, cap: int, interpret: bool = False,
):
    """Single-image person merge: the B=1 case of the batched kernel.

    All connection arrays are [n_slots], pre-compacted valid-first;
    ``n_valid`` bounds the loop. Returns (subset [cap, 20] f32,
    active [cap] bool).
    """
    subset, active = merge_people_pallas_batched(
        pair_flat[None], p1_flat[None], p2_flat[None], cid1_flat[None],
        cid2_flat[None], score_flat[None],
        jnp.asarray(n_valid, jnp.int32).reshape(1),
        peak_score_flat[None], cap=cap, interpret=interpret,
    )
    return subset[0], active[0]
