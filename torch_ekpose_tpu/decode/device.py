"""Fully on-device (JAX/XLA) pose decoder with static shapes.

This replaces the reference's decode pipeline — host-side scipy/cv2 NMS
(reference lib/utils/paf_to_pose.py:60-133) + a x8 materialized upsample
(:356-359) + the sequential C++ assembler (lib/pafprocess/pafprocess.cpp:
22-194) — with one jitted XLA program, so streaming inference never leaves
the TPU between the conv forward pass and the final person rows.

Fixed-capacity design (XLA needs static shapes):

- top-``max_peaks`` peaks per part, score-masked;
- 5x5 peak patches extracted and bicubic-upsampled x8 with exact one-hot
  MXU contractions (no TPU gathers, no cv2);
- all-pairs PAF line integrals for all 19 limbs at once, with the sampling
  factorized into one-hot row/column contractions on the MXU;
- greedy matching (reference's sort-then-scan == repeated masked argmax
  for distinct scores) and the sequential person merge run as single
  Pallas kernels on TPU (``ops/pallas_match.py`` / ``ops/pallas_merge.py``)
  with XLA while_loop fallbacks used off-TPU and under vmap; both preserve
  the reference's row ordering semantics (new rows append; merged rows
  deactivate in place).

Known, documented divergences from the host oracle (both harmless for AP):

- peaks within 2 cells of the map border refine against an edge-replicated
  5x5 patch instead of the reference's clipped smaller patch;
- exact score ties may match/merge in a different order (the reference
  inherits arbitrary tie order from ``std::sort``);
- scores accumulate in float32 (the oracle uses float64), so a refined
  coordinate that lands within ~1e-4 of an integer can truncate to the
  neighboring pixel (~1 part per several hundred decoded parts).
"""

from __future__ import annotations

import functools
import warnings
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from torch_ekpose_tpu import constants
from torch_ekpose_tpu.config import Config, cfg as default_cfg
from torch_ekpose_tpu.ops.resize import resize_matrix
from torch_ekpose_tpu.utils.human import BodyPart, Human

__all__ = [
    "DecodeResult", "build_decoder", "build_packed_decoder",
    "cap_saturation", "decode_jax", "decode_jax_batched", "pack_result",
    "packed_to_humans", "paf_to_pose_jax", "unpack_result",
]

_WIN = 2            # refinement patch half-width -> 5x5 patches
_PATCH = 2 * _WIN + 1


class DecodeResult(NamedTuple):
    """Fixed-shape decode output for one image.

    peak_xy      [18*K, 2] int32   truncated refined coords (upsampled frame)
    peak_score   [18*K]    float32
    peak_valid   [18*K]    bool
    subset       [CAP, 20] float32 person rows (cids are flat peak indices)
    person_valid [CAP]     bool
    """

    peak_xy: jax.Array
    peak_score: jax.Array
    peak_valid: jax.Array
    subset: jax.Array
    person_valid: jax.Array


# ---------------------------------------------------------------------------
# stage 1: peak finding + sub-pixel refinement
# ---------------------------------------------------------------------------

def _find_topk_peaks(
    heatmaps: jax.Array, thresh: float, k: int, use_pallas: bool = True
):
    """[H, W, 18] -> (px, py, score, valid), each [18, K].

    A peak is a 4-neighborhood local max above ``thresh``
    (reference paf_to_pose.py:34-36). Selection is top-k by score.
    ``use_pallas=False`` forces the XLA expression — required when the
    program will be partitioned over a mesh (no shardings for Pallas
    custom calls) or compiled for non-default-backend devices.
    """
    from torch_ekpose_tpu.ops.pallas_nms import (
        masked_peak_scores,
        masked_peak_scores_xla,
    )

    h, w, _ = heatmaps.shape
    m = jnp.transpose(heatmaps, (2, 0, 1))                # [18, H, W]
    nms = masked_peak_scores if use_pallas else masked_peak_scores_xla
    masked = nms(m, thresh).reshape(18, h * w)
    score, idx = jax.lax.top_k(masked, k)                 # [18, K]
    py, px = idx // w, idx % w
    valid = score > -jnp.inf
    return px, py, jnp.where(valid, score, 0.0), valid


def _refine_peaks(heatmaps: jax.Array, px, py, upsamp: int):
    """Sub-pixel refinement (reference paf_to_pose.py:94-131) for [18, K]
    peak grids. Returns float (x, y, score) in the upsampled frame."""
    h, w, _ = heatmaps.shape
    up_mat = jnp.asarray(resize_matrix(_PATCH, _PATCH * upsamp, "cubic"))

    # patch extraction as two one-hot contractions (exact; avoids the slow
    # TPU gather path — same trick as the PAF sampling in _score_all_limbs)
    hi = jax.lax.Precision.HIGHEST
    offs = jnp.arange(-_WIN, _WIN + 1)
    gy = jnp.clip(py[..., None] + offs[None, None, :], 0, h - 1)  # [18,K,5]
    gx = jnp.clip(px[..., None] + offs[None, None, :], 0, w - 1)
    hm_t = jnp.transpose(heatmaps, (2, 0, 1))             # [18, H, W]
    oh_y = (jnp.arange(h)[None, None, None] == gy[..., None]).astype(
        heatmaps.dtype
    )                                                     # [18, K, 5, H]
    rows = jnp.einsum("jkrh,jhw->jkrw", oh_y, hm_t, precision=hi)
    oh_x = (jnp.arange(w)[None, None, None] == gx[..., None]).astype(
        heatmaps.dtype
    )                                                     # [18, K, 5, W]
    patch = jnp.einsum("jkrw,jkcw->jkrc", rows, oh_x, precision=hi)

    # HIGHEST precision: TPU matmuls default to bf16 inputs, which would
    # perturb refined scores by ~0.4% and flip truncated coords by 1px
    up = jnp.einsum(
        "ua,jkab,vb->jkuv", up_mat, patch, up_mat,
        precision=jax.lax.Precision.HIGHEST,
    )
    side = _PATCH * upsamp
    flat = up.reshape(*up.shape[:2], side * side)
    am = jnp.argmax(flat, axis=-1)
    iy, ix = am // side, am % side
    score = jnp.take_along_axis(flat, am[..., None], axis=-1)[..., 0]

    # patch center in upsampled coordinates; the offset of the clamped
    # window start from the peak equals min(peak, WIN) per axis
    cx = (jnp.minimum(px, _WIN) + 0.5) * upsamp - 0.5
    cy = (jnp.minimum(py, _WIN) + 0.5) * upsamp - 0.5
    x = (px + 0.5) * upsamp - 0.5 + (ix - cx)
    y = (py + 0.5) * upsamp - 0.5 + (iy - cy)
    return x, y, score


# ---------------------------------------------------------------------------
# stage 2: all-pairs limb scoring + greedy matching
# ---------------------------------------------------------------------------

def _score_all_limbs(
    pafs, xi, yi, peak_valid, stride: int, n_steps: int,
    thresh_paf: float, thresh_cnt1: int,
):
    """[19, K, K] candidate scores + validity.

    xi/yi/peak_valid are [18, K] truncated-int peak tables. Implements the
    10-sample line integral + criteria of reference pafprocess.cpp:56-92.
    """
    h, w, _ = pafs.shape
    pairs = jnp.asarray(constants.COCO_PAIRS)             # [19, 2]
    ch = jnp.asarray(constants.COCO_PAIRS_NET)            # [19, 2]

    ax = xi[pairs[:, 0]].astype(jnp.float32)              # [19, K]
    ay = yi[pairs[:, 0]].astype(jnp.float32)
    bx = xi[pairs[:, 1]].astype(jnp.float32)
    by = yi[pairs[:, 1]].astype(jnp.float32)
    va = peak_valid[pairs[:, 0]]
    vb = peak_valid[pairs[:, 1]]

    dx = bx[:, None, :] - ax[:, :, None]                  # [19, Ka, Kb]
    dy = by[:, None, :] - ay[:, :, None]
    norm = jnp.sqrt(dx * dx + dy * dy)
    ok = norm >= 1e-12
    safe = jnp.where(ok, norm, 1.0)
    ux, uy = dx / safe, dy / safe

    steps = jnp.arange(n_steps, dtype=jnp.float32)        # [S]
    lx = jnp.floor(
        ax[:, :, None, None] + steps * dx[..., None] / n_steps + 0.5
    ).astype(jnp.int32)                                   # [19, Ka, Kb, S]
    ly = jnp.floor(
        ay[:, :, None, None] + steps * dy[..., None] / n_steps + 0.5
    ).astype(jnp.int32)
    gx = jnp.clip(lx // stride, 0, w - 1)
    gy = jnp.clip(ly // stride, 0, h - 1)

    # The PAF sampling is a 19*K*K*S-point random gather — the single
    # hottest op in the decoder. TPUs have no fast hardware gather, so we
    # factorize it into two one-hot contractions that run on the MXU
    # instead: a row gather over H, then a column select over W. With
    # Precision.HIGHEST the one-hot matmul reproduces the gathered f32
    # values bit-exactly (measured: ~6.7x faster than the XLA gather on
    # v5e for these shapes).
    kk = gx.shape[1] * gx.shape[2] * gx.shape[3]
    # per-limb 2-channel PAF planes, selected with static channel indices
    ch_np = np.asarray(constants.COCO_PAIRS_NET).reshape(-1)
    pafxy = pafs[:, :, ch_np].reshape(h, w, 19, 2)
    pafxy = jnp.transpose(pafxy, (2, 0, 1, 3))            # [19, H, W, 2]
    gy_f = gy.reshape(19, kk)
    gx_f = gx.reshape(19, kk)
    hi = jax.lax.Precision.HIGHEST
    oh_y = (jnp.arange(h)[None, None, :] == gy_f[..., None]).astype(
        pafs.dtype
    )                                                     # [19, P, H]
    rows = jnp.einsum("lph,lhwc->lpwc", oh_y, pafxy, precision=hi)
    oh_x = (jnp.arange(w)[None, None, :] == gx_f[..., None]).astype(
        pafs.dtype
    )                                                     # [19, P, W]
    vals = jnp.einsum("lpw,lpwc->lpc", oh_x, rows, precision=hi)
    vx = vals[..., 0].reshape(gx.shape)                   # [19, Ka, Kb, S]
    vy = vals[..., 1].reshape(gx.shape)
    dots = vx * ux[..., None] + vy * uy[..., None]        # [19, Ka, Kb, S]

    above = jnp.sum(dots > thresh_paf, axis=-1)
    mean = jnp.mean(dots, axis=-1)
    penalty = jnp.minimum(0.0, 0.5 * (h * stride) / safe - 1.0)
    score = mean + penalty
    valid = (
        ok & (above > thresh_cnt1) & (score > 0)
        & va[:, :, None] & vb[:, None, :]
    )
    return jnp.where(valid, score, -jnp.inf), valid


def _greedy_match_one(score: jax.Array, k: int):
    """Greedy 1:1 matching on one [K, K] score matrix
    (reference pafprocess.cpp:96-124: sorted scan == repeated masked argmax
    for distinct scores). Returns (ia, ib, score, valid), each [K].

    Runs as an early-exiting while_loop so the sequential cost scales with
    the number of ACCEPTED connections (~people per image), not the static
    capacity K. Under vmap the loop runs until every limb pair is done.
    """
    neg = -jnp.inf

    def cond(carry):
        t, alive, *_ = carry
        return alive & (t < k)

    def body(carry):
        t, _, used_a, used_b, out_ia, out_ib, out_s, out_v = carry
        masked = jnp.where(
            used_a[:, None] | used_b[None, :], neg, score
        )
        flat = masked.reshape(-1)
        best = jnp.argmax(flat)
        val = flat[best]
        ia, ib = best // k, best % k
        accept = val > neg
        used_a = used_a.at[ia].set(used_a[ia] | accept)
        used_b = used_b.at[ib].set(used_b[ib] | accept)
        out_ia = out_ia.at[t].set(jnp.where(accept, ia, -1))
        out_ib = out_ib.at[t].set(jnp.where(accept, ib, -1))
        out_s = out_s.at[t].set(jnp.where(accept, val, 0.0))
        out_v = out_v.at[t].set(accept)
        return t + 1, accept, used_a, used_b, out_ia, out_ib, out_s, out_v

    init = (
        jnp.asarray(0), jnp.asarray(True),
        jnp.zeros(k, bool), jnp.zeros(k, bool),
        jnp.full(k, -1, jnp.int32), jnp.full(k, -1, jnp.int32),
        jnp.zeros(k, jnp.float32), jnp.zeros(k, bool),
    )
    _, _, _, _, ia, ib, s, v = jax.lax.while_loop(cond, body, init)
    return ia, ib, s, v


# ---------------------------------------------------------------------------
# stage 3: sequential person-row merging
# ---------------------------------------------------------------------------

def _merge_prep(conn_cid1, conn_cid2, conn_score, conn_valid, k: int):
    """Compact valid connections to the front (stable, preserving the
    reference's pair-major, score-descending processing order) so the
    sequential merge loops over only those — cost scales with the actual
    number of connections in the image."""
    valid_flat = conn_valid.reshape(-1)
    order = jnp.argsort(~valid_flat, stable=True)
    return (
        (order // k).astype(jnp.int32),
        conn_cid1.reshape(-1)[order],
        conn_cid2.reshape(-1)[order],
        conn_score.reshape(-1)[order],
        valid_flat[order],
        jnp.sum(valid_flat),
    )


def _merge_people(
    conn_cid1, conn_cid2, conn_score, conn_valid, peak_score_flat,
    cap: int, k: int, use_pallas: bool = True,
):
    """Person grouping (reference pafprocess.cpp:127-185) over the [19, K]
    connection tables. Returns (subset [cap, 20], active [cap], n_rows).
    """
    pairs = jnp.asarray(constants.COCO_PAIRS)

    pair_flat, cid1_flat, cid2_flat, score_flat, valid_sorted, n_valid = (
        _merge_prep(conn_cid1, conn_cid2, conn_score, conn_valid, k)
    )

    if use_pallas and jax.default_backend() == "tpu":
        # one Pallas program for the whole sequential merge: person table
        # in VMEM, per-connection scalars in SMEM — ~an order of magnitude
        # less per-connection overhead than the XLA while_loop below.
        # Skipped entirely for connection-less frames.
        from torch_ekpose_tpu.ops.pallas_merge import merge_people_pallas

        def _run(args):
            return merge_people_pallas(*args, cap=cap)

        def _empty(args):
            return (
                jnp.full((cap, 20), -1.0, jnp.float32),
                jnp.zeros(cap, bool),
            )

        subset, active = jax.lax.cond(
            n_valid > 0, _run, _empty,
            (pair_flat, pairs[pair_flat, 0], pairs[pair_flat, 1],
             cid1_flat, cid2_flat, score_flat, n_valid, peak_score_flat),
        )
        return subset, active, jnp.asarray(0, jnp.int32)

    return _merge_loop_xla(
        pair_flat, cid1_flat, cid2_flat, score_flat, valid_sorted, n_valid,
        peak_score_flat, cap,
    )


def _merge_loop_xla(
    pair_flat, cid1_flat, cid2_flat, score_flat, valid_sorted, n_valid,
    peak_score_flat, cap: int,
):
    """The person merge as an XLA while_loop over pre-compacted [n_slots]
    connection arrays — the non-TPU / vmap-fallback twin of
    ``ops.pallas_merge.merge_people_pallas`` and the parity oracle for it.
    Returns (subset [cap, 20], active [cap], n_rows)."""
    pairs = jnp.asarray(constants.COCO_PAIRS)
    n_slots = pair_flat.shape[0]

    def body(s, carry):
        # Straight-line masked arithmetic instead of lax.switch: on TPU
        # every branch is a handful of tiny vector ops, so computing all
        # of them and selecting is ~2-3x faster per iteration than the
        # conditional (the merge loop runs once per connection and
        # dominates decode on crowded scenes).
        subset, active, n_rows = carry
        pair = pair_flat[s]
        p1, p2 = pairs[pair, 0], pairs[pair, 1]
        cid1 = cid1_flat[s].astype(jnp.float32)
        cid2 = cid2_flat[s].astype(jnp.float32)
        score = score_flat[s]
        valid = valid_sorted[s]

        col1 = jax.nn.one_hot(p1, 20, dtype=subset.dtype)
        col2 = jax.nn.one_hot(p2, 20, dtype=subset.dtype)
        # exact column reads (a one-hot matvec would round cids > 256 at
        # the TPU's default bf16 matmul precision)
        vals1 = jax.lax.dynamic_slice(subset, (0, p1), (cap, 1))[:, 0]
        vals2 = jax.lax.dynamic_slice(subset, (0, p2), (cap, 1))[:, 0]
        match = active & ((vals1 == cid1) | (vals2 == cid2))
        found = jnp.sum(match)
        cum = jnp.cumsum(match)
        match1 = jnp.argmax(match & (cum == 1))
        match2 = jnp.argmax(match & (cum == 2))

        row1 = subset[match1]
        row2 = subset[match2]
        sc2 = peak_score_flat[jnp.clip(cid2.astype(jnp.int32), 0, None)]
        sc1 = peak_score_flat[jnp.clip(cid1.astype(jnp.int32), 0, None)]

        is_f1 = valid & (found == 1)
        is_f2 = valid & (found == 2)
        is_new = valid & (found == 0)

        # --- row updates computed unconditionally, selected by masks ----
        # set_p2: row[p2] = cid2; score += peak2 + conn; count += 1
        # (reference pafprocess.cpp:147,169-171)
        p2row = row1 * (1 - col2) + cid2 * col2
        p2row = p2row.at[18].add(sc2 + score)
        p2row = p2row.at[19].add(1.0)
        # found==1 guards on row[p2] != cid2 (pafprocess.cpp:147); the
        # found==2 overlap branch applies unconditionally
        changed = jax.lax.dynamic_slice(row1, (p2,), (1,))[0] != cid2
        p2row_guarded = jnp.where(changed, p2row, row1)

        overlap = jnp.any((row1[:18] > 0) & (row2[:18] > 0))
        merged = row1.at[:18].add(row2[:18] + 1.0)
        merged = merged.at[18].add(row2[18] + score)
        merged = merged.at[19].add(row2[19])
        f2row = jnp.where(overlap, p2row, merged)

        can_new = is_new & (pair < 18) & (n_rows < cap)
        fresh = jnp.full(20, -1.0, subset.dtype)
        fresh = fresh * (1 - col1) + cid1 * col1
        fresh = fresh * (1 - col2) + cid2 * col2
        fresh = fresh.at[18].set(sc1 + sc2 + score)
        fresh = fresh.at[19].set(2.0)
        slot = jnp.clip(n_rows, 0, cap - 1)

        # --- at most two disjoint row writes, as masked selects ---------
        rows_idx = jnp.arange(cap)
        row1_final = jnp.where(
            is_f1, p2row_guarded, jnp.where(is_f2, f2row, row1)
        )
        write1 = (rows_idx == match1) & (is_f1 | is_f2)
        subset = jnp.where(write1[:, None], row1_final[None, :], subset)
        write_new = (rows_idx == slot) & can_new
        subset = jnp.where(write_new[:, None], fresh[None, :], subset)

        deact2 = (rows_idx == match2) & is_f2 & ~overlap
        active = (active & ~deact2) | write_new
        n_rows = n_rows + can_new.astype(n_rows.dtype)
        return subset, active, n_rows

    init = (
        jnp.full((cap, 20), -1.0, jnp.float32),
        jnp.zeros(cap, bool),
        jnp.asarray(0, jnp.int32),
    )

    def while_cond(c):
        return c[0] < jnp.minimum(n_valid, n_slots)

    def while_body(c):
        s, carry = c[0], c[1:]
        return (s + 1,) + tuple(body(s, carry))

    out = jax.lax.while_loop(
        while_cond, while_body, (jnp.asarray(0, jnp.int32),) + init
    )
    return out[1], out[2], out[3]


# ---------------------------------------------------------------------------
# full decoder
# ---------------------------------------------------------------------------

def _decode_dense(
    heatmaps, pafs, *, stride, n_steps, max_peaks, thresh_heatmap,
    thresh_paf, thresh_cnt1, use_pallas=True,
):
    """The decoder's dense stages for ONE image: peak finding, sub-pixel
    refinement, and all-pairs limb scoring. Pure batched tensor math —
    safe under jax.vmap. Returns (xi, yi, score, peak_valid, limb_scores).
    """
    heatmaps = heatmaps.astype(jnp.float32)
    pafs = pafs.astype(jnp.float32)
    k = max_peaks

    px, py, _, peak_valid = _find_topk_peaks(
        heatmaps[:, :, :18], thresh_heatmap, k, use_pallas=use_pallas
    )
    xf, yf, score = _refine_peaks(heatmaps[:, :, :18], px, py, stride)
    # the assembler stores truncated ints (reference pafprocess.h:26-31)
    xi = jnp.trunc(xf).astype(jnp.int32)
    yi = jnp.trunc(yf).astype(jnp.int32)
    score = jnp.where(peak_valid, score, 0.0)

    limb_scores, _ = _score_all_limbs(
        pafs, xi, yi, peak_valid, stride, n_steps, thresh_paf, thresh_cnt1
    )
    return xi, yi, score, peak_valid, limb_scores


@functools.partial(
    jax.jit,
    static_argnames=(
        "stride", "n_steps", "max_peaks", "subset_cap", "thresh_heatmap",
        "thresh_paf", "thresh_cnt1", "thresh_part_cnt", "thresh_human_score",
        "use_pallas_loops",
    ),
)
def decode_jax(
    heatmaps: jax.Array,
    pafs: jax.Array,
    *,
    stride: int = constants.DOWNSAMPLE,
    n_steps: int = constants.STEP_PAF,
    max_peaks: int = 32,
    subset_cap: int = 96,
    thresh_heatmap: float = constants.THRESH_HEATMAP,
    thresh_paf: float = constants.THRESH_VECTOR_SCORE,
    thresh_cnt1: int = constants.THRESH_VECTOR_CNT1,
    thresh_part_cnt: float = constants.THRESH_PART_CNT,
    thresh_human_score: float = constants.THRESH_HUMAN_SCORE,
    use_pallas_loops: bool = True,
) -> DecodeResult:
    """Decode one image's [H, W, 19] heatmaps + [H, W, 38] PAFs on device.

    ``use_pallas_loops=False`` keeps the sequential match/merge stages as
    XLA while_loops — required when the decoder will be vmapped (Pallas
    SMEM operands have no batching rule); under vmap the XLA loops run
    lock-step across the batch, so their per-iteration overhead amortizes.
    For [B, ...] stacks prefer :func:`decode_jax_batched`, which keeps the
    Pallas loop kernels by running them over an explicit batch grid.
    """
    k = max_peaks
    on_tpu = use_pallas_loops and jax.default_backend() == "tpu"
    xi, yi, score, peak_valid, limb_scores = _decode_dense(
        heatmaps, pafs, stride=stride, n_steps=n_steps, max_peaks=k,
        thresh_heatmap=thresh_heatmap, thresh_paf=thresh_paf,
        thresh_cnt1=thresh_cnt1, use_pallas=on_tpu,
    )
    if on_tpu:
        # all 19 greedy matches as one Pallas program (K lock-step rounds
        # of [19, K]-shaped vector work in VMEM); skipped entirely when no
        # candidate survived scoring (common for empty frames)
        from torch_ekpose_tpu.ops.pallas_match import greedy_match_pallas

        def _empty_match(scores):
            return (
                jnp.full((19, k), -1, jnp.int32),
                jnp.full((19, k), -1, jnp.int32),
                jnp.zeros((19, k), jnp.float32),
                jnp.zeros((19, k), bool),
            )

        ia, ib, cscore, cvalid = jax.lax.cond(
            jnp.any(limb_scores > -jnp.inf),
            greedy_match_pallas, _empty_match, limb_scores,
        )
    else:
        ia, ib, cscore, cvalid = jax.vmap(
            functools.partial(_greedy_match_one, k=k)
        )(limb_scores)

    # local peak index -> flat cid = part * K + index
    pairs = jnp.asarray(constants.COCO_PAIRS)
    cid1 = pairs[:, 0][:, None] * k + jnp.maximum(ia, 0)
    cid2 = pairs[:, 1][:, None] * k + jnp.maximum(ib, 0)

    subset, active, _ = _merge_people(
        cid1, cid2, cscore, cvalid, score.reshape(-1), subset_cap, k,
        use_pallas=use_pallas_loops,
    )
    counts = subset[:, 19]
    totals = subset[:, 18]
    person_valid = (
        active
        & (counts >= thresh_part_cnt)
        & (totals / jnp.maximum(counts, 1.0) >= thresh_human_score)
    )
    return DecodeResult(
        peak_xy=jnp.stack([xi, yi], axis=-1).reshape(18 * k, 2),
        peak_score=score.reshape(18 * k),
        peak_valid=peak_valid.reshape(18 * k),
        subset=subset,
        person_valid=person_valid,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "stride", "n_steps", "max_peaks", "subset_cap", "thresh_heatmap",
        "thresh_paf", "thresh_cnt1", "thresh_part_cnt", "thresh_human_score",
        "use_pallas_loops",
    ),
)
def decode_jax_batched(
    heatmaps: jax.Array,
    pafs: jax.Array,
    *,
    stride: int = constants.DOWNSAMPLE,
    n_steps: int = constants.STEP_PAF,
    max_peaks: int = 32,
    subset_cap: int = 96,
    thresh_heatmap: float = constants.THRESH_HEATMAP,
    thresh_paf: float = constants.THRESH_VECTOR_SCORE,
    thresh_cnt1: int = constants.THRESH_VECTOR_CNT1,
    thresh_part_cnt: float = constants.THRESH_PART_CNT,
    thresh_human_score: float = constants.THRESH_HUMAN_SCORE,
    use_pallas_loops: bool = True,
) -> DecodeResult:
    """Decode a batch of [B, H, W, 19] heatmaps + [B, H, W, 38] PAFs on
    device, returning a batched DecodeResult.

    Same per-image semantics as :func:`decode_jax`. The dense stages run
    under jax.vmap; the sequential match/merge stages run as the SAME
    Pallas kernels as the single-image path, batched over an explicit
    grid axis (match via pallas_call's grid-append vmap rule, merge via
    ``merge_people_pallas_batched`` — its SMEM operands have no batching
    rule, so the batch is a real grid dimension there). On non-TPU
    backends both stages fall back to vmapped XLA while_loops.
    """
    k = max_peaks
    b = heatmaps.shape[0]
    on_tpu = use_pallas_loops and jax.default_backend() == "tpu"

    xi, yi, score, peak_valid, limb_scores = jax.vmap(
        functools.partial(
            _decode_dense, stride=stride, n_steps=n_steps, max_peaks=k,
            thresh_heatmap=thresh_heatmap, thresh_paf=thresh_paf,
            thresh_cnt1=thresh_cnt1, use_pallas=on_tpu,
        )
    )(heatmaps, pafs)

    if on_tpu:
        from torch_ekpose_tpu.ops.pallas_match import greedy_match_pallas

        ia, ib, cscore, cvalid = jax.vmap(greedy_match_pallas)(limb_scores)
    else:
        ia, ib, cscore, cvalid = jax.vmap(
            jax.vmap(functools.partial(_greedy_match_one, k=k))
        )(limb_scores)

    pairs = jnp.asarray(constants.COCO_PAIRS)
    cid1 = pairs[:, 0][None, :, None] * k + jnp.maximum(ia, 0)
    cid2 = pairs[:, 1][None, :, None] * k + jnp.maximum(ib, 0)

    pair_flat, cid1_flat, cid2_flat, score_flat, valid_sorted, n_valid = (
        jax.vmap(functools.partial(_merge_prep, k=k))(
            cid1, cid2, cscore, cvalid
        )
    )
    peak_score_flat = score.reshape(b, 18 * k)
    if on_tpu:
        from torch_ekpose_tpu.ops.pallas_merge import (
            merge_people_pallas_batched,
        )

        subset, active = merge_people_pallas_batched(
            pair_flat, pairs[pair_flat, 0], pairs[pair_flat, 1],
            cid1_flat, cid2_flat, score_flat, n_valid, peak_score_flat,
            cap=subset_cap,
        )
    else:
        subset, active, _ = jax.vmap(
            functools.partial(_merge_loop_xla, cap=subset_cap)
        )(
            pair_flat, cid1_flat, cid2_flat, score_flat, valid_sorted,
            n_valid, peak_score_flat,
        )

    counts = subset[..., 19]
    totals = subset[..., 18]
    person_valid = (
        active
        & (counts >= thresh_part_cnt)
        & (totals / jnp.maximum(counts, 1.0) >= thresh_human_score)
    )
    return DecodeResult(
        peak_xy=jnp.stack([xi, yi], axis=-1).reshape(b, 18 * k, 2),
        peak_score=peak_score_flat,
        peak_valid=peak_valid.reshape(b, 18 * k),
        subset=subset,
        person_valid=person_valid,
    )


def pack_result(res: DecodeResult) -> jax.Array:
    """Flatten a (possibly batched) DecodeResult into ONE float32 buffer.

    Device->host transfers pay a fixed per-array latency (tens of ms over
    a remote-TPU tunnel), so fetching the five result fields separately
    quintuples the readback cost of every frame. All field values are
    exactly representable in f32 (coords < 2^15, cids < 2^11, bools),
    so one packed fetch is lossless. ``unpack_result`` restores dtypes.
    """
    lead = res.peak_score.shape[:-1]

    def flat(x):
        return x.reshape(*lead, -1).astype(jnp.float32)

    return jnp.concatenate(
        [flat(res.peak_xy), flat(res.peak_score), flat(res.peak_valid),
         flat(res.subset), flat(res.person_valid)],
        axis=-1,
    )


def unpack_result(
    packed: np.ndarray, max_peaks: int, subset_cap: int
) -> DecodeResult:
    """Host-side inverse of ``pack_result`` for ONE image's buffer."""
    n = 18 * max_peaks
    parts = np.split(
        np.asarray(packed),
        np.cumsum([n * 2, n, n, subset_cap * 20]),
    )
    return DecodeResult(
        peak_xy=parts[0].reshape(n, 2).astype(np.int32),
        peak_score=parts[1],
        peak_valid=parts[2].astype(bool),
        subset=parts[3].reshape(subset_cap, 20),
        person_valid=parts[4].astype(bool),
    )


def build_decoder(
    config: Optional[Config] = None, vmap_safe: bool = False
):
    """Returns a jitted single-image decoder closed over config values.

    ``vmap_safe=True`` builds a decoder that may be wrapped in jax.vmap
    (disables the Pallas loop kernels, which have no batching rule).
    """
    config = config or default_cfg
    return functools.partial(
        decode_jax,
        use_pallas_loops=not vmap_safe,
        stride=config.MODEL.DOWNSAMPLE,
        n_steps=config.TEST.NUM_INTERMED_PTS_BETWEEN_KEYPOINTS,
        max_peaks=config.DECODE.max_peaks_per_part,
        subset_cap=config.DECODE.max_people * 3,
        thresh_heatmap=config.TEST.THRESH_HEATMAP,
        thresh_paf=config.TEST.THRESH_PAF,
        thresh_cnt1=config.TEST.THRESH_VECTOR_CNT1,
        thresh_part_cnt=float(config.TEST.THRESH_PART_CNT),
        thresh_human_score=config.TEST.THRESH_HUMAN_SCORE,
    )


def build_packed_decoder(
    config: Optional[Config] = None, batched: bool = False,
    pallas: bool = True,
):
    """Jitted decoder whose output is the packed single-fetch buffer.

    ``batched=True`` returns a decoder for [B, ...] heatmap/PAF stacks
    (:func:`decode_jax_batched` — grid-batched Pallas loop kernels on
    TPU, vmapped XLA loops elsewhere). This is the one place the
    estimator, the sharded estimator, and the server-side batch path all
    build their decode programs from, so the packed layout stays
    consistent. ``pallas=False`` forces the XLA loop fallbacks — needed
    when the program will be partitioned over a multi-chip mesh, where
    XLA cannot infer shardings for Pallas custom calls.
    """
    config = config or default_cfg
    if batched:
        batched_decoder = functools.partial(
            decode_jax_batched,
            use_pallas_loops=pallas,
            stride=config.MODEL.DOWNSAMPLE,
            n_steps=config.TEST.NUM_INTERMED_PTS_BETWEEN_KEYPOINTS,
            max_peaks=config.DECODE.max_peaks_per_part,
            subset_cap=config.DECODE.max_people * 3,
            thresh_heatmap=config.TEST.THRESH_HEATMAP,
            thresh_paf=config.TEST.THRESH_PAF,
            thresh_cnt1=config.TEST.THRESH_VECTOR_CNT1,
            thresh_part_cnt=float(config.TEST.THRESH_PART_CNT),
            thresh_human_score=config.TEST.THRESH_HUMAN_SCORE,
        )
        return jax.jit(
            lambda heatmap, paf: pack_result(batched_decoder(heatmap, paf))
        )
    decoder = build_decoder(config, vmap_safe=not pallas)
    return jax.jit(lambda heatmap, paf: pack_result(decoder(heatmap, paf)))


def packed_to_humans(
    packed_row: np.ndarray, up_h: int, up_w: int,
    config: Optional[Config] = None,
) -> List[Human]:
    """One image's packed buffer (already on host) -> Humans."""
    config = config or default_cfg
    result = unpack_result(
        packed_row,
        config.DECODE.max_peaks_per_part,
        config.DECODE.max_people * 3,
    )
    return humans_from_result(result, up_h, up_w)


def cap_saturation(result: DecodeResult) -> tuple:
    """(peaks_saturated, people_saturated) for ONE image's DecodeResult.

    The fixed capacities this decoder needs for static XLA shapes diverge
    from the reference's unbounded ``std::vector`` assembler
    (reference pafprocess.cpp:12-13) on extreme scenes:

    - peaks: only the top-``max_peaks`` local maxima per part survive
      (``jax.lax.top_k`` — highest score wins, ties broken toward the
      earlier row-major cell, deterministically);
    - people: once all ``subset_cap`` person rows have been written, later
      found==0 connections are dropped instead of opening a row
      (``_merge_loop_xla``/``merge_people_pallas``; row slots are never
      reclaimed when rows merge, matching how both loops append).

    These are conservative *table-full* signals: a part using all K peak
    slots, or every person row written. A full table with exactly-capacity
    contents flags too, but any truncation is guaranteed to flag.
    """
    k = result.peak_valid.shape[-1] // 18
    peak_valid = np.asarray(result.peak_valid).reshape(18, k)
    peaks_saturated = bool(peak_valid.all(axis=1).any())
    # written person rows carry count >= 2 (fresh rows start at 2 and only
    # grow); untouched slots keep the -1.0 init
    counts = np.asarray(result.subset)[:, 19]
    people_saturated = bool((counts > 0.0).all())
    return peaks_saturated, people_saturated


_saturation_warned: set = set()


def _warn_if_saturated(result: DecodeResult) -> None:
    """One-time-per-process warning when a decode capacity saturates —
    crowded scenes may silently lose peaks/people vs the reference's
    unbounded assembler (VERDICT: AP-affecting divergence on crowd images).
    """
    peaks_sat, people_sat = cap_saturation(result)
    if peaks_sat and "peaks" not in _saturation_warned:
        _saturation_warned.add("peaks")
        warnings.warn(
            "decode peak capacity saturated: some part filled all "
            "max_peaks_per_part slots; lower-scoring peaks may have been "
            "dropped. Raise cfg.DECODE.max_peaks_per_part for crowded "
            "scenes (results stay deterministic: top-K by score).",
            RuntimeWarning, stacklevel=3,
        )
    if people_sat and "people" not in _saturation_warned:
        _saturation_warned.add("people")
        warnings.warn(
            "decode person-table capacity saturated: all person rows "
            "written; later part groups may have been dropped. Raise "
            "cfg.DECODE.max_people for crowded scenes.",
            RuntimeWarning, stacklevel=3,
        )


def humans_from_result(
    result: DecodeResult, up_h: int, up_w: int
) -> List[Human]:
    """Host conversion of a DecodeResult to Human objects
    (mirrors reference paf_to_pose.py:361-378)."""
    _warn_if_saturated(result)
    peak_xy = np.asarray(result.peak_xy)
    peak_score = np.asarray(result.peak_score)
    subset = np.asarray(result.subset)
    person_valid = np.asarray(result.person_valid)

    humans = []
    for human_id in np.nonzero(person_valid)[0]:
        row = subset[human_id]
        human = Human([])
        added = False
        for part_idx in range(constants.NUM_KEYPOINTS):
            cid = int(row[part_idx])
            if cid < 0:
                continue
            added = True
            human.body_parts[part_idx] = BodyPart(
                "%d-%d" % (human_id, part_idx), part_idx,
                float(peak_xy[cid, 0]) / up_w,
                float(peak_xy[cid, 1]) / up_h,
                float(peak_score[cid]),
            )
        if added:
            human.score = float(row[18] / row[19])
            humans.append(human)
    return humans


def paf_to_pose_jax(
    heatmaps, pafs, config: Optional[Config] = None
) -> List[Human]:
    """End-to-end device decode -> Humans for one image."""
    config = config or default_cfg
    decoder = build_decoder(config)
    packed = pack_result(decoder(jnp.asarray(heatmaps), jnp.asarray(pafs)))
    if hasattr(packed, "copy_to_host_async"):
        packed.copy_to_host_async()  # bulk fetch path (EVAL_BREAKDOWN)
    result = unpack_result(
        jax.device_get(packed),
        config.DECODE.max_peaks_per_part,
        config.DECODE.max_people * 3,
    )
    stride = config.MODEL.DOWNSAMPLE
    return humans_from_result(
        result, heatmaps.shape[0] * stride, heatmaps.shape[1] * stride
    )
