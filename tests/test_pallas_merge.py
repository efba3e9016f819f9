"""Pallas person-merge kernel (interpret mode) vs the XLA while_loop."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torch_ekpose_tpu import constants
from torch_ekpose_tpu.decode import device as D
from torch_ekpose_tpu.ops.pallas_merge import merge_people_pallas

K = 8
CAP = 24


def _random_tables(rng):
    """Random-but-plausible connection tables: per limb pair, a few
    accepted 1:1 matches with distinct peak indices."""
    cid1 = np.zeros((19, K), np.int32)
    cid2 = np.zeros((19, K), np.int32)
    score = np.zeros((19, K), np.float32)
    valid = np.zeros((19, K), bool)
    for li, (p1, p2) in enumerate(constants.COCO_PAIRS):
        n = int(rng.integers(0, K // 2 + 1))
        ia = rng.permutation(K)[:n]
        ib = rng.permutation(K)[:n]
        for t, (a, b) in enumerate(zip(ia, ib)):
            cid1[li, t] = p1 * K + a
            cid2[li, t] = p2 * K + b
            score[li, t] = float(rng.uniform(0.1, 2.0))
            valid[li, t] = True
    return cid1, cid2, score, valid


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_pallas_merge_matches_xla(seed):
    rng = np.random.default_rng(seed)
    cid1, cid2, score, valid = _random_tables(rng)
    peak_score = rng.uniform(0.1, 1.0, 18 * K).astype(np.float32)

    subset_x, active_x, _ = D._merge_people(
        jnp.asarray(cid1), jnp.asarray(cid2), jnp.asarray(score),
        jnp.asarray(valid), jnp.asarray(peak_score), CAP, K,
    )

    pairs = jnp.asarray(constants.COCO_PAIRS)
    valid_flat = valid.reshape(-1)
    order = np.argsort(~valid_flat, kind="stable")
    pair_flat = (order // K).astype(np.int32)
    subset_p, active_p = merge_people_pallas(
        jnp.asarray(pair_flat),
        pairs[pair_flat, 0], pairs[pair_flat, 1],
        jnp.asarray(cid1.reshape(-1)[order]),
        jnp.asarray(cid2.reshape(-1)[order]),
        jnp.asarray(score.reshape(-1)[order]),
        int(valid_flat.sum()),
        jnp.asarray(peak_score),
        cap=CAP, interpret=True,
    )

    np.testing.assert_array_equal(
        np.asarray(active_p), np.asarray(active_x)
    )
    np.testing.assert_allclose(
        np.asarray(subset_p), np.asarray(subset_x), rtol=0, atol=1e-5
    )


@pytest.mark.parametrize("seed", [4, 5])
def test_pallas_merge_batched_matches_xla(seed):
    """The grid-batched merge kernel (interpret mode) == the per-image
    XLA while_loop fallback, including an empty image in the batch."""
    from torch_ekpose_tpu.ops.pallas_merge import merge_people_pallas_batched

    rng = np.random.default_rng(seed)
    B = 3
    pairs = jnp.asarray(constants.COCO_PAIRS)
    batch = []
    for bi in range(B):
        cid1, cid2, score, valid = _random_tables(rng)
        if bi == B - 1:
            valid[:] = False
        batch.append((cid1, cid2, score, valid))
    peak_score = rng.uniform(0.1, 1.0, (B, 18 * K)).astype(np.float32)

    prep = [
        jax.device_get(
            D._merge_prep(
                jnp.asarray(c1), jnp.asarray(c2), jnp.asarray(s),
                jnp.asarray(v), K,
            )
        )
        for c1, c2, s, v in batch
    ]
    stack = [np.stack([p[i] for p in prep]) for i in range(6)]
    pair_flat, cid1_flat, cid2_flat, score_flat, valid_sorted, n_valid = stack

    subset_p, active_p = merge_people_pallas_batched(
        jnp.asarray(pair_flat),
        pairs[pair_flat, 0], pairs[pair_flat, 1],
        jnp.asarray(cid1_flat), jnp.asarray(cid2_flat),
        jnp.asarray(score_flat), jnp.asarray(n_valid),
        jnp.asarray(peak_score), cap=CAP, interpret=True,
    )

    for bi in range(B):
        subset_x, active_x, _ = D._merge_loop_xla(
            jnp.asarray(pair_flat[bi]), jnp.asarray(cid1_flat[bi]),
            jnp.asarray(cid2_flat[bi]), jnp.asarray(score_flat[bi]),
            jnp.asarray(valid_sorted[bi]), int(n_valid[bi]),
            jnp.asarray(peak_score[bi]), CAP,
        )
        np.testing.assert_array_equal(
            np.asarray(active_p[bi]), np.asarray(active_x)
        )
        np.testing.assert_allclose(
            np.asarray(subset_p[bi]), np.asarray(subset_x),
            rtol=0, atol=0,
        )
