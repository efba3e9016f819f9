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
