"""Pallas NMS-mask kernel parity (interpret mode on CPU) against the XLA
expression and the numpy oracle's find_peaks."""

import numpy as np
import pytest

import jax.numpy as jnp

from torch_ekpose_tpu.decode.oracle import find_peaks
from torch_ekpose_tpu.ops.pallas_nms import (
    masked_peak_scores,
    masked_peak_scores_xla,
)


@pytest.mark.parametrize("shape", [(18, 46, 46), (19, 35, 82), (3, 8, 128)])
def test_pallas_matches_xla(rng, shape):
    maps = rng.normal(0, 0.3, shape).astype(np.float32)
    want = np.asarray(masked_peak_scores_xla(jnp.asarray(maps), 0.15))
    got = np.asarray(
        masked_peak_scores(jnp.asarray(maps), 0.15, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_masked_scores_match_oracle_peaks(rng):
    maps = rng.normal(0, 0.3, (5, 30, 40)).astype(np.float32)
    masked = np.asarray(
        masked_peak_scores(jnp.asarray(maps), 0.15, interpret=True)
    )
    for c in range(maps.shape[0]):
        ys, xs = np.nonzero(np.isfinite(masked[c]))
        got = set(zip(xs.tolist(), ys.tolist()))
        want = {tuple(p) for p in find_peaks(maps[c], 0.15)}
        assert got == want
