"""Decoder fixed-capacity overflow semantics.

The on-device decoder needs static shapes, so it bounds what the
reference's assembler keeps unbounded (reference
lib/pafprocess/pafprocess.cpp:12-13 module-level ``std::vector``s):

- at most ``max_peaks_per_part`` peaks per part (top-K by score);
- at most ``max_people * 3`` person rows (later groups dropped when full).

These tests pin the truncation rules (deterministic, top-K-by-score for
peaks; first-``cap`` creations in the reference's pair-major processing
order for person rows), verify the host oracle and the native C++ backend
keep the reference's unbounded behavior, and verify the one-time
saturation warning that the eval/serve paths emit through
``humans_from_result``.
"""

import numpy as np
import pytest

from torch_ekpose_tpu import constants
from torch_ekpose_tpu.config import Config
from torch_ekpose_tpu.decode import device, oracle

K = 8  # small caps keep XLA CPU compiles fast (mirrors test_decode_device)


@pytest.fixture()
def crowd_cfg():
    cfg = Config()
    cfg.DECODE.max_peaks_per_part = K
    cfg.DECODE.max_people = K
    return cfg


@pytest.fixture(autouse=True)
def _reset_warn_state():
    device._saturation_warned.clear()
    yield
    device._saturation_warned.clear()


def _spike_heatmap(h, w, n_spikes, channel=0, rng_seed=0):
    """[h, w, 19] heatmap with ``n_spikes`` isolated single-cell spikes of
    strictly distinct heights on one part channel. Spikes sit on a grid
    with >=3-cell spacing so each is a 4-neighbor local max."""
    rng = np.random.default_rng(rng_seed)
    heat = np.zeros((h, w, 19), np.float32)
    cells = [(y, x) for y in range(3, h - 3, 4) for x in range(3, w - 3, 4)]
    assert len(cells) >= n_spikes
    order = rng.permutation(len(cells))[:n_spikes]
    spikes = []
    for i, ci in enumerate(order):
        y, x = cells[ci]
        val = 0.3 + 0.02 * i  # distinct, all above THRESH_HEATMAP=0.15
        heat[y, x, channel] = val
        spikes.append((x, y, val))
    return heat, spikes


def test_peak_truncation_is_topk_by_score():
    """_find_topk_peaks keeps exactly the K highest-scoring local maxima,
    deterministically, when a part holds more than K peaks."""
    heat, spikes = _spike_heatmap(46, 46, n_spikes=2 * K)
    expect = sorted(spikes, key=lambda s: -s[2])[:K]

    px, py, score, valid = device._find_topk_peaks(
        np.asarray(heat[:, :, :18]), constants.THRESH_HEATMAP, K
    )
    px, py, score, valid = map(np.asarray, (px, py, score, valid))
    assert valid[0].all()          # the crowded part fills every slot
    assert not valid[1:].any()     # other parts stay empty
    got = {(int(x), int(y)) for x, y in zip(px[0], py[0])}
    assert got == {(x, y) for x, y, _ in expect}
    # scores come back sorted descending (top_k contract) -> deterministic
    np.testing.assert_allclose(
        score[0], sorted((v for _, _, v in expect), reverse=True),
        rtol=1e-6,
    )

    # determinism: an identical second run returns identical arrays
    px2, py2, score2, valid2 = device._find_topk_peaks(
        np.asarray(heat[:, :, :18]), constants.THRESH_HEATMAP, K
    )
    np.testing.assert_array_equal(px, np.asarray(px2))
    np.testing.assert_array_equal(py, np.asarray(py2))
    np.testing.assert_array_equal(score, np.asarray(score2))


def test_oracle_and_native_peaks_stay_unbounded():
    """The host backends keep ALL peaks, like the reference's assembler —
    the capacity divergence is specific to the static-shape device path."""
    heat, spikes = _spike_heatmap(46, 46, n_spikes=2 * K)
    peaks = oracle.nms(heat, constants.THRESH_HEATMAP, 8, 18)
    assert len(peaks[0]) == 2 * K  # no truncation
    assert all(len(p) == 0 for p in peaks[1:])


def test_peak_saturation_warns_once_through_humans_path(crowd_cfg):
    """A scene with more peaks than max_peaks_per_part raises the one-time
    RuntimeWarning on the eval/serve chokepoint (humans_from_result)."""
    heat, _ = _spike_heatmap(46, 46, n_spikes=2 * K)
    pafs = np.zeros((46, 46, 38), np.float32)
    with pytest.warns(RuntimeWarning, match="peak capacity saturated"):
        device.paf_to_pose_jax(heat, pafs, crowd_cfg)
    # second decode: warning must NOT fire again
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error", RuntimeWarning)
        device.paf_to_pose_jax(heat, pafs, crowd_cfg)


def test_no_warning_below_capacity(crowd_cfg):
    heat, _ = _spike_heatmap(46, 46, n_spikes=K - 2)
    pafs = np.zeros((46, 46, 38), np.float32)
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error", RuntimeWarning)
        humans = device.paf_to_pose_jax(heat, pafs, crowd_cfg)
    assert humans == []


def test_person_table_truncation_order():
    """When more person rows are needed than the table holds, the merge
    keeps the FIRST ``cap`` creations in the reference's processing order
    (pair-major, score-descending within a pair) and deterministically
    drops the rest; the reference grows its vector instead
    (pafprocess.cpp:174-183)."""
    cap = 4
    k = K
    # pair 2 = parts (2, 3): 8 valid connections, no two sharing a peak,
    # so every connection opens a fresh row -> 8 > cap creations
    pair_idx = 2
    p1, p2 = constants.COCO_PAIRS[pair_idx]
    conn_cid1 = np.zeros((19, k), np.int32)
    conn_cid2 = np.zeros((19, k), np.int32)
    conn_score = np.zeros((19, k), np.float32)
    conn_valid = np.zeros((19, k), bool)
    for i in range(k):
        conn_cid1[pair_idx, i] = p1 * k + i
        conn_cid2[pair_idx, i] = p2 * k + i
        conn_score[pair_idx, i] = 0.9 - 0.05 * i  # score-descending order
        conn_valid[pair_idx, i] = True
    peak_score_flat = np.full(18 * k, 0.5, np.float32)

    import jax.numpy as jnp

    def run():
        subset, active, _ = device._merge_people(
            jnp.asarray(conn_cid1), jnp.asarray(conn_cid2),
            jnp.asarray(conn_score), jnp.asarray(conn_valid),
            jnp.asarray(peak_score_flat), cap, k, use_pallas=False,
        )
        return np.asarray(subset), np.asarray(active)

    subset, active = run()
    assert active.sum() == cap  # table saturated; creations 5..8 dropped
    np.testing.assert_array_equal(
        subset[:, p1], [p1 * k + i for i in range(cap)]
    )
    np.testing.assert_array_equal(
        subset[:, p2], [p2 * k + i for i in range(cap)]
    )
    # determinism
    subset2, active2 = run()
    np.testing.assert_array_equal(subset, subset2)
    np.testing.assert_array_equal(active, active2)

    # the saturation detector flags the full table
    n = 18 * k
    res = device.DecodeResult(
        peak_xy=np.zeros((n, 2), np.int32),
        peak_score=peak_score_flat,
        peak_valid=np.zeros(n, bool),
        subset=subset,
        person_valid=active,
    )
    peaks_sat, people_sat = device.cap_saturation(res)
    assert people_sat and not peaks_sat

    with pytest.warns(RuntimeWarning, match="person-table capacity"):
        device.humans_from_result(res, 368, 368)


def test_cap_saturation_negative():
    n = 18 * K
    res = device.DecodeResult(
        peak_xy=np.zeros((n, 2), np.int32),
        peak_score=np.zeros(n, np.float32),
        peak_valid=np.zeros(n, bool),
        subset=np.full((24, 20), -1.0, np.float32),
        person_valid=np.zeros(24, bool),
    )
    assert device.cap_saturation(res) == (False, False)
