"""On-device (JAX) decoder parity against the numpy oracle.

Noise is added to every synthetic scene so scores are distinct — the only
documented divergences of the device decoder are tie ordering and
border-peak refinement, neither of which these scenes exercise."""

import dataclasses

import numpy as np
import pytest

from torch_ekpose_tpu.config import Config
from torch_ekpose_tpu.data import gen_targets_np
from torch_ekpose_tpu.decode import api, device, oracle

GY, GX, STRIDE = 46, 46, 8


@pytest.fixture(scope="module")
def small_cfg():
    cfg = Config()
    # small capacities keep XLA CPU compile times reasonable in CI
    cfg.DECODE.max_peaks_per_part = 8
    cfg.DECODE.max_people = 8
    return cfg


def _random_scene(rng, n_people):
    kpts = np.zeros((n_people, 18, 3))
    offsets = np.array([
        (0, -95), (0, -70), (-25, -70), (-32, -35), (-36, 0), (25, -70),
        (32, -35), (36, 0), (-18, 0), (-20, 45), (-20, 90), (18, 0),
        (20, 45), (20, 90), (-8, -103), (8, -103), (-17, -99), (17, -99),
    ])
    for p in range(n_people):
        cx, cy = rng.uniform(80, 290), rng.uniform(120, 250)
        scale = rng.uniform(0.5, 0.9)
        kpts[p, :, :2] = (
            np.array([cx, cy]) + offsets * scale + rng.normal(0, 3, (18, 2))
        )
        kpts[p, :, 2] = rng.choice([0, 2], size=18, p=[0.1, 0.9])
    heat, pafs = gen_targets_np(kpts, GY, GX, STRIDE, 7.0)
    heat = (heat + rng.normal(0, 0.015, heat.shape)).astype(np.float32)
    pafs = (pafs + rng.normal(0, 0.015, pafs.shape)).astype(np.float32)
    return heat, pafs


def _canonical(humans):
    """Order-insensitive structural form: exact part ids + coordinates.

    Scores are compared separately with a tolerance (the device decoder
    accumulates in float32, the oracle in float64)."""
    people = []
    for h in humans:
        parts = tuple(
            (idx, round(p.x, 6), round(p.y, 6))
            for idx, p in sorted(h.body_parts.items())
        )
        people.append(parts)
    return sorted(people)


def _assert_same_humans(got, want):
    assert _canonical(got) == _canonical(want)
    got_s = sorted(h.score for h in got)
    want_s = sorted(h.score for h in want)
    np.testing.assert_allclose(got_s, want_s, atol=1e-2)


@pytest.mark.parametrize("seed", range(4))
def test_device_matches_oracle(small_cfg, seed):
    rng = np.random.default_rng(seed + 100)
    heat, pafs = _random_scene(rng, int(rng.integers(1, 4)))
    want = oracle.paf_to_pose_numpy(heat, pafs, small_cfg)
    got = device.paf_to_pose_jax(heat, pafs, small_cfg)
    _assert_same_humans(got, want)


def test_device_empty(small_cfg):
    heat = np.zeros((GY, GX, 19), dtype=np.float32)
    pafs = np.zeros((GY, GX, 38), dtype=np.float32)
    assert device.paf_to_pose_jax(heat, pafs, small_cfg) == []


def test_api_jax_backend_dispatch(small_cfg):
    rng = np.random.default_rng(5)
    heat, pafs = _random_scene(rng, 1)
    got = api.paf_to_pose(heat, pafs, small_cfg, backend="jax")
    want = api.paf_to_pose(heat, pafs, small_cfg, backend="numpy")
    _assert_same_humans(got, want)


def test_decode_result_shapes(small_cfg):
    rng = np.random.default_rng(9)
    heat, pafs = _random_scene(rng, 2)
    decoder = device.build_decoder(small_cfg)
    res = decoder(heat, pafs)
    k = small_cfg.DECODE.max_peaks_per_part
    cap = small_cfg.DECODE.max_people * 3
    assert res.peak_xy.shape == (18 * k, 2)
    assert res.peak_score.shape == (18 * k,)
    assert res.subset.shape == (cap, 20)
    assert res.person_valid.shape == (cap,)


def test_pack_unpack_roundtrip():
    """pack_result -> unpack_result is lossless for single and batched
    DecodeResults."""
    import jax
    import jax.numpy as jnp

    from torch_ekpose_tpu.config import get_default_config
    from torch_ekpose_tpu.decode import device as D

    cfg = get_default_config()
    k = cfg.DECODE.max_peaks_per_part
    cap = cfg.DECODE.max_people * 3
    rng = np.random.default_rng(3)
    heat = rng.random((46, 54, 19)).astype(np.float32)
    pafs = rng.normal(0, 0.3, (46, 54, 38)).astype(np.float32)

    decoder = D.build_decoder(cfg)
    res = jax.device_get(decoder(jnp.asarray(heat), jnp.asarray(pafs)))
    packed = np.asarray(D.pack_result(decoder(jnp.asarray(heat),
                                              jnp.asarray(pafs))))
    rt = D.unpack_result(packed, k, cap)
    np.testing.assert_array_equal(rt.peak_xy, res.peak_xy)
    np.testing.assert_array_equal(rt.peak_score, res.peak_score)
    np.testing.assert_array_equal(rt.peak_valid, res.peak_valid)
    np.testing.assert_array_equal(rt.subset, res.subset)
    np.testing.assert_array_equal(rt.person_valid, res.person_valid)
    assert rt.peak_xy.dtype == np.int32
    assert rt.peak_valid.dtype == bool


def test_decode_jax_batched_matches_single(small_cfg):
    """decode_jax_batched (XLA-fallback path on CPU) == per-image
    decode_jax on every DecodeResult field."""
    import functools

    import jax.numpy as jnp

    rng = np.random.default_rng(17)
    scenes = [_random_scene(rng, int(rng.integers(0, 4))) for _ in range(4)]
    heat = jnp.asarray(np.stack([s[0] for s in scenes]))
    pafs = jnp.asarray(np.stack([s[1] for s in scenes]))

    kwargs = dict(
        max_peaks=small_cfg.DECODE.max_peaks_per_part,
        subset_cap=small_cfg.DECODE.max_people * 3,
    )
    batched = device.decode_jax_batched(heat, pafs, **kwargs)
    for i in range(heat.shape[0]):
        single = device.decode_jax(heat[i], pafs[i], **kwargs)
        for field, got, want in zip(
            batched._fields, batched, single
        ):
            np.testing.assert_array_equal(
                np.asarray(got[i]), np.asarray(want), err_msg=field
            )


def test_packed_batched_decoder_matches_humans(small_cfg):
    """build_packed_decoder(batched=True) -> packed_to_humans equals the
    single-image fused path for every image in the batch."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(23)
    scenes = [_random_scene(rng, 2) for _ in range(3)]
    heat = jnp.asarray(np.stack([s[0] for s in scenes]))
    pafs = jnp.asarray(np.stack([s[1] for s in scenes]))

    packed = jax.device_get(
        device.build_packed_decoder(small_cfg, batched=True)(heat, pafs)
    )
    up_h, up_w = GY * STRIDE, GX * STRIDE
    for i in range(3):
        got = device.packed_to_humans(packed[i], up_h, up_w, small_cfg)
        want = device.paf_to_pose_jax(scenes[i][0], scenes[i][1], small_cfg)
        _assert_same_humans(got, want)


@pytest.mark.parametrize("seed", range(3))
def test_device_matches_oracle_crowded(small_cfg, seed):
    """Adversarial scenes: enough people to saturate the per-part peak
    capacity and overlap limb corridors — exercises top-k truncation,
    candidate-pair pruning, and disjoint person merging under pressure."""
    rng = np.random.default_rng(seed + 500)
    kpts = np.zeros((7, 18, 3))
    for p in range(7):
        cx, cy = rng.uniform(60, 310), rng.uniform(80, 290)
        scale = rng.uniform(0.3, 0.5)
        offsets = np.array([
            (0, -95), (0, -70), (-25, -70), (-32, -35), (-36, 0), (25, -70),
            (32, -35), (36, 0), (-18, 0), (-20, 45), (-20, 90), (18, 0),
            (20, 45), (20, 90), (-8, -103), (8, -103), (-17, -99), (17, -99),
        ])
        kpts[p, :, :2] = (
            np.array([cx, cy]) + offsets * scale + rng.normal(0, 2, (18, 2))
        )
        kpts[p, :, 2] = 2
    heat, pafs = gen_targets_np(kpts, GY, GX, STRIDE, 7.0)
    heat = (heat + rng.normal(0, 0.02, heat.shape)).astype(np.float32)
    pafs = (pafs + rng.normal(0, 0.02, pafs.shape)).astype(np.float32)
    want = oracle.paf_to_pose_numpy(heat, pafs, small_cfg)
    got = device.paf_to_pose_jax(heat, pafs, small_cfg)
    _assert_same_humans(got, want)


def test_device_matches_oracle_threshold_straddle(small_cfg):
    """Heatmap values straddling THRESH_HEATMAP and PAF magnitudes around
    THRESH_PAF: the accept/reject boundary must agree with the oracle."""
    rng = np.random.default_rng(77)
    heat = np.zeros((GY, GX, 19), dtype=np.float32)
    pafs = np.zeros((GY, GX, 38), dtype=np.float32)
    thr = small_cfg.TEST.THRESH_HEATMAP
    # isolated peaks at, just above, and just below threshold
    spots = [(8, 8, thr + 0.05), (8, 30, thr + 0.004), (30, 8, thr - 0.004),
             (30, 30, thr + 0.2), (20, 20, thr + 0.11)]
    for j, (y, x, v) in enumerate(spots):
        heat[y, x, j % 18] = v
        heat[y - 1, x, j % 18] = v * 0.5
        heat[y, x - 1, j % 18] = v * 0.5
    heat[..., 18] = np.clip(1 - heat[..., :18].max(-1), 0, 1)
    heat += rng.normal(0, 0.001, heat.shape).astype(np.float32)
    pafs += rng.normal(0, small_cfg.TEST.THRESH_PAF, pafs.shape).astype(
        np.float32
    )
    want = oracle.paf_to_pose_numpy(heat, pafs, small_cfg)
    got = device.paf_to_pose_jax(heat, pafs, small_cfg)
    _assert_same_humans(got, want)
