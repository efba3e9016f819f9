"""Target-generation parity: numpy oracle vs a direct sequential
re-expression of the reference semantics (lib/datasets/heatmap.py:11-33,
lib/datasets/paf.py:11-63, lib/datasets/datasets.py:231-283), and the JAX
on-device version vs the numpy oracle."""

import numpy as np
import pytest

from torch_ekpose_tpu import constants
from torch_ekpose_tpu.data import gen_targets_jax, gen_targets_np

GY, GX, STRIDE, SIGMA = 46, 46, 8, 7.0


def _sequential_reference(keypoints):
    """Straight sequential implementation of the reference's accumulation
    order (per-person clip for heatmaps, running per-pixel mean for PAFs)."""
    heat = np.zeros((GY, GX, 19))
    start = STRIDE / 2.0 - 0.5
    xx, yy = np.meshgrid(
        np.arange(GX) * STRIDE + start, np.arange(GY) * STRIDE + start
    )
    for j in range(18):
        for person in keypoints:
            if person[j, 2] <= 0.5:
                continue
            d2 = (xx - person[j, 0]) ** 2 + (yy - person[j, 1]) ** 2
            e = d2 / 2.0 / SIGMA / SIGMA
            heat[:, :, j] += np.exp(-e) * (e <= 4.6052)
            heat[:, :, j] = np.minimum(heat[:, :, j], 1.0)
    heat[:, :, -1] = np.maximum(1 - heat[:, :, :18].max(axis=2), 0.0)

    pafs = np.zeros((GY, GX, 38))
    pxx, pyy = np.meshgrid(np.arange(GX), np.arange(GY))
    for i, (k1, k2) in enumerate(constants.LIMB_IDS):
        count = np.zeros((GY, GX))
        acc = np.zeros((GY, GX, 2))
        for person in keypoints:
            if person[k1, 2] <= 0.5 or person[k2, 2] <= 0.5:
                continue
            a, b = person[k1, :2] / STRIDE, person[k2, :2] / STRIDE
            limb = b - a
            norm = np.linalg.norm(limb)
            if norm == 0.0:
                continue
            u = limb / norm
            min_x = max(int(round(min(a[0], b[0]) - 1)), 0)
            max_x = min(int(round(max(a[0], b[0]) + 1)), GX)
            min_y = max(int(round(min(a[1], b[1]) - 1)), 0)
            max_y = min(int(round(max(a[1], b[1]) + 1)), GY)
            bbox = (pxx >= min_x) & (pxx < max_x) & (pyy >= min_y) & (pyy < max_y)
            perp = np.abs((pxx - a[0]) * u[1] - (pyy - a[1]) * u[0])
            mask = bbox & (perp < 1)
            vec = mask[:, :, None] * u[None, None, :]
            acc = acc * count[:, :, None] + vec
            count = count + mask
            denom = np.where(count == 0, 1, count)
            acc = acc / denom[:, :, None]
        pafs[:, :, 2 * i: 2 * i + 2] = acc
    return heat.astype(np.float32), pafs.astype(np.float32)


def _random_people(rng, n):
    kpts = np.zeros((n, 18, 3))
    kpts[:, :, 0] = rng.uniform(0, GX * STRIDE, size=(n, 18))
    kpts[:, :, 1] = rng.uniform(0, GY * STRIDE, size=(n, 18))
    kpts[:, :, 2] = rng.choice([0, 1, 2], size=(n, 18), p=[0.2, 0.2, 0.6])
    return kpts


@pytest.mark.parametrize("n_people", [1, 3])
def test_np_matches_sequential_reference(rng, n_people):
    kpts = _random_people(rng, n_people)
    h_ref, p_ref = _sequential_reference(kpts)
    h_ours, p_ours = gen_targets_np(kpts, GY, GX, STRIDE, SIGMA)
    np.testing.assert_allclose(h_ours, h_ref, atol=1e-6)
    np.testing.assert_allclose(p_ours, p_ref, atol=1e-6)


def test_jax_matches_np(rng):
    kpts = _random_people(rng, 4)
    h_np, p_np = gen_targets_np(kpts, GY, GX, STRIDE, SIGMA)
    h_jax, p_jax = gen_targets_jax(kpts, GY, GX, STRIDE, SIGMA)
    np.testing.assert_allclose(np.asarray(h_jax), h_np, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p_jax), p_np, atol=1e-5)


def test_heatmap_peak_location_and_background():
    kpts = np.zeros((1, 18, 3))
    kpts[0, 0] = [100.0, 60.0, 2]  # nose at image coords (100, 60)
    heat, _ = gen_targets_np(kpts, GY, GX, STRIDE, SIGMA)
    iy, ix = np.unravel_index(np.argmax(heat[:, :, 0]), (GY, GX))
    # peak grid cell ~ (coord - start) / stride
    assert abs(ix * STRIDE + STRIDE / 2 - 0.5 - 100.0) <= STRIDE
    assert abs(iy * STRIDE + STRIDE / 2 - 0.5 - 60.0) <= STRIDE
    # background complements the foreground max
    np.testing.assert_allclose(
        heat[:, :, -1], np.maximum(1 - heat[:, :, :18].max(axis=2), 0),
        atol=1e-7,
    )


def test_paf_unit_vector_along_limb():
    kpts = np.zeros((1, 18, 3))
    kpts[0, 1] = [80.0, 80.0, 2]    # neck
    kpts[0, 8] = [80.0, 240.0, 2]   # right_hip: straight down
    _, pafs = gen_targets_np(kpts, GY, GX, STRIDE, SIGMA)
    # limb (1, 8) is LIMB_IDS[0] -> channels 0 (x), 1 (y)
    assert constants.LIMB_IDS[0] == (1, 8)
    col = int(80 / STRIDE)
    rows = slice(int(80 / STRIDE) + 1, int(240 / STRIDE) - 1)
    np.testing.assert_allclose(pafs[rows, col, 0], 0.0, atol=1e-7)
    np.testing.assert_allclose(pafs[rows, col, 1], 1.0, atol=1e-7)
    # outside the corridor the field is zero
    assert np.all(pafs[rows, col + 3, :2] == 0)


def test_overlapping_limbs_average():
    kpts = np.zeros((2, 18, 3))
    # two people with identical vertical neck->right_hip limbs, opposite dirs
    kpts[0, 1] = [80.0, 80.0, 2]
    kpts[0, 8] = [80.0, 240.0, 2]
    kpts[1, 1] = [80.0, 240.0, 2]
    kpts[1, 8] = [80.0, 80.0, 2]
    _, pafs = gen_targets_np(kpts, GY, GX, STRIDE, SIGMA)
    col = int(80 / STRIDE)
    rows = slice(int(80 / STRIDE) + 1, int(240 / STRIDE) - 1)
    # +1 and -1 average to 0
    np.testing.assert_allclose(pafs[rows, col, 1], 0.0, atol=1e-7)


def test_batched_vmap_shapes():
    from torch_ekpose_tpu.data import make_batched_target_fn

    fn = make_batched_target_fn(23, 31, STRIDE, SIGMA)
    batch = np.zeros((2, 5, 18, 3), dtype=np.float32)
    batch[0, 0, 0] = [50, 50, 2]
    heat, pafs = fn(batch)
    assert heat.shape == (2, 23, 31, 19)
    assert pafs.shape == (2, 23, 31, 38)
