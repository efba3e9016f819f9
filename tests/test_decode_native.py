"""Native (C++) assembler parity against the numpy oracle on synthetic and
randomized scenes. Skipped when the toolchain can't build the library."""

import numpy as np
import pytest

from torch_ekpose_tpu import constants, native
from torch_ekpose_tpu.config import cfg
from torch_ekpose_tpu.data import gen_targets_np
from torch_ekpose_tpu.decode import api, oracle

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native pafdecode library unavailable"
)

GY, GX, STRIDE = 46, 46, 8


def _random_scene(rng, n_people):
    kpts = np.zeros((n_people, 18, 3))
    for p in range(n_people):
        cx, cy = rng.uniform(60, 300), rng.uniform(100, 280)
        scale = rng.uniform(0.4, 1.0)
        base = rng.normal(0, 4, size=(18, 2))
        offsets = np.array([
            (0, -95), (0, -70), (-25, -70), (-32, -35), (-36, 0), (25, -70),
            (32, -35), (36, 0), (-18, 0), (-20, 45), (-20, 90), (18, 0),
            (20, 45), (20, 90), (-8, -103), (8, -103), (-17, -99), (17, -99),
        ])
        kpts[p, :, :2] = np.array([cx, cy]) + offsets * scale + base
        kpts[p, :, 2] = rng.choice([0, 2], size=18, p=[0.15, 0.85])
    return gen_targets_np(kpts, GY, GX, STRIDE, 7.0)


def _humans_equal(h1, h2):
    if len(h1) != len(h2):
        return False
    for a, b in zip(h1, h2):
        if abs(a.score - b.score) > 1e-4:
            return False
        if set(a.body_parts) != set(b.body_parts):
            return False
        for idx in a.body_parts:
            pa, pb = a.body_parts[idx], b.body_parts[idx]
            if abs(pa.x - pb.x) > 1e-6 or abs(pa.y - pb.y) > 1e-6:
                return False
            if abs(pa.score - pb.score) > 1e-4:
                return False
    return True


@pytest.mark.parametrize("seed", range(6))
def test_native_matches_oracle_random_scenes(seed):
    rng = np.random.default_rng(seed)
    heat, pafs = _random_scene(rng, rng.integers(1, 5))
    heat = (heat + rng.normal(0, 0.02, heat.shape)).astype(np.float32)
    pafs = (pafs + rng.normal(0, 0.02, pafs.shape)).astype(np.float32)
    h_np = api.paf_to_pose(heat, pafs, cfg, backend="numpy")
    h_cc = api.paf_to_pose(heat, pafs, cfg, backend="native")
    assert _humans_equal(h_np, h_cc), f"seed {seed}"


def test_native_empty_input():
    heat = np.zeros((GY, GX, 19), dtype=np.float32)
    pafs = np.zeros((GY, GX, 38), dtype=np.float32)
    assert api.paf_to_pose(heat, pafs, cfg, backend="native") == []


def test_native_subset_matches_oracle_subset():
    rng = np.random.default_rng(7)
    heat, pafs = _random_scene(rng, 3)
    peaks_by_part = oracle.nms(heat, cfg.TEST.THRESH_HEATMAP, STRIDE)
    peaks_flat = api.flatten_peaks(peaks_by_part)
    _, subset_np = oracle.decode(heat, pafs, cfg, peaks_by_part=peaks_by_part)
    subset_cc = native.process_paf(
        peaks_flat, pafs, STRIDE,
        cfg.TEST.NUM_INTERMED_PTS_BETWEEN_KEYPOINTS,
        cfg.TEST.THRESH_PAF, cfg.TEST.THRESH_VECTOR_CNT1,
        cfg.TEST.THRESH_PART_CNT, cfg.TEST.THRESH_HUMAN_SCORE,
    )
    assert subset_cc.shape == subset_np.shape
    np.testing.assert_allclose(subset_cc, subset_np, rtol=1e-4, atol=1e-4)


def test_thread_safety_smoke():
    # the reference decoder keeps results in module globals and is not
    # thread-safe (pafprocess.cpp:12-13); ours must decode concurrently
    import concurrent.futures

    rng = np.random.default_rng(3)
    scenes = [_random_scene(np.random.default_rng(s), 2) for s in range(4)]
    expected = [
        api.paf_to_pose(h, p, cfg, backend="numpy") for h, p in scenes
    ]
    with concurrent.futures.ThreadPoolExecutor(max_workers=4) as ex:
        results = list(
            ex.map(
                lambda hp: api.paf_to_pose(hp[0], hp[1], cfg, backend="native"),
                scenes,
            )
        )
    for got, want in zip(results, expected):
        assert _humans_equal(got, want)
