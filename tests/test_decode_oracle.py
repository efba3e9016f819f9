"""Numpy oracle decoder tests: synthetic skeletons with known ground truth,
plus NMS parity against an inline scipy/cv2 re-expression of the reference's
peak refinement (reference lib/utils/paf_to_pose.py:26-133)."""

import numpy as np
import pytest

from torch_ekpose_tpu import constants
from torch_ekpose_tpu.config import cfg
from torch_ekpose_tpu.data import gen_targets_np
from torch_ekpose_tpu.decode import oracle

GY, GX, STRIDE = 46, 46, 8


def _skeleton(cx, cy, scale=1.0):
    """A synthetic upright 18-keypoint person centered at (cx, cy)."""
    offsets = {
        0: (0, -95), 1: (0, -70), 2: (-25, -70), 3: (-32, -35), 4: (-36, 0),
        5: (25, -70), 6: (32, -35), 7: (36, 0), 8: (-18, 0), 9: (-20, 45),
        10: (-20, 90), 11: (18, 0), 12: (20, 45), 13: (20, 90),
        14: (-8, -103), 15: (8, -103), 16: (-17, -99), 17: (17, -99),
    }
    kpts = np.zeros((18, 3))
    for j, (dx, dy) in offsets.items():
        kpts[j] = [cx + dx * scale, cy + dy * scale, 2]
    return kpts


def _targets(people):
    kpts = np.stack(people)
    return gen_targets_np(kpts, GY, GX, STRIDE, 7.0)


def test_single_person_assembled():
    gt = _skeleton(184, 184)
    heat, pafs = _targets([gt])
    humans = oracle.paf_to_pose_numpy(heat, pafs, cfg)
    assert len(humans) == 1
    h = humans[0]
    assert h.part_count() >= 16
    for j, part in h.body_parts.items():
        x, y = part.x * GX * STRIDE, part.y * GY * STRIDE
        assert abs(x - gt[j, 0]) <= 6.0, (j, x, gt[j, 0])
        assert abs(y - gt[j, 1]) <= 6.0, (j, y, gt[j, 1])
    assert h.score > 0.3


def test_two_people_separated():
    gt1, gt2 = _skeleton(100, 184, 0.8), _skeleton(270, 184, 0.8)
    heat, pafs = _targets([gt1, gt2])
    humans = oracle.paf_to_pose_numpy(heat, pafs, cfg)
    assert len(humans) == 2
    # each human's neck should be near one of the two ground-truth necks
    necks = sorted(h.body_parts[1].x * GX * STRIDE for h in humans)
    assert abs(necks[0] - 100) <= 8 and abs(necks[1] - 270) <= 8


def test_empty_maps_give_no_humans():
    heat = np.zeros((GY, GX, 19), dtype=np.float32)
    heat[:, :, -1] = 1.0
    pafs = np.zeros((GY, GX, 38), dtype=np.float32)
    assert oracle.paf_to_pose_numpy(heat, pafs, cfg) == []


def test_tiny_fragment_is_dropped():
    # Only nose + neck visible: a single connection -> 2 parts < 4 -> dropped
    kpts = np.zeros((1, 18, 3))
    kpts[0, 0] = [184, 100, 2]
    kpts[0, 1] = [184, 140, 2]
    heat, pafs = _targets([kpts[0]])
    assert oracle.paf_to_pose_numpy(heat, pafs, cfg) == []


def test_find_peaks_semantics():
    m = np.zeros((9, 9), dtype=np.float32)
    m[4, 4] = 0.9          # clear peak
    m[1, 1] = 0.1          # below threshold
    m[7, 2] = 0.5
    m[7, 3] = 0.5          # plateau: both are 4-neighbor maxima
    peaks = oracle.find_peaks(m, 0.15)
    as_set = {tuple(p) for p in peaks}
    assert (4, 4) in as_set
    assert (1, 1) not in as_set
    assert (2, 7) in as_set and (3, 7) in as_set
    # scan order is row-major (y, then x), coordinates returned as (x, y)
    assert peaks[0].tolist() == [4, 4]


def test_nms_matches_inline_reference():
    """Re-express the reference NMS (scipy maximum_filter cross footprint,
    cv2 INTER_CUBIC x8 5x5-patch refinement, paf_to_pose.py:94-131) inline
    and compare peak coordinates/scores."""
    cv2 = pytest.importorskip("cv2")
    scipy_ndimage = pytest.importorskip("scipy.ndimage")

    rng = np.random.default_rng(42)
    heat, _ = _targets([_skeleton(150, 200), _skeleton(260, 170, 0.7)])
    heat = heat + rng.normal(0, 0.01, heat.shape).astype(np.float32)

    ours = oracle.nms(heat, 0.15, 8, 18)

    win = 2
    for j in range(18):
        m = heat[:, :, j].astype(np.float32)
        footprint = scipy_ndimage.generate_binary_structure(2, 1)
        mask = (scipy_ndimage.maximum_filter(m, footprint=footprint) == m) & (
            m > 0.15
        )
        coords = np.array(np.nonzero(mask)[::-1]).T  # [[x, y], ...]
        assert len(coords) == len(ours[j]), f"joint {j} peak count"
        for i, (px, py) in enumerate(coords):
            x_min, y_min = np.maximum(0, np.array([px, py]) - win)
            x_max = min(m.shape[1] - 1, px + win)
            y_max = min(m.shape[0] - 1, py + win)
            patch = m[y_min:y_max + 1, x_min:x_max + 1]
            up = cv2.resize(
                patch, None, fx=8, fy=8, interpolation=cv2.INTER_CUBIC
            )
            loc = np.unravel_index(up.argmax(), up.shape)
            center = (np.array([py - y_min, px - x_min]) + 0.5) * 8 - 0.5
            refined = np.array(loc) - center
            expect_x = (px + 0.5) * 8 - 0.5 + refined[1]
            expect_y = (py + 0.5) * 8 - 0.5 + refined[0]
            np.testing.assert_allclose(
                ours[j][i][:3], [expect_x, expect_y, up[loc]],
                rtol=1e-4, atol=1e-3,
            )


def test_decode_respects_part_count_threshold():
    # person with exactly 4 chained parts survives (count >= THRESH_PART_CNT)
    kpts = np.zeros((18, 3))
    kpts[1] = [184, 120, 2]   # neck
    kpts[2] = [150, 120, 2]   # rshoulder
    kpts[3] = [140, 160, 2]   # relbow
    kpts[4] = [135, 200, 2]   # rwrist
    heat, pafs = _targets([kpts])
    humans = oracle.paf_to_pose_numpy(heat, pafs, cfg)
    assert len(humans) == 1
    assert humans[0].part_count() == 4
