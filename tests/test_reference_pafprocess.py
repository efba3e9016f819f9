"""Cross-validate every decode backend against the reference's REAL
``pafprocess`` SWIG extension, built from /root/reference/lib/pafprocess
exactly as the reference does (reference lib/pafprocess/make.sh:1).

This closes the self-referential parity chain: previously the oracle was
checked against a hand re-expression of the reference algorithm; here the
reference's own C++ assembler (pafprocess.cpp:22-194) is executed on
identical inputs and its person rows compared with:

- ``decode/oracle.py::decode`` (numpy oracle, peaks injected),
- ``native/pafdecode.cpp`` via ``native.process_paf`` (peaks injected),
- ``decode/device.py::decode_jax`` (on-device; its own NMS peaks are fed
  BACK into the reference assembler so both see the same peak list).

Input protocol pinned from the reference consumer
(reference lib/utils/paf_to_pose.py:346-361 ``paf_to_pose_cpp``):
``joint_list`` [1, P, 5] float32 (x, y, score, gid, part) in the x8
upsampled frame, part-major, plus x8 INTER_NEAREST-upsampled heatmap/PAF.
For integer factors cv2's INTER_NEAREST maps dst pixel i -> src i//8,
i.e. ``np.repeat``; the assembler reads only the PAF values and the
upsampled height h1 (criterion2, pafprocess.cpp:83).
"""

from __future__ import annotations

import shutil
import subprocess
import sys
import zlib

import numpy as np
import pytest

from torch_ekpose_tpu import constants, native
from torch_ekpose_tpu.config import cfg
from torch_ekpose_tpu.decode import oracle

STRIDE = 8
NPART = 18
NPAIR = 19

REF_DIR = "/root/reference/lib/pafprocess"


# ---------------------------------------------------------------------------
# reference extension build (once per session)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="session")
def refpaf(tmp_path_factory):
    """Build the reference SWIG extension in a tmp copy and import it."""
    if shutil.which("swig") is None:
        pytest.skip("swig not available")
    src = tmp_path_factory.mktemp("refpaf")
    for name in ("pafprocess.cpp", "pafprocess.h", "pafprocess.i",
                 "numpy.i", "setup.py"):
        shutil.copy(f"{REF_DIR}/{name}", src / name)
    try:
        subprocess.run(
            ["swig", "-python", "-c++", "pafprocess.i"],
            cwd=src, check=True, capture_output=True,
        )
        subprocess.run(
            [sys.executable, "setup.py", "build_ext", "--inplace"],
            cwd=src, check=True, capture_output=True,
        )
    except subprocess.CalledProcessError as e:  # pragma: no cover
        pytest.skip(f"reference pafprocess build failed: {e.stderr[-400:]}")
    sys.path.insert(0, str(src))
    try:
        import pafprocess as mod  # noqa: F401

        # the SWIG wrapper resolves _pafprocess relative to sys.path
        yield mod
    finally:
        sys.path.remove(str(src))


def run_reference(refpaf, peaks_flat: np.ndarray, pafs: np.ndarray):
    """Feed one image through the reference assembler.

    Returns (rows, parts): ``rows`` is the subset as [M, 20] (cid / score
    / count, reference numbering = input row order), ``parts`` the list of
    humans as {part_id: (x, y, score)} dicts plus the person score.
    """
    h, w = pafs.shape[:2]
    joint_list = np.ascontiguousarray(
        peaks_flat.reshape(1, -1, 5), dtype=np.float32
    )
    heat_up = np.zeros((h * STRIDE, w * STRIDE, 19), dtype=np.float32)
    paf_up = np.ascontiguousarray(
        np.repeat(np.repeat(pafs, STRIDE, 0), STRIDE, 1), dtype=np.float32
    )
    refpaf.process_paf(joint_list, heat_up, paf_up)

    rows, humans = [], []
    for hid in range(refpaf.get_num_humans()):
        row = np.full(20, -1.0)
        parts = {}
        for part in range(NPART):
            cid = int(refpaf.get_part_cid(hid, part))
            row[part] = cid
            if cid >= 0:
                parts[part] = (
                    int(refpaf.get_part_x(cid)),
                    int(refpaf.get_part_y(cid)),
                    round(float(refpaf.get_part_score(cid)), 4),
                )
        score = float(refpaf.get_score(hid))
        rows.append(row)
        humans.append((parts, round(score, 4)))
    return rows, humans


def subset_to_humans(subset: np.ndarray, peaks_flat: np.ndarray):
    """[M, 20] person rows + flat peaks -> the same signature as
    :func:`run_reference` (part -> (x, y, score), person score)."""
    humans = []
    for row in np.asarray(subset):
        parts = {}
        for part in range(NPART):
            cid = int(row[part])
            if cid >= 0:
                x, y, s = peaks_flat[cid, 0], peaks_flat[cid, 1], \
                    peaks_flat[cid, 2]
                parts[part] = (int(x), int(y), round(float(s), 4))
        humans.append((parts, round(float(row[18] / max(row[19], 1)), 4)))
    return humans


# ---------------------------------------------------------------------------
# fixture scenes (peak lists + PAF maps)
# ---------------------------------------------------------------------------


def paint_limb(pafs, p_a, p_b, pair_id, width=2):
    """Paint a unit-vector PAF corridor for one limb in grid space."""
    chx, chy = constants.COCO_PAIRS_NET[pair_id]
    ax, ay = p_a[0] / STRIDE, p_a[1] / STRIDE
    bx, by = p_b[0] / STRIDE, p_b[1] / STRIDE
    vec = np.array([bx - ax, by - ay])
    norm = np.hypot(*vec)
    if norm < 1e-6:
        return
    vec = vec / norm
    for t in np.linspace(0, 1, 32):
        gx, gy = ax + t * (bx - ax), ay + t * (by - ay)
        x0, x1 = int(gx) - width, int(gx) + width + 1
        y0, y1 = int(gy) - width, int(gy) + width + 1
        h, w = pafs.shape[:2]
        pafs[max(0, y0):min(h, y1), max(0, x0):min(w, x1), chx] = vec[0]
        pafs[max(0, y0):min(h, y1), max(0, x0):min(w, x1), chy] = vec[1]


def make_person(rng, w_up, h_up, cx, cy, scale=60.0):
    """A plausible 18-part skeleton centred at (cx, cy), int coords."""
    # rough template in unit space (x right, y down), reference part order
    template = np.array([
        [0.0, -1.0], [0.0, -0.6], [-0.35, -0.6], [-0.45, -0.1],
        [-0.5, 0.35], [0.35, -0.6], [0.45, -0.1], [0.5, 0.35],
        [-0.2, 0.2], [-0.22, 0.75], [-0.24, 1.3], [0.2, 0.2],
        [0.22, 0.75], [0.24, 1.3], [-0.1, -1.1], [0.1, -1.1],
        [-0.22, -1.05], [0.22, -1.05],
    ])
    pts = template * scale + rng.normal(0, 2.0, template.shape)
    pts[:, 0] += cx
    pts[:, 1] += cy
    pts[:, 0] = np.clip(pts[:, 0], 0, w_up - 1)
    pts[:, 1] = np.clip(pts[:, 1], 0, h_up - 1)
    return pts.astype(np.int64)


def scene_people(rng, n_people, grid_h=40, grid_w=48, drop=0.0,
                 tie_scores=False):
    """n persons with painted PAF corridors; returns (peaks_flat, pafs)."""
    h_up, w_up = grid_h * STRIDE, grid_w * STRIDE
    pafs = np.zeros((grid_h, grid_w, 38), dtype=np.float32)
    peaks_by_part = [[] for _ in range(NPART)]
    for p in range(n_people):
        cx = rng.uniform(80, w_up - 80)
        cy = rng.uniform(100, h_up - 100)
        pts = make_person(rng, w_up, h_up, cx, cy)
        keep = rng.random(NPART) >= drop
        for pair_id, (a, b) in enumerate(constants.COCO_PAIRS):
            if keep[a] and keep[b]:
                paint_limb(pafs, pts[a], pts[b], pair_id)
        for part in range(NPART):
            if keep[part]:
                score = 0.5 if tie_scores else float(rng.uniform(0.3, 1.0))
                peaks_by_part[part].append(
                    [float(pts[part, 0]), float(pts[part, 1]), score]
                )
    return flatten(peaks_by_part), pafs


def scene_random(rng, grid_h=24, grid_w=24, max_per_part=4):
    """Chaos: random peaks, random PAF — exercises the filter paths."""
    h_up, w_up = grid_h * STRIDE, grid_w * STRIDE
    pafs = rng.uniform(-1, 1, (grid_h, grid_w, 38)).astype(np.float32)
    peaks_by_part = [[] for _ in range(NPART)]
    for part in range(NPART):
        for _ in range(int(rng.integers(0, max_per_part + 1))):
            peaks_by_part[part].append([
                float(rng.integers(0, w_up)),
                float(rng.integers(0, h_up)),
                float(rng.uniform(0.05, 1.0)),
            ])
    return flatten(peaks_by_part), pafs


def flatten(peaks_by_part):
    """part-major [P, 5] (x, y, score, gid, part) with gid = row index —
    the reference assembler numbers cids by input order
    (pafprocess.cpp:26-35)."""
    rows, gid = [], 0
    for part, plist in enumerate(peaks_by_part):
        for x, y, s in plist:
            rows.append([x, y, s, gid, part])
            gid += 1
    return (np.array(rows, dtype=np.float64) if rows
            else np.zeros((0, 5), dtype=np.float64))


def to_parts_lists(peaks_flat):
    """flat -> per-part [N, 4] (x, y, score, gid) for oracle.decode."""
    out = []
    for part in range(NPART):
        sel = peaks_flat[peaks_flat[:, 4] == part]
        out.append(sel[:, :4] if len(sel) else np.zeros((0, 4)))
    return out


SCENES = [
    ("one_person", lambda rng: scene_people(rng, 1)),
    ("two_people", lambda rng: scene_people(rng, 2)),
    ("crowd4", lambda rng: scene_people(rng, 4, grid_h=52, grid_w=64)),
    ("missing_parts", lambda rng: scene_people(rng, 3, drop=0.3)),
    ("tie_scores", lambda rng: scene_people(rng, 2, tie_scores=True)),
    ("random_0", lambda rng: scene_random(rng)),
    ("random_1", lambda rng: scene_random(rng, grid_h=32, grid_w=20)),
    ("random_dense", lambda rng: scene_random(rng, max_per_part=8)),
    ("empty", lambda rng: (np.zeros((0, 5)),
                           np.zeros((24, 24, 38), np.float32))),
    ("single_peak", lambda rng: (np.array([[50., 50., 0.9, 0., 0.]]),
                                 np.zeros((24, 24, 38), np.float32))),
]


def border_scene():
    """Peaks exactly on the upsampled-frame border, incl. coincident pair
    (norm < 1e-12 skip, pafprocess.cpp:66)."""
    grid = 24
    up = grid * STRIDE
    pafs = np.ones((grid, grid, 38), dtype=np.float32) * 0.3
    peaks_by_part = [[] for _ in range(NPART)]
    peaks_by_part[1].append([0.0, 0.0, 0.9])           # corner neck
    peaks_by_part[2].append([0.0, 0.0, 0.8])           # coincident shoulder
    peaks_by_part[5].append([float(up - 1), 0.0, 0.7])
    peaks_by_part[8].append([0.0, float(up - 1), 0.6])
    peaks_by_part[11].append([float(up - 1), float(up - 1), 0.5])
    peaks_by_part[0].append([float(up - 1), float(up // 2), 0.4])
    return flatten(peaks_by_part), pafs


SCENES.append(("border", lambda rng: border_scene()))


# ---------------------------------------------------------------------------
# the cross-checks
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name,builder", SCENES, ids=[s[0] for s in SCENES])
def test_oracle_matches_reference(refpaf, name, builder):
    rng = np.random.default_rng(zlib.crc32(name.encode()))
    peaks_flat, pafs = builder(rng)
    ref_rows, ref_humans = run_reference(refpaf, peaks_flat, pafs)

    got_flat, subset = oracle.decode(
        np.zeros((*pafs.shape[:2], 19), np.float32), pafs,
        peaks_by_part=to_parts_lists(peaks_flat),
    )
    np.testing.assert_array_equal(got_flat[:, :2], peaks_flat[:, :2])
    assert len(subset) == len(ref_rows), (
        f"{name}: oracle found {len(subset)} people, reference "
        f"{len(ref_rows)}"
    )
    for i, (mine, ref) in enumerate(zip(subset, ref_rows)):
        np.testing.assert_array_equal(
            mine[:18].astype(int), ref[:18].astype(int),
            err_msg=f"{name}: person {i} part cids differ",
        )
    assert subset_to_humans(subset, peaks_flat) == ref_humans


@pytest.mark.parametrize("name,builder", SCENES, ids=[s[0] for s in SCENES])
def test_native_matches_reference(refpaf, name, builder):
    if not native.available():  # builds on demand inside available()
        pytest.skip("native pafdecode library unavailable")
    rng = np.random.default_rng(zlib.crc32(name.encode()))
    peaks_flat, pafs = builder(rng)
    ref_rows, ref_humans = run_reference(refpaf, peaks_flat, pafs)

    subset = native.process_paf(
        peaks_flat, pafs, stride=STRIDE,
        n_steps=cfg.TEST.NUM_INTERMED_PTS_BETWEEN_KEYPOINTS,
        thresh_paf=cfg.TEST.THRESH_PAF,
        thresh_vector_cnt1=cfg.TEST.THRESH_VECTOR_CNT1,
        thresh_part_cnt=cfg.TEST.THRESH_PART_CNT,
        thresh_human_score=cfg.TEST.THRESH_HUMAN_SCORE,
    )
    assert len(subset) == len(ref_rows)
    for i, (mine, ref) in enumerate(zip(subset, ref_rows)):
        np.testing.assert_array_equal(
            mine[:18].astype(int), ref[:18].astype(int),
            err_msg=f"{name}: person {i} part cids differ",
        )
    assert subset_to_humans(subset, peaks_flat) == ref_humans


def scene_mixed(rng):
    """People + clutter: painted skeletons with dropped parts, plus
    uniform-random spurious peaks and PAF noise — the adversarial middle
    ground between the structured and chaos scenes."""
    # scene_people centres people >=100 px from the border, so the
    # upsampled frame must exceed 200 px: grid >= 26 (26*8 = 208)
    grid_h = int(rng.integers(26, 56))
    grid_w = int(rng.integers(26, 56))
    peaks_flat, pafs = scene_people(
        rng, int(rng.integers(1, 5)), grid_h=grid_h, grid_w=grid_w,
        drop=float(rng.uniform(0.0, 0.4)),
        tie_scores=bool(rng.integers(0, 2)),
    )
    pafs = pafs + rng.normal(0, 0.08, pafs.shape).astype(np.float32)
    extra = [[] for _ in range(NPART)]
    for part in range(NPART):
        for _ in range(int(rng.integers(0, 3))):
            extra[part].append([
                float(rng.integers(0, grid_w * STRIDE)),
                float(rng.integers(0, grid_h * STRIDE)),
                float(rng.uniform(0.05, 1.0)),
            ])
    merged = [[] for _ in range(NPART)]
    for part in range(NPART):
        sel = peaks_flat[peaks_flat[:, 4] == part] if len(peaks_flat) \
            else np.zeros((0, 5))
        merged[part] = [list(r[:3]) for r in sel] + extra[part]
    return flatten(merged), pafs


@pytest.mark.parametrize("seed", range(24))
def test_fuzz_matches_reference(refpaf, seed):
    """Seeded fuzz sweep: oracle (and native, when buildable) person rows
    must equal the reference assembler's on randomized mixed scenes."""
    rng = np.random.default_rng(seed)
    peaks_flat, pafs = scene_mixed(rng)
    ref_rows, ref_humans = run_reference(refpaf, peaks_flat, pafs)

    _, subset = oracle.decode(
        np.zeros((*pafs.shape[:2], 19), np.float32), pafs,
        peaks_by_part=to_parts_lists(peaks_flat),
    )
    assert len(subset) == len(ref_rows), (
        f"seed {seed}: oracle {len(subset)} people vs reference "
        f"{len(ref_rows)}"
    )
    for i, (mine, ref) in enumerate(zip(subset, ref_rows)):
        np.testing.assert_array_equal(
            mine[:18].astype(int), ref[:18].astype(int),
            err_msg=f"seed {seed}: person {i} part cids differ",
        )
    assert subset_to_humans(subset, peaks_flat) == ref_humans

    if native.available():
        nat = native.process_paf(
            peaks_flat, pafs, stride=STRIDE,
            n_steps=cfg.TEST.NUM_INTERMED_PTS_BETWEEN_KEYPOINTS,
            thresh_paf=cfg.TEST.THRESH_PAF,
            thresh_vector_cnt1=cfg.TEST.THRESH_VECTOR_CNT1,
            thresh_part_cnt=cfg.TEST.THRESH_PART_CNT,
            thresh_human_score=cfg.TEST.THRESH_HUMAN_SCORE,
        )
        assert subset_to_humans(nat, peaks_flat) == ref_humans, (
            f"seed {seed}: native humans != reference"
        )


def _device_cases():
    # structured scenes only: the device decoder runs its own NMS, so we
    # need real heatmaps; its peak list is then fed back to the reference
    return [("one_person", 1), ("two_people", 2), ("crowd3", 3)]


@pytest.mark.parametrize("name,n_people", _device_cases(),
                         ids=[c[0] for c in _device_cases()])
def test_device_assembler_matches_reference(refpaf, name, n_people):
    """decode_jax's own peaks -> reference process_paf: person rows must
    agree with decode_jax's subset (same-peaks assembler cross-check)."""
    import jax.numpy as jnp

    from torch_ekpose_tpu.decode import device

    rng = np.random.default_rng(zlib.crc32(name.encode()))
    grid_h, grid_w = 40, 48
    peaks_flat, pafs = scene_people(rng, n_people, grid_h, grid_w)

    # rasterize peaks into a heatmap whose argmaxes land exactly on them
    heat = np.zeros((grid_h, grid_w, 19), dtype=np.float32)
    for x, y, s, _gid, part in peaks_flat:
        heat[int(y) // STRIDE, int(x) // STRIDE, int(part)] = s

    res = device.decode_jax(
        jnp.asarray(heat), jnp.asarray(pafs), max_peaks=8,
        use_pallas_loops=False,
    )
    peak_xy = np.asarray(res.peak_xy)
    peak_score = np.asarray(res.peak_score)
    peak_valid = np.asarray(res.peak_valid)
    subset = np.asarray(res.subset)
    person_valid = np.asarray(res.person_valid)

    # device cid (part * K + slot) -> flat part-major gid
    k = 8
    flat_rows, remap = [], {}
    gid = 0
    for part in range(NPART):
        for slot in range(k):
            cid = part * k + slot
            if peak_valid[cid]:
                remap[cid] = gid
                flat_rows.append([
                    float(peak_xy[cid, 0]), float(peak_xy[cid, 1]),
                    float(peak_score[cid]), gid, part,
                ])
                gid += 1
    dev_peaks = np.array(flat_rows, dtype=np.float64)

    _ref_rows, ref_humans = run_reference(refpaf, dev_peaks, pafs)

    mine = []
    for row, ok in zip(subset, person_valid):
        if not ok:
            continue
        parts = {}
        for part in range(NPART):
            cid = int(row[part])
            if cid >= 0 and cid in remap:
                g = remap[cid]
                parts[part] = (
                    int(dev_peaks[g, 0]), int(dev_peaks[g, 1]),
                    round(float(dev_peaks[g, 2]), 4),
                )
        mine.append((parts, round(float(row[18] / max(row[19], 1)), 4)))

    assert sorted(map(repr, mine)) == sorted(map(repr, ref_humans)), (
        f"{name}: device humans != reference humans\n"
        f"device: {mine}\nreference: {ref_humans}"
    )
