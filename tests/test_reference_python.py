"""Cross-validation against reference-EXECUTED Python components.

test_reference_pafprocess.py closes the parity chain for the C++
assembler; this file does the same for every directly importable Python
component of the reference (/root/reference, read-only): the target
generators, inference padding, the preprocessors, peak NMS with sub-pixel
refinement, and the Human face/upper-body box heuristics. Each test runs
the reference's own code on the same inputs as ours and requires
identical results — no re-expressions in the loop.

(lib.datasets.transforms and lib.datasets.datasets stay out of reach:
they import torchvision at module scope for photometric ops, and their
geometric behavior is driven by global np.random state — covered instead
by the pinned-semantics tests in test_data_pipeline.py.)
"""

import sys
import types

import numpy as np
import pytest

from torch_ekpose_tpu import constants
from torch_ekpose_tpu.config import get_default_config

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    """Import the reference's dependency-light modules.

    ``lib.utils.paf_to_pose`` imports the SWIG pafprocess module at
    module scope (paf_to_pose.py:7); its NMS never touches it, so a stub
    satisfies the import without building the extension here.
    """
    if "lib.pafprocess.pafprocess" not in sys.modules:
        sys.modules["lib.pafprocess.pafprocess"] = types.ModuleType(
            "lib.pafprocess.pafprocess"
        )
    sys.path.insert(0, REFERENCE)
    try:
        from lib.datasets import heatmap as ref_heatmap
        from lib.datasets import paf as ref_paf
        from lib.datasets import preprocessing as ref_preprocessing
        from lib.evaluate import estimator as ref_estimator
        from lib.utils import common as ref_common
        from lib.utils import paf_to_pose as ref_paf_to_pose
    finally:
        sys.path.remove(REFERENCE)
    return types.SimpleNamespace(
        heatmap=ref_heatmap,
        paf=ref_paf,
        preprocessing=ref_preprocessing,
        estimator=ref_estimator,
        common=ref_common,
        paf_to_pose=ref_paf_to_pose,
    )


# ---------------------------------------------------------------------------
# target generation (reference lib/datasets/heatmap.py:11-33, paf.py:11-63,
# driven exactly as datasets.py:231-283 does)
# ---------------------------------------------------------------------------


def _random_keypoints(rng, n_people, input_size=368):
    """[P, 18, 3] internal-order keypoints with mixed visibility.

    Visible joints stay in-frame: the reference generators only ever see
    coordinates that passed ``remove_illegal_joint``
    (datasets.py:199-209) — fed joints fully outside the frame, the
    reference's putVecMaps crashes on an empty meshgrid
    (paf.py:35-47, float64 empty-array indexing), while ours just
    rasterizes nothing. Invisible joints carry junk coords to prove both
    sides ignore them.
    """
    kps = np.zeros((n_people, 18, 3))
    kps[:, :, 0] = rng.uniform(0, input_size - 1, (n_people, 18))
    kps[:, :, 1] = rng.uniform(0, input_size - 1, (n_people, 18))
    kps[:, :, 2] = rng.choice([0.0, 1.0, 2.0], (n_people, 18),
                              p=[0.2, 0.2, 0.6])
    junk = kps[:, :, 2] < 0.5
    kps[:, :, 0] = np.where(junk, -1.0, kps[:, :, 0])
    kps[:, :, 1] = np.where(junk, -1.0, kps[:, :, 1])
    return kps


def _reference_targets(ref, keypoints, grid_y, grid_x, stride):
    """The reference get_ground_truth inner loops (datasets.py:251-282),
    calling the reference's OWN putGaussianMaps/putVecMaps."""
    heatmaps = np.zeros((grid_y, grid_x, 19))
    pafs = np.zeros((grid_y, grid_x, 38))
    for i in range(18):
        for joint in keypoints[:, i]:
            if joint[2] > 0.5:
                heatmaps[:, :, i] = ref.heatmap.putGaussianMaps(
                    joint[:2], heatmaps[:, :, i], 7.0, grid_y, grid_x,
                    stride,
                )
    for i, (k1, k2) in enumerate(constants.LIMB_IDS):
        count = np.zeros((grid_y, grid_x), dtype=np.uint32)
        for joint in keypoints:
            if joint[k1, 2] > 0.5 and joint[k2, 2] > 0.5:
                pafs[:, :, 2 * i:2 * (i + 1)], count = ref.paf.putVecMaps(
                    centerA=joint[k1, :2], centerB=joint[k2, :2],
                    accumulate_vec_map=pafs[:, :, 2 * i:2 * (i + 1)],
                    count=count, grid_y=grid_y, grid_x=grid_x,
                    stride=stride,
                )
    heatmaps[:, :, -1] = np.maximum(
        1 - np.max(heatmaps[:, :, :18], axis=2), 0.0
    )
    return heatmaps, pafs


@pytest.mark.parametrize("seed,n_people", [(0, 1), (1, 2), (2, 4), (3, 7)])
def test_targets_match_reference(ref, seed, n_people):
    from torch_ekpose_tpu.data.targets import gen_targets_np

    rng = np.random.default_rng(seed)
    kps = _random_keypoints(rng, n_people)
    grid = 368 // 8
    want_heat, want_paf = _reference_targets(ref, kps, grid, grid, 8)
    got_heat, got_paf = gen_targets_np(kps, grid, grid, stride=8)
    np.testing.assert_allclose(got_heat, want_heat, atol=1e-6)
    np.testing.assert_allclose(got_paf, want_paf, atol=1e-6)


def test_targets_coincident_joints_match_reference(ref):
    """norm == 0 limbs skip (reference paf.py:24-26); exact overlap."""
    from torch_ekpose_tpu.data.targets import gen_targets_np

    kps = np.zeros((2, 18, 3))
    kps[:, :, :2] = 100.0  # every joint of both people at one point
    kps[:, :, 2] = 2.0
    grid = 46
    want_heat, want_paf = _reference_targets(ref, kps, grid, grid, 8)
    got_heat, got_paf = gen_targets_np(kps, grid, grid, stride=8)
    np.testing.assert_allclose(got_heat, want_heat, atol=1e-6)
    np.testing.assert_allclose(got_paf, want_paf, atol=1e-6)


# ---------------------------------------------------------------------------
# inference padding (reference lib/evaluate/estimator.py:45-68)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("h,w", [(480, 640), (640, 480), (368, 368),
                                 (123, 457), (17, 31), (800, 133)])
def test_padding_matches_reference(ref, h, w):
    from torch_ekpose_tpu.runtime.estimator import padding

    pytest.importorskip("cv2")
    rng = np.random.default_rng(h * 1000 + w)
    im = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    want_pad, want_scale, want_shape = ref.estimator.padding(im, 368, 8)
    got_pad, got_scale, got_shape = padding(im, 368, 8)
    assert got_scale == want_scale
    assert tuple(got_shape) == tuple(want_shape)
    np.testing.assert_array_equal(got_pad, want_pad)


# ---------------------------------------------------------------------------
# preprocessors (reference lib/datasets/preprocessing.py:16-98)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["rtpose", "vgg", "inception", "ssd"])
def test_preprocess_matches_reference(ref, mode):
    import torch_ekpose_tpu.data.preprocessing as ours

    rng = np.random.default_rng(hash(mode) % 2**32)
    im = rng.integers(0, 255, (46, 62, 3)).astype(np.uint8)
    want = getattr(ref.preprocessing, f"{mode}_preprocess")(im.copy())
    got = getattr(ours, f"{mode}_preprocess")(im.copy())
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-6)


@pytest.mark.parametrize("mode", ["rtpose", "vgg", "inception"])
def test_inverse_preprocess_matches_reference(ref, mode):
    import torch_ekpose_tpu.data.preprocessing as ours

    rng = np.random.default_rng(1 + hash(mode) % 2**32)
    im = rng.integers(0, 255, (46, 62, 3)).astype(np.uint8)
    chw = getattr(ref.preprocessing, f"{mode}_preprocess")(im.copy())
    want = getattr(ref.preprocessing, f"inverse_{mode}_preprocess")(
        np.asarray(chw).copy()
    )
    got = getattr(ours, f"inverse_{mode}_preprocess")(
        np.asarray(chw).copy()
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=1e-3,
    )


# ---------------------------------------------------------------------------
# peak NMS + sub-pixel refinement (reference lib/utils/paf_to_pose.py:26-133)
# ---------------------------------------------------------------------------


def _smooth_heatmaps(rng, gy=46, gx=58, n=19):
    """Peaky but smooth random heatmaps (bicubic-upsampled noise)."""
    from scipy.ndimage import gaussian_filter

    base = rng.random((gy, gx, n)).astype(np.float32)
    for j in range(n):
        base[:, :, j] = gaussian_filter(base[:, :, j], sigma=2.0)
    base -= base.min()
    base /= base.max()
    return base.astype(np.float32)


@pytest.mark.parametrize("seed", range(4))
def test_nms_matches_reference(ref, seed):
    from torch_ekpose_tpu.decode import oracle

    pytest.importorskip("cv2")
    rng = np.random.default_rng(seed)
    heatmaps = _smooth_heatmaps(rng)
    cfg = get_default_config()
    want = ref.paf_to_pose.NMS(
        heatmaps.copy(), upsampFactor=8, config=cfg
    )
    got = oracle.nms(
        heatmaps.copy(), thresh=cfg.TEST.THRESH_HEATMAP, upsamp=8,
    )
    assert len(got) == len(want) == 18
    for j, (mine, theirs) in enumerate(zip(got, want)):
        theirs = np.asarray(theirs, dtype=np.float64).reshape(-1, 4)
        assert mine.shape == theirs.shape, (
            f"joint {j}: {mine.shape} vs reference {theirs.shape}"
        )
        np.testing.assert_allclose(
            mine, theirs, atol=1e-4,
            err_msg=f"joint {j} peak rows differ",
        )


def test_nms_unrefined_matches_reference(ref):
    from torch_ekpose_tpu.decode import oracle

    rng = np.random.default_rng(11)
    heatmaps = _smooth_heatmaps(rng)
    cfg = get_default_config()
    want = ref.paf_to_pose.NMS(
        heatmaps.copy(), upsampFactor=8, bool_refine_center=False,
        config=cfg,
    )
    got = oracle.nms(
        heatmaps.copy(), thresh=cfg.TEST.THRESH_HEATMAP, upsamp=8,
        refine=False,
    )
    for mine, theirs in zip(got, want):
        np.testing.assert_allclose(
            mine, np.asarray(theirs, np.float64).reshape(-1, 4), atol=1e-4
        )


# ---------------------------------------------------------------------------
# legacy pure-Python decoder (reference lib/utils/paf_to_pose.py:136-343)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(3))
def test_legacy_decoder_matches_reference(ref, seed):
    """joint_list and person rows of the 7-limb legacy pipeline."""
    from torch_ekpose_tpu.decode.legacy import paf_to_pose_legacy

    pytest.importorskip("cv2")
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(seed)
    heatmaps = _smooth_heatmaps(rng)
    pafs = rng.uniform(-1, 1, (46, 58, 38)).astype(np.float32)
    for c in range(38):
        pafs[:, :, c] = gaussian_filter(pafs[:, :, c], sigma=3.0)
    pafs *= 3.0  # push some line integrals over the 0.05 bar

    cfg = get_default_config()
    want_joints, want_people = ref.paf_to_pose.paf_to_pose(
        heatmaps.copy(), pafs.copy(), cfg
    )
    got_joints, got_people = paf_to_pose_legacy(
        heatmaps.copy(), pafs.copy(), cfg
    )
    np.testing.assert_allclose(
        got_joints, np.asarray(want_joints, np.float64), atol=1e-4
    )
    want_people = np.asarray(want_people, np.float64).reshape(-1, 20)
    got_people = np.asarray(got_people, np.float64).reshape(-1, 20)
    assert got_people.shape == want_people.shape
    np.testing.assert_allclose(got_people, want_people, atol=1e-4)


# ---------------------------------------------------------------------------
# get_outputs end to end: padding + preprocess + forward + unpack
# (reference lib/evaluate/estimator.py:71-88) with the reference's OWN
# estimator code driving the reference's OWN vgg2016 torch model, vs our
# estimator driving the converted checkpoint
# ---------------------------------------------------------------------------


def test_get_outputs_matches_reference(ref):
    torch = pytest.importorskip("torch")
    pytest.importorskip("cv2")
    import jax.numpy as jnp

    from test_converter_parity import _vgg19_features_standin

    if "torchvision" not in sys.modules:
        stub = types.ModuleType("torchvision")
        stub.models = types.ModuleType("torchvision.models")
        stub.models.vgg19 = lambda **kw: _vgg19_features_standin()
        sys.modules["torchvision"] = stub
        sys.modules["torchvision.models"] = stub.models
    sys.path.insert(0, REFERENCE)
    try:
        from lib.network import vgg2016
    finally:
        sys.path.remove(REFERENCE)

    from torch_ekpose_tpu.runtime import (
        PoseEstimator,
        convert_torch_checkpoint,
    )

    torch.manual_seed(0)
    ref_model = vgg2016.OpenPose()
    ref_model.eval().float()
    state = {
        k: v.detach().numpy() for k, v in ref_model.state_dict().items()
    }

    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (250, 333, 3)).astype(np.uint8)
    with torch.no_grad():
        want_pafs, want_heat, want_scale = ref.estimator.get_outputs(
            image.copy(), ref_model, "vgg", "cpu"
        )

    est = PoseEstimator(
        model_name="vgg2016",
        variables=convert_torch_checkpoint(state, "vgg2016"),
        compute_dtype=jnp.float32,
    )
    got_pafs, got_heat, got_scale = est.get_outputs(image.copy())
    assert got_scale == want_scale
    np.testing.assert_allclose(got_pafs, want_pafs, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(got_heat, want_heat, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# Human box heuristics (reference lib/utils/common.py:93-244)
# ---------------------------------------------------------------------------


def _paired_humans(ref, parts):
    """The same body parts in a reference Human and in ours.

    ``parts`` is {part_idx: (x, y, score)} with normalized coords.
    """
    from torch_ekpose_tpu.utils.human import BodyPart, Human

    ref_h = ref.common.Human([])
    our_h = Human([])
    for idx, (x, y, s) in parts.items():
        ref_h.body_parts[idx] = ref.common.BodyPart(
            f"0-{idx}", idx, x, y, s
        )
        our_h.body_parts[idx] = BodyPart(f"0-{idx}", idx, x, y, s)
    return ref_h, our_h


FACE_CASES = [
    # full face: nose + both eyes + both ears + neck
    {0: (0.5, 0.3, 0.9), 1: (0.5, 0.45, 0.8), 14: (0.47, 0.28, 0.7),
     15: (0.53, 0.28, 0.7), 16: (0.44, 0.3, 0.6), 17: (0.56, 0.3, 0.6)},
    # nose + neck only
    {0: (0.4, 0.2, 0.9), 1: (0.4, 0.35, 0.8)},
    # nose + one eye, no neck
    {0: (0.6, 0.5, 0.9), 14: (0.58, 0.48, 0.7)},
    # no nose -> None
    {1: (0.5, 0.5, 0.9), 14: (0.5, 0.4, 0.8)},
    # edge of frame
    {0: (0.02, 0.02, 0.9), 1: (0.02, 0.2, 0.8), 15: (0.05, 0.01, 0.7)},
]


@pytest.mark.parametrize("case", range(len(FACE_CASES)))
@pytest.mark.parametrize("mode", [0, 1])
def test_face_box_matches_reference(ref, case, mode):
    ref_h, our_h = _paired_humans(ref, FACE_CASES[case])
    want = ref_h.get_face_box(432, 368, mode=mode)
    got = our_h.get_face_box(432, 368, mode=mode)
    assert got == want


UPPER_CASES = [
    # full upper body
    {1: (0.5, 0.4, 0.9), 2: (0.4, 0.42, 0.8), 5: (0.6, 0.42, 0.8),
     8: (0.45, 0.7, 0.7), 11: (0.55, 0.7, 0.7), 0: (0.5, 0.25, 0.9)},
    # shoulders + neck, no hips
    {1: (0.5, 0.4, 0.9), 2: (0.4, 0.42, 0.8), 5: (0.6, 0.42, 0.8),
     0: (0.5, 0.3, 0.9)},
    # missing a shoulder -> None path
    {1: (0.5, 0.4, 0.9), 2: (0.4, 0.42, 0.8)},
    # only hips
    {8: (0.45, 0.7, 0.7), 11: (0.55, 0.7, 0.7)},
]


@pytest.mark.parametrize("case", range(len(UPPER_CASES)))
def test_upper_body_box_matches_reference(ref, case):
    ref_h, our_h = _paired_humans(ref, UPPER_CASES[case])
    want = ref_h.get_upper_body_box(432, 368)
    got = our_h.get_upper_body_box(432, 368)
    assert got == want
