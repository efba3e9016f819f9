"""Tests for the parity-completeness surfaces: legacy decoder, host
preprocessors + inverses, inference datasets, profiling utilities, and the
model summary tool."""

import numpy as np
import PIL.Image
import pytest

from torch_ekpose_tpu.config import cfg
from torch_ekpose_tpu.data import gen_targets_np, preprocessing as P
from torch_ekpose_tpu.data.dataset import (
    ImageList,
    PilImageList,
    collate_images_targets_meta,
)
from torch_ekpose_tpu.decode.legacy import JOINT_TO_LIMB, paf_to_pose_legacy

GY, GX, STRIDE = 46, 46, 8


def _upper_body_person(cx, cy):
    # the legacy decoder only knows 7 upper-body limbs
    offsets = {
        0: (0, -95), 1: (0, -70), 2: (-25, -70), 3: (-32, -35), 4: (-36, 0),
        5: (25, -70), 6: (32, -35), 7: (36, 0),
    }
    kpts = np.zeros((18, 3))
    for j, (dx, dy) in offsets.items():
        kpts[j] = [cx + dx, cy + dy, 2]
    return kpts


def test_legacy_decoder_assembles_upper_body():
    heat, pafs = gen_targets_np(
        np.stack([_upper_body_person(184, 220)]), GY, GX, STRIDE, 7.0
    )
    # legacy decoder reads PAF channels 0..13 for its 7 limbs; rearrange
    # the training-limb channels to the legacy order
    from torch_ekpose_tpu import constants

    legacy_pafs = np.zeros_like(pafs)
    for lt, pair in enumerate(JOINT_TO_LIMB):
        src = constants.LIMB_IDS.index(pair)
        legacy_pafs[:, :, 2 * lt: 2 * lt + 2] = pafs[:, :, 2 * src: 2 * src + 2]
    joint_list, people = paf_to_pose_legacy(heat, legacy_pafs, cfg)
    assert len(people) == 1
    row = people[0]
    assert row[-1] == 8          # 8 connected upper-body parts
    for part in (0, 1, 2, 3, 4, 5, 6, 7):
        assert row[part] >= 0


def test_legacy_decoder_empty():
    heat = np.zeros((GY, GX, 19), dtype=np.float32)
    pafs = np.zeros((GY, GX, 38), dtype=np.float32)
    joint_list, people = paf_to_pose_legacy(heat, pafs, cfg)
    assert len(people) == 0


@pytest.mark.parametrize("mode,inv", [
    ("rtpose", P.inverse_rtpose_preprocess),
    ("vgg", P.inverse_vgg_preprocess),
    ("inception", P.inverse_inception_preprocess),
])
def test_preprocess_inverses_round_trip(rng, mode, inv):
    img = rng.integers(0, 255, (32, 40, 3)).astype(np.uint8)
    chw = P.preprocess(img, mode)
    assert chw.shape == (3, 32, 40)
    back = inv(chw)
    np.testing.assert_allclose(
        np.asarray(back, dtype=np.float64), img, atol=1.0
    )


def test_preprocess_unknown_mode_passthrough(rng):
    img = rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)
    out = P.preprocess(img, "nope")
    np.testing.assert_array_equal(out, img)


def test_vgg_preprocess_matches_device_version(rng):
    import jax.numpy as jnp

    from torch_ekpose_tpu.runtime.estimator import preprocess_jax

    img = rng.integers(0, 255, (16, 24, 3)).astype(np.uint8)
    host = P.vgg_preprocess(img)                       # CHW
    dev = np.asarray(preprocess_jax(jnp.asarray(img), "vgg"))  # HWC
    np.testing.assert_allclose(dev.transpose(2, 0, 1), host, atol=1e-5)


def test_image_list_datasets(tmp_path, rng):
    paths = []
    for i in range(3):
        p = tmp_path / f"im{i}.png"
        PIL.Image.fromarray(
            rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)
        ).save(p)
        paths.append(str(p))
    ds = ImageList(paths)
    path, original, transformed = ds[1]
    assert path == paths[1]
    assert original.shape == (40, 50, 3) and original.max() <= 1.0
    assert transformed.shape == (40, 50, 3)

    pil_ds = PilImageList([PIL.Image.new("RGB", (30, 20))] * 2)
    idx, original, transformed = pil_ds[0]
    assert idx == 0 and original.shape == (20, 30, 3)

    batch = [(np.zeros((4, 4, 3)), np.ones((2, 2, 19)), np.ones((2, 2, 38)))
             for _ in range(2)]
    images, heats, pafs = collate_images_targets_meta(batch)
    assert images.shape == (2, 4, 4, 3)
    assert heats.shape == (2, 2, 2, 19)
    assert pafs.shape == (2, 2, 2, 38)


def test_step_timer():
    from torch_ekpose_tpu.utils.profiling import StepTimer

    timer = StepTimer(window=10)
    for _ in range(3):
        with timer:
            pass
    stats = timer.stats()
    assert stats["fps"] > 0 and stats["p99_ms"] >= 0


def test_model_summary_counts():
    from torch_ekpose_tpu.cli.summary import summarize

    info = summarize("vgg2016", 64)
    assert info["params"] == 52_311_446  # pinned by test_models param test
