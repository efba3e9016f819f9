"""On-device augmentation (data/device_aug.py) vs the host chain.

The host pipeline (data/transforms.py) is the parity-pinned reference
implementation; the device pipeline must (a) be exactly the same affine
on keypoints, (b) reproduce the photometric ops within uint8
quantization, and (c) degrade to an exact identity when every knob is
off — that last case pins the normalize math to the host's
``_normalize_hwc`` bit-for-bit semantics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torch_ekpose_tpu import constants
from torch_ekpose_tpu.data import device_aug
from torch_ekpose_tpu.data import transforms as T



def _scene(seed=0, size=368, people=2):
    from torch_ekpose_tpu.data.synthetic_coco import render_scene

    rng = np.random.default_rng(seed)
    image, kpts = render_scene(rng, people, size, size)
    return image[:, :, ::-1].copy(), kpts  # BGR -> RGB like the host chain


def _run(image, kpts, seed=0, **kw):
    out_img, out_kpts = device_aug.augment_batch(
        jnp.asarray(image[None]),
        jnp.asarray([[image.shape[0], image.shape[1]]], jnp.int32),
        jnp.asarray(kpts[None], jnp.float32),
        jax.random.PRNGKey(seed),
        **kw,
    )
    return np.asarray(out_img[0]), np.asarray(out_kpts[0])


def test_identity_when_all_knobs_off():
    image, kpts = _scene()
    out, out_kpts = _run(
        image, kpts, scale_range=(1.0, 1.0), flip_prob=0.0,
        jitter_strength=0.0,
    )
    expected = T._normalize_hwc(image)
    np.testing.assert_allclose(out, expected, atol=2e-5)
    np.testing.assert_allclose(out_kpts, kpts, atol=1e-4)


def test_fixed_downscale_affine_and_pad_color():
    image, kpts = _scene(seed=1)
    out, out_kpts = _run(
        image, kpts, scale_range=(0.5, 0.5), flip_prob=0.0,
        jitter_strength=0.0,
    )
    # s = 0.5 on a 368 canvas: new = 184, centered pad t = 92
    np.testing.assert_allclose(
        out_kpts[..., 0], kpts[..., 0] * 0.5 + 92.0, atol=1e-3
    )
    np.testing.assert_allclose(
        out_kpts[..., 1], kpts[..., 1] * 0.5 + 92.0, atol=1e-3
    )
    np.testing.assert_allclose(out_kpts[..., 2], kpts[..., 2])
    # corners are CenterPad's imagenet-mean fill color
    pad = (np.round(np.asarray(constants.IMAGENET_MEAN) * 255.0) / 255.0
           - np.asarray(constants.IMAGENET_MEAN)) \
        / np.asarray(constants.IMAGENET_STD)
    np.testing.assert_allclose(out[0, 0], pad, atol=1e-5)
    np.testing.assert_allclose(out[-1, -1], pad, atol=1e-5)


def test_flip_reverses_columns_and_swaps_parts():
    image, kpts = _scene(seed=2)
    kw = dict(scale_range=(0.8, 0.8), jitter_strength=0.0)
    plain, k_plain = _run(image, kpts, seed=7, flip_prob=0.0, **kw)
    flipped, k_flip = _run(image, kpts, seed=7, flip_prob=1.0, **kw)
    np.testing.assert_allclose(flipped, plain[:, ::-1, :], atol=1e-5)
    swap = list(constants.HFLIP_SWAP_INTERNAL)
    np.testing.assert_allclose(
        k_flip[:, :, 0], 368.0 - 1.0 - k_plain[:, swap, 0], atol=1e-3
    )
    np.testing.assert_allclose(k_flip[:, :, 1], k_plain[:, swap, 1],
                               atol=1e-3)
    # right shoulder <-> left shoulder actually exchanged
    assert swap[int(constants.CocoPart.RShoulder)] == int(
        constants.CocoPart.LShoulder
    )


def test_out_of_canvas_keypoints_get_vis_zero():
    image, kpts = _scene(seed=3)
    # upscale-and-crop: some joints must fall outside the 368 window
    out, out_kpts = _run(
        image, kpts, seed=11, scale_range=(2.0, 2.0), flip_prob=0.0,
        jitter_strength=0.0, out_size=368,
    )
    inside = (
        (out_kpts[..., 0] >= 0) & (out_kpts[..., 0] < 368)
        & (out_kpts[..., 1] >= 0) & (out_kpts[..., 1] < 368)
    )
    assert np.all(out_kpts[~inside][:, 2] == 0)
    assert inside.sum() > 0  # and not everything got dropped


@pytest.mark.parametrize("name,value", [
    ("brightness", 0.93), ("brightness", 1.08),
    ("contrast", 0.91), ("contrast", 1.07),
    ("saturation", 0.92), ("saturation", 1.09),
])
def test_enhance_ops_match_host_within_quantization(name, value):
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    host = T._jitter_op(arr, name, value).astype(np.float32)
    fn = {"brightness": device_aug._brightness,
          "contrast": device_aug._contrast,
          "saturation": device_aug._saturation}[name]
    dev = np.clip(np.round(np.asarray(
        fn(jnp.asarray(arr, jnp.float32), jnp.float32(value))
    )), 0, 255)
    # host is integer-exact PIL blend (truncates), device rounds in f32:
    # at most one uint8 step apart, almost everywhere equal
    assert np.abs(dev - host).max() <= 1.0
    assert np.abs(dev - host).mean() < 0.51


def test_hue_matches_cv2_roundtrip_within_quantization():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    for shift in (-0.1, 0.04, 0.1):
        host = T._jitter_op(arr, "hue", shift).astype(np.float32)
        dev = np.clip(np.round(np.asarray(device_aug._hue(
            jnp.asarray(arr, jnp.float32), jnp.float32(shift)
        ))), 0, 255)
        # cv2's uint8 HSV quantizes H/S to 256 steps before inverting;
        # the f32 path does not, so allow a few uint8 steps of drift
        assert np.abs(dev - host).mean() < 3.0
        assert (np.abs(dev - host) > 12).mean() < 0.02
    assert cv2 is not None


def test_batch_shapes_and_determinism():
    image, kpts = _scene(seed=6, people=3)
    out1, k1 = _run(image, kpts, seed=42)
    out2, k2 = _run(image, kpts, seed=42)
    np.testing.assert_array_equal(out1, out2)
    np.testing.assert_array_equal(k1, k2)
    out3, _ = _run(image, kpts, seed=43)
    assert np.abs(out3 - out1).max() > 1e-3
    assert out1.shape == (368, 368, 3) and k1.shape == kpts.shape
