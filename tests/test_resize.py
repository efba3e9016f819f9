"""Resize-matrix parity against OpenCV (the resampling conventions the
reference decode path depends on — lib/utils/paf_to_pose.py:107,356-359)."""

import numpy as np
import pytest

from torch_ekpose_tpu.ops import resize_image_np, resize_matrix

cv2 = pytest.importorskip("cv2")

INTERP_CV = {
    "nearest": cv2.INTER_NEAREST,
    "linear": cv2.INTER_LINEAR,
    "cubic": cv2.INTER_CUBIC,
}


@pytest.mark.parametrize("interp", ["nearest", "linear", "cubic"])
@pytest.mark.parametrize(
    "src,dst",
    [((5, 5), (40, 40)), ((46, 46), (368, 368)), ((7, 9), (23, 31)),
     ((30, 40), (15, 20)), ((3, 5), (24, 40))],
)
def test_matches_cv2_float(rng, interp, src, dst):
    img = rng.standard_normal(src).astype(np.float32)
    ours = resize_image_np(img, dst[0], dst[1], interp)
    ref = cv2.resize(img, (dst[1], dst[0]), interpolation=INTERP_CV[interp])
    atol = 1e-5 if interp != "cubic" else 1e-4
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=atol)


def test_multichannel_matches_cv2(rng):
    img = rng.standard_normal((12, 10, 3)).astype(np.float32)
    ours = resize_image_np(img, 48, 40, "cubic")
    ref = cv2.resize(img, (40, 48), interpolation=cv2.INTER_CUBIC)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_nearest_is_exact_x8():
    # The decode path upsamples heatmap/PAF x8 with INTER_NEAREST
    # (reference paf_to_pose.py:356-359); nearest x8 must be index // 8.
    m = resize_matrix(6, 48, "nearest")
    src_idx = np.argmax(m, axis=1)
    np.testing.assert_array_equal(src_idx, np.arange(48) // 8)


def test_rows_sum_to_one():
    for interp in ["nearest", "linear", "cubic"]:
        m = resize_matrix(9, 31, interp)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)


def test_jax_matches_np(rng):
    import jax.numpy as jnp

    from torch_ekpose_tpu.ops import resize_image_jax

    img = rng.standard_normal((10, 14, 2)).astype(np.float32)
    ours_np = resize_image_np(img, 30, 42, "cubic")
    ours_jax = np.asarray(resize_image_jax(jnp.asarray(img), 30, 42, "cubic"))
    np.testing.assert_allclose(ours_jax, ours_np, rtol=1e-5, atol=1e-5)
