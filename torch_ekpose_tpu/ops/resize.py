"""OpenCV-compatible separable image resizing as dense interpolation matrices.

The reference decodes poses with a pipeline of `cv2.resize` calls whose exact
resampling conventions determine COCO AP (reference lib/utils/paf_to_pose.py:
INTER_CUBIC x8 patch refinement at :107, INTER_NEAREST x8 map upsample at
:356-359; reference lib/evaluate/estimator.py:60 uses default INTER_LINEAR).
Rather than calling OpenCV, we express each 1-D resample as a dense
``[dst, src]`` weight matrix and apply it with two matmuls:

    out = R_h @ img @ R_w.T          (per channel)

On TPU this turns every resize into MXU work and makes the op trivially
jittable/vmappable with static shapes. The matrices replicate OpenCV's
conventions exactly for float inputs:

- coordinate mapping ``src = (dst + 0.5) * (src_len / dst_len) - 0.5``
  (for NEAREST, OpenCV instead uses ``src = floor(dst * src_len / dst_len)``)
- bicubic Keys kernel with ``A = -0.75``
- border replication (taps clamped to the valid range)

Weight matrices are built in numpy (host, cached) so tracing never
recomputes them.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = [
    "resize_matrix",
    "resize_2d",
    "resize_image_np",
    "resize_image_jax",
]


def _cubic_keys(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic kernel with OpenCV's A=-0.75 (interpolateCubic)."""
    t = np.abs(t)
    t2 = t * t
    t3 = t2 * t
    return np.where(
        t <= 1.0,
        (a + 2.0) * t3 - (a + 3.0) * t2 + 1.0,
        np.where(t < 2.0, a * t3 - 5.0 * a * t2 + 8.0 * a * t - 4.0 * a, 0.0),
    )


@functools.lru_cache(maxsize=None)
def resize_matrix(src_len: int, dst_len: int, interpolation: str) -> np.ndarray:
    """Dense ``[dst_len, src_len]`` float32 resampling matrix.

    ``interpolation``: one of ``"nearest"``, ``"linear"``, ``"cubic"``.
    Matches cv2.resize's float path along one axis, including border
    replication.
    """
    scale = src_len / dst_len
    dst = np.arange(dst_len, dtype=np.float64)
    mat = np.zeros((dst_len, src_len), dtype=np.float64)
    rows = np.arange(dst_len)

    if interpolation == "nearest":
        # cv2 INTER_NEAREST: sx = floor(dx * scale), clamped.
        sx = np.floor(dst * scale).astype(np.int64)
        sx = np.clip(sx, 0, src_len - 1)
        mat[rows, sx] = 1.0
    elif interpolation == "linear":
        s = (dst + 0.5) * scale - 0.5
        base = np.floor(s).astype(np.int64)
        t = s - base
        for k, w in ((0, 1.0 - t), (1, t)):
            idx = np.clip(base + k, 0, src_len - 1)
            np.add.at(mat, (rows, idx), w)
    elif interpolation == "cubic":
        s = (dst + 0.5) * scale - 0.5
        base = np.floor(s).astype(np.int64)
        t = s - base
        for k in (-1, 0, 1, 2):
            w = _cubic_keys(t - k)
            idx = np.clip(base + k, 0, src_len - 1)
            np.add.at(mat, (rows, idx), w)
    else:
        raise ValueError(f"unknown interpolation {interpolation!r}")

    return np.ascontiguousarray(mat, dtype=np.float32)


def resize_2d(img, dst_h: int, dst_w: int, interpolation: str):
    """Resize a [H, W] or [H, W, C] jax array; returns float32."""
    src_h, src_w = img.shape[0], img.shape[1]
    rh = jnp.asarray(resize_matrix(src_h, dst_h, interpolation))
    rw = jnp.asarray(resize_matrix(src_w, dst_w, interpolation))
    img = img.astype(jnp.float32)
    if img.ndim == 2:
        return rh @ img @ rw.T
    # [H,W,C]: contract H then W, keeping channels last.
    out = jnp.einsum("hH,HWC->hWC", rh, img)
    return jnp.einsum("wW,hWC->hwC", rw, out)


def resize_image_jax(img, dst_h: int, dst_w: int, interpolation: str = "linear"):
    """Alias of :func:`resize_2d` with cv2-style default."""
    return resize_2d(img, dst_h, dst_w, interpolation)


def resize_image_np(
    img: np.ndarray, dst_h: int, dst_w: int, interpolation: str = "linear"
) -> np.ndarray:
    """Numpy twin of :func:`resize_2d` for host-side / oracle code."""
    src_h, src_w = img.shape[0], img.shape[1]
    rh = resize_matrix(src_h, dst_h, interpolation)
    rw = resize_matrix(src_w, dst_w, interpolation)
    img = np.asarray(img, dtype=np.float32)
    if img.ndim == 2:
        return rh @ img @ rw.T
    out = np.tensordot(rh, img, axes=(1, 0))            # [h, W, C]
    out = np.tensordot(rw, out, axes=(1, 1))            # [w, h, C]
    return np.ascontiguousarray(np.swapaxes(out, 0, 1))  # [h, w, C]
