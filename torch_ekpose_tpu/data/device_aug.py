"""On-device training augmentation: the host decodes, the TPU augments.

The measured host pipeline (BENCH_INPUT.json) sustains ~60 augmented
img/s/core against a ~167 img/s/chip training demand — the geometric +
photometric transforms, not the PNG decode, dominate. This module moves
the WHOLE augmentation chain of the reference's training pipeline
(reference train.py:88-94: Normalize -> RandomApply(HFlip, 0.5) ->
RescaleRelative(0.5, 1.0) -> Crop(square) -> CenterPad(square), plus the
ColorJitter(0.1 x4) photometric step of reference
lib/datasets/transforms.py:90-107) into one jitted XLA program that runs
on the training chip, batched:

- geometric: flip + uniform rescale + random crop + center pad compose
  into ONE axis-aligned affine per image, applied with
  ``jax.image.scale_and_translate`` (triangle kernel) directly onto the
  square output canvas — no intermediate canvases, no host resample.
  Out-of-source pixels get the imagenet-mean pad color, like the host
  chain's CenterPad. Keypoints ride the same affine exactly (flip also
  swaps left/right rows, reference lib/datasets/utils.py:8).
- photometric: brightness/contrast/saturation with PIL ImageEnhance
  blend semantics (integer convert("L") grayscale, degenerate-image
  blend) and the full-range HSV hue shift, in a random per-image order,
  matching the host `_color_jitter` (transforms.py:458-525) to within
  quantization (the host path is integer-exact PIL; this one computes
  in f32 on device — same distribution, not bit-equal; the host chain
  remains the parity-pinned reference implementation).
- the jpeg-compression (p=0.1) and grayscale (p=0.01) host augmentations
  are NOT replicated (libjpeg cannot run on-device); their regularizing
  effect is marginal and the host pipeline remains available when exact
  reference augmentation statistics are required.

The output feeds ``data.targets.gen_targets_jax`` (targets already
rasterize on device), so with this module the host's per-image work is
reduced to file decode + a fixed-size pad — see ``data.raw_cache`` for
removing even the decode.

Design notes (pallas_guide.md): everything here is elementwise or a
separable resample — HBM-bandwidth-bound, which is exactly what the
training chip has idle while the MXU chews the conv stack; XLA fuses
the jitter chain into the resample output without materializing
intermediates.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torch_ekpose_tpu import constants

__all__ = ["augment_batch", "make_augment_fn"]

_MEAN = np.asarray(constants.IMAGENET_MEAN, np.float32)
_STD = np.asarray(constants.IMAGENET_STD, np.float32)


def _gray_u8_jnp(rgb_f32: jnp.ndarray) -> jnp.ndarray:
    """PIL ``convert("L")`` on device: same ITU-R 601-2 fixed-point
    rounding as the host's ``_gray_u8`` (transforms.py:445-449), applied
    to a float image by rounding to the nearest uint8 grid first."""
    r, g, b = rgb_f32[..., 0], rgb_f32[..., 1], rgb_f32[..., 2]
    ri = jnp.round(r).astype(jnp.uint32)
    gi = jnp.round(g).astype(jnp.uint32)
    bi = jnp.round(b).astype(jnp.uint32)
    return (
        (ri * 19595 + gi * 38470 + bi * 7471 + 0x8000) >> 16
    ).astype(jnp.float32)


def _brightness(img, factor):
    return img * factor


def _contrast(img, factor):
    mean = jnp.floor(jnp.mean(_gray_u8_jnp(img)) + 0.5)
    return (img - mean) * factor + mean


def _saturation(img, factor):
    gray = _gray_u8_jnp(img)[..., None]
    return (img - gray) * factor + gray


def _hue(img, shift):
    """Full-range uint8 HSV hue rotation (the host path's cv2
    ``RGB2HSV_FULL`` round trip, transforms.py:478-485), in f32."""
    x = jnp.clip(img, 0.0, 255.0)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = mx - mn
    safe_c = jnp.where(c > 0, c, 1.0)
    # hue in [0, 6)
    hr = jnp.where(mx == r, ((g - b) / safe_c) % 6.0, 0.0)
    hg = jnp.where((mx == g) & (mx != r), (b - r) / safe_c + 2.0, 0.0)
    hb = jnp.where(
        (mx == b) & (mx != r) & (mx != g), (r - g) / safe_c + 4.0, 0.0
    )
    h = jnp.where(c > 0, hr + hg + hb, 0.0)
    # full-range encode to [0, 256), integer shift mod 256, decode
    h256 = (h * (256.0 / 6.0) + jnp.round(shift * 255.0)) % 256.0
    h6 = h256 * (6.0 / 256.0)
    i = jnp.floor(h6)
    f = h6 - i
    p = mn
    q = mx - c * f
    t = mn + c * f
    i = i.astype(jnp.int32) % 6
    r2 = jnp.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4], [mx, q, p, p, t], mx
    )
    g2 = jnp.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4], [t, mx, mx, q, p], p
    )
    b2 = jnp.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, mx, mx], q
    )
    return jnp.stack([r2, g2, b2], axis=-1)


def _color_jitter_device(img, key, strength=0.1):
    """brightness/contrast/saturation/hue in a random order, factors
    U(1 +- strength) (hue: U(+-strength)) — the host `_color_jitter`
    distribution (transforms.py:508-525)."""
    k_perm, k_b, k_c, k_s, k_h = jax.random.split(key, 5)
    order = jax.random.permutation(k_perm, 4)
    factors = jnp.stack([
        jax.random.uniform(k_b, (), minval=1 - strength,
                           maxval=1 + strength),
        jax.random.uniform(k_c, (), minval=1 - strength,
                           maxval=1 + strength),
        jax.random.uniform(k_s, (), minval=1 - strength,
                           maxval=1 + strength),
        jax.random.uniform(k_h, (), minval=-strength, maxval=strength),
    ])

    def apply_op(i, im):
        op = order[i]
        return lax_switch_clip(op, im, factors)

    def lax_switch_clip(op, im, fs):
        im = jax.lax.switch(
            op,
            [
                lambda v: _brightness(v, fs[0]),
                lambda v: _contrast(v, fs[1]),
                lambda v: _saturation(v, fs[2]),
                lambda v: _hue(v, fs[3]),
            ],
            im,
        )
        # each PIL/cv2 op lands back on the uint8 grid; round+clip keeps
        # the f32 path on the same trajectory
        return jnp.clip(jnp.round(im), 0.0, 255.0)

    return jax.lax.fori_loop(0, 4, apply_op, img)


def _augment_one(
    image_u8: jnp.ndarray,     # [H, W, 3] uint8 (fixed canvas)
    valid_hw: jnp.ndarray,     # [2] actual (h, w) inside the canvas
    kpts: jnp.ndarray,         # [P, 18, 3]
    key: jax.Array,
    out_size: int,
    scale_range: Tuple[float, float],
    flip_prob: float,
    jitter_strength: float,
):
    k_flip, k_scale, k_cx, k_cy, k_jit = jax.random.split(key, 5)
    h = valid_hw[0].astype(jnp.float32)
    w = valid_hw[1].astype(jnp.float32)

    img = image_u8.astype(jnp.float32)

    # ---- photometric first (operates on source pixels, like the host
    # chain where jitter applies to the final crop; jitter and the
    # affine commute up to resample interpolation) -----------------------
    img = _color_jitter_device(img, k_jit, jitter_strength)

    # ---- one affine: flip -> scale s -> crop offset -> center pad ------
    s = jax.random.uniform(
        k_scale, (), minval=scale_range[0], maxval=scale_range[1]
    )
    flip = jax.random.bernoulli(k_flip, flip_prob)

    new_w, new_h = w * s, h * s
    out = float(out_size)
    # the host Crop picks a uniform x0 in [0, max(0, new_w - out)], then
    # CenterPad centers the remainder; composing gives a single output
    # translation t: source pixel u maps to x = u*s + t
    max_off_x = jnp.maximum(new_w - out, 0.0)
    max_off_y = jnp.maximum(new_h - out, 0.0)
    crop_x = jax.random.uniform(k_cx, ()) * max_off_x
    crop_y = jax.random.uniform(k_cy, ()) * max_off_y
    pad_x = jnp.maximum(out - new_w, 0.0) / 2.0
    pad_y = jnp.maximum(out - new_h, 0.0) / 2.0
    t_x = pad_x - crop_x
    t_y = pad_y - crop_y

    resampled = jax.image.scale_and_translate(
        img,
        (out_size, out_size, 3),
        (0, 1, 2),
        jnp.stack([s, s, jnp.float32(1.0)]),
        jnp.stack([t_y, t_x, jnp.float32(0.0)]),
        method="linear",
    )
    # pad-color fill outside the valid source footprint (CenterPad uses
    # the imagenet mean color, transforms.py:272-284)
    ys = jnp.arange(out_size, dtype=jnp.float32)[:, None]
    xs = jnp.arange(out_size, dtype=jnp.float32)[None, :]
    inside = (
        (xs >= t_x) & (xs < t_x + new_w) & (ys >= t_y) & (ys < t_y + new_h)
    )
    pad_color = jnp.asarray(np.round(_MEAN * 255.0), jnp.float32)
    canvas = jnp.where(inside[..., None], resampled, pad_color)
    canvas = jnp.where(flip, canvas[:, ::-1, :], canvas)

    # ---- keypoints through the same affine ------------------------------
    kx = kpts[..., 0] * s + t_x
    ky = kpts[..., 1] * s + t_y
    kv = kpts[..., 2]
    kx = jnp.where(flip, out - 1.0 - kx, kx)
    swap = jnp.asarray(constants.HFLIP_SWAP_INTERNAL, jnp.int32)
    kx_f, ky_f, kv_f = kx[:, swap], ky[:, swap], kv[:, swap]
    kx = jnp.where(flip, kx_f, kx)
    ky = jnp.where(flip, ky_f, ky)
    kv = jnp.where(flip, kv_f, kv)
    oob = (kx < 0) | (kx >= out) | (ky < 0) | (ky >= out)
    kv = jnp.where(oob, 0.0, kv)
    out_kpts = jnp.stack([kx, ky, kv], axis=-1)

    # ---- normalize (transforms.py:418-429) ------------------------------
    normed = (canvas / 255.0 - _MEAN) / _STD
    return normed, out_kpts


@functools.partial(
    jax.jit,
    static_argnames=("out_size", "scale_range", "flip_prob",
                     "jitter_strength"),
)
def augment_batch(
    images_u8: jnp.ndarray,    # [B, H, W, 3] uint8
    valid_hw: jnp.ndarray,     # [B, 2] int32
    kpts: jnp.ndarray,         # [B, P, 18, 3] f32 (vis 0 rows padded)
    key: jax.Array,
    out_size: int = 368,
    scale_range: Tuple[float, float] = (0.5, 1.0),
    flip_prob: float = 0.5,
    jitter_strength: float = 0.1,
):
    """Batched device augmentation. Returns (images [B, S, S, 3] f32
    imagenet-normalized, keypoints [B, P, 18, 3] in output coords)."""
    keys = jax.random.split(key, images_u8.shape[0])
    return jax.vmap(
        lambda im, hw, kp, k: _augment_one(
            im, hw, kp, k, out_size, scale_range, flip_prob,
            jitter_strength,
        )
    )(images_u8, valid_hw, kpts, keys)


def make_augment_fn(out_size: int = 368, **kw):
    """Partially-applied :func:`augment_batch` for a train loop."""
    def fn(images_u8, valid_hw, kpts, key):
        return augment_batch(
            images_u8, valid_hw, kpts, key, out_size=out_size, **kw
        )

    return fn
