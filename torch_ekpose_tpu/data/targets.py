"""Ground-truth heatmap / PAF target generation.

The reference rasterizes targets on the CPU inside DataLoader workers with
per-person, per-limb Python loops (reference lib/datasets/heatmap.py:11-33
``putGaussianMaps``, lib/datasets/paf.py:11-63 ``putVecMaps``, driven by
lib/datasets/datasets.py:231-283 ``get_ground_truth``) — the hottest part of
its input pipeline. Here the same math is expressed as dense, vectorized
array ops:

- :func:`gen_targets_np` — numpy twin, bit-faithful to the reference
  semantics, for host-side pipelines and as the parity oracle.
- :func:`gen_targets_jax` — jittable/vmappable JAX version that runs the
  rasterization **on device**, vectorized over persons, joints, and limbs
  with visibility masking (fixed MAX_PERSONS capacity; XLA fuses the whole
  thing into a few elementwise kernels).

Pinned semantics:

- Heatmaps: grid point (ix, iy) maps to image coords
  ``ix * stride + stride/2 - 0.5``; per-person Gaussian ``exp(-d^2/2s^2)``
  cut off where the exponent exceeds 4.6052 (~1%); per-person accumulation
  clipped at 1.0, which for non-negative contributions equals
  ``min(sum, 1.0)``. Background channel = ``max(1 - max_over_parts, 0)``
  (reference datasets.py:279-282).
- PAFs: keypoints divided by stride (NO half-pixel shift — the reference's
  convention differs between heatmaps and PAFs); corridor = pixels whose
  perpendicular distance to the limb line is < 1 grid unit, inside the
  rounded bounding box of the two endpoints (banker's rounding, as Python's
  ``round``); overlapping persons are averaged with a per-pixel count
  (reference paf.py:29-61; the running mean there equals sum / count).
- A joint participates only when its visibility flag > 0.5; limbs need both
  endpoints (reference datasets.py:254,266).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torch_ekpose_tpu import constants

__all__ = ["gen_targets_np", "gen_targets_jax", "make_batched_target_fn"]


# ---------------------------------------------------------------------------
# numpy oracle
# ---------------------------------------------------------------------------

def _put_gaussian_np(
    centers: np.ndarray, valid: np.ndarray, grid_y: int, grid_x: int,
    stride: int, sigma: float,
) -> np.ndarray:
    """Accumulated Gaussian map for one joint over all persons.

    ``centers`` [P, 2] image-space (x, y); ``valid`` [P] bool.
    """
    start = stride / 2.0 - 0.5
    xs = np.arange(grid_x) * stride + start
    ys = np.arange(grid_y) * stride + start
    xx, yy = np.meshgrid(xs, ys)
    acc = np.zeros((grid_y, grid_x), dtype=np.float64)
    for p in range(len(centers)):
        if not valid[p]:
            continue
        d2 = (xx - centers[p, 0]) ** 2 + (yy - centers[p, 1]) ** 2
        exponent = d2 / (2.0 * sigma * sigma)
        contrib = np.exp(-exponent) * (exponent <= constants.TARGET_GAUSSIAN_CUTOFF)
        acc += contrib
    return np.minimum(acc, 1.0)


def _put_vec_np(
    a_list: np.ndarray, b_list: np.ndarray, valid: np.ndarray,
    grid_y: int, grid_x: int, stride: int, thre: float,
) -> np.ndarray:
    """Averaged PAF [grid_y, grid_x, 2] for one limb over all persons."""
    xx, yy = np.meshgrid(np.arange(grid_x), np.arange(grid_y))
    vec_sum = np.zeros((grid_y, grid_x, 2), dtype=np.float64)
    count = np.zeros((grid_y, grid_x), dtype=np.int64)
    for p in range(len(a_list)):
        if not valid[p]:
            continue
        a = a_list[p] / stride
        b = b_list[p] / stride
        limb = b - a
        norm = float(np.linalg.norm(limb))
        if norm == 0.0:
            continue
        u = limb / norm
        min_x = max(int(round(min(a[0], b[0]) - thre)), 0)
        max_x = min(int(round(max(a[0], b[0]) + thre)), grid_x)
        min_y = max(int(round(min(a[1], b[1]) - thre)), 0)
        max_y = min(int(round(max(a[1], b[1]) + thre)), grid_y)
        bbox = (xx >= min_x) & (xx < max_x) & (yy >= min_y) & (yy < max_y)
        perp = np.abs((xx - a[0]) * u[1] - (yy - a[1]) * u[0])
        mask = bbox & (perp < thre)
        vec_sum[..., 0] += mask * u[0]
        vec_sum[..., 1] += mask * u[1]
        count += mask
    return vec_sum / np.maximum(count, 1)[..., None]


def gen_targets_np(
    keypoints: np.ndarray,
    grid_y: int,
    grid_x: int,
    stride: int = constants.DOWNSAMPLE,
    sigma: float = constants.TARGET_SIGMA,
) -> Tuple[np.ndarray, np.ndarray]:
    """Targets for one image. ``keypoints`` [P, 18, 3] internal-order
    image-space (x, y, vis). Returns (heatmaps [gy, gx, 19],
    pafs [gy, gx, 38]) float32."""
    keypoints = np.asarray(keypoints, dtype=np.float64).reshape(-1, 18, 3)
    heatmaps = np.zeros(
        (grid_y, grid_x, constants.NUM_HEATMAP_CHANNELS), dtype=np.float64
    )
    for j in range(constants.NUM_KEYPOINTS):
        heatmaps[:, :, j] = _put_gaussian_np(
            keypoints[:, j, :2], keypoints[:, j, 2] > 0.5,
            grid_y, grid_x, stride, sigma,
        )
    heatmaps[:, :, -1] = np.maximum(
        1.0 - heatmaps[:, :, : constants.NUM_KEYPOINTS].max(axis=2), 0.0
    )

    pafs = np.zeros(
        (grid_y, grid_x, constants.NUM_PAF_CHANNELS), dtype=np.float64
    )
    for i, (k1, k2) in enumerate(constants.LIMB_IDS):
        valid = (keypoints[:, k1, 2] > 0.5) & (keypoints[:, k2, 2] > 0.5)
        pafs[:, :, 2 * i: 2 * i + 2] = _put_vec_np(
            keypoints[:, k1, :2], keypoints[:, k2, :2], valid,
            grid_y, grid_x, stride, constants.TARGET_PAF_THRE,
        )
    return heatmaps.astype(np.float32), pafs.astype(np.float32)


# ---------------------------------------------------------------------------
# JAX on-device version
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("grid_y", "grid_x", "stride", "sigma")
)
def gen_targets_jax(
    keypoints: jax.Array,
    grid_y: int,
    grid_x: int,
    stride: int = constants.DOWNSAMPLE,
    sigma: float = constants.TARGET_SIGMA,
) -> Tuple[jax.Array, jax.Array]:
    """On-device target generation for one image.

    ``keypoints`` [P, 18, 3] (pad unused person slots with visibility 0).
    Returns (heatmaps [gy, gx, 19], pafs [gy, gx, 38]) float32. vmap over a
    leading batch axis for batched generation.
    """
    keypoints = jnp.asarray(keypoints, jnp.float32).reshape(-1, 18, 3)
    kx, ky, kv = keypoints[..., 0], keypoints[..., 1], keypoints[..., 2]

    # ---- heatmaps: [P, 18] centers against a [gy, gx] grid ----
    start = stride / 2.0 - 0.5
    gx_coords = jnp.arange(grid_x, dtype=jnp.float32) * stride + start
    gy_coords = jnp.arange(grid_y, dtype=jnp.float32) * stride + start
    dx = gx_coords[None, None, None, :] - kx[:, :, None, None]  # [P,18,1,gx]
    dy = gy_coords[None, None, :, None] - ky[:, :, None, None]  # [P,18,gy,1]
    exponent = (dx * dx + dy * dy) / (2.0 * sigma * sigma)      # [P,18,gy,gx]
    contrib = jnp.exp(-exponent) * (exponent <= constants.TARGET_GAUSSIAN_CUTOFF)
    contrib = contrib * (kv[:, :, None, None] > 0.5)
    joint_maps = jnp.minimum(contrib.sum(axis=0), 1.0)          # [18,gy,gx]
    background = jnp.maximum(1.0 - joint_maps.max(axis=0), 0.0)
    heatmaps = jnp.concatenate([joint_maps, background[None]], axis=0)
    heatmaps = jnp.transpose(heatmaps, (1, 2, 0))               # [gy,gx,19]

    # ---- PAFs: [P, 19 limbs] corridors against a pixel grid ----
    k1 = jnp.array([l[0] for l in constants.LIMB_IDS])
    k2 = jnp.array([l[1] for l in constants.LIMB_IDS])
    ax, ay = kx[:, k1] / stride, ky[:, k1] / stride             # [P,19]
    bx, by = kx[:, k2] / stride, ky[:, k2] / stride
    valid = (kv[:, k1] > 0.5) & (kv[:, k2] > 0.5)
    lx, ly = bx - ax, by - ay
    norm = jnp.sqrt(lx * lx + ly * ly)
    valid = valid & (norm > 0.0)
    safe_norm = jnp.where(norm > 0.0, norm, 1.0)
    ux, uy = lx / safe_norm, ly / safe_norm                     # [P,19]

    thre = constants.TARGET_PAF_THRE
    min_x = jnp.maximum(jnp.round(jnp.minimum(ax, bx) - thre), 0.0)
    max_x = jnp.minimum(jnp.round(jnp.maximum(ax, bx) + thre), grid_x)
    min_y = jnp.maximum(jnp.round(jnp.minimum(ay, by) - thre), 0.0)
    max_y = jnp.minimum(jnp.round(jnp.maximum(ay, by) + thre), grid_y)

    px = jnp.arange(grid_x, dtype=jnp.float32)                  # pixel cols
    py = jnp.arange(grid_y, dtype=jnp.float32)                  # pixel rows
    in_x = (px[None, None, :] >= min_x[..., None]) & (
        px[None, None, :] < max_x[..., None]
    )                                                           # [P,19,gx]
    in_y = (py[None, None, :] >= min_y[..., None]) & (
        py[None, None, :] < max_y[..., None]
    )                                                           # [P,19,gy]
    perp = jnp.abs(
        (px[None, None, None, :] - ax[..., None, None]) * uy[..., None, None]
        - (py[None, None, :, None] - ay[..., None, None]) * ux[..., None, None]
    )                                                           # [P,19,gy,gx]
    mask = (
        in_y[:, :, :, None] & in_x[:, :, None, :] & (perp < thre)
        & valid[..., None, None]
    )
    maskf = mask.astype(jnp.float32)
    vec_x = (maskf * ux[..., None, None]).sum(axis=0)           # [19,gy,gx]
    vec_y = (maskf * uy[..., None, None]).sum(axis=0)
    count = maskf.sum(axis=0)
    denom = jnp.maximum(count, 1.0)
    vec_x, vec_y = vec_x / denom, vec_y / denom
    pafs = jnp.stack([vec_x, vec_y], axis=1)                    # [19,2,gy,gx]
    pafs = pafs.reshape(constants.NUM_PAF_CHANNELS, grid_y, grid_x)
    pafs = jnp.transpose(pafs, (1, 2, 0))                       # [gy,gx,38]
    return heatmaps.astype(jnp.float32), pafs.astype(jnp.float32)


def make_batched_target_fn(
    grid_y: int, grid_x: int,
    stride: int = constants.DOWNSAMPLE,
    sigma: float = constants.TARGET_SIGMA,
):
    """jitted [B, P, 18, 3] -> (heatmaps [B,gy,gx,19], pafs [B,gy,gx,38])."""
    fn = functools.partial(
        gen_targets_jax, grid_y=grid_y, grid_x=grid_x, stride=stride,
        sigma=sigma,
    )
    return jax.jit(jax.vmap(fn))
