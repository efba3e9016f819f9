"""Weight-exact space-to-depth execution of stride-1 3x3 conv chains.

Why: the measured MFU profile (docs/PERF.md) pins the vgg2016 forward's
efficiency gap on the full-resolution low-channel VGG19 prefix — XLA's
TPU conv emitter runs conv1_1 (3->64 @432x368, reference topology
lib/network/vgg2016.py:6-24 via torchvision ``features[:23]``) at ~1% of
the MXU's bf16 peak and conv2_x at 11-13%, because sub-128 channel
counts cannot fill the MXU's 128-wide tiles. An earlier probe showed a
space-to-depth half-resolution variant running 2.1x faster — but that
variant changed the function being computed (it needed retraining).

This module gets the layout win WITHOUT changing the function: a
stride-1 SAME 3x3 conv at full resolution decomposes EXACTLY over the
2x2 pixel parities of a space-to-depth tiling. Output pixels of parity
(py, px) read a 2x2 window of s2d cells, so the full-res conv equals
four stride-1 convs with 2x2 kernels over the s2d tensor — one per
output parity, each kernel a fixed rearrangement of the original 3x3
weights (7 of 16 tap positions are structurally zero). The rearranged
kernels see 4x the input channels (parity-packed), which is what the
MXU wants. Chained convs stay in s2d space (parity-packed channels),
and a trailing 2x2/2 max pool collapses to an elementwise max over the
four parity slices — no windowed reduction at all.

The transformation consumes the ORIGINAL parameters at apply time, so
checkpoints are untouched; every output matches the plain conv chain up
to float accumulation order. Works on every backend (pure XLA ops).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = ["s2d_conv_chain", "space_to_depth", "depth_to_space"]

Params = Sequence[Tuple[jax.Array, jax.Array]]  # [(3,3,ci,co), (co,)], ...

_DN = ("NHWC", "HWIO", "NHWC")


def space_to_depth(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel order (py, px, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jax.Array) -> jax.Array:
    """Inverse of :func:`space_to_depth`."""
    b, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h2, w2, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h2 * 2, w2 * 2, c)


def _parity_kernel(w: jax.Array, py: int, px: int) -> jax.Array:
    """Rearrange a (3,3,CI,CO) kernel for output parity (py, px).

    Returns a (2,2,4*CI,CO) kernel over the parity-packed s2d tensor.
    Tap (kd, q) of the 2-wide kernel along one axis covers the full-res
    offset ``a = 2*kd + q - 1 + p`` into the original 3-tap axis
    (a in 0..2 valid, else structurally zero), where the conv's spatial
    padding is (1,0) for parity 0 and (0,1) for parity 1.
    """
    ci, co = w.shape[2], w.shape[3]
    k = jnp.zeros((2, 2, 4, ci, co), w.dtype)
    for kdy in range(2):
        ay = 2 * kdy + py - 1  # + qy below
        for kdx in range(2):
            ax = 2 * kdx + px - 1
            for qy in range(2):
                if not 0 <= ay + qy <= 2:
                    continue
                for qx in range(2):
                    if not 0 <= ax + qx <= 2:
                        continue
                    k = k.at[kdy, kdx, qy * 2 + qx].set(w[ay + qy, ax + qx])
    return k.reshape(2, 2, 4 * ci, co)


def _pad(p: int):
    return (1, 0) if p == 0 else (0, 1)


def s2d_conv_chain(
    x: jax.Array, params: Params, pool: bool = False
) -> jax.Array:
    """Chained SAME 3x3 conv+bias+ReLU [+ final 2x2/2 max pool], computed
    in space-to-depth form. Exactly equals the plain chain (ReLU and the
    parity decomposition commute; the pool window IS the parity group).

    ``x`` is the full-resolution (B, H, W, C) input, H and W even.
    Returns full resolution (after ``depth_to_space``) or, with
    ``pool=True``, the (B, H/2, W/2, C_out) pooled output directly.
    """
    if x.shape[1] % 2 or x.shape[2] % 2:
        raise ValueError("s2d_conv_chain needs even H and W")
    dtype = x.dtype
    cur = space_to_depth(x)  # parity-packed; stays packed through the chain
    for w, b in params:
        parity = []
        for py in (0, 1):
            for px in (0, 1):
                k = _parity_kernel(w, py, px).astype(dtype)
                y = jax.lax.conv_general_dilated(
                    cur, k, (1, 1), [_pad(py), _pad(px)],
                    dimension_numbers=_DN,
                    preferred_element_type=jnp.float32,
                )
                parity.append(
                    jax.nn.relu(y + b.astype(jnp.float32)).astype(dtype)
                )
        cur = jnp.concatenate(parity, axis=-1)  # repack (py, px, c)
    if pool:
        co = params[-1][0].shape[3]
        p = [cur[..., i * co:(i + 1) * co] for i in range(4)]
        return jnp.maximum(jnp.maximum(p[0], p[1]), jnp.maximum(p[2], p[3]))
    return depth_to_space_grouped(cur, params[-1][0].shape[3])


def depth_to_space_grouped(x: jax.Array, co: int) -> jax.Array:
    """d2s for a parity-CONCATENATED tensor (4 groups of ``co``)."""
    b, h2, w2, _ = x.shape
    x = x.reshape(b, h2, w2, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h2 * 2, w2 * 2, co)
