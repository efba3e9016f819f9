"""Pallas TPU kernel: fused chains of 3×3 convs for the VGG prefix.

Why this exists: the measured MFU profile (docs/PERF.md) shows XLA's TPU
conv emitter running the full-resolution, low-channel VGG19 prefix
(conv1_1 3→64, conv1_2 64→64, conv2_x 64/128; reference topology
lib/network/vgg2016.py:6-24 via torchvision ``features[:23]``) at 1–13%
of the MXU's bf16 peak, while the 128-channel CPM head reaches 93%. The
prefix is also HBM-heavy: at 432×368×batch-8 every full-resolution
intermediate is 163 MB, so conv1_1→conv1_2→pool costs ~700 MB of HBM
traffic as three separate XLA ops.

This kernel computes an entire block — N chained (3×3 conv + bias +
ReLU) layers followed by an optional 2×2/2 max pool — in ONE pass over
row tiles: each tile's intermediates never leave VMEM, so HBM traffic
drops to one read of the input plus one write of the pooled output. The
convs are expressed as 9 shifted ``dot_general`` contractions per layer
(bf16 operands, f32 accumulation on the MXU — the same accumulation
XLA's conv emitter uses, so results match the unfused path to bf16
rounding).

Semantics exactly match the unfused chain of flax ``nn.Conv`` SAME
convs: zero-padding at image borders between chained convs is
reproduced by masking each intermediate outside the true image extent
(a chained SAME conv sees ZEROS beyond the border, not the previous
conv's halo values).

Falls back transparently to the XLA expression on non-TPU backends.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv_chain", "conv_chain_xla"]

Params = Sequence[Tuple[jax.Array, jax.Array]]  # [(3,3,ci,co), (co,)], ...


def conv_chain_xla(x: jax.Array, params: Params, pool: bool) -> jax.Array:
    """Reference XLA expression: chained SAME 3×3 conv+bias+ReLU [+pool]."""
    dn = ("NHWC", "HWIO", "NHWC")
    for w, b in params:
        x = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=dn, preferred_element_type=jnp.float32,
        )
        x = jax.nn.relu(x + b.astype(jnp.float32)).astype(w.dtype)
    if pool:
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )
    return x


def _chain_kernel(x_ref, *refs, n_convs: int, row_tile: int, height: int,
                  width: int, pool: bool, out_dtype):
    """One (batch, row-tile) grid cell: run the whole conv chain in VMEM."""
    out_ref = refs[-1]
    tile_i = pl.program_id(1)
    cur = x_ref[0]  # (row_tile + 2n, width + 2n, c0)
    for j in range(n_convs):
        w_ref = refs[2 * j]
        b_ref = refs[2 * j + 1]
        halo = n_convs - j - 1          # remaining halo after this conv
        hh = row_tile + 2 * halo
        ww = width + 2 * halo
        acc = jnp.zeros((hh, ww, w_ref.shape[3]), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                acc += jax.lax.dot_general(
                    cur[dy:dy + hh, dx:dx + ww, :],
                    w_ref[dy, dx],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        cur = jax.nn.relu(acc + b_ref[0]).astype(out_dtype)
        if halo:
            # A chained SAME conv zero-pads at IMAGE borders; zero the
            # halo wherever it crosses outside the true image extent.
            # masks built at the full 3D shape: Mosaic cannot reshape or
            # broadcast an i1 vector across a new minor dim
            row0 = tile_i * row_tile - halo
            shape3 = (hh, ww, cur.shape[2])
            rows = jax.lax.broadcasted_iota(jnp.int32, shape3, 0) + row0
            cols = jax.lax.broadcasted_iota(jnp.int32, shape3, 1) - halo
            inside = ((rows >= 0) & (rows < height)
                      & (cols >= 0) & (cols < width))
            cur = jnp.where(inside, cur, jnp.zeros((), out_dtype))
    if pool:
        # 2×2/2 max pool via dim-splitting reshapes + max, NOT strided
        # slices: ``cur[0::2]`` rewrites to a 3D gather, which Mosaic
        # refuses to lower ("Only 2D gather is supported"). Reshapes
        # that split second-minor dims (lane dim c untouched) lower fine.
        th, tw, c = cur.shape
        cur = cur.reshape(th // 2, 2, tw, c).max(axis=1)
        cur = cur.reshape(th // 2, tw // 2, 2, c).max(axis=2)
    out_ref[0] = cur


@functools.partial(
    jax.jit,
    static_argnames=("pool", "row_tile", "interpret"),
)
def _conv_chain_tpu(x, params, pool, row_tile, interpret):
    b, h, w, _ = x.shape
    n = len(params)
    hp = -(-h // row_tile) * row_tile      # rows padded to the tile grid
    # n halo rows/cols of zeros each side, plus bottom fill to the grid
    x = jnp.pad(x, ((0, 0), (n, hp - h + n), (n, n), (0, 0)))
    n_tiles = hp // row_tile
    c_out = params[-1][0].shape[3]
    out_h, out_w = (hp // 2, w // 2) if pool else (hp, w)
    tile_h = row_tile // 2 if pool else row_tile

    # overlapping (haloed) row tiles need element-indexed blocks; Mosaic
    # requires ALL dims to be Element then, and the last two Element dims
    # to span the full array (they do: full padded width, all channels)
    in_specs = [
        pl.BlockSpec(
            (pl.Element(1), pl.Element(row_tile + 2 * n),
             pl.Element(w + 2 * n), pl.Element(x.shape[3])),
            lambda bi, ti: (bi, ti * row_tile, 0, 0),
        )
    ]
    args = [x]
    for wgt, bias in params:
        in_specs.append(pl.BlockSpec(wgt.shape, lambda bi, ti: (0, 0, 0, 0)))
        args.append(wgt.astype(x.dtype))
        in_specs.append(pl.BlockSpec((1, bias.shape[0]),
                                     lambda bi, ti: (0, 0)))
        args.append(bias.astype(jnp.float32)[None, :])

    out = pl.pallas_call(
        functools.partial(
            _chain_kernel, n_convs=n, row_tile=row_tile, height=h,
            width=w, pool=pool, out_dtype=x.dtype,
        ),
        grid=(b, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile_h, out_w, c_out),
                               lambda bi, ti: (bi, ti, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, out_h, out_w, c_out), x.dtype),
        # the unrolled chain's live intermediates exceed Mosaic's default
        # 16 MiB scoped-vmem budget; v5e has 128 MiB of VMEM — grant most
        # of it (the batch/tile grid dims are arbitrary, so double
        # buffering stays modest)
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    want_h = h // 2 if pool else h
    return out[:, :want_h]


def conv_chain(
    x: jax.Array,
    params: Params,
    pool: bool = False,
    row_tile: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """Fused 3×3 conv[+ReLU] chain with optional trailing 2×2/2 max pool.

    Matches ``conv_chain_xla`` (the unfused flax path) to bf16 rounding.
    Uses the Pallas kernel on TPU (or when ``interpret``), XLA elsewhere.
    """
    if pool:
        if x.shape[1] % 2 or x.shape[2] % 2:
            raise ValueError("pooled conv_chain needs even H and W")
    if row_tile % 2 and pool:
        raise ValueError("row_tile must be even when pooling")
    use_kernel = interpret or jax.default_backend() == "tpu"
    if not use_kernel:
        return conv_chain_xla(x, tuple(params), pool)
    return _conv_chain_tpu(x, tuple(params), pool, row_tile, interpret)
