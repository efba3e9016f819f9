"""Fused block-1 kernel experiment: conv1_1 + conv1_2 + pool in one
Pallas pass, with MXU-shaped 2D dots.

The trace profile (docs/PERF.md) localizes ~3.2 ms of the 17.6 ms fused
forward to the VGG19 block-1 prefix at batch 8 @432x368: the input
layout copy (0.50), conv1_1 (0.80 ms at 2.8% MFU), conv1_2 (1.33 ms at
36%), and pool1 (0.57 ms) — while every >=256-channel conv already runs
at 97-99% of peak. Round 1's fused kernel (ops/pallas_conv.py) lost 4x
to XLA here because it issued nine 3D dot_generals per layer with a
64-deep contraction; these variants instead assemble patches in VMEM
and issue ONE 2D dot per layer with a 27/192/576-deep contraction:

  vA  patches-576: conv1_2 as [M, 9*64] @ [9*64, 64]   (ceiling ~45%)
  vB  dy-concat-192: conv1_2 as [M, 3*64] @ [3*64, 3*64] then a 3-way
      shifted add over the dx output blocks               (ceiling ~56%)

Both compute conv1_1 as a patches-27 dot ([M, 27] @ [27, 64]).
Checks bf16-level agreement against the unfused XLA chain, then times
XLA vs both kernels.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from profile_mfu import bench, report
from torch_ekpose_tpu.ops.pallas_conv import conv_chain_xla


def _mask_border(y, row0, height, width):
    """Zero y [rows, W+2, C] wherever (image-coords) it falls outside
    [0,height)x[0,width): a chained SAME conv sees zeros there."""
    rows, wp2, c = y.shape
    rr = jax.lax.broadcasted_iota(jnp.int32, y.shape, 0) + row0
    cc = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1) - 1
    inside = (rr >= 0) & (rr < height) & (cc >= 0) & (cc < width)
    return jnp.where(inside, y, jnp.zeros((), y.dtype))


def _conv1_kernel(x_ref, w1_ref, b1_ref, out_ref, pat1_ref, *, rt, width):
    """conv1_1 alone: [1, rt+2, 3, W+2] 1-halo block -> [1, rt, W, 64].
    Bandwidth-bound (writes 64x its input); the dot is a tiny-K [.., 32]
    contraction whose FLOPs are negligible, so the win over XLA's conv
    emitter is purely in streaming the 64-channel output at HBM speed."""
    for dy in range(3):
        for dx in range(3):
            pat1_ref[:, 3 * (3 * dy + dx): 3 * (3 * dy + dx) + 3, :] = (
                x_ref[0, dy:dy + rt, :, dx:dx + width]
            ).astype(out_ref.dtype)
    pat1_ref[:, 27:32, :] = jnp.zeros((rt, 5, width), out_ref.dtype)
    y = jax.lax.dot_general(
        pat1_ref[:], w1_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )                                               # [rt, W, 64]
    out_ref[0] = jax.nn.relu(y + b1_ref[0]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rt", "interpret"))
def conv1_fused(x, w1, b1, rt=16, interpret=False):
    """relu(conv1_1(x)) for x [B, H, W, 3] bf16, SAME padding."""
    b_, h, w, _ = x.shape
    assert h % rt == 0
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xp = jnp.transpose(xp, (0, 1, 3, 2))           # [B, H+2, 3, W+2]
    w1m = jnp.pad(w1.reshape(27, 64), ((0, 5), (0, 0))).astype(x.dtype)
    return pl.pallas_call(
        functools.partial(_conv1_kernel, rt=rt, width=w),
        grid=(b_, h // rt),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(rt + 2), pl.Element(3),
                 pl.Element(w + 2)),
                lambda bi, ti: (bi, ti * rt, 0, 0),
            ),
            pl.BlockSpec((32, 64), lambda bi, ti: (0, 0)),
            pl.BlockSpec((1, 64), lambda bi, ti: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rt, w, 64), lambda bi, ti: (bi, ti, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b_, h, w, 64), x.dtype),
        scratch_shapes=[pltpu.VMEM((rt, 32, w), x.dtype)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, w1m, b1.astype(jnp.float32)[None, :])


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
            pat1_ref, pat2_ref, *, rt, height, width, variant):
    """Patch tensors are assembled by WRITES into VMEM scratch refs:
    Mosaic's vector concatenate cannot join slices whose sublane/lane
    offsets differ (the dy/dx-shifted views all disagree), but memory
    writes relayout for free."""
    ti = pl.program_id(1)
    dtype = out_ref.dtype
    # ---- conv1_1: [rt+2, 32, W+2] x [32, 64] -> [rt+2, W+2, 64] ----
    # x_ref block is [1, rt+4, 3, W+4]: channels SECOND-minor, so the
    # dy/dx patch slices never touch the minor dim. Patch channel is
    # zero-padded 27 -> 32 (weight rows 27..31 are zero).
    for dy in range(3):
        for dx in range(3):
            pat1_ref[:, 3 * (3 * dy + dx): 3 * (3 * dy + dx) + 3, :] = (
                x_ref[0, dy:dy + rt + 2, :, dx:dx + width + 2]
            ).astype(dtype)
    pat1_ref[:, 27:32, :] = jnp.zeros((rt + 2, 5, width + 2), dtype)
    y = jax.lax.dot_general(
        pat1_ref[:], w1_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )                                               # [rt+2, W+2, 64]
    y = jax.nn.relu(y + b1_ref[0]).astype(dtype)
    y = _mask_border(y, ti * rt - 1, height, width)
    # ---- conv1_2 ----------------------------------------------------
    if variant == "A":
        for dy in range(3):
            for dx in range(3):
                k = 64 * (3 * dy + dx)
                pat2_ref[:, :, k:k + 64] = y[dy:dy + rt, dx:dx + width, :]
        out = jax.lax.dot_general(
            pat2_ref[:].reshape(rt * width, 576), w2_ref[:],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).reshape(rt, width, 64)
    else:
        for dy in range(3):
            pat2_ref[:, :, 64 * dy:64 * dy + 64] = y[dy:dy + rt]
        p = jax.lax.dot_general(
            pat2_ref[:].reshape(rt * (width + 2), 192), w2_ref[:],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).reshape(rt, width + 2, 192)
        out = (p[:, 0:width, 0:64] + p[:, 1:width + 1, 64:128]
               + p[:, 2:width + 2, 128:192])
    out = jax.nn.relu(out + b2_ref[0]).astype(dtype)
    # ---- 2x2/2 max pool (reshape-split, no strided slice) ----------
    out = out.reshape(rt // 2, 2, width, 64).max(axis=1)
    out = out.reshape(rt // 2, width // 2, 2, 64).max(axis=2)
    out_ref[0] = out


@functools.partial(jax.jit, static_argnames=("rt", "variant", "interpret"))
def block1_fused(x, w1, b1, w2, b2, rt=16, variant="B", interpret=False):
    """x: [B, H, W, 3] bf16. Returns pool(relu(conv2(relu(conv1(x))))).
    w1 [3,3,3,64] HWIO, w2 [3,3,64,64] HWIO."""
    b_, h, w, _ = x.shape
    assert h % rt == 0 and rt % 2 == 0 and w % 2 == 0
    # pre-pad: 2 halo rows/cols of zeros each side, fold W and C so the
    # minor dim is well-tiled ((W+4)*3 instead of 3)
    # channels second-minor: the LAST TWO block dims (3, W+4) then span
    # the full array, which Mosaic requires for Element-indexed blocks,
    # and in-kernel patch slices need no minor-dim reshapes
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    xp = jnp.transpose(xp, (0, 1, 3, 2))           # [B, H+4, 3, W+4]
    # conv1_1 weights -> [32, 64] with (dy, dx, c) patch ordering, rows
    # 27..31 zero (patch channel is padded to a sublane multiple)
    w1m = jnp.pad(w1.reshape(27, 64), ((0, 5), (0, 0))).astype(x.dtype)
    if variant == "A":
        # (dy, dx, c) -> rows of [576, 64]
        w2m = w2.reshape(576, 64).astype(x.dtype)
    else:
        # Wbig [3*64, 3*64]: rows = (dy, c) concat order, cols = dx blocks
        w2m = jnp.transpose(w2, (0, 2, 1, 3)).reshape(192, 192).astype(x.dtype)
    n_tiles = h // rt
    out = pl.pallas_call(
        functools.partial(_kernel, rt=rt, height=h, width=w, variant=variant),
        grid=(b_, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(rt + 4), pl.Element(3),
                 pl.Element(w + 4)),
                lambda bi, ti: (bi, ti * rt, 0, 0),
            ),
            pl.BlockSpec((32, 64), lambda bi, ti: (0, 0)),
            pl.BlockSpec((1, 64), lambda bi, ti: (0, 0)),
            pl.BlockSpec(w2m.shape, lambda bi, ti: (0, 0)),
            pl.BlockSpec((1, 64), lambda bi, ti: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rt // 2, w // 2, 64),
                               lambda bi, ti: (bi, ti, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b_, h // 2, w // 2, 64), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rt + 2, 32, w + 2), x.dtype),
            pltpu.VMEM(
                (rt, w, 576) if variant == "A" else (rt, w + 2, 192),
                x.dtype,
            ),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, w1m, b1.astype(jnp.float32)[None, :], w2m,
      b2.astype(jnp.float32)[None, :])
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--height", type=int, default=368)
    p.add_argument("--width", type=int, default=432)
    p.add_argument("--rt", type=int, default=16)
    p.add_argument("--cpu", action="store_true", help="interpret mode")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from torch_ekpose_tpu.utils.hardware import bf16_peak_flops
    peak = bf16_peak_flops(jax.devices()[0].device_kind) or 0
    interp = jax.default_backend() != "tpu"
    print(f"# device={jax.devices()[0].device_kind} interpret={interp}")

    rng = np.random.default_rng(0)
    b, h, w = args.batch, args.height, args.width
    x = jnp.asarray(rng.standard_normal((b, h, w, 3)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 3, 64)) * 0.2, jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal(64) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal(64) * 0.1, jnp.float32)
    params = [(w1, b1), (w2, b2)]

    # --- conv1_1-only kernel ---------------------------------------
    ref1 = conv_chain_xla(x, [(w1, b1)], pool=False)
    got1 = conv1_fused(x, w1, b1, rt=args.rt, interpret=interp)
    err1 = jnp.max(jnp.abs(got1.astype(jnp.float32)
                           - ref1.astype(jnp.float32)))
    rel1 = err1 / jnp.max(jnp.abs(ref1.astype(jnp.float32)))
    print(f"# variant C (conv1_1 only): max abs err {float(err1):.4f} "
          f"rel {float(rel1):.5f}")
    assert float(rel1) < 0.05

    ref = conv_chain_xla(x, params, pool=True)
    for variant in ("A", "B"):
        got = block1_fused(x, w1, b1, w2, b2, rt=args.rt, variant=variant,
                           interpret=interp)
        err = jnp.max(jnp.abs(got.astype(jnp.float32)
                              - ref.astype(jnp.float32)))
        rel = err / jnp.max(jnp.abs(ref.astype(jnp.float32)))
        print(f"# variant {variant}: max abs err {float(err):.4f} "
              f"rel {float(rel):.5f}")
        assert float(rel) < 0.05, "kernel does not match XLA chain"

    if interp:
        return
    secs, flops1 = bench(lambda x: conv_chain_xla(x, [(w1, b1)], False), x)
    report("conv1_1-xla", secs, flops1, peak)
    secs, _ = bench(
        lambda x: conv1_fused(x, w1, b1, rt=args.rt), x)
    report(f"conv1_1-pallas-rt{args.rt}", secs, flops1, peak)
    secs, flops = bench(lambda x: conv_chain_xla(x, params, True), x)
    report("block1-xla", secs, flops, peak)
    for variant in ("A", "B"):
        fn = functools.partial(block1_fused, w1=w1, b1=b1, w2=w2, b2=b2,
                               rt=args.rt, variant=variant)
        secs, _ = bench(lambda x: fn(x), x)
        report(f"block1-pallas-{variant}-rt{args.rt}", secs, flops, peak)


if __name__ == "__main__":
    main()
