"""A/B the weight-exact space-to-depth conv chains against plain XLA.

Measures the VGG19 prefix blocks at the bench shape (batch 8, 432x368)
as (a) the plain full-resolution chain and (b) the s2d parity
decomposition (ops/s2d_conv.py), plus numeric agreement. The s2d form
does ~1.78x the wall FLOPs (structural zeros in the parity kernels) but
feeds the MXU 4x the input channels — the question this script answers
is whether that trade wins on real hardware. Run on the real chip; on
CPU (--cpu) it just smoke-tests the plumbing at a tiny shape.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse

import numpy as np
import jax
import jax.numpy as jnp

from profile_mfu import bench, report

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--height", type=int, default=368)
    p.add_argument("--width", type=int, default=432)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        args.batch, args.height, args.width = 1, 32, 24

    from torch_ekpose_tpu.ops.pallas_conv import conv_chain_xla
    from torch_ekpose_tpu.ops.s2d_conv import s2d_conv_chain
    from torch_ekpose_tpu.utils.hardware import bf16_peak_flops

    peak = bf16_peak_flops(jax.devices()[0].device_kind)
    print(f"# device={jax.devices()[0].device_kind} peak={peak}", flush=True)
    rng = np.random.default_rng(0)

    def t(shape, scale=0.1):
        return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)

    b, h, w = args.batch, args.height, args.width
    blocks = {
        "block1": ((b, h, w, 3), [(3, 64), (64, 64)]),
        "block2": ((b, h // 2, w // 2, 64), [(64, 128), (128, 128)]),
    }
    for name, (xshape, chain) in blocks.items():
        x = t(xshape, 1.0).astype(jnp.bfloat16)
        params = [(t((3, 3, ci, co)), t((co,), 0.01)) for ci, co in chain]

        ref = conv_chain_xla(x, params, True)
        out = s2d_conv_chain(x, params, pool=True)
        err = float(jnp.max(jnp.abs(
            out.astype(jnp.float32) - ref.astype(jnp.float32))))
        print(f"# {name} max|s2d-plain| = {err:.4f}", flush=True)

        secs, flops = bench(lambda x: conv_chain_xla(x, params, True), x)
        report(f"{name}-plain", secs, flops, peak)
        secs, _ = bench(lambda x: s2d_conv_chain(x, params, pool=True), x)
        # report the PLAIN chain's flops for both so mfu stays comparable
        # (the s2d wall-flops include structural zeros)
        report(f"{name}-s2d", secs, flops, peak)


if __name__ == "__main__":
    main()
