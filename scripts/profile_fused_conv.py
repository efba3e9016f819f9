"""A/B the fused Pallas conv-chain kernel against XLA on the VGG prefix.

Measures block1 (3->64->64 + pool, full res) and block2 (64->128->128 +
pool, half res) at the bench shape, each as (a) the unfused XLA chain
and (b) the fused VMEM-resident kernel, plus numeric agreement. Run on
the real chip; on CPU it exercises interpret mode at a tiny shape.
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
    p.add_argument("--row-tile", type=int, default=16)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        args.batch, args.height, args.width = 1, 32, 24

    from torch_ekpose_tpu.ops.pallas_conv import conv_chain, conv_chain_xla
    from torch_ekpose_tpu.utils.hardware import bf16_peak_flops

    peak = bf16_peak_flops(jax.devices()[0].device_kind)
    print(f"# device={jax.devices()[0].device_kind} peak={peak}", flush=True)
    interp = args.cpu
    rng = np.random.default_rng(0)

    def t(shape, scale=0.1):
        return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)

    b, h, w = args.batch, args.height, args.width
    blocks = {
        "block1": ((b, h, w, 3), [(3, 64), (64, 64)]),
        "block2": ((b, h // 2, w // 2, 64), [(64, 128), (128, 128)]),
        "block3": ((b, h // 4, w // 4, 128),
                   [(128, 256), (256, 256), (256, 256), (256, 256)]),
    }
    for name, (xshape, chain) in blocks.items():
        x = t(xshape, 1.0).astype(jnp.bfloat16)
        params = [(t((3, 3, ci, co)), t((co,), 0.01)) for ci, co in chain]

        ref = conv_chain_xla(x, params, True)
        out = conv_chain(x, params, pool=True, row_tile=args.row_tile,
                         interpret=interp)
        err = float(jnp.max(jnp.abs(
            out.astype(jnp.float32) - ref.astype(jnp.float32))))
        print(f"# {name} max|fused-xla| = {err:.4f}", flush=True)

        secs, flops = bench(lambda x: conv_chain_xla(x, params, True), x)
        report(f"{name}-xla", secs, flops, peak)
        secs, _ = bench(
            lambda x: conv_chain(x, params, pool=True,
                                 row_tile=args.row_tile, interpret=interp),
            x,
        )
        # cost_analysis of a pallas_call reports no flops; reuse XLA's
        report(f"{name}-fused", secs, flops, peak)


if __name__ == "__main__":
    main()
