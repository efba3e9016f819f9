"""Per-conv MFU profile of the VGG19 backbone at the bench resolution.

profile_mfu.py showed the backbone at ~48% of bf16 peak while the CPM
head runs at 76-93%; this localizes which backbone convs burn the
cycles (suspects: the full-resolution 3->64 and 64->64 layers, whose
tiny channel counts cannot fill the MXU's 128-wide tiles).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse

import numpy as np
import jax
import jax.numpy as jnp

from profile_mfu import bench, report


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--height", type=int, default=368)
    p.add_argument("--width", type=int, default=432)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from torch_ekpose_tpu.utils.hardware import bf16_peak_flops

    peak = bf16_peak_flops(jax.devices()[0].device_kind)
    print(f"# device={jax.devices()[0].device_kind} peak={peak}", flush=True)

    b, h, w = args.batch, args.height, args.width
    rng = jax.random.PRNGKey(0)

    # (name, cin, cout, input h, input w) mirroring VGG19_PLAN + the two
    # extra convs (models/vgg.py); pools halve the resolution after
    # blocks 1-3
    plan = [
        ("conv1_1", 3, 64, h, w),
        ("conv1_2", 64, 64, h, w),
        ("conv2_1", 64, 128, h // 2, w // 2),
        ("conv2_2", 128, 128, h // 2, w // 2),
        ("conv3_1", 128, 256, h // 4, w // 4),
        ("conv3_x3", 256, 256, h // 4, w // 4),   # x3 identical convs
        ("conv4_1", 256, 512, h // 8, w // 8),
        ("conv4_2", 512, 512, h // 8, w // 8),
        ("conv_23", 512, 256, h // 8, w // 8),
        ("conv_25", 256, 128, h // 8, w // 8),
    ]
    dn = ("NHWC", "HWIO", "NHWC")
    total_ms = 0.0
    for name, cin, cout, hh, ww in plan:
        reps = 3 if name == "conv3_x3" else 1
        k = jax.random.normal(
            jax.random.fold_in(rng, cin * cout), (3, 3, cin, cout),
            jnp.bfloat16,
        ) * 0.05
        x = jax.random.normal(
            jax.random.fold_in(rng, cin), (b, hh, ww, cin), jnp.bfloat16
        )

        def conv(x, k=k):
            return jax.nn.relu(jax.lax.conv_general_dilated(
                x, k, (1, 1), [(1, 1)] * 2, dimension_numbers=dn))

        secs, flops = bench(conv, x)
        total_ms += secs * 1e3 * reps
        report(f"{name}{'x3' if reps == 3 else ''}", secs, flops, peak)
    print(f"# sum of conv times (with x3): {total_ms:.3f} ms", flush=True)

    # candidate: space-to-depth the input so conv1_1 sees 12 channels at
    # half resolution — EXACT for the conv1_1+conv1_2+pool prefix only
    # if re-trained; measured here purely to see the ceiling it would buy
    x = jax.random.normal(rng, (b, h, w, 3), jnp.bfloat16)
    k1 = jax.random.normal(jax.random.fold_in(rng, 1), (3, 3, 3, 64),
                           jnp.bfloat16) * 0.05
    k2 = jax.random.normal(jax.random.fold_in(rng, 2), (3, 3, 64, 64),
                           jnp.bfloat16) * 0.05

    def block1(x):
        y = jax.nn.relu(jax.lax.conv_general_dilated(
            x, k1, (1, 1), [(1, 1)] * 2, dimension_numbers=dn))
        y = jax.nn.relu(jax.lax.conv_general_dilated(
            y, k2, (1, 1), [(1, 1)] * 2, dimension_numbers=dn))
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )

    secs, flops = bench(block1, x)
    report("block1-as-is(+pool)", secs, flops, peak)

    xs2d = jnp.reshape(
        jnp.transpose(
            jnp.reshape(x, (b, h // 2, 2, w // 2, 2, 3)), (0, 1, 3, 2, 4, 5)
        ), (b, h // 2, w // 2, 12),
    )
    ks1 = jax.random.normal(jax.random.fold_in(rng, 3), (3, 3, 12, 64),
                            jnp.bfloat16) * 0.05

    def block1_s2d(x):
        y = jax.nn.relu(jax.lax.conv_general_dilated(
            x, ks1, (1, 1), [(1, 1)] * 2, dimension_numbers=dn))
        return jax.nn.relu(jax.lax.conv_general_dilated(
            y, k2, (1, 1), [(1, 1)] * 2, dimension_numbers=dn))

    secs, flops = bench(block1_s2d, xs2d)
    report("block1-s2d-halfres", secs, flops, peak)


if __name__ == "__main__":
    main()
