"""Training-step throughput + MFU on the current backend: fp32 vs bf16
compute, host vs device targets, optional grad accumulation.

The train step is the full fused program (device target rasterization +
forward + backward + Adam update); images/sec here is the sustained rate
an N-chip data-parallel mesh multiplies, ICI permitting. FLOP numerator
comes from XLA's own cost analysis of the compiled step.

Run: python scripts/profile_train.py [--batch 8] [--size 368] [--cpu]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="vgg2016")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=368)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--cpu", action="store_true")
    p.add_argument(
        "--targets", default="device", choices=("device", "raw"),
        help="device: host-augmented images in, targets on-chip; "
             "raw: uint8 canvases in, augmentation AND targets on-chip "
             "(the data/device_aug.py path)",
    )
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from torch_ekpose_tpu.models import get_model, init_model
    from torch_ekpose_tpu.training import (
        create_train_state, make_optimizer, make_train_step,
    )

    s, b = args.size, args.batch
    grid = (s // 8, s // 8)
    from torch_ekpose_tpu.utils.hardware import bf16_peak_flops

    kind = jax.devices()[0].device_kind
    peak = bf16_peak_flops(kind)
    print(f"# device={kind} peak={peak}", flush=True)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(0, 1, (b, s, s, 3)), jnp.float32)
    kpts = np.zeros((b, 4, 18, 3), dtype=np.float32)
    kpts[:, 0, :, 0] = rng.uniform(10, s - 10, (b, 18))
    kpts[:, 0, :, 1] = rng.uniform(10, s - 10, (b, 18))
    kpts[:, 0, :, 2] = 2
    kpts = jnp.asarray(kpts)

    # raw mode inputs: uint8 canvases + valid extents + a PRNG key; the
    # step runs flip/rescale/crop/pad/jitter/normalize on-chip first
    canvases = jnp.asarray(
        rng.integers(0, 256, (b, s, s, 3)), jnp.uint8)
    valid_hw = jnp.full((b, 2), s, jnp.int32)
    aug_key = jax.random.PRNGKey(0)

    _, variables = init_model(args.model, input_shape=(1, s, s, 3))

    for dtype_name, dtype in (("float32", jnp.float32),
                              ("bfloat16", jnp.bfloat16)):
        model = get_model(args.model, dtype=dtype)
        with jax.default_device(jax.devices()[0]):
            tx = make_optimizer(1e-4, 5e-4)
            state = create_train_state(model, variables, tx)
        step = make_train_step(model, targets=args.targets, grid=grid)
        if args.targets == "raw":
            step_args = (canvases, valid_hw, kpts, aug_key)
        else:
            step_args = (images, kpts)

        state, logs = step(state, *step_args)         # compile + warm
        # Steps serialize through the carried ``state``; the clock must
        # still STOP on a real value fetch — block_until_ready has
        # returned before queued work executed under tunnel congestion
        # (see bench.py), which once made f32 read as 1073 img/s here.
        float(jax.device_get(logs["Loss"]))
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, logs = step(state, *step_args)
        float(jax.device_get(logs["Loss"]))
        dt = (time.perf_counter() - t0) / args.steps

        mfu = None
        try:
            inner = jax.jit(step)
            cost = inner.lower(state, *step_args).compile().cost_analysis()
            flops = float((cost or {}).get("flops", 0.0))
            if peak and flops > 0:
                mfu = round(flops / dt / peak, 3)
        except Exception:
            pass
        print(json.dumps({
            "dtype": dtype_name, "batch": b, "size": s,
            "targets": args.targets,
            "ms_per_step": round(dt * 1e3, 2),
            "images_per_sec": round(b / dt, 2),
            "loss": round(float(logs["Loss"]), 3),
            "mfu": mfu,
        }), flush=True)


if __name__ == "__main__":
    main()
