"""Device-time cost of --precision highest, tunnel-immune.

EVAL_THROUGHPUT's fps columns ride a remote tunnel whose speed swings
4x between sessions, so the highest-vs-fast cost factor measured there
is noise. This measures the DEVICE time of the batched forward alone —
data-chained iterations (each input depends on the previous output, so
early-returning block_until_ready cannot lie) ending in a real value
fetch, the bench.py pattern — at f32-fast (MXU bf16 multiplies),
f32-highest (true-f32 multiplies), and bf16 for context.

Writes PRECISION_COST.json. Usage:
    python scripts/profile_precision.py [--batch 8] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=368)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out", default="PRECISION_COST.json")
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from torch_ekpose_tpu.models import cast_params, init_model
    from torch_ekpose_tpu.runtime.estimator import (
        matmul_precision,
        preprocess_jax,
    )

    model_f32, variables = init_model(
        "vgg2016", input_shape=(1, 64, 64, 3), dtype=jnp.float32
    )
    from torch_ekpose_tpu.models import get_model

    images = np.random.default_rng(0).uniform(
        0, 255, (args.batch, args.size, args.size, 3)
    ).astype(np.float32)

    results = {}
    for name, dtype, precision in (
        ("f32_fast", jnp.float32, "fast"),
        ("f32_highest", jnp.float32, "highest"),
        ("bf16_fast", jnp.bfloat16, "fast"),
    ):
        model = get_model("vgg2016", dtype=dtype)
        vars_d = jax.device_put(
            variables if dtype == jnp.float32
            else cast_params(variables, dtype)
        )

        @jax.jit
        def step(v, x, chain):
            with matmul_precision(precision):
                xin = jax.vmap(lambda im: preprocess_jax(im, "vgg"))(
                    x + chain  # data chain: input depends on last output
                )
                (paf, heatmap), _ = model.apply(v, xin, train=False)
                # zero-valued scalar folded into the next input keeps
                # every iteration data-dependent without changing values
                zero = (paf.astype(jnp.float32).sum() * 0.0
                        + heatmap.astype(jnp.float32).sum() * 0.0)
                return paf, heatmap, zero

        x = jnp.asarray(images)
        chain = jnp.zeros((), jnp.float32)
        paf, heatmap, chain = step(vars_d, x, chain)  # compile + warm
        float(chain)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            paf, heatmap, chain = step(vars_d, x, chain)
        float(chain)  # real value fetch ends the clock honestly
        dt = (time.perf_counter() - t0) / args.iters
        results[name] = {
            "s_per_batch": round(dt, 4),
            "frames_per_s": round(args.batch / dt, 1),
        }
        print(name, json.dumps(results[name]), flush=True)

    out = {
        "backend": jax.devices()[0].platform,
        "device": jax.devices()[0].device_kind,
        "workload": f"vgg2016 batched forward, batch {args.batch} @ "
                    f"{args.size}px, data-chained x{args.iters}",
        "results": results,
        "highest_over_fast_f32": round(
            results["f32_highest"]["s_per_batch"]
            / results["f32_fast"]["s_per_batch"], 3),
        "f32_fast_over_bf16": round(
            results["f32_fast"]["s_per_batch"]
            / results["bf16_fast"]["s_per_batch"], 3),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
