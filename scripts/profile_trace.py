"""Op-level device-time profile of the fused forward program.

profile_backbone.py times convs in isolation, which carries per-call
dispatch overhead through the device tunnel; this captures a
jax.profiler trace of the REAL fused forward (the program bench.py
times) and aggregates per-op device durations from the xplane, giving
the authoritative answer to where the 69.1%-MFU forward spends its
time (reference topology: /root/reference/lib/network/vgg2016.py).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import collections
import glob

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def aggregate_device_ops(trace_dir):
    """Sum per-op durations from every device-side line in the trace."""
    from jax.profiler import ProfileData

    paths = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    ops = collections.Counter()
    counts = collections.Counter()
    for path in paths:
        with open(path, "rb") as f:
            data = ProfileData.from_serialized_xspace(f.read())
        for plane in data.planes:
            name = plane.name.lower()
            # '/device:TPU:0' on TPU; '/host:CPU' is XLA:CPU's op plane
            if "device:" not in name and name != "/host:cpu":
                continue
            for line in plane.lines:
                for ev in line.events:
                    dur = ev.duration_ns
                    if dur <= 0:
                        continue
                    ops[ev.name] += dur
                    counts[ev.name] += 1
    return ops, counts


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--height", type=int, default=368)
    p.add_argument("--width", type=int, default=432)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--dtype", choices=["bfloat16", "int8", "int8_static"],
                   default="bfloat16")
    p.add_argument("--trace-dir", default="/tmp/fwd_trace")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from torch_ekpose_tpu.models import (
        cast_params, get_model, init_model, quantize_variables,
    )

    model, variables = init_model(
        "vgg2016", input_shape=(1, args.height, args.width, 3),
        dtype=jnp.bfloat16)
    if args.dtype == "int8":
        model = get_model("vgg2016", dtype=jnp.bfloat16, quantize=True)
        variables = quantize_variables(variables, model)
    elif args.dtype == "int8_static":
        # same construction as profile_batched.py: calibrate on one
        # random frame batch — scale VALUES don't affect op timings
        from torch_ekpose_tpu.models import calibrate_act_scales
        from torch_ekpose_tpu.runtime.estimator import preprocess_jax

        dyn_model = get_model("vgg2016", dtype=jnp.bfloat16, quantize=True)
        model = get_model("vgg2016", dtype=jnp.bfloat16, quantize="static")
        variables = quantize_variables(variables, dyn_model)
        calib = jax.vmap(lambda f: preprocess_jax(f, "vgg"))(
            jnp.asarray(np.random.default_rng(1).integers(
                0, 255, (2, args.height, args.width, 3)), jnp.uint8))
        variables = calibrate_act_scales(variables, dyn_model, [calib])
    else:
        variables = cast_params(variables, jnp.bfloat16)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (args.batch, args.height, args.width, 3)),
        jnp.bfloat16)

    @jax.jit
    def fwd(v, x):
        (paf, ht), _ = model.apply(v, x, train=False)
        return paf, ht

    jax.block_until_ready(fwd(variables, x))  # compile outside the trace

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.iters):
            out = fwd(variables, x)
        jax.block_until_ready(out)

    ops, counts = aggregate_device_ops(args.trace_dir)
    total = sum(ops.values())
    print(f"# total device ns across trace: {total} "
          f"({total/1e6/args.iters:.3f} ms/iter if single line)")
    for name, ns in ops.most_common(args.top):
        print(f"{ns/1e6:10.3f} ms  x{counts[name]:<4d} {name[:120]}")


if __name__ == "__main__":
    main()
