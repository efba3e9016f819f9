"""Eval-loop throughput on the current backend: where the 2-3 img/s went.

EVAL_DTYPES.json measured 30 images in ~10 s on the real chip while the
streaming bench does 374 fps — two orders of magnitude. This profiles the
ACTUAL `evaluate.run_eval` loop (reference eval.py:129-170 shape) across
the knobs that explain the gap:

- ``batch1_host``  — batch 1, host decode (the reference's exact shape,
  and our pre-round-4 CLI default)
- ``batch1_jax``   — batch 1 routed through the device-decode pipeline
  (run_eval now refuses to silently fall back to host decode)
- ``batch8_jax``   — the TPU-native default: bucketed batch 8, fused
  forward + on-device decode, two batches in flight
- ``batch16_jax``  — same, batch 16

Each config runs the loop twice: the first pass pays compile + cache
warmup, the second is steady state. AP is recorded per config — all must
agree (the identity tests in tests/test_eval_pipeline.py pin this).

Writes EVAL_THROUGHPUT.json. Usage:
    python scripts/profile_eval.py [--images 64] [--ckpt .../trained_ref.pth]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--size", type=int, default=368)
    ap.add_argument("--ckpt", default="/tmp/synparity/trained_ref.pth")
    ap.add_argument("--out", default="EVAL_THROUGHPUT.json")
    args = ap.parse_args()

    import jax.numpy as jnp

    from torch_ekpose_tpu.data.synthetic_coco import write_coco_dataset
    from torch_ekpose_tpu.evaluate import run_eval
    from torch_ekpose_tpu.runtime import PoseEstimator

    workdir = tempfile.mkdtemp(prefix="evalprof_")
    # one padded-shape bucket: every image lands in the same executable,
    # like the square TRAINED_PARITY regime
    image_dir, anno_file = write_coco_dataset(
        workdir, args.images, h=args.size, w=args.size, mode="val",
        seed=11, max_people=3,
    )

    if os.path.isfile(args.ckpt):
        import torch

        from torch_ekpose_tpu.runtime import convert_torch_checkpoint

        state = torch.load(args.ckpt, map_location="cpu")
        state = {
            (k[len("module."):] if k.startswith("module.") else k): v.numpy()
            for k, v in state.items()
        }
        variables = convert_torch_checkpoint(state, "vgg2016")
        weights = "trained (scripts/trained_parity.py checkpoint)"
    else:
        variables = None
        weights = "random init (trained ckpt absent; decode load lighter)"

    # the four round-4 configs at the default ("fast": MXU bf16
    # multiplies even for f32 operands) AND the same sweep at
    # --precision highest (true-f32 multiplies): round 4 measured a
    # config-to-config AP spread of 0.008 at fast — highest is the knob
    # that makes TPU serving numerics transfer to the CPU parity gates
    configs = [
        ("batch1_host", "native", 1, "fast"),
        ("batch1_jax", "jax", 1, "fast"),
        ("batch8_jax", "jax", 8, "fast"),
        ("batch16_jax", "jax", 16, "fast"),
        ("batch1_host_highest", "native", 1, "highest"),
        ("batch1_jax_highest", "jax", 1, "highest"),
        ("batch8_jax_highest", "jax", 8, "highest"),
        ("batch16_jax_highest", "jax", 16, "highest"),
    ]
    results = {}
    for name, backend, batch, precision in configs:
        est = PoseEstimator(
            "vgg2016", variables=variables, decode_backend=backend,
            dest_size=args.size, compute_dtype=jnp.float32,
            precision=precision,
        )
        t0 = time.perf_counter()
        ap_first = run_eval(
            image_dir, anno_file, est, mode="val", progress=False,
            batch_size=batch,
        )
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        ap_steady = run_eval(
            image_dir, anno_file, est, mode="val", progress=False,
            batch_size=batch,
        )
        t_steady = time.perf_counter() - t0
        results[name] = {
            "ap": round(ap_steady, 4),
            "precision": precision,
            "first_pass_s": round(t_first, 2),
            "steady_s": round(t_steady, 2),
            "img_per_s_steady": round(args.images / t_steady, 1),
            "compile_warmup_s": round(t_first - t_steady, 2),
        }
        print(name, json.dumps(results[name]), flush=True)
        del est

    aps = {r["ap"] for r in results.values()}
    aps_fast = {r["ap"] for r in results.values()
                if r["precision"] == "fast"}
    aps_highest = {r["ap"] for r in results.values()
                   if r["precision"] == "highest"}
    # the serving path is the device (jax) decode; the host-decode rows
    # exercise a DIFFERENT decode backend (native C++, reference
    # semantics incl. unbounded capacities), so config-identity is
    # judged within each backend
    aps_jax_fast = {r["ap"] for n, r in results.items()
                    if "jax" in n and r["precision"] == "fast"}
    aps_jax_highest = {r["ap"] for n, r in results.items()
                       if "jax" in n and r["precision"] == "highest"}
    fps_cost = {
        b: round(
            results[f"batch{b}_jax"]["img_per_s_steady"]
            / results[f"batch{b}_jax_highest"]["img_per_s_steady"], 3)
        for b in (1, 8, 16)
        if f"batch{b}_jax_highest" in results
    }
    out = {
        "backend": jax.devices()[0].platform,
        "device": jax.devices()[0].device_kind,
        "weights": weights,
        "dataset": f"{args.images} x {args.size}px single-bucket val set "
                   "(synthetic_coco), scoring included in every timing",
        "results": results,
        "ap_identical_across_configs": len(aps) == 1,
        "ap_identical_at_fast": len(aps_fast) == 1,
        "ap_identical_at_highest": len(aps_highest) == 1,
        "ap_identical_device_decode_at_fast": len(aps_jax_fast) == 1,
        "ap_identical_device_decode_at_highest":
            len(aps_jax_highest) == 1,
        "highest_fps_cost_factor_by_batch": fps_cost,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
