"""bf16-vs-f32 training A/B: does bf16 compute change what you get?

docs/PERF.md shows bf16 compute trains ~17-20% faster (167-171 vs
141-143 img/s, 66.9% vs 55% MFU), but every parity artifact
(TRAIN_CURVE_PARITY, BN_TRAIN_PARITY) was gathered at f32 and
`cli.train` defaulted to f32 without convergence evidence either way.
This settles it: two trainings from IDENTICAL initial weights on
BYTE-IDENTICAL batch streams (same BatchLoader seed over the same
synthetic_coco set), differing ONLY in compute dtype — params,
optimizer moments, and the loss stay f32 in both arms (the bf16 arm
casts activations/weights to bf16 inside the forward, training/
train_step.py) — then both trained models run the full eval loop on a
held-out val set.

Gates:
- loss-curve EMA agreement within 2% (bf16's ~3 decimal digits dither
  individual steps; the curve is the signal),
- final AP within 0.01.

Writes BF16_TRAIN_AB.json. Run on the TPU:
    python scripts/bf16_train_ab.py [--steps 400] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def train_arm(dtype_name, variables, batches, args, grid):
    import jax
    import jax.numpy as jnp

    from torch_ekpose_tpu.models import get_model
    from torch_ekpose_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    model = get_model("vgg2016", dtype=dtype)
    state = create_train_state(
        model, variables, make_optimizer(args.lr, args.weight_decay)
    )
    step_fn = make_train_step(model, targets="device", grid=grid)
    curve = []
    t0 = time.time()
    for s, (ims, kpts) in enumerate(batches, 1):
        state, logs = step_fn(
            state, jnp.asarray(ims, jnp.float32), jnp.asarray(kpts)
        )
        curve.append(float(logs["Loss"]))
        if s % 50 == 0 or s <= 2:
            print(f"[{dtype_name}] step {s}/{len(batches)}  "
                  f"loss {curve[-1]:.1f}  {time.time() - t0:.0f}s",
                  flush=True)
    params = jax.device_get(state.params)
    return curve, {"params": params}


def ema(curve, alpha=0.05):
    v = curve[0]
    for x in curve[1:]:
        v = (1 - alpha) * v + alpha * x
    return float(v)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--weight-decay", type=float, default=5e-4)
    ap.add_argument("--size", type=int, default=368)
    ap.add_argument("--train-images", type=int, default=160)
    ap.add_argument("--val-images", type=int, default=48)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="BF16_TRAIN_AB.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from torch_ekpose_tpu.data import BatchLoader, CocoKeypoints
    from torch_ekpose_tpu.data import transforms as T
    from torch_ekpose_tpu.data.synthetic_coco import write_coco_dataset
    from torch_ekpose_tpu.evaluate import evaluator
    from torch_ekpose_tpu.models import init_model
    from torch_ekpose_tpu.runtime.estimator import PoseEstimator

    workdir = tempfile.mkdtemp(prefix="bf16ab_")
    train_dir, train_anno = write_coco_dataset(
        workdir, args.train_images, h=args.size, w=args.size,
        mode="train", seed=args.seed + 1, max_people=3,
    )
    val_dir, val_anno = write_coco_dataset(
        workdir, args.val_images, h=args.size, w=args.size,
        mode="val", seed=args.seed + 2, max_people=3,
    )

    # one batch stream, materialized ONCE so both arms see byte-identical
    # data (held as uint8-sized f32 batches; steps*batch images)
    ds = CocoKeypoints(
        train_dir, train_anno,
        preprocess=T.TRAIN_PREPROCESS(args.size),
        image_transform=T.image_transform_train,
        target_mode="device", input_size=args.size,
    )
    loader = BatchLoader(
        ds, args.batch, shuffle=True, num_workers=0, drop_last=True,
        seed=args.seed,
    )
    # f16 storage halves the stream's RAM (2.6 GB at the defaults); both
    # arms upcast identically at use time inside train_arm
    batches = []
    while len(batches) < args.steps:
        for b in loader:
            batches.append((b[0].astype(np.float16), b[1]))
            if len(batches) >= args.steps:
                break

    _, variables = init_model(
        "vgg2016", rng=jax.random.PRNGKey(args.seed),
        input_shape=(1, args.size, args.size, 3), dtype=jnp.float32,
    )
    grid = (args.size // 8, args.size // 8)

    arms = {}
    for name in ("float32", "bfloat16"):
        t0 = time.time()
        curve, trained = train_arm(name, variables, batches, args, grid)
        wall = time.time() - t0
        est = PoseEstimator(
            "vgg2016", variables=trained, compute_dtype=jnp.float32,
            decode_backend="jax", dest_size=args.size,
        )
        ap_val = evaluator.run_eval(
            val_dir, val_anno, est, progress=False, batch_size=8,
        )
        arms[name] = {
            "final_ema": round(ema(curve), 2),
            "ap": round(float(ap_val), 4),
            "train_wall_s": round(wall, 1),
            "every_50": [round(curve[i], 1)
                         for i in range(0, len(curve), 50)],
        }
        print(name, json.dumps(arms[name]), flush=True)

    ema_rel = abs(arms["float32"]["final_ema"]
                  - arms["bfloat16"]["final_ema"]) \
        / arms["float32"]["final_ema"]
    ap_diff = arms["bfloat16"]["ap"] - arms["float32"]["ap"]
    result = {
        "recipe": f"identical init + byte-identical {args.steps}-step "
                  f"batch-{args.batch} stream (synthetic_coco, full host "
                  "augmentation), Adam "
                  f"{args.lr}/wd {args.weight_decay}; params/moments/loss "
                  "f32 in both arms, only compute dtype differs; backend "
                  f"{jax.default_backend()} "
                  f"({jax.devices()[0].device_kind})",
        "arms": arms,
        "loss_ema_rel_diff": round(float(ema_rel), 4),
        "ap_bf16_minus_f32": round(float(ap_diff), 4),
        "gate": "loss EMA within 2% and |AP diff| <= 0.01 "
                "(EQUIVALENCE, two-sided)",
        "gate_pass": bool(ema_rel <= 0.02 and abs(ap_diff) <= 0.01),
        "bf16_no_worse_gate": "AP(bf16) >= AP(f32) - 0.01 (one-sided)",
        "bf16_no_worse_pass": bool(ap_diff >= -0.01),
        "default_decision": (
            "cli.train keeps --dtype float32 as the default: the "
            "two-sided equivalence gate has now failed at both 400 and "
            "2000 steps, so bf16 training is NOT numerically equivalent "
            "— it is an opt-in speed/accuracy trade (--dtype bfloat16), "
            "measured here at "
            f"{arms['float32']['train_wall_s'] / max(arms['bfloat16']['train_wall_s'], 1e-9):.2f}x "
            "faster wall-clock"
            + (" with NO end-task cost in this run (AP delta "
               f"{ap_diff:+.4f})" if ap_diff >= -0.01 else
               f" at an end-task COST (AP delta {ap_diff:+.4f})")
        ),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
