"""Certify the raw/device-aug training recipe (the multi-chip input
path) against the reference-shaped host augmentation chain.

``--targets raw`` feeds decode-only uint8 canvases and runs the whole
augmentation on device (data/device_aug.py) — but that chain drops the
reference's jpeg-compression (p=0.1) and grayscale (p=0.01) transforms
(reference lib/datasets/transforms.py:90-107) and replaces
integer-exact PIL jitter with f32 device math. Before multi-chip runs
standardize on it, this A/B asks the only question that matters: does
training on it converge to the same model?

Two arms from IDENTICAL initial weights, same optimizer, same step
count, same underlying images (only the augmentation chain differs, by
design):

- ``host_aug``: the reference-shaped chain — PIL-exact jitter +
  jpeg/grayscale augs on the host, device-rasterized targets
  (``--targets device``);
- ``raw_aug``: decode-only feeding + on-device augmentation
  (``--targets raw``, the promoted multi-chip path).

Both trained models then run the full eval loop over the four
TRAINED_PARITY regime val sets (square / nonsquare / crowded /
multiscale). Gate: per-regime |AP(raw) - AP(host)| <= 0.005 — the same
bar the cross-stack gates hold. Writes RAW_AUG_AB.json.

Run on the TPU:
    python scripts/raw_aug_ab.py [--steps 2000] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

# the four round-4 regimes (trained_parity.REGIMES shape, our-loop only:
# the cross-stack side is owned by trained_parity.py; here the question
# is arm-vs-arm)
EVAL_REGIMES = {
    "square": dict(n=24, sizes=[(368, 368)], people=(1, 3),
                   band=(0.40, 0.60), seed=7777),
    "nonsquare": dict(n=21, sizes=[(368, 496), (496, 368), (296, 520)],
                      people=(1, 3), band=(0.40, 0.58), seed=8888),
    "crowded": dict(n=12, sizes=[(368, 368)], people=(6, 9),
                    band=(0.32, 0.46), seed=9999),
    "multiscale": dict(n=15, sizes=[(368, 368), (416, 416), (512, 512)],
                       people=(2, 4), band=(0.33, 0.60), seed=4444),
}


def train_arm(mode, variables, loader, args, grid):
    """mode: 'host_aug' (device targets) or 'raw_aug' (raw targets)."""
    import jax
    import jax.numpy as jnp

    from torch_ekpose_tpu.models import get_model
    from torch_ekpose_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    model = get_model("vgg2016", dtype=jnp.float32)
    state = create_train_state(
        model, variables, make_optimizer(args.lr, args.weight_decay)
    )
    targets = "raw" if mode == "raw_aug" else "device"
    step_fn = make_train_step(model, targets=targets, grid=grid)
    key = jax.random.PRNGKey(args.seed + 77)
    curve, host_s, s = [], 0.0, 0
    t0 = time.time()
    while s < args.steps:
        th = time.time()
        for batch in loader:
            host_s += time.time() - th
            s += 1
            if targets == "raw":
                key, sub = jax.random.split(key)
                state, logs = step_fn(state, *[jnp.asarray(b) for b in batch], sub)
            else:
                state, logs = step_fn(state, *[jnp.asarray(b) for b in batch])
            curve.append(float(logs["Loss"]))
            if s % 100 == 0 or s <= 2:
                print(f"[{mode}] step {s}/{args.steps}  "
                      f"loss {curve[-1]:.1f}  {time.time() - t0:.0f}s "
                      f"(host {host_s:.0f}s)", flush=True)
            if s >= args.steps:
                break
            th = time.time()
    params = jax.device_get(state.params)
    return curve, {"params": params}, time.time() - t0, host_s


def ema(curve, alpha=0.05):
    v = curve[0]
    for x in curve[1:]:
        v = (1 - alpha) * v + alpha * x
    return float(v)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--weight-decay", type=float, default=5e-4)
    ap.add_argument("--size", type=int, default=368)
    ap.add_argument("--train-images", type=int, default=160)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--arms", default="host_aug,raw_aug")
    ap.add_argument("--no-eval", action="store_true",
                    help="train-only smoke (interface check, no regimes)")
    ap.add_argument("--out", default="RAW_AUG_AB.json")
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

    workdir = tempfile.mkdtemp(prefix="rawab_")
    # train scenes rendered in the regime band (post-resize people scale
    # 0.4-0.6 at dest 368) so the regime val sets are in-distribution
    train_dir, train_anno = write_coco_dataset(
        workdir, args.train_images, h=args.size, w=args.size,
        mode="train", seed=args.seed + 1, max_people=3,
        scale_range=(0.40, 0.60),
    )

    def make_ds(target_mode):
        return CocoKeypoints(
            train_dir, train_anno,
            preprocess=T.TRAIN_PREPROCESS(args.size),
            image_transform=T.image_transform_train,
            target_mode=target_mode, input_size=args.size,
        )

    _, variables = init_model(
        "vgg2016", rng=jax.random.PRNGKey(args.seed),
        input_shape=(1, args.size, args.size, 3), dtype=jnp.float32,
    )
    grid = (args.size // 8, args.size // 8)

    arms = {}
    for mode in args.arms.split(","):
        ds = make_ds("raw" if mode == "raw_aug" else "device")
        loader = BatchLoader(
            ds, args.batch, shuffle=True, num_workers=0, drop_last=True,
            seed=args.seed,
        )
        curve, trained, wall, host_s = train_arm(
            mode, variables, loader, args, grid
        )
        est = PoseEstimator(
            "vgg2016", variables=trained, compute_dtype=jnp.float32,
            decode_backend="jax",
        )
        regime_ap = {}
        for rname, spec in ({} if args.no_eval else EVAL_REGIMES).items():
            rdir = os.path.join(workdir, f"regime_{rname}")
            image_dir, anno_file = write_coco_dataset(
                rdir, spec["n"], mode="val", seed=spec["seed"],
                sizes=spec["sizes"], min_people=spec["people"][0],
                max_people=spec["people"][1],
                post_resize_band=spec["band"],
            )
            ap_val = evaluator.run_eval(
                image_dir, anno_file, est, progress=False, batch_size=4,
            )
            regime_ap[rname] = round(float(ap_val), 4)
            print(f"[{mode}] {rname}: AP {ap_val:.4f}", flush=True)
        arms[mode] = {
            "final_ema": round(ema(curve), 2),
            "regime_ap": regime_ap,
            "train_wall_s": round(wall, 1),
            "host_input_s": round(host_s, 1),
            "every_100": [round(curve[i], 1)
                          for i in range(0, len(curve), 100)],
        }
        del est

    deltas = {
        r: round(arms["raw_aug"]["regime_ap"][r]
                 - arms["host_aug"]["regime_ap"][r], 4)
        for r in EVAL_REGIMES
    } if len(arms) == 2 and not args.no_eval else {}
    gate_pass = bool(deltas) and all(abs(d) <= 0.005 for d in deltas.values())
    raw_no_worse = bool(deltas) and all(d >= -0.005 for d in deltas.values())
    result = {
        "recipe": f"identical init, {args.steps} steps batch "
                  f"{args.batch}, Adam {args.lr}/wd {args.weight_decay}, "
                  "f32 both arms; host_aug = reference-shaped PIL chain "
                  "with jpeg/grayscale augs + device targets; raw_aug = "
                  "decode-only feeding + on-device augmentation "
                  "(data/device_aug.py, no jpeg/grayscale); backend "
                  f"{jax.default_backend()} "
                  f"({jax.devices()[0].device_kind})",
        "arms": arms,
        "regime_ap_delta_raw_minus_host": deltas,
        "gate": "per regime |AP(raw_aug) - AP(host_aug)| <= 0.005 "
                "(EQUIVALENCE, two-sided)",
        "gate_pass": gate_pass,
        "raw_no_worse_gate": "per regime AP(raw_aug) >= AP(host_aug) "
                             "- 0.005 (one-sided)",
        "raw_no_worse_pass": raw_no_worse,
        "documented_default": (
            "--targets device (the reference-shaped host augmentation "
            "chain) stays the training default; --targets raw is the "
            "opt-in multi-chip feeding path"
        ),
        "interpretation": (
            "equivalence within 0.005 NOT shown"
            + (", but raw_aug scored no worse (or better) on every "
               "regime in this run — the dropped jpeg/grayscale augs "
               "and f32 device jitter did not cost accuracy at this "
               "horizon; single-run training noise means the positive "
               "deltas should not be read as a proven win either"
               if raw_no_worse else
               "; raw_aug scored WORSE on at least one regime — use "
               "--targets device (the default) for final training")
        ),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
