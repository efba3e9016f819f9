"""Non-vacuous BN-family trained-weights cross-stack eval.

`scripts/bn_train_parity.py` proves the lockstep claims (per-step losses,
running batch-stats, train/eval switching vs the executed torch
reference) but its trained-eval phase scores a 300-step model — AP 0.0
on both stacks, which agrees trivially. This script makes the BN
cross-stack end-task check carry weight:

1. **train (TPU)** — our stack ALONE trains ``mobilenet_thin`` from the
   converted torch-seed-0 init for enough steps that the model detects
   real skeletons (lockstep equivalence is already owned by
   bn_train_parity.py; repeating it for thousands of steps on the
   torch-CPU arm would take hours and prove nothing new). Params AND
   the accumulated BN batch_stats export to a reference-format ``.pth``
   (`runtime/checkpoint.py::export_torch_checkpoint`).
2. **score (CPU, re-execed with JAX_PLATFORMS=cpu)** — the reference's
   own executed ``eval.py::run_eval`` (torch CPU f32, SWIG decode —
   reference eval.py:129-170) and our ``evaluate.run_eval`` (XLA-CPU
   f32) both score that checkpoint on a rendered val set; gate:
   |delta AP| <= 0.005 AND per-image detection-count agreement >= 0.9
   AND AP >= 0.1 (the non-vacuousness floor).

Merges a ``trained_eval_long`` block into BN_TRAIN_PARITY.json. Usage:
    python scripts/bn_trained_eval.py [--steps 2000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

VARIANT = "mobilenet_thin"


def build_argparser():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--weight-decay", type=float, default=5e-4)
    ap.add_argument("--train-size", type=int, default=160)
    ap.add_argument("--val-images", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workdir", default="/tmp/bntrained")
    ap.add_argument("--out", default="BN_TRAIN_PARITY.json")
    ap.add_argument("--score-only", default=None, metavar="CKPT",
                    help="internal: skip training, score this .pth "
                    "(the train phase re-execs with this set)")
    return ap


def ref_openpose_factory(ref_mobilenet):
    # the reference OpenPose defaults networks.py:28-33 uses for
    # 'mobilenet_thin': conv_width 0.75 / conv_width2 0.50
    return types.SimpleNamespace(
        OpenPose=lambda: ref_mobilenet.OpenPose(
            conv_width=0.75, conv_width2=0.50)
    )


def train_phase(args) -> str:
    """Train on the default backend (TPU when present); return ckpt path."""
    import torch

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    import refstack
    sys.path.insert(0, refstack.REFERENCE)
    from lib.network import mobilenet as ref_mobilenet
    sys.path.remove(refstack.REFERENCE)

    from torch_ekpose_tpu.data import preprocessing as our_preprocessing
    from torch_ekpose_tpu.models import get_model
    from torch_ekpose_tpu.runtime import (
        convert_torch_checkpoint,
        export_torch_checkpoint,
    )
    from torch_ekpose_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    # trained_parity pins jax_platforms=cpu at import (its own phases all
    # run on XLA-CPU); this phase must train on the real chip, so restore
    # the platform config around the import — backends are not yet
    # initialized here, so the restored value is what the first jax use
    # below sees
    prev_env = os.environ.get("JAX_PLATFORMS")
    prev_cfg = jax.config.jax_platforms
    from trained_parity import make_batch

    jax.config.update("jax_platforms", prev_cfg)
    if prev_env is None:
        os.environ.pop("JAX_PLATFORMS", None)
    else:
        os.environ["JAX_PLATFORMS"] = prev_env

    torch.manual_seed(0)
    ref_model = ref_openpose_factory(ref_mobilenet).OpenPose().float()
    state0 = {k: v.detach().numpy().copy()
              for k, v in ref_model.state_dict().items()}
    del ref_model

    variables = convert_torch_checkpoint(state0, VARIANT)
    model = get_model(VARIANT, dtype=jnp.float32)
    state = create_train_state(
        model, variables, make_optimizer(args.lr, args.weight_decay)
    )
    step_fn = make_train_step(model, targets="host")

    # our vgg_preprocess is bit-identical to the reference's
    # (tests/test_reference_python.py); make_batch only calls that one fn
    pre = types.SimpleNamespace(
        vgg_preprocess=our_preprocessing.vgg_preprocess)
    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    for s in range(1, args.steps + 1):
        ims, heats, pafs = make_batch(rng, pre, args.batch, args.train_size)
        state, logs = step_fn(
            state,
            jnp.asarray(ims.transpose(0, 2, 3, 1)),
            jnp.asarray(heats.transpose(0, 2, 3, 1)),
            jnp.asarray(pafs.transpose(0, 2, 3, 1)),
        )
        if s % 200 == 0 or s == 1:
            print(f"step {s}/{args.steps}  loss {float(logs['Loss']):.1f}"
                  f"  {time.time() - t0:.0f}s  [{jax.default_backend()}]",
                  flush=True)

    our_vars = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    ckpt = os.path.join(args.workdir, "bn_trained_long.pth")
    export_torch_checkpoint(our_vars, VARIANT, path=ckpt, template=state0)
    print(f"trained ckpt -> {ckpt}", flush=True)
    return ckpt


def score_phase(args, ckpt: str) -> None:
    # the axon sitecustomize rewrites JAX_PLATFORMS at interpreter
    # startup, so the env var passed by the parent does not survive;
    # pin the platform through jax.config like tests/conftest.py does
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    assert jax.default_backend() == "cpu", (
        "score phase must run on XLA-CPU for exact cross-stack parity"
    )
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    import torch

    import refstack
    from trained_parity import detection_agreement, run_reference_eval

    tmp = tempfile.mkdtemp(prefix="refpaf_")
    pafprocess = refstack.build_reference_pafprocess(tmp)
    ref_estimator, _, _ = refstack.import_reference_modules(pafprocess)
    ref_eval = refstack.import_reference_eval()
    sys.path.insert(0, refstack.REFERENCE)
    from lib.network import mobilenet as ref_mobilenet
    sys.path.remove(refstack.REFERENCE)

    from torch_ekpose_tpu.data.coco import COCO
    from torch_ekpose_tpu.data.synthetic_coco import write_coco_dataset
    from torch_ekpose_tpu.evaluate import evaluator
    from torch_ekpose_tpu.runtime import convert_torch_checkpoint
    from torch_ekpose_tpu.runtime.estimator import PoseEstimator

    image_dir, anno_file = write_coco_dataset(
        args.workdir, args.val_images, mode="val", seed=5555,
        max_people=3, sizes=[(368, 368), (368, 496)],
        post_resize_band=(0.40, 0.60),
    )

    state = torch.load(ckpt, map_location="cpu")
    state = {(k[7:] if k.startswith("module.") else k): v.numpy()
             for k, v in state.items()}
    our_vars = convert_torch_checkpoint(state, VARIANT)
    est = PoseEstimator(VARIANT, variables=our_vars,
                        compute_dtype=jnp.float32)
    ours_json = os.path.join(args.workdir, "results_ours.json")
    ap_ours = evaluator.run_eval(
        image_dir, anno_file, est, results_json=ours_json, progress=False
    )
    with open(ours_json) as f:
        our_rows = json.load(f)
    print(f"ours: AP {ap_ours:.4f}  rows {len(our_rows)}", flush=True)

    ref_rows = run_reference_eval(
        ref_eval, ref_estimator, ref_openpose_factory(ref_mobilenet),
        ckpt, image_dir, anno_file, args.workdir,
    )
    img_ids = COCO(anno_file).getImgIds()
    ap_ref = evaluator.eval_coco(ref_rows, anno_file, img_ids)
    agree = detection_agreement(our_rows, ref_rows, img_ids)
    ap_delta = abs(ap_ours - ap_ref)
    print(f"reference: AP {ap_ref:.4f}  rows {len(ref_rows)}", flush=True)

    block = {
        "steps": args.steps,
        "batch": args.batch,
        "train_size": args.train_size,
        "val_images": args.val_images,
        "ap_ours_our_loop": round(float(ap_ours), 4),
        "ap_ours_reference_loop": round(float(ap_ref), 4),
        "abs_delta": round(float(ap_delta), 4),
        "detections": [len(our_rows), len(ref_rows)],
        "detection_agreement": agree,
        "gate": "abs_delta <= 0.005 AND count_agreement >= 0.9 AND "
                "ap >= 0.1 (non-vacuousness floor)",
        "gate_pass": bool(
            ap_delta <= 0.005
            and agree["count_agreement"] >= 0.9
            and ap_ours >= 0.1
        ),
        "note": "our stack trained ALONE on TPU from the converted "
                "torch init (lockstep equivalence owned by "
                "bn_train_parity.py); params + accumulated BN "
                "batch_stats exported to a reference .pth and scored "
                "by BOTH executed eval loops on XLA/torch CPU f32",
    }
    print(json.dumps(block, indent=2))

    # merge into the BN parity artifact
    if os.path.isfile(args.out):
        with open(args.out) as f:
            doc = json.load(f)
    else:
        doc = {"variant": VARIANT}
    doc["trained_eval_long"] = block
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=2)
        f.write("\n")
    if not block["gate_pass"]:
        sys.exit(1)


def main():
    args = build_argparser().parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    if args.score_only:
        score_phase(args, args.score_only)
        return
    ckpt = train_phase(args)
    # score in a fresh process pinned to the CPU backend: the torch
    # reference runs on CPU and our eval must be XLA-CPU f32 for the
    # exact (delta = 0) cross-stack standard TRAINED_PARITY set
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    cmd = [sys.executable, os.path.abspath(__file__),
           "--score-only", ckpt,
           "--steps", str(args.steps), "--batch", str(args.batch),
           "--train-size", str(args.train_size),
           "--val-images", str(args.val_images),
           "--workdir", args.workdir, "--out", args.out]
    raise SystemExit(subprocess.call(cmd, env=env))


if __name__ == "__main__":
    main()
