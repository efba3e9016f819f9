"""AP of the serving dtypes on trained weights (TPU).

tests/test_quantize.py pins the quantized forwards to cosine > 0.99 on
random weights; that bounds nothing about end-task accuracy. This runs
the COMPLETE eval loop (evaluate.run_eval — padding, forward, on-device
decode, append_result, OKS scoring) on the trained-parity checkpoint and
val set (scripts/trained_parity.py must have run first) once per serving
dtype, so the bf16 headline mode and both int8 modes get real AP numbers
against the float32 cross-stack-proven 0.4493.

Writes EVAL_DTYPES.json. Runs on whatever backend jax selects (TPU via
the tunnel here; --cpu to force the host backend).

Usage:  python scripts/eval_trained_dtypes.py [--dtypes bfloat16,int8_static]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/synparity/trained_ref.pth")
    ap.add_argument("--workdir", default="/tmp/synparity")
    ap.add_argument(
        "--dtypes", default="float32,bfloat16,int8,int8_static",
        help="comma-separated PoseEstimator compute dtypes to score",
    )
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--out", default="EVAL_DTYPES.json")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    import torch

    from torch_ekpose_tpu.evaluate import evaluator
    from torch_ekpose_tpu.runtime import convert_torch_checkpoint
    from torch_ekpose_tpu.runtime.estimator import PoseEstimator

    image_dir = os.path.join(args.workdir, "images", "val")
    anno_file = os.path.join(args.workdir, "annotations_val.json")
    if not (os.path.isfile(args.ckpt) and os.path.isfile(anno_file)):
        raise SystemExit(
            "run scripts/trained_parity.py first (needs its checkpoint "
            "and val set)"
        )

    state = torch.load(args.ckpt, map_location="cpu")
    state = {k[len("module."):]: v.numpy() for k, v in state.items()}
    variables = convert_torch_checkpoint(state, "vgg2016")

    results = {}
    for name in args.dtypes.split(","):
        import jax.numpy as jnp

        compute_dtype = {
            "float32": jnp.float32,
            "bfloat16": jnp.bfloat16,
            "int8": "int8",
            "int8_static": "int8_static",
        }[name]
        est = PoseEstimator(
            "vgg2016", variables=variables, compute_dtype=compute_dtype,
            decode_backend="jax",  # the on-device decode, as served
        )
        if name == "int8_static":
            # calibrate on the first four val images — production-like
            # frames, as the docstring prescribes
            import cv2

            frames = [
                cv2.imread(os.path.join(image_dir, f))
                for f in sorted(os.listdir(image_dir))[:4]
            ]
            est.calibrate([np.stack(frames)])
        t0 = time.time()
        ap_val = evaluator.run_eval(
            image_dir, anno_file, est, progress=False,
            batch_size=args.batch,
        )
        results[name] = {
            "ap": round(float(ap_val), 4),
            "eval_s": round(time.time() - t0, 1),
        }
        print(name, results[name], flush=True)

    f32 = results.get("float32", {}).get("ap")
    out = {
        "backend": jax.default_backend(),
        "val_set": "trained_parity held-out 30x368px (AP cross-stack "
                   "proven at 0.4493 f32 on CPU)",
        "results": results,
        "note": "all dtypes share the identical converted trained "
                "checkpoint; int8 modes quantize it post-training",
    }
    if f32 is not None:
        for name, r in results.items():
            r["delta_vs_f32"] = round(r["ap"] - f32, 4)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
