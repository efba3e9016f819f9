"""Crowded-scene end-task check: capped device decode vs unbounded host
decode vs the EXECUTED REFERENCE STACK, all on trained weights.

The device decoder's fixed capacities (top-32 peaks/part, 96 person
rows) diverge from the reference's unbounded assembler on extreme
scenes (docs/PARITY.md; truncation rules pinned in
tests/test_capacity.py). This measures whether that matters at the
DEFAULT capacities on genuinely crowded images: a rendered val set with
8-12 people per image is evaluated three ways with the trained-parity
checkpoint —

- ``jax``:       our on-device (capped) decoder;
- ``numpy``:     our host oracle (unbounded, reference semantics);
- ``reference``: the reference's own eval loop executed verbatim
  (``get_outputs`` + SWIG ``paf_to_pose_cpp`` + ``append_result``,
  reference eval.py:129-170) — the one decode regime where round-3
  evidence was only self-referential.

AP, per-image human counts, and cross-stack detection agreement are
compared. Also reports whether the saturation warning fired.

Writes CROWD_CHECK.json. Needs scripts/trained_parity.py's checkpoint.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/synparity/trained_ref.pth")
    ap.add_argument("--images", type=int, default=12)
    ap.add_argument("--min-people", type=int, default=8)
    ap.add_argument("--max-people", type=int, default=12)
    ap.add_argument("--workdir", default="/tmp/crowdval")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"],
                    help="our stack's compute dtype (round 4 ran the "
                    "default bf16; the isolation matrix runs f32)")
    ap.add_argument("--precision", default="fast",
                    choices=["fast", "highest"],
                    help="conv/dot multiply precision for our stack "
                    "(runtime/estimator.py::matmul_precision)")
    ap.add_argument("--tag", default="",
                    help="suffix for per-config results_*.json filenames "
                    "so an isolation matrix can diff rows across configs")
    ap.add_argument("--skip-reference", action="store_true",
                    help="reuse results_reference.json from a previous "
                    "run on the same workdir (the torch-CPU reference "
                    "pass is config-independent)")
    ap.add_argument("--out", default="CROWD_CHECK.json")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    import torch

    from torch_ekpose_tpu.data import synthetic_coco as sc
    from torch_ekpose_tpu.decode import device as decode_device
    from torch_ekpose_tpu.evaluate import evaluator
    from torch_ekpose_tpu.runtime import convert_torch_checkpoint
    from torch_ekpose_tpu.runtime.estimator import PoseEstimator

    # crowded scenes: smaller people so 8-12 fit in frame. The model was
    # trained at scale 0.4-0.6; 0.3-0.45 is near enough its regime that
    # most people detect, which is what makes the cap comparison bite.
    rng = np.random.default_rng(99)
    image_dir = os.path.join(args.workdir, "images", "val")
    os.makedirs(image_dir, exist_ok=True)
    import cv2

    images, annotations, ann_id = [], [], 1
    for i in range(args.images):
        img_id = 5000 + i
        n = int(rng.integers(args.min_people, args.max_people + 1))
        image, kpts = sc.render_scene(
            rng, n, 368, 368, scale_range=(0.3, 0.45)
        )
        cv2.imwrite(os.path.join(image_dir, f"{img_id}.png"), image)
        images.append({"id": img_id, "file_name": f"{img_id}.png",
                       "width": 368, "height": 368})
        for person in kpts:
            annotations.append(sc._coco_annotation(ann_id, img_id, person))
            ann_id += 1
    from torch_ekpose_tpu import constants

    anno_file = os.path.join(args.workdir, "annotations_val.json")
    with open(anno_file, "w") as f:
        json.dump({
            "images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "person",
                            "keypoints": list(constants.COCO_KEYPOINTS),
                            "skeleton": []}],
        }, f)

    state = torch.load(args.ckpt, map_location="cpu")
    state = {k[len("module."):]: v.numpy() for k, v in state.items()}
    variables = convert_torch_checkpoint(state, "vgg2016")

    import jax.numpy as jnp

    compute_dtype = (
        jnp.float32 if args.dtype == "float32" else jnp.bfloat16
    )
    tag = f"_{args.tag}" if args.tag else ""
    results = {}
    for backend in ("jax", "numpy"):
        decode_device._saturation_warned.clear()
        est = PoseEstimator(
            "vgg2016", variables=variables, decode_backend=backend,
            compute_dtype=compute_dtype, precision=args.precision,
        )
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            ap_val = evaluator.run_eval(
                image_dir, anno_file, est, progress=False,
                results_json=os.path.join(
                    args.workdir, f"results_{backend}{tag}.json"),
            )
        with open(os.path.join(
                args.workdir, f"results_{backend}{tag}.json")) as f:
            rows = json.load(f)
        results[backend] = {
            "ap": round(float(ap_val), 4),
            "detections": len(rows),
            "saturation_warnings": sorted(
                {str(w.message)[:50] for w in caught
                 if issubclass(w.category, RuntimeWarning)}
            ),
        }
        print(backend, results[backend], flush=True)

    # ---- the executed reference stack on the same scenes ----------------
    from trained_parity import detection_agreement, run_reference_eval

    ref_json = os.path.join(args.workdir, "results_reference.json")
    if args.skip_reference and os.path.isfile(ref_json):
        with open(ref_json) as f:
            ref_rows = json.load(f)
    else:
        import refstack

        tmp = tempfile.mkdtemp(prefix="refpaf_")
        pafprocess = refstack.build_reference_pafprocess(tmp)
        ref_estimator, ref_vgg2016, _ = refstack.import_reference_modules(
            pafprocess
        )
        ref_eval = refstack.import_reference_eval()
        ref_rows = run_reference_eval(
            ref_eval, ref_estimator, ref_vgg2016, args.ckpt,
            image_dir, anno_file, args.workdir,
        )
        with open(ref_json, "w") as f:
            json.dump(ref_rows, f)
    img_ids = [im["id"] for im in images]
    ap_ref = evaluator.eval_coco(ref_rows, anno_file, img_ids)
    with open(os.path.join(
            args.workdir, f"results_numpy{tag}.json")) as f:
        oracle_rows = json.load(f)
    with open(os.path.join(
            args.workdir, f"results_jax{tag}.json")) as f:
        device_rows = json.load(f)
    results["reference"] = {
        "ap": round(float(ap_ref), 4),
        "detections": len(ref_rows),
        "agreement_vs_oracle": detection_agreement(
            oracle_rows, ref_rows, img_ids),
        "agreement_vs_device": detection_agreement(
            device_rows, ref_rows, img_ids),
    }
    print("reference", results["reference"], flush=True)

    out = {
        "backend": jax.default_backend(),
        "dtype": args.dtype,
        "precision": args.precision,
        "setup": f"{args.images} rendered scenes, "
                 f"{args.min_people}-{args.max_people} people each, "
                 "trained-parity weights; device decode (capped 32 "
                 "peaks/part, 96 person rows) vs host oracle (unbounded, "
                 "reference semantics) vs the reference's executed "
                 "eval.py loop (SWIG decode)",
        "results": results,
        "ap_delta_capped_vs_unbounded": round(
            results["jax"]["ap"] - results["numpy"]["ap"], 4),
        "ap_delta_ours_vs_reference": round(
            results["numpy"]["ap"] - results["reference"]["ap"], 4),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
