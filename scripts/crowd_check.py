"""Crowded-scene end-task check: capped device decode vs unbounded host
decode on trained weights.

The device decoder's fixed capacities (top-32 peaks/part, 96 person
rows) diverge from the reference's unbounded assembler on extreme
scenes (docs/PARITY.md; truncation rules pinned in
tests/test_capacity.py). This measures whether that matters at the
DEFAULT capacities on genuinely crowded images: a rendered val set with
8-12 people per image is evaluated twice with the trained-parity
checkpoint — once through the on-device (capped) decoder, once through
the host oracle (unbounded, reference semantics) — and both AP and the
per-image human counts are compared. Also reports whether the
saturation warning fired.

Writes CROWD_CHECK.json. Needs scripts/trained_parity.py's checkpoint.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/synparity/trained_ref.pth")
    ap.add_argument("--images", type=int, default=12)
    ap.add_argument("--min-people", type=int, default=8)
    ap.add_argument("--max-people", type=int, default=12)
    ap.add_argument("--workdir", default="/tmp/crowdval")
    ap.add_argument("--cpu", action="store_true")
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

    results = {}
    for backend in ("jax", "numpy"):
        decode_device._saturation_warned.clear()
        est = PoseEstimator(
            "vgg2016", variables=variables, decode_backend=backend
        )
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            ap_val = evaluator.run_eval(
                image_dir, anno_file, est, progress=False,
                results_json=os.path.join(
                    args.workdir, f"results_{backend}.json"),
            )
        with open(os.path.join(
                args.workdir, f"results_{backend}.json")) as f:
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

    out = {
        "backend": jax.default_backend(),
        "setup": f"{args.images} rendered scenes, "
                 f"{args.min_people}-{args.max_people} people each, "
                 "trained-parity weights; device decode (capped 32 "
                 "peaks/part, 96 person rows) vs host oracle (unbounded, "
                 "reference semantics)",
        "results": results,
        "ap_delta_capped_vs_unbounded": round(
            results["jax"]["ap"] - results["numpy"]["ap"], 4),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
