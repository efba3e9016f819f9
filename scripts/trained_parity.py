"""End-task cross-stack proof with TRAINED weights, across regimes.

Trains the reference's own ``OpenPose()`` (torch CPU, reference
``get_loss``/Adam hyperparameters — /root/reference/train.py:145-149,
311-339) on rendered synthetic scenes
(``torch_ekpose_tpu.data.synthetic_coco``), saves a real ``.pth``,
converts it with ``runtime.convert_torch_checkpoint``, and then runs BOTH
stacks' complete eval loops over held-out COCO-format val sets covering
the regimes where the protocol actually sweats:

- ``square``     — 368x368, 1-3 people (the happy path);
- ``nonsquare``  — mixed portrait/landscape/odd canvases exercising
  several pad-to-x8 buckets of ``padding``
  (reference lib/evaluate/estimator.py:52-68);
- ``crowded``    — 6-9 people per image (assembler-order and
  capacity pressure);
- ``multiscale`` — mixed canvas sizes and wide within-image people-scale
  variation.

Per regime:

- reference: its ``eval.py::run_eval`` executed verbatim — padding,
  ``get_outputs``, SWIG ``paf_to_pose_cpp``, ``append_result``
  (/root/reference/eval.py:129-170). The loop runs to the point where it
  has written results.json; the absent COCOeval then raises and the rows
  are rescued from disk.
- ours: ``evaluate.run_eval`` with a ``PoseEstimator`` on the converted
  weights (JAX CPU, float32 for dtype parity with the reference).

Both detection sets are scored by our OKS evaluator
(``evaluate.cocoeval.COCOKeypointEval``) against the same annotations.
Gates, per regime: |AP(ours) - AP(reference)| <= 0.005 (0.5 AP on the
0-100 scale, BASELINE.md's "within 0.5 AP"), per-image detection-count
agreement >= 0.9, and nonzero detections from both stacks.

Writes TRAINED_PARITY.json. Usage:
    python scripts/trained_parity.py [--steps 400] [--skip-train]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
import types

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

import refstack  # noqa: E402

# training people-scale band (on the 160px train canvas). Every val
# regime renders people so their POST-eval-resize scale lands inside
# this band (synthetic_coco.write_coco_dataset post_resize_band), so
# one checkpoint covers square, nonsquare, crowded, and multiscale.
SCALE_RANGE = (0.30, 0.65)

#: Held-out val regimes. ``sizes`` are (h, w) canvases cycled per image;
#: ``band`` is the POST-resize people-scale band (people height =
#: 200px * scale after the protocol's max-side-368 resize).
REGIMES = {
    "square": dict(
        n=30, sizes=[(368, 368)], people=(1, 3), band=(0.40, 0.60),
        seed=7777,
    ),
    "nonsquare": dict(
        n=28,
        sizes=[(368, 496), (496, 368), (296, 520), (520, 296),
               (300, 444), (444, 300), (368, 400)],
        people=(1, 3), band=(0.40, 0.58), seed=8888,
    ),
    "crowded": dict(
        n=16, sizes=[(368, 368)], people=(6, 9), band=(0.32, 0.46),
        seed=9999,
    ),
    "multiscale": dict(
        n=20, sizes=[(368, 368), (416, 416), (512, 512)], people=(2, 4),
        band=(0.33, 0.60), seed=4444,
    ),
    # round-5 photo-statistics regimes (renderer options in
    # synthetic_coco.render_scene): where bottom-up decoders actually
    # differ on real data — overlapping bodies and border-cropped people
    # (reference lib/datasets/datasets.py:126-139, 199-229 exist to
    # handle exactly these)
    "occluded": dict(
        n=20, sizes=[(368, 368), (416, 368)], people=(3, 6),
        band=(0.34, 0.52), seed=5151,
        render=dict(background="textured", occlusion=True,
                    scale_strokes=True),
    ),
    "truncated": dict(
        n=20,
        # includes >= 2:1 aspect canvases (portrait and landscape)
        sizes=[(368, 368), (256, 520), (520, 256), (240, 512)],
        people=(1, 4), band=(0.36, 0.55), seed=6161,
        render=dict(background="textured", truncate=True,
                    scale_strokes=True),
    ),
}


def detection_agreement(rows_a, rows_b, img_ids):
    """Per-image cross-stack agreement between two result-row lists:
    fraction of images where both stacks report the SAME number of
    people, plus the mean keypoint distance (px) between greedily
    matched detections on those images."""
    by_img_a, by_img_b = {}, {}
    for r in rows_a:
        by_img_a.setdefault(r["image_id"], []).append(r)
    for r in rows_b:
        by_img_b.setdefault(r["image_id"], []).append(r)

    def kp(row):
        return np.asarray(row["keypoints"], dtype=np.float64).reshape(17, 3)

    equal, dists = 0, []
    for iid in img_ids:
        A = [kp(r) for r in by_img_a.get(iid, [])]
        B = [kp(r) for r in by_img_b.get(iid, [])]
        if len(A) != len(B):
            continue
        equal += 1
        unused = list(range(len(B)))
        for a in A:
            best, best_j = None, None
            for j in unused:
                b = B[j]
                both = (a[:, 2] > 0) & (b[:, 2] > 0)
                if not both.any():
                    continue
                d = float(np.linalg.norm(
                    a[both, :2] - b[both, :2], axis=1).mean())
                if best is None or d < best:
                    best, best_j = d, j
            if best_j is not None:
                unused.remove(best_j)
                dists.append(best)
    return {
        "images_equal_count": equal,
        "images_total": len(img_ids),
        "count_agreement": round(equal / max(len(img_ids), 1), 4),
        "matched_mean_px": round(float(np.mean(dists)), 3) if dists
        else None,
        "matched_max_px": round(float(np.max(dists)), 3) if dists
        else None,
    }


def make_batch(rng, ref_preprocessing, batch: int, size: int):
    """Rendered scenes -> (images NCHW f32 via the reference's own
    vgg_preprocess, heatmap targets NCHW, PAF targets NCHW)."""
    from torch_ekpose_tpu.data.synthetic_coco import render_scene
    from torch_ekpose_tpu.data.targets import gen_targets_np

    grid = size // 8
    ims, heats, pafs = [], [], []
    for _ in range(batch):
        # round 5: mix the photo-statistics renderer options into
        # training so the occluded/truncated val regimes are scored by a
        # model that has seen clutter, overlap, and border crops (the
        # reference trains on real COCO, which has all of these)
        image, kpts = render_scene(
            rng, int(rng.integers(1, 3)), size, size,
            scale_range=SCALE_RANGE,
            background="textured" if rng.uniform() < 0.4 else "plain",
            occlusion=bool(rng.uniform() < 0.3),
            truncate=bool(rng.uniform() < 0.25),
            scale_strokes=bool(rng.uniform() < 0.5),
        )
        heat, paf = gen_targets_np(kpts, grid, grid, 8, 7.0)
        ims.append(ref_preprocessing.vgg_preprocess(image))  # [3, H, W]
        heats.append(heat.transpose(2, 0, 1))
        pafs.append(paf.transpose(2, 0, 1))
    return (
        np.stack(ims).astype(np.float32),
        np.stack(heats).astype(np.float32),
        np.stack(pafs).astype(np.float32),
    )


def train_reference(args, ref_train, ref_preprocessing, ckpt_path: str):
    import torch

    sys.path.insert(0, refstack.REFERENCE)
    from lib.network import vgg2016
    sys.path.remove(refstack.REFERENCE)

    torch.manual_seed(0)
    model = vgg2016.OpenPose().float().train()
    # reference main-training optimizer (train.py:177-182 with the
    # argparse defaults lr=1e-4, weight_decay=5e-4)
    optimizer = torch.optim.Adam(
        model.parameters(), lr=args.lr, betas=(0.9, 0.999),
        weight_decay=args.weight_decay,
    )
    loss_args = types.SimpleNamespace(batch_size=args.batch)
    rng = np.random.default_rng(args.seed)

    t0 = time.time()
    running = None
    for step in range(1, args.steps + 1):
        ims, heats, pafs = make_batch(
            rng, ref_preprocessing, args.batch, args.train_size
        )
        img_t = torch.from_numpy(ims)
        heat_t = torch.from_numpy(heats)
        paf_t = torch.from_numpy(pafs)
        _, saved_for_loss = model(img_t)
        total_loss, _ = ref_train.get_loss(
            saved_for_loss, heat_t, paf_t, loss_args
        )
        optimizer.zero_grad()
        total_loss.backward()
        optimizer.step()
        val = float(total_loss.detach())
        running = val if running is None else 0.95 * running + 0.05 * val
        if step % 25 == 0 or step == 1:
            print(
                f"step {step}/{args.steps}  loss {val:.1f}  "
                f"(ema {running:.1f})  {time.time() - t0:.0f}s",
                flush=True,
            )

    model.eval()
    # save as the reference's train loop does: a DataParallel state_dict
    # ('module.'-prefixed — train.py:107 wraps in nn.DataParallel), so the
    # reference's own load_ckpt (estimator.py:22-42) round-trips it.
    torch.save(
        {"module." + k: v for k, v in model.state_dict().items()},
        ckpt_path,
    )
    return running


def run_reference_eval(ref_eval, ref_estimator, ref_vgg2016, ckpt_path,
                       image_dir, anno_file, workdir):
    """Execute the reference's run_eval verbatim; rescue results.json."""
    import torch

    device = torch.device("cpu")
    model = ref_vgg2016.OpenPose().float()
    # the reference's own checkpoint loader (strips the module. prefix)
    model = ref_estimator.load_ckpt(model, ckpt_path, device)

    args = types.SimpleNamespace(mode="val", save=0, json=True)
    results_dir = os.path.join(workdir, "results")
    os.makedirs(results_dir, exist_ok=True)
    prev_cwd = os.getcwd()
    os.chdir(workdir)  # eval_coco hardcodes ./results/results.json
    try:
        try:
            ref_eval.run_eval(
                image_dir=image_dir, anno_file=anno_file, vis_dir="results/",
                model=model, preprocess="vgg", device=device, args=args,
            )
            raise AssertionError(
                "reference eval_coco ran to completion — COCOeval stub "
                "was not hit; scoring would have been pycocotools', "
                "which is absent"
            )
        except ModuleNotFoundError:
            # raised by the COCOeval stub AFTER the loop appended every
            # image's rows and eval_coco wrote them to disk
            with open(os.path.join(results_dir, "results.json")) as f:
                return json.load(f)
    finally:
        os.chdir(prev_cwd)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--weight-decay", type=float, default=5e-4)
    ap.add_argument("--train-size", type=int, default=160)
    ap.add_argument("--regimes", default=",".join(REGIMES),
                    help="comma-separated subset of regimes to run")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workdir", default="/tmp/synparity")
    ap.add_argument("--out", default="TRAINED_PARITY.json")
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse an existing trained checkpoint")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    ckpt_path = os.path.join(args.workdir, "trained_ref.pth")

    # ---- reference stack (executed, not reimplemented) ------------------
    tmp = tempfile.mkdtemp(prefix="refpaf_")
    pafprocess = refstack.build_reference_pafprocess(tmp)
    ref_estimator, ref_vgg2016, _ = refstack.import_reference_modules(
        pafprocess
    )
    ref_train = refstack.import_reference_train()
    ref_eval = refstack.import_reference_eval()
    sys.path.insert(0, refstack.REFERENCE)
    from lib.datasets import preprocessing as ref_preprocessing
    sys.path.remove(refstack.REFERENCE)

    # ---- train the reference model --------------------------------------
    if not (args.skip_train and os.path.isfile(ckpt_path)):
        final_loss = train_reference(
            args, ref_train, ref_preprocessing, ckpt_path
        )
        print(f"trained: ema loss {final_loss:.1f} -> {ckpt_path}")
    else:
        final_loss = None
        print(f"reusing {ckpt_path}")

    # ---- converted weights, once -----------------------------------------
    import torch

    import jax.numpy as jnp
    from torch_ekpose_tpu.data.coco import COCO
    from torch_ekpose_tpu.data.synthetic_coco import write_coco_dataset
    from torch_ekpose_tpu.evaluate import evaluator
    from torch_ekpose_tpu.runtime import convert_torch_checkpoint
    from torch_ekpose_tpu.runtime.estimator import PoseEstimator

    state = torch.load(ckpt_path, map_location="cpu")
    state = {k[len("module."):]: v.numpy() for k, v in state.items()}
    variables = convert_torch_checkpoint(state, "vgg2016")
    est = PoseEstimator(
        "vgg2016", variables=variables, compute_dtype=jnp.float32
    )

    # ---- both stacks' full eval loops, per regime --------------------------
    regimes_out = {}
    all_pass = True
    for name in args.regimes.split(","):
        spec = REGIMES[name]
        rdir = os.path.join(args.workdir, f"regime_{name}")
        image_dir, anno_file = write_coco_dataset(
            rdir, spec["n"], mode="val", seed=spec["seed"],
            sizes=spec["sizes"], min_people=spec["people"][0],
            max_people=spec["people"][1], post_resize_band=spec["band"],
            **spec.get("render", {}),
        )

        t0 = time.time()
        ref_rows = run_reference_eval(
            ref_eval, ref_estimator, ref_vgg2016, ckpt_path,
            image_dir, anno_file, rdir,
        )
        ref_eval_s = time.time() - t0
        ours_json = os.path.join(rdir, "results_ours.json")
        t0 = time.time()
        ap_ours = evaluator.run_eval(
            image_dir, anno_file, est, results_json=ours_json,
            progress=False,
        )
        our_eval_s = time.time() - t0
        with open(ours_json) as f:
            our_rows = json.load(f)

        img_ids = COCO(anno_file).getImgIds()
        ap_ref = evaluator.eval_coco(ref_rows, anno_file, img_ids)
        agree = detection_agreement(our_rows, ref_rows, img_ids)
        delta = abs(ap_ours - ap_ref)
        gate_pass = bool(
            delta <= 0.005
            and agree["count_agreement"] >= 0.9
            and len(our_rows) > 0 and len(ref_rows) > 0
        )
        all_pass = all_pass and gate_pass
        regimes_out[name] = {
            "images": spec["n"],
            "canvases": [f"{h}x{w}" for h, w in spec["sizes"]],
            "people": list(spec["people"]),
            "post_resize_scale_band": list(spec["band"]),
            "render_options": spec.get("render", {}),
            "ap_ours": round(ap_ours, 4),
            "ap_reference": round(ap_ref, 4),
            "abs_delta": round(delta, 4),
            "detections_ours": len(our_rows),
            "detections_reference": len(ref_rows),
            "detection_agreement": agree,
            "eval_seconds": {"reference": round(ref_eval_s, 1),
                             "ours": round(our_eval_s, 1)},
            "gate_pass": gate_pass,
        }
        print(f"[{name}] ours {ap_ours:.4f} ref {ap_ref:.4f} "
              f"delta {delta:.4f} agree {agree['count_agreement']:.2f} "
              f"pass={gate_pass}", flush=True)

    result = {
        "gate": "per regime: abs_delta <= 0.005 (0.5 AP on the 0-100 "
                "scale) AND per-image detection-count agreement >= 0.9 "
                "AND both stacks detect",
        "gate_pass": all_pass,
        "regimes": regimes_out,
        "train": {
            "steps": args.steps, "batch": args.batch, "lr": args.lr,
            "weight_decay": args.weight_decay, "size": args.train_size,
            "scale_band": list(SCALE_RANGE),
            "final_ema_loss": final_loss and round(final_loss, 1),
            "optimizer": "reference Adam defaults (train.py:177-182)",
            "loss": "reference get_loss, executed (train.py:311-339)",
        },
        "protocol": {
            "reference": "eval.py::run_eval executed verbatim "
                         "(get_outputs + SWIG paf_to_pose_cpp + "
                         "append_result), rows rescued from its "
                         "results.json",
            "ours": "evaluate.run_eval with PoseEstimator on the "
                    "converted .pth (JAX CPU f32)",
            "scoring": "torch_ekpose_tpu.evaluate.cocoeval for BOTH "
                       "stacks (pycocotools absent)",
        },
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result, indent=2))
    if not all_pass:
        sys.exit(1)


if __name__ == "__main__":
    main()
