"""End-task cross-stack proof with TRAINED weights.

Trains the reference's own ``OpenPose()`` (torch CPU, reference
``get_loss``/Adam hyperparameters — /root/reference/train.py:145-149,
311-339) on rendered synthetic scenes
(``torch_ekpose_tpu.data.synthetic_coco``), saves a real ``.pth``,
converts it with ``runtime.convert_torch_checkpoint``, and then runs BOTH
stacks' complete eval loops over a held-out COCO-format val set:

- reference: its ``eval.py::run_eval`` executed verbatim — padding,
  ``get_outputs``, SWIG ``paf_to_pose_cpp``, ``append_result``
  (/root/reference/eval.py:129-170). The loop runs to the point where it
  has written results.json; the absent COCOeval then raises and the rows
  are rescued from disk.
- ours: ``evaluate.run_eval`` with a ``PoseEstimator`` on the converted
  weights (JAX CPU, float32 for dtype parity with the reference).

Both detection sets are scored by our OKS evaluator
(``evaluate.cocoeval.COCOKeypointEval``) against the same annotations.
Gate: |AP(ours) - AP(reference)| <= 0.005 (0.5 AP on the 0-100 scale,
BASELINE.md's "within 0.5 AP") with weights that detect real skeletons.

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

# people rendered at the same absolute pixel scale in train and val
# (the eval path's max-side-368 resize is identity on the 368px canvas)
SCALE_RANGE = (0.4, 0.6)


def make_batch(rng, ref_preprocessing, batch: int, size: int):
    """Rendered scenes -> (images NCHW f32 via the reference's own
    vgg_preprocess, heatmap targets NCHW, PAF targets NCHW)."""
    from torch_ekpose_tpu.data.synthetic_coco import render_scene
    from torch_ekpose_tpu.data.targets import gen_targets_np

    grid = size // 8
    ims, heats, pafs = [], [], []
    for _ in range(batch):
        image, kpts = render_scene(
            rng, int(rng.integers(1, 3)), size, size,
            scale_range=SCALE_RANGE,
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
    ap.add_argument("--train-size", type=int, default=128)
    ap.add_argument("--val-images", type=int, default=30)
    ap.add_argument("--val-size", type=int, default=368)
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

    # ---- held-out val set ------------------------------------------------
    from torch_ekpose_tpu.data.synthetic_coco import write_coco_dataset

    image_dir, anno_file = write_coco_dataset(
        args.workdir, args.val_images, h=args.val_size, w=args.val_size,
        mode="val", seed=7777, max_people=3, scale_range=SCALE_RANGE,
    )

    # ---- train the reference model --------------------------------------
    if not (args.skip_train and os.path.isfile(ckpt_path)):
        final_loss = train_reference(
            args, ref_train, ref_preprocessing, ckpt_path
        )
        print(f"trained: ema loss {final_loss:.1f} -> {ckpt_path}")
    else:
        final_loss = None
        print(f"reusing {ckpt_path}")

    # ---- reference stack full eval loop ----------------------------------
    t0 = time.time()
    ref_rows = run_reference_eval(
        ref_eval, ref_estimator, ref_vgg2016, ckpt_path,
        image_dir, anno_file, args.workdir,
    )
    ref_eval_s = time.time() - t0
    print(f"reference eval: {len(ref_rows)} detections, {ref_eval_s:.0f}s")

    # ---- our stack full eval loop ----------------------------------------
    import torch

    import jax.numpy as jnp
    from torch_ekpose_tpu.evaluate import evaluator
    from torch_ekpose_tpu.runtime import convert_torch_checkpoint
    from torch_ekpose_tpu.runtime.estimator import PoseEstimator

    state = torch.load(ckpt_path, map_location="cpu")
    state = {k[len("module."):]: v.numpy() for k, v in state.items()}
    variables = convert_torch_checkpoint(state, "vgg2016")
    est = PoseEstimator(
        "vgg2016", variables=variables, compute_dtype=jnp.float32
    )
    ours_json = os.path.join(args.workdir, "results_ours.json")
    t0 = time.time()
    ap_ours = evaluator.run_eval(
        image_dir, anno_file, est, results_json=ours_json, progress=False
    )
    our_eval_s = time.time() - t0
    with open(ours_json) as f:
        our_rows = json.load(f)
    print(f"our eval: {len(our_rows)} detections, {our_eval_s:.0f}s")

    # ---- score the reference's detections with the same evaluator --------
    from torch_ekpose_tpu.data.coco import COCO

    img_ids = COCO(anno_file).getImgIds()
    ap_ref = evaluator.eval_coco(ref_rows, anno_file, img_ids)

    delta = abs(ap_ours - ap_ref)
    result = {
        "ap_ours": round(ap_ours, 4),
        "ap_reference": round(ap_ref, 4),
        "abs_delta": round(delta, 4),
        "gate": "abs_delta <= 0.005 (0.5 AP on the 0-100 scale)",
        "gate_pass": bool(delta <= 0.005),
        "detections_ours": len(our_rows),
        "detections_reference": len(ref_rows),
        "val_images": args.val_images,
        "val_size": args.val_size,
        "train": {
            "steps": args.steps, "batch": args.batch, "lr": args.lr,
            "weight_decay": args.weight_decay, "size": args.train_size,
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
    if not result["gate_pass"]:
        sys.exit(1)
    if len(our_rows) == 0 or len(ref_rows) == 0:
        print("WARNING: zero detections — weights did not learn; "
              "raise --steps")
        sys.exit(2)


if __name__ == "__main__":
    main()
