"""Measured same-hardware baseline: reference PyTorch pipeline vs ours.

BASELINE.md's first task — "run the reference to establish the actual
frames/sec/chip base" — cannot be satisfied on the reference's intended
hardware (this image has no GPU), so bench.py's `vs_baseline` ratio uses a
provisional 12 fps figure and is labeled `baseline_provisional`. What CAN
be measured honestly is both stacks on the SAME hardware: the host CPU.
This script runs the reference's own frame path (padding + vgg preprocess
+ torch forward + NMS + compiled SWIG pafprocess decode, exactly
reference eval.py:150-156) and our frame path (`PoseEstimator.estimate`,
JAX CPU backend) on the same input with IDENTICAL weights (the reference
model's state_dict converted through `runtime.checkpoint`), and writes a
measured-vs-measured comparison to BASELINE_CPU.json.

Weights: by default a seed-0 random init; pass ``--ckpt`` (e.g. the
checkpoint produced by scripts/trained_parity.py) to measure with trained
weights, where both decoders do real assembly work — untrained weights
produce near-flat maps, biasing the e2e comparison toward whichever
decoder exits earliest.

Timing: each stack's two closures are interleaved round-robin (so
transient load on this one-core host hits both distributions alike) and
medians reported. The reference's e2e is the SUM of its forward and
decode medians — its decode is tens of ms, far below the host's
forward variance, so a directly-timed combined closure just produces a
second noisy forward median that can (and in round 2 did) land below
the first, committing a physically impossible artifact.

Usage:  python scripts/baseline_reference_cpu.py [--iters 15] [--ckpt F]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

# MUST override, not setdefault: this image's sitecustomize pins
# JAX_PLATFORMS=axon (the remote-TPU tunnel), which would silently turn
# "ours" into a tunnel-latency measurement instead of XLA-CPU. And since
# sitecustomize may already have imported jax, override through
# jax.config too (tests/conftest.py pattern).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

import refstack  # noqa: E402


def interleaved_medians(fns, warmup: int, iters: int):
    """Median per-call ms for each closure, with samples interleaved
    round-robin: on a one-core host a transient background process
    corrupts a contiguous run of one closure but spreads evenly over
    interleaved ones. Medians resist what remains."""
    for fn in fns:
        for _ in range(warmup):
            fn()
    samples = [[] for _ in fns]
    for _ in range(iters):
        for i, fn in enumerate(fns):
            t0 = time.perf_counter()
            fn()
            samples[i].append((time.perf_counter() - t0) * 1000.0)
    return [float(np.median(s)) for s in samples]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--width", type=int, default=432)
    ap.add_argument("--height", type=int, default=368)
    ap.add_argument("--ckpt", default=None,
                    help=".pth with module.-prefixed keys (e.g. from "
                         "scripts/trained_parity.py); default: seed-0 init")
    ap.add_argument("--image", default=None,
                    help="optional image path; default: uint8 noise, or a "
                         "rendered synthetic scene when --ckpt is given")
    ap.add_argument("--out", default="BASELINE_CPU.json")
    args = ap.parse_args()

    import torch

    tmp = tempfile.mkdtemp(prefix="refbase_")
    pafprocess = refstack.build_reference_pafprocess(tmp)
    ref_estimator, ref_vgg2016, ref_paf_to_pose = (
        refstack.import_reference_modules(pafprocess)
    )

    torch.manual_seed(0)
    ref_model = ref_vgg2016.OpenPose().float().eval()
    if args.ckpt:
        ref_model = ref_estimator.load_ckpt(
            ref_model, args.ckpt, torch.device("cpu")
        )
        weights_desc = f"trained ({os.path.basename(args.ckpt)})"
    else:
        weights_desc = "seed-0 random init (decoders do near-zero work " \
                       "on the near-flat maps; see --ckpt)"
    state = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    rng = np.random.default_rng(0)
    if args.image:
        import cv2

        image = cv2.imread(args.image)
        image = cv2.resize(image, (args.width, args.height))
        input_desc = f"{args.image} resized to {args.width}x{args.height}"
    elif args.ckpt:
        # trained weights deserve an input with real people so BOTH
        # decode paths assemble real skeletons
        from torch_ekpose_tpu.data.synthetic_coco import render_scene

        image, _ = render_scene(
            rng, 3, args.height, args.width, scale_range=(0.4, 0.6)
        )
        input_desc = (
            f"{args.width}x{args.height} rendered 3-person scene"
        )
    else:
        image = rng.integers(
            0, 256, (args.height, args.width, 3), dtype=np.uint8
        )
        input_desc = f"{args.width}x{args.height} uint8 noise"
    cfg = refstack.ref_cfg()
    device = torch.device("cpu")

    # -- reference frame path (eval.py:150-156) ---------------------------
    def ref_forward():
        with torch.no_grad():
            return ref_estimator.get_outputs(image, ref_model, "vgg", device)

    ref_paf0, ref_heat0, _ = ref_forward()

    def ref_decode():
        return ref_paf_to_pose.paf_to_pose_cpp(ref_heat0, ref_paf0, cfg)

    def ref_e2e():
        paf, heatmap, _ = ref_forward()
        return ref_paf_to_pose.paf_to_pose_cpp(heatmap, paf, cfg)

    # -- our frame path, same weights, JAX CPU backend --------------------
    from torch_ekpose_tpu.runtime import convert_torch_checkpoint
    from torch_ekpose_tpu.runtime.estimator import PoseEstimator
    import jax.numpy as jnp

    variables = convert_torch_checkpoint(state, "vgg2016")
    # float32 on CPU: XLA-CPU has no native bf16 units, and the reference
    # runs float32 — dtype parity keeps the comparison honest.
    est = PoseEstimator(
        "vgg2016", variables=variables, compute_dtype=jnp.float32
    )

    def our_forward():
        pafs, heatmaps, scale = est.get_outputs(image)
        return np.asarray(heatmaps)

    our_paf, our_heat, _ = est.get_outputs(image)
    ref_paf, ref_heat, _ = ref_forward()
    heat_delta = float(np.abs(np.asarray(our_heat) - ref_heat).max())
    paf_delta = float(np.abs(np.asarray(our_paf) - ref_paf).max())

    def our_e2e():
        return est.estimate(image)

    # The reference's e2e is forward + SWIG decode of the SAME call, so
    # its honest e2e is the SUM of the two independently-measured
    # medians. (Round 2 timed a combined e2e closure directly and
    # committed the physically impossible e2e < forward: the decode is
    # tens of ms, far below this one-core host's run-to-run forward
    # variance, so the combined closure's median is just a second noisy
    # forward sample that can land below the first.) Our two closures
    # are DIFFERENT executables — `estimate` fuses forward+decode into
    # one XLA program and fetches one small packed buffer, while the
    # forward closure fetches the full heatmap/paf arrays — so ours are
    # timed directly and e2e may legitimately come in under
    # forward+fetch.
    ref_forward_ms, ref_decode_ms = interleaved_medians(
        [ref_forward, ref_decode], args.warmup, args.iters
    )
    ref_e2e_ms = ref_forward_ms + ref_decode_ms
    our_forward_ms, our_e2e_ms = interleaved_medians(
        [our_forward, our_e2e], args.warmup, args.iters
    )
    ref_humans = len(ref_e2e())
    our_humans = len(our_e2e()[0])  # estimate() -> (humans, im_scale)

    assert jax.default_backend() == "cpu", jax.default_backend()
    result = {
        "hardware": f"{os.cpu_count()}-core host CPU, both stacks",
        "jax_backend": jax.default_backend(),
        "weights": weights_desc,
        "input": input_desc,
        "iters": args.iters,
        "sampling": "interleaved round-robin, median per closure",
        "reference": {
            "forward_ms": round(ref_forward_ms, 1),
            "decode_ms": round(ref_decode_ms, 1),
            "e2e_ms": round(ref_e2e_ms, 1),
            "e2e_note": "forward + decode medians summed (decode is far "
                        "below this host's forward variance, so a "
                        "combined closure's median is not meaningful)",
            "humans": ref_humans,
            "stack": "torch CPU f32 + scipy/cv2 NMS + SWIG pafprocess",
        },
        "ours": {
            "forward_ms": round(our_forward_ms, 1),
            "e2e_ms": round(our_e2e_ms, 1),
            "e2e_note": "different executables: e2e is the fused "
                        "forward+decode program with one small packed "
                        "fetch; the forward closure fetches full "
                        "heatmap/paf arrays",
            "humans": our_humans,
            "stack": "JAX XLA-CPU f32, fused forward+decode",
        },
        "speedup_forward": round(ref_forward_ms / our_forward_ms, 2),
        "speedup_e2e": round(ref_e2e_ms / our_e2e_ms, 2),
        # Numeric agreement of the two stacks on this input. The suite
        # proves chain parity at atol=1e-4
        # (tests/test_reference_python.py::test_get_outputs_matches_reference).
        "max_abs_heatmap_delta": heat_delta,
        "max_abs_paf_delta": paf_delta,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
