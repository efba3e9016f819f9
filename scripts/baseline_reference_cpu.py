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

The reference model factory needs torchvision only for
`models.vgg19().features` (reference lib/network/vgg2016.py:14-15);
a faithful plain-torch config-E stand-in (the same one the parity tests
use) makes it constructible here. The SWIG extension is built exactly as
the reference's make.sh does, in a temp copy.

Usage:  python scripts/baseline_reference_cpu.py [--iters 3] [--warmup 1]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
import types

# MUST override, not setdefault: this image's sitecustomize pins
# JAX_PLATFORMS=axon (the remote-TPU tunnel), which would silently turn
# "ours" into a tunnel-latency measurement instead of XLA-CPU. And since
# sitecustomize may already have imported jax, override through
# jax.config too (tests/conftest.py pattern).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REFERENCE = "/root/reference"
REF_PAF_DIR = os.path.join(REFERENCE, "lib", "pafprocess")


def _vgg19_features_standin():
    """Plain-torch VGG19 config-E feature plan (what torchvision's
    ``vgg19().features`` is); the reference consumes only
    ``features.children()[:23]`` (reference lib/network/vgg2016.py:14-15)."""
    import torch.nn as nn

    plan = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
            512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers, in_ch = [], 3
    for v in plan:
        if v == "M":
            layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers.append(nn.Conv2d(in_ch, v, kernel_size=3, padding=1))
            layers.append(nn.ReLU(inplace=True))
            in_ch = v
    return types.SimpleNamespace(features=nn.Sequential(*layers))


def build_reference_pafprocess(tmp: str):
    """Build the reference SWIG extension exactly as make.sh:1 does."""
    src = os.path.join(tmp, "refpaf")
    os.makedirs(src)
    for name in ("pafprocess.cpp", "pafprocess.h", "pafprocess.i",
                 "numpy.i", "setup.py"):
        shutil.copy(os.path.join(REF_PAF_DIR, name), src)
    subprocess.run(["swig", "-python", "-c++", "pafprocess.i"],
                   cwd=src, check=True, capture_output=True)
    subprocess.run([sys.executable, "setup.py", "build_ext", "--inplace"],
                   cwd=src, check=True, capture_output=True)
    sys.path.insert(0, src)
    import pafprocess  # noqa: F401  (the built extension)
    return pafprocess


def import_reference_modules(pafprocess_mod):
    """Import the reference's estimator/decoder/model with torchvision
    stubbed and the freshly built pafprocess injected."""
    stub = types.ModuleType("torchvision")
    stub.models = types.ModuleType("torchvision.models")
    stub.models.vgg19 = lambda **kw: _vgg19_features_standin()
    sys.modules.setdefault("torchvision", stub)
    sys.modules.setdefault("torchvision.models", stub.models)
    pkg = types.ModuleType("lib.pafprocess.pafprocess")
    pkg.__dict__.update(pafprocess_mod.__dict__)
    sys.modules["lib.pafprocess.pafprocess"] = pkg
    sys.path.insert(0, REFERENCE)
    from lib.evaluate import estimator as ref_estimator
    from lib.network import vgg2016 as ref_vgg2016
    from lib.utils import paf_to_pose as ref_paf_to_pose
    sys.path.remove(REFERENCE)
    return ref_estimator, ref_vgg2016, ref_paf_to_pose


def ref_cfg():
    """The constants paf_to_pose reads (reference lib/config/default.py)."""
    return types.SimpleNamespace(
        MODEL=types.SimpleNamespace(NUM_KEYPOINTS=18, DOWNSAMPLE=8),
        TEST=types.SimpleNamespace(
            THRESH_HEATMAP=0.15, THRESH_PAF=0.05,
            NUM_INTERMED_PTS_BETWEEN_KEYPOINTS=10,
        ),
    )


def timeit(fn, warmup: int, iters: int):
    """Median per-call ms — the host has one core, so any stray process
    corrupts a mean; the median resists transient contention."""
    for _ in range(warmup):
        fn()
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        samples.append((time.perf_counter() - t0) * 1000.0)
    return float(np.median(samples))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--width", type=int, default=432)
    ap.add_argument("--height", type=int, default=368)
    ap.add_argument("--out", default="BASELINE_CPU.json")
    args = ap.parse_args()

    import torch

    tmp = tempfile.mkdtemp(prefix="refbase_")
    pafprocess = build_reference_pafprocess(tmp)
    ref_estimator, ref_vgg2016, ref_paf_to_pose = import_reference_modules(
        pafprocess
    )

    torch.manual_seed(0)
    ref_model = ref_vgg2016.OpenPose().float().eval()
    state = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    rng = np.random.default_rng(0)
    image = rng.integers(
        0, 256, (args.height, args.width, 3), dtype=np.uint8
    )
    cfg = ref_cfg()
    device = torch.device("cpu")

    # -- reference frame path (eval.py:150-156) ---------------------------
    def ref_forward():
        with torch.no_grad():
            return ref_estimator.get_outputs(image, ref_model, "vgg", device)

    def ref_e2e():
        paf, heatmap, _ = ref_forward()
        return ref_paf_to_pose.paf_to_pose_cpp(heatmap, paf, cfg)

    ref_forward_ms = timeit(ref_forward, args.warmup, args.iters)
    ref_e2e_ms = timeit(ref_e2e, args.warmup, args.iters)
    ref_humans = len(ref_e2e())
    ref_paf, ref_heat, _ = ref_forward()

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
    heat_delta = float(np.abs(np.asarray(our_heat) - ref_heat).max())
    paf_delta = float(np.abs(np.asarray(our_paf) - ref_paf).max())

    def our_e2e():
        return est.estimate(image)

    our_forward_ms = timeit(our_forward, args.warmup, args.iters)
    our_e2e_ms = timeit(our_e2e, args.warmup, args.iters)
    our_humans = len(our_e2e())

    assert jax.default_backend() == "cpu", jax.default_backend()
    result = {
        "hardware": f"{os.cpu_count()}-core host CPU, both stacks",
        "jax_backend": jax.default_backend(),
        "input": f"{args.width}x{args.height} uint8 noise, "
                 "identical converted weights (torch seed 0)",
        "iters": args.iters,
        "reference": {
            "forward_ms": round(ref_forward_ms, 1),
            "e2e_ms": round(ref_e2e_ms, 1),
            "humans": ref_humans,
            "stack": "torch CPU f32 + scipy/cv2 NMS + SWIG pafprocess",
        },
        "ours": {
            "forward_ms": round(our_forward_ms, 1),
            "e2e_ms": round(our_e2e_ms, 1),
            "humans": our_humans,
            "stack": "JAX XLA-CPU f32, fused forward+decode",
        },
        "speedup_forward": round(ref_forward_ms / our_forward_ms, 2),
        "speedup_e2e": round(ref_e2e_ms / our_e2e_ms, 2),
        # Numeric agreement of the two stacks on this input. With
        # random-seeded (untrained) weights the maps are near-flat, so a
        # few-1e-4 delta can flip near-threshold peaks and change the
        # human count; the suite proves chain parity at atol=1e-4
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
