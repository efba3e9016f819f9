"""Shared loaders for executing the reference stack (/root/reference) on
this image: torchvision/yacs/pycocotools are absent, so functional
stand-ins (not mocks) satisfy the imports and everything that runs is the
reference's own code. Used by scripts/baseline_reference_cpu.py and
scripts/trained_parity.py; the test-suite twins live in
tests/test_reference_*.py.
"""

from __future__ import annotations

import importlib.util
import os
import shutil
import subprocess
import sys
import types

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


def install_torchvision_stub() -> None:
    """UNCONDITIONALLY install the plain-torch stand-in, so a real
    torchvision (if one ever appears in the image) cannot silently change
    the seeded reference weights under a measurement."""
    stub = types.ModuleType("torchvision")
    stub.models = types.ModuleType("torchvision.models")
    stub.models.vgg19 = lambda **kw: _vgg19_features_standin()

    # reference lib/datasets/transforms.py constructs these at module
    # import; nothing executed through this loader calls them, so
    # constructible placeholders suffice (same as the test-suite stubs).
    class _TVOp:
        def __init__(self, *a, **kw):
            pass

        def __call__(self, *a, **kw):  # pragma: no cover
            raise NotImplementedError("torchvision stub op executed")

    tv_t = types.ModuleType("torchvision.transforms")
    for name in ("Normalize", "Compose", "ToTensor", "ColorJitter",
                 "RandomApply", "Lambda", "RandomGrayscale"):
        setattr(tv_t, name, _TVOp)
    tv_f = types.ModuleType("torchvision.transforms.functional")
    tv_f.to_tensor = _TVOp()
    tv_f.pad = _TVOp()
    tv_t.functional = tv_f
    stub.transforms = tv_t

    sys.modules["torchvision"] = stub
    sys.modules["torchvision.models"] = stub.models
    sys.modules["torchvision.transforms"] = tv_t
    sys.modules["torchvision.transforms.functional"] = tv_f


def install_yacs_stub() -> None:
    if "yacs" in sys.modules:
        return

    class CfgNode(dict):
        # attribute-style access is all lib/config/default.py uses
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:  # pragma: no cover
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    yacs = types.ModuleType("yacs")
    yacs.config = types.ModuleType("yacs.config")
    yacs.config.CfgNode = CfgNode
    sys.modules["yacs"] = yacs
    sys.modules["yacs.config"] = yacs.config


def install_pycocotools_stub() -> None:
    """Satisfy ``from pycocotools.coco import COCO`` with OUR functional
    COCO index (torch_ekpose_tpu.data.coco implements the pycocotools
    surface the reference uses); COCOeval stays absent — both stacks'
    detections are scored by our OKS evaluator instead."""
    if "pycocotools" in sys.modules:
        return
    from torch_ekpose_tpu.data.coco import COCO

    class _Absent:
        def __init__(self, *a, **kw):  # pragma: no cover
            raise ModuleNotFoundError(
                "pycocotools.COCOeval is absent; score with "
                "torch_ekpose_tpu.evaluate.cocoeval instead")

    pc = types.ModuleType("pycocotools")
    pc_coco = types.ModuleType("pycocotools.coco")
    pc_eval = types.ModuleType("pycocotools.cocoeval")
    pc_coco.COCO = COCO
    pc_eval.COCOeval = _Absent
    pc.coco, pc.cocoeval = pc_coco, pc_eval
    sys.modules["pycocotools"] = pc
    sys.modules["pycocotools.coco"] = pc_coco
    sys.modules["pycocotools.cocoeval"] = pc_eval


def build_reference_pafprocess(tmp: str):
    """Build the reference SWIG extension exactly as its make.sh does."""
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
    install_torchvision_stub()
    pkg = types.ModuleType("lib.pafprocess.pafprocess")
    pkg.__dict__.update(pafprocess_mod.__dict__)
    sys.modules["lib.pafprocess.pafprocess"] = pkg
    sys.path.insert(0, REFERENCE)
    from lib.evaluate import estimator as ref_estimator
    from lib.network import vgg2016 as ref_vgg2016
    from lib.utils import paf_to_pose as ref_paf_to_pose
    sys.path.remove(REFERENCE)
    return ref_estimator, ref_vgg2016, ref_paf_to_pose


def import_reference_train():
    """The reference's train.py as a module (main() is __main__-guarded),
    with torch.nn.Module.cuda() a CPU no-op so its ``get_loss``
    (train.py:311-339, ``criterion.cuda()``) executes here. The patch is
    left in place — the caller keeps training on CPU."""
    import torch

    install_torchvision_stub()
    install_yacs_stub()
    torch.nn.Module.cuda = lambda self, *a, **kw: self
    sys.path.insert(0, REFERENCE)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_train", os.path.join(REFERENCE, "train.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(REFERENCE)
    return mod


def import_reference_eval():
    """The reference's eval.py as a module: ``append_result`` and the
    ``run_eval`` loop are the executed protocol
    (reference eval.py:93-170)."""
    install_torchvision_stub()
    install_yacs_stub()
    install_pycocotools_stub()
    if "lib.pafprocess.pafprocess" not in sys.modules:
        sys.modules["lib.pafprocess.pafprocess"] = types.ModuleType(
            "lib.pafprocess.pafprocess")
    sys.path.insert(0, REFERENCE)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_eval", os.path.join(REFERENCE, "eval.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(REFERENCE)
    return mod


def ref_cfg():
    """The constants paf_to_pose reads (reference lib/config/default.py)."""
    return types.SimpleNamespace(
        MODEL=types.SimpleNamespace(NUM_KEYPOINTS=18, DOWNSAMPLE=8),
        TEST=types.SimpleNamespace(
            THRESH_HEATMAP=0.15, THRESH_PAF=0.05,
            NUM_INTERMED_PTS_BETWEEN_KEYPOINTS=10,
        ),
    )
