"""Eval-protocol parity against the reference's *executed* eval.py.

/root/reference/eval.py imports pycocotools at module scope; a placeholder
module satisfies the import (the scoring math itself is pycocotools',
absent from this image — our independent OKS evaluator is validated by its
own adversarial suite in test_cocoeval.py). Everything else the module
executes here is the reference's own code:

- ``append_result`` (eval.py:93-125): the x*upsample+0.5 shift, ORDER_COCO
  remap, score=1.0 — executed on identical Human lists and required to
  produce byte-identical results.json rows to ours.
- ``run_eval``'s per-image loop (eval.py:129-170): executed end-to-end
  with its model/decoder seams patched to deterministic fakes fed to BOTH
  stacks, so the loop arithmetic (the upsample_keypoints formula with the
  executed cfg.MODEL.DOWNSAMPLE) is pinned by file-level byte equality.
"""

import importlib.util
import json
import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REFERENCE, "eval.py")),
    reason="reference tree unavailable",
)


@pytest.fixture(scope="module")
def ref_eval():
    from test_reference_train_math import _install_stubs

    _install_stubs()
    if "pycocotools" not in sys.modules:
        pc = types.ModuleType("pycocotools")
        pc_coco = types.ModuleType("pycocotools.coco")
        pc_eval = types.ModuleType("pycocotools.cocoeval")

        class _Absent:
            def __init__(self, *a, **kw):  # pragma: no cover
                raise ModuleNotFoundError(
                    "pycocotools is absent; patch the seam in the test")

        pc_coco.COCO = _Absent
        pc_eval.COCOeval = _Absent
        pc.coco, pc.cocoeval = pc_coco, pc_eval
        sys.modules["pycocotools"] = pc
        sys.modules["pycocotools.coco"] = pc_coco
        sys.modules["pycocotools.cocoeval"] = pc_eval
    # lib.utils.paf_to_pose imports the SWIG pafprocess at module scope;
    # the loop under test only calls the patched paf_to_pose_cpp seam
    if "lib.pafprocess.pafprocess" not in sys.modules:
        sys.modules["lib.pafprocess.pafprocess"] = types.ModuleType(
            "lib.pafprocess.pafprocess")

    sys.path.insert(0, REFERENCE)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_eval", os.path.join(REFERENCE, "eval.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        from lib.utils import common as ref_common
    finally:
        sys.path.remove(REFERENCE)
    mod._ref_common = ref_common
    return mod


def _human_specs(rng, n_images=3):
    """Shared random humans: {img_id: [ {part_idx: (x, y, score)} ]} with
    normalized coords as the decoders emit, some parts missing."""
    specs = {}
    for img_id in (101, 202, 303)[:n_images]:
        humans = []
        for _ in range(int(rng.integers(1, 4))):
            parts = {}
            for i in range(18):
                if rng.random() < 0.7:
                    parts[i] = (float(rng.random()), float(rng.random()),
                                float(rng.random()))
            humans.append(parts)
        specs[img_id] = humans
    return specs


def _build_ref_humans(ref_eval, parts_list):
    out = []
    for parts in parts_list:
        h = ref_eval._ref_common.Human([])
        for i, (x, y, s) in parts.items():
            h.body_parts[i] = ref_eval._ref_common.BodyPart(
                "%d-%d" % (i, 0), i, x, y, s)
        out.append(h)
    return out


def _build_our_humans(parts_list):
    from torch_ekpose_tpu.utils.human import BodyPart, Human

    out = []
    for parts in parts_list:
        h = Human()
        for i, (x, y, s) in parts.items():
            h.body_parts[i] = BodyPart("%d-%d" % (i, 0), i, x, y, s)
        out.append(h)
    return out


def test_append_result_byte_identical(ref_eval, rng):
    from torch_ekpose_tpu.evaluate import append_result

    specs = _human_specs(rng)
    upsamples = {101: (393.75, 524.3), 202: (368.0, 368.0),
                 303: (412.0, 297.5)}
    ref_rows, our_rows = [], []
    for img_id, parts_list in specs.items():
        ref_eval.append_result(
            img_id, _build_ref_humans(ref_eval, parts_list),
            upsamples[img_id], ref_rows)
        append_result(
            img_id, _build_our_humans(parts_list),
            upsamples[img_id], our_rows)
    assert json.dumps(ref_rows) == json.dumps(our_rows)
    # sanity: rows are non-trivial
    assert sum(1 for r in ref_rows for v in r["keypoints"] if v) > 20


def test_protocol_constants_match_executed_reference(ref_eval):
    from torch_ekpose_tpu import constants
    from torch_ekpose_tpu.config import Config

    cfg = Config()
    assert list(ref_eval.ORDER_COCO) == list(constants.ORDER_COCO)
    assert ref_eval.cfg.MODEL.DOWNSAMPLE == cfg.MODEL.DOWNSAMPLE
    assert ref_eval.cfg.MODEL.NUM_KEYPOINTS == cfg.MODEL.NUM_KEYPOINTS
    assert ref_eval.cfg.TEST.THRESH_HEATMAP == cfg.TEST.THRESH_HEATMAP
    assert ref_eval.cfg.TEST.THRESH_PAF == cfg.TEST.THRESH_PAF


def test_run_eval_loop_byte_identical(ref_eval, rng, tmp_path, monkeypatch):
    """Both stacks' complete eval loops over the same 3-image set, with
    the model/decoder seams replaced by identical deterministic fakes:
    the results.json files must be byte-identical."""
    import cv2

    from torch_ekpose_tpu.config import Config
    from torch_ekpose_tpu.evaluate import evaluator as our_evaluator

    img_ids = [101, 202, 303]
    specs = _human_specs(rng)
    # per-image fake outputs with distinct map shapes and scales so the
    # upsample_keypoints formula (eval.py:166) is exercised non-trivially
    fake = {
        101: (np.zeros((46, 58, 38), np.float32),
              rng.random((46, 58, 19)).astype(np.float32), 0.6),
        202: (np.zeros((40, 40, 38), np.float32),
              rng.random((40, 40, 19)).astype(np.float32), 0.77),
        303: (np.zeros((33, 51, 38), np.float32),
              rng.random((33, 51, 19)).astype(np.float32), 1.15),
    }

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    infos = []
    for img_id in img_ids:
        name = f"{img_id:012d}.png"
        fill = img_id // 101 * 40
        cv2.imwrite(str(img_dir / name),
                    np.full((60, 80, 3), fill, np.uint8))
        infos.append({"id": img_id, "width": 80, "height": 60,
                      "file_name": name})
    anno = tmp_path / "annotations_val.json"
    anno.write_text(json.dumps({
        "images": infos,
        "annotations": [{
            "id": k, "image_id": img_id, "category_id": 1,
            "keypoints": [10.0, 10.0, 2.0] * 17, "num_keypoints": 17,
            "iscrowd": 0, "area": 100.0, "bbox": [5.0, 5.0, 10.0, 10.0],
        } for k, img_id in enumerate(img_ids, 1)],
        "categories": [{"id": 1, "name": "person"}],
    }))

    # ---- reference side: execute run_eval with its seams patched -------
    class FakeCOCO:
        def __init__(self, anno_file):
            pass

        def getCatIds(self, catNms):
            return [1]

        def getImgIds(self, catIds=None):
            return list(img_ids)

        def loadImgs(self, img_id):
            return [i for i in infos if i["id"] == img_id]

    def fake_get_outputs(oriImg, model, preprocess, device):
        img_id = img_ids[int(round(float(oriImg[0, 0, 0]) / 40.0)) - 1]
        paf, heat, scale = fake[img_id]
        return paf, heat, scale

    ref_calls = iter(img_ids)

    def fake_paf_to_pose_cpp(heatmap, paf, cfg):
        return _build_ref_humans(ref_eval, specs[next(ref_calls)])

    captured = {}

    def fake_eval_coco(outputs, annFile, imgIds, args):
        captured["json"] = json.dumps(outputs)
        return 0.0

    monkeypatch.setattr(ref_eval, "COCO", FakeCOCO)
    monkeypatch.setattr(ref_eval, "get_outputs", fake_get_outputs)
    monkeypatch.setattr(ref_eval, "paf_to_pose_cpp", fake_paf_to_pose_cpp)
    monkeypatch.setattr(ref_eval, "eval_coco", fake_eval_coco)
    monkeypatch.setattr(ref_eval, "tqdm", lambda x: x)
    args = types.SimpleNamespace(mode="val", save=0, json=True)
    ref_eval.run_eval(str(img_dir), str(anno), str(tmp_path), model=None,
                      preprocess="vgg", device=None, args=args)

    # ---- our side: execute run_eval with the same fakes ----------------
    our_calls = iter(img_ids)

    class FakeEstimator:
        config = Config()
        decode_backend = "numpy"

        def get_outputs(self, image):
            return fake_get_outputs(image, None, None, None)

    monkeypatch.setattr(
        our_evaluator, "_decode",
        lambda est, heat, paf: _build_our_humans(specs[next(our_calls)]))
    results_json = tmp_path / "results.json"
    our_evaluator.run_eval(
        str(img_dir), str(anno), FakeEstimator(), mode="val",
        results_json=str(results_json), progress=False)

    assert results_json.read_text() == captured["json"]
    assert len(json.loads(captured["json"])) == sum(
        len(v) for v in specs.values())
