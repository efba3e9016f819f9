"""Dependency-free COCO keypoint evaluator tests with analytically known
outcomes (the protocol twin of pycocotools COCOeval used at reference
eval.py:73-90)."""

import numpy as np
import pytest

from torch_ekpose_tpu.data.coco import COCO
from torch_ekpose_tpu.evaluate.cocoeval import COCOKeypointEval, compute_oks


def _make_gt(n_images=4, people_per_img=2, seed=0):
    rng = np.random.default_rng(seed)
    images, annotations = [], []
    ann_id = 1
    gt_kpts = {}
    for img_id in range(1, n_images + 1):
        images.append({
            "id": img_id, "width": 640, "height": 480,
            "file_name": f"{img_id:012d}.jpg",
        })
        for _ in range(people_per_img):
            cx, cy = rng.uniform(100, 540), rng.uniform(100, 380)
            kp = np.zeros((17, 3))
            kp[:, 0] = cx + rng.uniform(-60, 60, 17)
            kp[:, 1] = cy + rng.uniform(-90, 90, 17)
            kp[:, 2] = 2
            x0, y0 = kp[:, 0].min(), kp[:, 1].min()
            w = kp[:, 0].max() - kp[:, 0].min()
            h = kp[:, 1].max() - kp[:, 1].min()
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": 1,
                "keypoints": [float(v) for v in kp.reshape(-1)],
                "num_keypoints": 17, "iscrowd": 0,
                "area": float(w * h), "bbox": [x0, y0, w, h],
            })
            gt_kpts[ann_id] = kp
            ann_id += 1
    dataset = {
        "images": images,
        "annotations": annotations,
        "categories": [{
            "id": 1, "name": "person",
            "keypoints": ["nose"] * 17, "skeleton": [],
        }],
    }
    return dataset, gt_kpts


def _gt_coco(dataset, tmp_path):
    import json

    p = tmp_path / "ann.json"
    p.write_text(json.dumps(dataset))
    return COCO(str(p))


def _results_from_gt(dataset, jitter=0.0, seed=1):
    rng = np.random.default_rng(seed)
    results = []
    for ann in dataset["annotations"]:
        kp = np.asarray(ann["keypoints"], dtype=float).reshape(17, 3)
        kp[:, :2] += rng.normal(0, jitter, (17, 2))
        kp[:, 2] = 1
        results.append({
            "image_id": ann["image_id"], "category_id": 1,
            "keypoints": [float(v) for v in kp.reshape(-1)],
            "score": 1.0,
        })
    return results


def _run(coco_gt, results):
    ev = COCOKeypointEval(coco_gt, coco_gt.loadRes(results))
    ev.params.imgIds = coco_gt.getImgIds()
    ev.evaluate()
    ev.accumulate()
    ev.summarize(verbose=False)
    return ev.stats


def test_perfect_detections_ap1(tmp_path):
    dataset, _ = _make_gt()
    coco_gt = _gt_coco(dataset, tmp_path)
    stats = _run(coco_gt, _results_from_gt(dataset, jitter=0.0))
    assert stats[0] == pytest.approx(1.0)
    assert stats[5] == pytest.approx(1.0)  # AR


def test_no_detections_ap0(tmp_path):
    dataset, _ = _make_gt()
    coco_gt = _gt_coco(dataset, tmp_path)
    stats = _run(coco_gt, [{
        "image_id": 1, "category_id": 1,
        "keypoints": [0.0] * 51, "score": 1.0,
    }])
    assert stats[0] == pytest.approx(0.0, abs=1e-6)


def test_jitter_monotone(tmp_path):
    dataset, _ = _make_gt()
    coco_gt = _gt_coco(dataset, tmp_path)
    ap_small = _run(coco_gt, _results_from_gt(dataset, jitter=2.0))[0]
    ap_large = _run(coco_gt, _results_from_gt(dataset, jitter=9.0))[0]
    assert 0.0 < ap_large < ap_small <= 1.0


def test_missing_people_reduce_recall(tmp_path):
    dataset, _ = _make_gt(n_images=4, people_per_img=2)
    coco_gt = _gt_coco(dataset, tmp_path)
    results = _results_from_gt(dataset, jitter=0.0)
    stats = _run(coco_gt, results[::2])  # drop half of the detections
    assert stats[5] == pytest.approx(0.5, abs=0.05)


def test_unlabeled_gt_is_ignored(tmp_path):
    dataset, _ = _make_gt(n_images=2, people_per_img=1)
    # add a gt with no labeled keypoints: must not count toward recall
    dataset["annotations"].append({
        "id": 999, "image_id": 1, "category_id": 1,
        "keypoints": [0.0] * 51, "num_keypoints": 0, "iscrowd": 0,
        "area": 100.0, "bbox": [0, 0, 10, 10],
    })
    coco_gt = _gt_coco(dataset, tmp_path)
    stats = _run(coco_gt, _results_from_gt(
        {"annotations": dataset["annotations"][:2]}, jitter=0.0
    ))
    assert stats[0] == pytest.approx(1.0)


def test_oks_matrix_basics():
    gt = {
        "keypoints": [100.0, 100.0, 2] * 17,
        "bbox": [80, 80, 40, 40], "area": 1600.0,
    }
    dt_same = {"keypoints": [100.0, 100.0, 1] * 17}
    dt_far = {"keypoints": [500.0, 500.0, 1] * 17}
    ious = compute_oks([gt], [dt_same, dt_far])
    assert ious[0, 0] == pytest.approx(1.0)
    assert ious[1, 0] < 1e-4
