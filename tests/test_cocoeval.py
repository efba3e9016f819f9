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


def _person_ann(ann_id, img_id, cx, cy, spread=40.0, **over):
    """A fully-labeled 17-keypoint person on a deterministic grid."""
    kp = np.zeros((17, 3))
    kp[:, 0] = cx + np.linspace(-spread, spread, 17)
    kp[:, 1] = cy + np.linspace(-spread, spread, 17)[::-1]
    kp[:, 2] = 2
    w = kp[:, 0].max() - kp[:, 0].min()
    h = kp[:, 1].max() - kp[:, 1].min()
    ann = {
        "id": ann_id, "image_id": img_id, "category_id": 1,
        "keypoints": [float(v) for v in kp.reshape(-1)],
        "num_keypoints": 17, "iscrowd": 0, "area": float(w * h),
        "bbox": [float(kp[:, 0].min()), float(kp[:, 1].min()),
                 float(w), float(h)],
    }
    ann.update(over)
    return ann


def _det_from(ann, score):
    kp = np.asarray(ann["keypoints"], dtype=float).reshape(17, 3)
    kp[:, 2] = 1
    return {
        "image_id": ann["image_id"], "category_id": 1,
        "keypoints": [float(v) for v in kp.reshape(-1)],
        "score": float(score),
    }


def _dataset(images, annotations):
    return {
        "images": [
            {"id": i, "width": 2000, "height": 2000,
             "file_name": f"{i:012d}.jpg"}
            for i in images
        ],
        "annotations": annotations,
        "categories": [{
            "id": 1, "name": "person",
            "keypoints": ["nose"] * 17, "skeleton": [],
        }],
    }


def _run_ids(coco_gt, results, img_ids):
    ev = COCOKeypointEval(coco_gt, coco_gt.loadRes(results))
    ev.params.imgIds = img_ids
    ev.evaluate()
    ev.accumulate()
    ev.summarize(verbose=False)
    return ev.stats


def test_iscrowd_multi_match_never_counts_against_precision(tmp_path):
    """pycocotools protocol: an iscrowd=1 gt may be matched by ANY number
    of detections (gtm is not consumed for crowds), and every detection
    so matched is ignored — neither TP nor FP. Paper expectation: 1 real
    TP, 2 crowd-absorbed detections => AP = AR = 1.0 exactly; without
    crowd semantics the two extras would be FPs at ranks 2-3 and AP < 1."""
    real = _person_ann(1, 1, 200, 200)
    crowd = _person_ann(2, 1, 900, 900, iscrowd=1)
    coco_gt = _gt_coco(_dataset([1], [real, crowd]), tmp_path)
    results = [
        _det_from(real, 0.9),
        _det_from(crowd, 0.8),   # both match the same crowd gt
        _det_from(crowd, 0.7),
    ]
    stats = _run_ids(coco_gt, results, [1])
    assert stats[0] == pytest.approx(1.0)
    assert stats[5] == pytest.approx(1.0)


def test_zero_keypoint_gt_box_fallback_oks():
    """k1 == 0: OKS distances fall back to the clamped distance outside
    the gt box inflated 2x about itself (x in [x0-w, x0+2w]); inside the
    inflated box every term is exp(0) = 1. Outside, each keypoint term is
    exp(-d^2 / (2 * area * (2*sigma_i)^2)) — computed here on paper from
    the published COCO sigmas."""
    gt = {
        "keypoints": [0.0] * 51, "num_keypoints": 0,
        "bbox": [100.0, 100.0, 40.0, 40.0], "area": 1600.0,
    }
    inside = {"keypoints": [120.0, 120.0, 1.0] * 17}
    # 20 px right of the inflated box's x1 = 100 + 2*40 = 180; y inside
    outside = {"keypoints": [200.0, 120.0, 1.0] * 17}
    ious = compute_oks([gt], [inside, outside])  # [n_dt, n_gt]
    assert ious[0, 0] == pytest.approx(1.0)
    sigmas = [0.026, 0.025, 0.025, 0.035, 0.035, 0.079, 0.079, 0.072,
              0.072, 0.062, 0.062, 0.107, 0.107, 0.087, 0.087, 0.089,
              0.089]
    expected = np.mean([
        np.exp(-(20.0 ** 2) / ((2 * s) ** 2 * (1600.0 + np.spacing(1)) * 2))
        for s in sigmas
    ])
    assert ious[1, 0] == pytest.approx(float(expected), rel=1e-9)


def test_zero_keypoint_crowd_region_absorbs_inside_dets_only(tmp_path):
    """End-to-end consequence of the box fallback: a detection inside a
    zero-keypoint crowd region is absorbed (ignored); a detection outside
    it is a plain FP. Paper expectation: absorbed => AP 1.0 from the one
    real TP; FP outranking the TP => precision curve [0, 1/2] whose
    envelope is flat 0.5 => AP 0.5."""
    region = {
        "id": 1, "image_id": 1, "category_id": 1,
        "keypoints": [0.0] * 51, "num_keypoints": 0, "iscrowd": 1,
        "area": 1600.0, "bbox": [100.0, 100.0, 40.0, 40.0],
    }
    real = _person_ann(2, 2, 300, 300)
    coco_gt = _gt_coco(_dataset([1, 2], [region, real]), tmp_path)

    def at(x, y, score):
        kp = np.zeros((17, 3))
        kp[:, 0] = x + np.linspace(0, 30, 17)
        kp[:, 1] = y + np.linspace(0, 30, 17)
        kp[:, 2] = 1
        return {"image_id": 1, "category_id": 1,
                "keypoints": [float(v) for v in kp.reshape(-1)],
                "score": score}

    tp = _det_from(real, 0.8)
    absorbed = _run_ids(coco_gt, [at(110, 110, 0.9), tp], [1, 2])
    fp = _run_ids(coco_gt, [at(1500, 1500, 0.9), tp], [1, 2])
    assert absorbed[0] == pytest.approx(1.0)
    assert fp[0] == pytest.approx(0.5)


def test_max_dets_truncation_drops_rank_21(tmp_path):
    """Detections are truncated to the 20 highest-scored BEFORE matching.
    24 junk detections outrank the only correct one => it is cut and
    recall is exactly 0; flip the scores so the correct one ranks first
    and AP/AR are exactly 1 (the 19 surviving junk FPs sit below the TP,
    so the interpolated precision envelope at every recall level is 1)."""
    real = _person_ann(1, 1, 200, 200)
    coco_gt = _gt_coco(_dataset([1], [real]), tmp_path)

    def junk(score):
        kp = np.zeros((17, 3))
        kp[:, 0] = 1500 + np.linspace(0, 50, 17)
        kp[:, 1] = 1500 + np.linspace(0, 50, 17)
        kp[:, 2] = 1
        return {"image_id": 1, "category_id": 1,
                "keypoints": [float(v) for v in kp.reshape(-1)],
                "score": score}

    junks = [junk(0.99 - 0.01 * i) for i in range(24)]
    cut = _run_ids(coco_gt, junks + [_det_from(real, 0.5)], [1])
    assert cut[0] == pytest.approx(0.0, abs=1e-9)
    assert cut[5] == pytest.approx(0.0, abs=1e-9)
    kept = _run_ids(coco_gt, junks + [_det_from(real, 1.0)], [1])
    assert kept[0] == pytest.approx(1.0)
    assert kept[5] == pytest.approx(1.0)


def test_score_tie_order_is_image_order_stable(tmp_path):
    """Equal-score detections sort by the stable mergesort pycocotools
    uses, i.e. concatenation order = params.imgIds order. A TP and an FP
    with identical scores therefore swap ranks when the image order
    swaps. Paper expectation: TP first => AP 1.0; FP first => precision
    [0, 1/2], envelope 0.5 everywhere => AP 0.5."""
    real = _person_ann(1, 1, 200, 200)
    coco_gt = _gt_coco(_dataset([1, 2], [real]), tmp_path)
    fp_det = dict(_det_from(real, 0.5), image_id=2)
    results = [_det_from(real, 0.5), fp_det]
    assert _run_ids(coco_gt, results, [1, 2])[0] == pytest.approx(1.0)
    assert _run_ids(coco_gt, results, [2, 1])[0] == pytest.approx(0.5)


def test_area_range_boundaries_are_inclusive(tmp_path):
    """pycocotools keeps a gt when aRng[0] <= area <= aRng[1]: a person
    with area exactly 96^2 belongs to BOTH medium and large; exactly 32^2
    is medium; 32^2 - 1 is out of medium entirely, leaving that range
    with no gt and no counted detection => sentinel -1."""
    def with_area(area, img_id, ann_id):
        return _person_ann(ann_id, img_id, 500, 500, area=float(area))

    for area, ap_medium, ap_large in [
        (96 ** 2, 1.0, 1.0),
        (32 ** 2, 1.0, -1.0),
        (32 ** 2 - 1, -1.0, -1.0),
    ]:
        gt = with_area(area, 1, 1)
        coco_gt = _gt_coco(_dataset([1], [gt]), tmp_path)
        stats = _run_ids(coco_gt, [_det_from(gt, 0.9)], [1])
        assert stats[3] == pytest.approx(ap_medium), area
        assert stats[4] == pytest.approx(ap_large), area


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


def test_crowd_maxdets_area_boundary_combined_one_image(tmp_path):
    """All three protocol mechanisms interact in ONE image: an iscrowd
    region absorbing 18 detections, maxDets=20 truncation cutting a
    rank-21 junk det, and a gt sitting exactly on the medium area
    boundary (32^2, inclusive) while the lone FP's keypoint-extent area
    is large-only. Paper expectations:
    - "all": kept dets sort to [18 crowd-absorbed (ignored), FP, TP];
      precision after the TP is 1/2, the right-to-left envelope makes
      every interpolation point 0.5 => AP(all) = 0.5, AR(all) = 1.0;
    - "medium": the FP's area (150x100) is outside medium and it is
      unmatched => ignored; only the TP counts => AP(medium) = 1.0;
    - "large": no counted gts => sentinel -1."""
    gt1 = _person_ann(1, 1, 100, 300, spread=16.0, area=float(32 ** 2))
    crowd = {
        "id": 2, "image_id": 1, "category_id": 1,
        "keypoints": [0.0] * 51, "num_keypoints": 0, "iscrowd": 1,
        "area": 3600.0, "bbox": [400.0, 50.0, 60.0, 60.0],
    }
    coco_gt = _gt_coco(_dataset([1], [gt1, crowd]), tmp_path)

    def in_crowd(score, k):
        kp = np.zeros((17, 3))
        kp[:, 0] = 405 + 3 * k + np.linspace(0, 20, 17)
        kp[:, 1] = 55 + np.linspace(0, 20, 17)
        kp[:, 2] = 1
        return {"image_id": 1, "category_id": 1,
                "keypoints": [float(v) for v in kp.reshape(-1)],
                "score": score}

    def far_fp(score):
        # keypoint extent 150x100 = 15000 > 96^2: large-only det area
        kp = np.zeros((17, 3))
        kp[:, 0] = 200 + np.linspace(0, 150, 17)
        kp[:, 1] = 380 + np.linspace(0, 100, 17)
        kp[:, 2] = 1
        return {"image_id": 1, "category_id": 1,
                "keypoints": [float(v) for v in kp.reshape(-1)],
                "score": score}

    def tiny_junk(score):
        kp = np.zeros((17, 3))
        kp[:, 0] = 580.0 + np.linspace(0, 2, 17)
        kp[:, 1] = 450.0 + np.linspace(0, 2, 17)
        kp[:, 2] = 1
        return {"image_id": 1, "category_id": 1,
                "keypoints": [float(v) for v in kp.reshape(-1)],
                "score": score}

    results = (
        [in_crowd(0.7, k) for k in range(18)]
        + [far_fp(0.65), _det_from(gt1, 0.6), tiny_junk(0.05)]
    )
    stats = _run_ids(coco_gt, results, [1])
    assert stats[0] == pytest.approx(0.5)    # AP all
    assert stats[5] == pytest.approx(1.0)    # AR all
    assert stats[3] == pytest.approx(1.0)    # AP medium
    assert stats[4] == pytest.approx(-1.0)   # AP large: no gts counted


def test_all_tied_scores_maxdets_stable_truncation(tmp_path):
    """maxDets truncation under a FULL score tie is decided by mergesort
    stability: 25 dets all scored 0.5 (5 junk listed first, then 20
    perfect matches of 20 gts) keep the FIRST 20 in list order => 5 junk
    FPs + 15 TPs, recall 15/20. Paper AP: precision after the k-th TP is
    k/(5+k), increasing, so the envelope is flat at 15/20 = 0.75 up to
    recall 0.75 and 0 beyond => AP = 0.75 * 76/101 (76 of the 101
    interpolation points lie at recall <= 0.75)."""
    gts = []
    for k in range(20):
        cx = 100 + (k % 5) * 120
        cy = 80 + (k // 5) * 110
        gts.append(_person_ann(k + 1, 1, cx, cy, spread=15.0))
    coco_gt = _gt_coco(_dataset([1], gts), tmp_path)

    def junk(k):
        kp = np.zeros((17, 3))
        kp[:, 0] = 1200 + 40 * k + np.linspace(0, 10, 17)
        kp[:, 1] = 1200 + np.linspace(0, 10, 17)
        kp[:, 2] = 1
        return {"image_id": 1, "category_id": 1,
                "keypoints": [float(v) for v in kp.reshape(-1)],
                "score": 0.5}

    results = [junk(k) for k in range(5)] + [
        _det_from(g, 0.5) for g in gts
    ]
    stats = _run_ids(coco_gt, results, [1])
    assert stats[0] == pytest.approx(0.75 * 76 / 101)
    assert stats[5] == pytest.approx(0.75)


def test_nonignored_match_blocks_higher_oks_crowd_steal(tmp_path):
    """pycocotools' matching loop stops considering ignored gts once the
    detection already holds a non-ignored match (the dtIg 'break' rule):
    a det with OKS ~0.57 against a real gt AND OKS 1.0 against a crowd
    region covering it must match the REAL gt at thresholds <= its OKS
    (TP), and fall through to the crowd (ignored) above them. Paper
    expectation with OKS in (0.55, 0.60): TP at thresholds {0.50, 0.55},
    ignored at the other 8 => AP = AR = 2/10 exactly; a best-OKS-first
    matcher would score 0.0."""
    gt1 = _person_ann(1, 1, 450.0, 450.0, spread=50.0, area=10000.0)
    crowd = {
        "id": 2, "image_id": 1, "category_id": 1,
        "keypoints": [0.0] * 51, "num_keypoints": 0, "iscrowd": 1,
        "area": 810000.0, "bbox": [0.0, 0.0, 900.0, 900.0],
    }
    coco_gt = _gt_coco(_dataset([1], [gt1, crowd]), tmp_path)

    # pick the uniform offset whose OKS lands inside (0.555, 0.595):
    # computed, not guessed, so the expectation below is airtight
    det = None
    for d in np.linspace(5.0, 60.0, 400):
        kp = np.asarray(gt1["keypoints"], dtype=float).reshape(17, 3)
        kp[:, 0] += d
        kp[:, 2] = 1
        cand = {"image_id": 1, "category_id": 1,
                "keypoints": [float(v) for v in kp.reshape(-1)],
                "score": 0.9}
        oks = compute_oks([gt1], [cand])[0, 0]
        if 0.555 < oks < 0.595:
            det = cand
            break
    assert det is not None
    stats = _run_ids(coco_gt, [det], [1])
    assert stats[0] == pytest.approx(0.2)
    assert stats[5] == pytest.approx(0.2)
