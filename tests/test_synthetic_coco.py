"""Renderable synthetic COCO dataset generator (data.synthetic_coco):
well-formed COCO JSON, keypoint-order round trips, and loadability by
both the eval COCO index and the training dataset."""

import json

import numpy as np
import pytest

from torch_ekpose_tpu import constants
from torch_ekpose_tpu.data import synthetic_coco as sc
from torch_ekpose_tpu.data.coco import COCO


def test_render_scene_deterministic_and_shaped():
    a_img, a_kp = sc.render_scene(np.random.default_rng(3), 2, 128, 160)
    b_img, b_kp = sc.render_scene(np.random.default_rng(3), 2, 128, 160)
    assert a_img.shape == (128, 160, 3) and a_img.dtype == np.uint8
    assert a_kp.shape == (2, 18, 3)
    np.testing.assert_array_equal(a_img, b_img)
    np.testing.assert_array_equal(a_kp, b_kp)
    # keypoints inside the canvas, all visible
    assert (a_kp[..., 0] >= 0).all() and (a_kp[..., 0] < 160).all()
    assert (a_kp[..., 1] >= 0).all() and (a_kp[..., 1] < 128).all()
    assert (a_kp[..., 2] == 2).all()


def test_joints_are_drawn_at_keypoints():
    """The rendered joint disks carry their class color at the keypoint."""
    img, kpts = sc.render_scene(
        np.random.default_rng(5), 1, 256, 256, noise=0.0
    )
    # wrists/ankles sit at limb endpoints, drawn last -> unoccluded
    for j in (4, 7, 10, 13):
        x, y = np.round(kpts[0, j, :2]).astype(int)
        assert tuple(img[y, x]) == sc._joint_color(j), f"part {j}"


def test_coco_annotations_roundtrip(tmp_path):
    image_dir, anno_file = sc.write_coco_dataset(
        str(tmp_path), 4, h=192, w=192, mode="val", seed=11, max_people=2
    )
    with open(anno_file) as f:
        anno = json.load(f)
    assert len(anno["images"]) == 4
    assert anno["categories"][0]["keypoints"] == list(
        constants.COCO_KEYPOINTS
    )
    for ann in anno["annotations"]:
        assert len(ann["keypoints"]) == 51
        assert ann["num_keypoints"] == 17
        assert ann["area"] > 0
        x0, y0, bw, bh = ann["bbox"]
        kp = np.asarray(ann["keypoints"]).reshape(17, 3)
        assert (kp[:, 0] >= x0).all() and (kp[:, 0] <= x0 + bw).all()
        assert (kp[:, 1] >= y0).all() and (kp[:, 1] <= y0 + bh).all()

    coco = COCO(anno_file)
    ids = coco.getImgIds(catIds=coco.getCatIds(catNms=["person"]))
    assert len(ids) == 4
    # the 17-kp COCO rows convert back to internal order with a synthetic
    # neck at the shoulder midpoint (the dataset loader's path)
    ann = anno["annotations"][0]
    internal = constants.coco_to_internal_keypoints(
        np.asarray(ann["keypoints"], dtype=np.float64).reshape(17, 3)
    )
    assert internal.shape == (18, 3)
    l_sh, r_sh, neck = internal[5], internal[2], internal[1]
    np.testing.assert_array_equal(
        neck[:2], np.round((l_sh[:2] + r_sh[:2]) / 2.0)
    )


def test_dataset_loader_consumes_generated_set(tmp_path):
    """CocoKeypoints trains directly off a generated directory."""
    image_dir, anno_file = sc.write_coco_dataset(
        str(tmp_path), 3, h=128, w=128, mode="train", seed=2, max_people=2
    )
    from torch_ekpose_tpu.data import CocoKeypoints

    ds = CocoKeypoints(image_dir, anno_file, input_size=128)
    assert len(ds) == 3
    image, heat, paf = ds[0]
    assert image.shape == (128, 128, 3)
    assert heat.shape == (16, 16, 19) and paf.shape == (16, 16, 38)
    # every rendered person is fully visible, so the nose channel fires
    assert heat[:, :, 0].max() > 0.5


def test_internal_to_coco_order():
    """ORDER_COCO remap: internal nose (0) stays row 0; internal left eye
    (15) becomes COCO row 1 (reference eval.py:35)."""
    internal = np.arange(18 * 3, dtype=np.float64).reshape(18, 3)
    coco = constants.internal_to_coco_keypoints(internal)
    np.testing.assert_array_equal(coco[0], internal[0])
    np.testing.assert_array_equal(coco[1], internal[15])
    np.testing.assert_array_equal(coco[5], internal[5])


def test_render_scene_photo_statistics_options():
    """Round-5 renderer options (textured background, occlusion
    clustering, border truncation, scale-aware strokes): correct vis
    semantics, and the DEFAULT path stays byte-identical (same rng
    stream) so the committed parity artifacts remain reproducible."""
    from torch_ekpose_tpu.data import synthetic_coco as sc

    # default path unchanged: vis=2 everywhere, deterministic
    a = sc.render_scene(np.random.default_rng(3), 2, 160, 160)
    b = sc.render_scene(np.random.default_rng(3), 2, 160, 160)
    np.testing.assert_array_equal(a[0], b[0])
    assert set(a[1][:, :, 2].ravel()) == {2.0}

    # truncation: out-of-frame joints are v=0 with zeroed coords; the
    # torso stays inside so every person keeps labeled joints
    img, kp = sc.render_scene(
        np.random.default_rng(11), 4, 200, 420,
        scale_range=(0.5, 0.7), truncate=True, background="textured",
    )
    assert img.shape == (200, 420, 3) and img.dtype == np.uint8
    v0 = kp[:, :, 2] == 0
    assert np.all(kp[v0] == 0.0)
    for person in kp:
        assert (person[:, 2] > 0).sum() >= 5  # torso-inside guarantee
        lab = person[person[:, 2] > 0]
        assert lab[:, 0].max() < 420 and lab[:, 1].max() < 200

    # occlusion: overlapping bodies produce v=1 flags on overdrawn joints
    found_v1 = False
    for seed in range(20, 26):
        _, kp = sc.render_scene(
            np.random.default_rng(seed), 6, 368, 368,
            scale_range=(0.35, 0.5), occlusion=True,
        )
        if (kp[:, :, 2] == 1).any():
            found_v1 = True
            break
    assert found_v1, "occlusion clustering never produced a v=1 joint"

    # scale_strokes keeps sub-40px people renderable: their joint colors
    # survive at the joint pixel (a full-width stroke blob would overdraw)
    img, kp = sc.render_scene(
        np.random.default_rng(31), 1, 368, 368,
        scale_range=(0.15, 0.15), scale_strokes=True,
    )
    person = kp[0]
    hits = 0
    for j in range(18):
        x, y = int(round(person[j, 0])), int(round(person[j, 1]))
        if tuple(int(c) for c in img[y, x]) == sc._joint_color(j):
            hits += 1
    assert hits >= 10, f"only {hits}/18 joints survive at small scale"


def test_truncated_annotations_bbox_ignores_unlabeled():
    """COCO rows for truncated people: bbox/area span labeled joints only
    (v=0 joints sit at (0,0) and must not drag the box to the origin)."""
    from torch_ekpose_tpu.data import synthetic_coco as sc

    person = np.zeros((18, 3))
    person[:, 0] = np.linspace(100, 140, 18)
    person[:, 1] = np.linspace(50, 150, 18)
    person[:, 2] = 2
    person[0] = 0.0   # nose truncated out of frame
    ann = sc._coco_annotation(1, 1, person)
    x, y, w, h = ann["bbox"]
    assert x > 50 and y > 20, "bbox was dragged toward the (0,0) corner"
    assert ann["num_keypoints"] == 16  # 17 COCO joints minus the nose
