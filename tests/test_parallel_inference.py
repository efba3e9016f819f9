"""Mesh-sharded inference: 8-virtual-device CPU mesh parity vs the
single-device fused path (the same SPMD program runs on a real slice)."""

import numpy as np

from torch_ekpose_tpu.parallel import make_mesh
from torch_ekpose_tpu.parallel.inference import ShardedPoseEstimator


def _sig(humans):
    return sorted(
        sorted(
            (p, round(bp.x, 6), round(bp.y, 6), round(bp.score, 5))
            for p, bp in h.body_parts.items()
        )
        for h in humans
    )


def test_sharded_inference_matches_single_device(vgg_model_and_vars):
    import jax

    model, variables = vgg_model_and_vars
    mesh = make_mesh(8)
    assert mesh.size == 8

    sharded = ShardedPoseEstimator(model, variables, mesh=mesh)
    rng = np.random.default_rng(2)
    images = rng.integers(0, 255, (8, 64, 64, 3)).astype(np.uint8)
    humans_sharded = sharded.estimate_batch(images)
    assert len(humans_sharded) == 8

    # single-device reference: same program on a size-1 mesh
    single = ShardedPoseEstimator(model, variables, mesh=make_mesh(1))
    for i in range(8):
        humans_1 = single.estimate_batch(images[i : i + 1])[0]
        assert _sig(humans_sharded[i]) == _sig(humans_1)


def test_sharded_inference_rejects_indivisible_batch(vgg_model_and_vars):
    import pytest

    model, variables = vgg_model_and_vars
    sharded = ShardedPoseEstimator(model, variables, mesh=make_mesh(8))
    with pytest.raises(ValueError):
        sharded.estimate_batch(np.zeros((3, 64, 64, 3), np.uint8))


def test_sharded_eval_loop_matches_single_device(
    vgg_model_and_vars, tmp_path
):
    """The full bucketed eval loop driven by a ShardedPoseEstimator on
    the 8-virtual-device mesh (cli.eval --num-devices) produces the same
    result rows as the size-1 mesh — including the remainder bucket that
    flush() pads up to the batch size."""
    import json
    import os

    import PIL.Image

    from torch_ekpose_tpu.evaluate import run_eval

    rng = np.random.default_rng(5)
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    images, annotations = [], []
    for img_id in range(1, 7):          # 6 images, batch 4 -> remainder 2
        name = f"{img_id:012d}.png"
        arr = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
        PIL.Image.fromarray(arr).save(img_dir / name)
        images.append({
            "id": img_id, "width": 64, "height": 64, "file_name": name,
        })
        annotations.append({
            "id": img_id, "image_id": img_id, "category_id": 1,
            "keypoints": [32.0, 32.0, 2.0] * 17, "num_keypoints": 17,
            "iscrowd": 0, "area": 400.0, "bbox": [22, 22, 20, 20],
            "segmentation": [],
        })
    anno = str(tmp_path / "annotations_val.json")
    with open(anno, "w") as f:
        json.dump({
            "images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "person"}],
        }, f)

    model, variables = vgg_model_and_vars
    rows = {}
    for n in (8, 1):
        est = ShardedPoseEstimator(
            model, variables, mesh=make_mesh(n), dest_size=64
        )
        results = str(tmp_path / f"results_{n}.json")
        # different batch sizes on purpose: identical rows must come out
        # of differently-shaped bucket flushes (incl. remainder padding)
        run_eval(
            str(img_dir), anno, est, mode="val", progress=False,
            batch_size=8 if n == 8 else 4,
            results_json=results,
        )
        rows[n] = json.load(open(results))

    def canon(rs):
        return sorted(
            (r["image_id"], [round(v, 4) for v in r["keypoints"]],
             round(r["score"], 5))
            for r in rs
        )

    assert canon(rows[8]) == canon(rows[1])
