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
