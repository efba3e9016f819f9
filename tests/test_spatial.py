"""Spatially-sharded (sp) single-image inference
(parallel/spatial.py): GSPMD partitions the convs over the image
height with halo exchanges; results must match the single-device
forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torch_ekpose_tpu.parallel import SpatialPoseEstimator, make_mesh


def test_spatial_forward_matches_single_device(vgg_model_and_vars):
    """The height-sharded forward on the 8-virtual-device mesh produces
    the same stage-6 maps as the unsharded forward — GSPMD's halo
    exchange must be exact, not approximate."""
    model, variables = vgg_model_and_vars
    img = np.random.default_rng(0).integers(
        0, 255, (128, 64, 3)
    ).astype(np.uint8)

    sp = SpatialPoseEstimator(
        model, variables, mesh=make_mesh(8), dest_size=128
    )
    im_pad, _ = sp.pad(img)
    assert im_pad.shape[0] % (8 * 8) == 0
    fwd = sp._forward_fn(*im_pad.shape[:2])
    x = jax.device_put(jnp.asarray(im_pad)[None], sp._spatial)
    paf_sp, ht_sp = fwd(sp.variables, x)

    single = SpatialPoseEstimator(
        model, variables, mesh=make_mesh(1), dest_size=128
    )
    fwd1 = single._forward_fn(*im_pad.shape[:2])
    x1 = jax.device_put(jnp.asarray(im_pad)[None], single._spatial)
    paf_1, ht_1 = fwd1(single.variables, x1)

    np.testing.assert_allclose(
        np.asarray(paf_sp), np.asarray(paf_1), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ht_sp), np.asarray(ht_1), rtol=1e-5, atol=1e-5
    )


def test_spatial_estimate_end_to_end(vgg_model_and_vars):
    """estimate() runs the full pad -> sp forward -> first-device
    decode chain on the 8-device mesh; the decode consumes the SAME
    maps test_spatial_forward_matches_single_device pins to the
    unsharded forward, so this certifies the wiring (device_put of the
    replicated maps onto the first chip, packed fetch, Human
    conversion)."""
    model, variables = vgg_model_and_vars
    # 2:1 aspect at dest 128 pads to 128x64 for BOTH factor 8 and
    # factor 64, so mesh sizes see byte-identical inputs
    img = np.random.default_rng(1).integers(
        0, 255, (128, 64, 3)
    ).astype(np.uint8)

    est = SpatialPoseEstimator(
        model, variables, mesh=make_mesh(8), dest_size=128
    )
    assert est.pad(img)[0].shape == (128, 64, 3)
    humans, im_scale = est.estimate(img)
    assert isinstance(humans, list)
    assert im_scale == 1.0
    for h in humans:
        for p in h.body_parts.values():
            assert 0.0 <= p.x <= 1.0 and 0.0 <= p.y <= 1.0
