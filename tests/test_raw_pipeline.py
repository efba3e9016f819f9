"""Decode-only input pipeline: CocoKeypoints(target_mode="raw") ->
raw-array cache -> BatchLoader -> make_train_step(targets="raw").

The host-side contract is minimal by design (BENCH_INPUT.json: the host
augmentation chain cannot feed a chip at 1 core); these tests pin the
raw items' geometry, the cache round-trip, and the full on-device
train step (augment + rasterize + fwd/bwd) end to end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torch_ekpose_tpu.data import (
    BatchLoader,
    CocoKeypoints,
    RawArrayDataset,
    build_raw_cache,
    cache_exists,
)
from torch_ekpose_tpu.data.synthetic_coco import write_coco_dataset



@pytest.fixture(scope="module")
def small_set(tmp_path_factory):
    root = tmp_path_factory.mktemp("rawset")
    image_dir, anno_file = write_coco_dataset(
        str(root), 6, mode="train", seed=11, max_people=3,
        sizes=[(368, 368), (496, 368), (240, 320)],
        post_resize_band=(0.4, 0.6),
    )
    return image_dir, anno_file


def test_raw_items_geometry(small_set):
    image_dir, anno_file = small_set
    ds = CocoKeypoints(
        image_dir, anno_file, target_mode="raw", raw_canvas=432,
    )
    for i in range(len(ds)):
        canvas, valid_hw, kpts = ds[i]
        assert canvas.shape == (432, 432, 3) and canvas.dtype == np.uint8
        h, w = int(valid_hw[0]), int(valid_hw[1])
        assert 0 < h <= 432 and 0 < w <= 432
        # outside the valid region the canvas is zero padding
        assert canvas[h:, :].sum() == 0 and canvas[:, w:].sum() == 0
        # labeled keypoints land inside the valid region
        vis = kpts[..., 2] > 0
        assert vis.any()
        assert (kpts[..., 0][vis] <= w - 0.5 + 1e-6).all()
        assert (kpts[..., 1][vis] <= h - 0.5 + 1e-6).all()


def test_raw_downscale_scales_keypoints(small_set):
    image_dir, anno_file = small_set
    big = CocoKeypoints(image_dir, anno_file, target_mode="raw",
                        raw_canvas=432)
    small = CocoKeypoints(image_dir, anno_file, target_mode="raw",
                          raw_canvas=216)
    c_big, v_big, k_big = big[1]     # a 496-wide image: downscaled
    c_small, v_small, k_small = small[1]
    ratio = v_small.astype(float) / v_big.astype(float)
    vis = (k_big[..., 2] > 0) & (k_small[..., 2] > 0)
    np.testing.assert_allclose(
        k_small[..., 0][vis], k_big[..., 0][vis] * ratio[1], atol=1.0
    )
    np.testing.assert_allclose(
        k_small[..., 1][vis], k_big[..., 1][vis] * ratio[0], atol=1.0
    )


def test_raw_cache_roundtrip(small_set, tmp_path):
    image_dir, anno_file = small_set
    ds = CocoKeypoints(image_dir, anno_file, target_mode="raw",
                       raw_canvas=256)
    prefix = str(tmp_path / "cache")
    assert not cache_exists(prefix)
    build_raw_cache(ds, prefix)
    assert cache_exists(prefix)
    cached = RawArrayDataset(prefix)
    assert len(cached) == len(ds)
    for i in (0, len(ds) - 1):
        a, b = ds[i], cached[i]
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
    # picklability (process-mode BatchLoader workers)
    import pickle

    clone = pickle.loads(pickle.dumps(cached))
    np.testing.assert_array_equal(clone[2][0], ds[2][0])


def test_raw_batch_loader_and_train_step(small_set, tmp_path):
    from torch_ekpose_tpu.models import get_model
    from torch_ekpose_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    image_dir, anno_file = small_set
    ds = CocoKeypoints(image_dir, anno_file, target_mode="raw",
                       raw_canvas=128)
    prefix = str(tmp_path / "cache")
    build_raw_cache(ds, prefix)
    loader = BatchLoader(
        RawArrayDataset(prefix), batch_size=2, shuffle=True,
        num_workers=0, drop_last=True,
    )

    model = get_model("vgg2016", dtype=jnp.float32)
    out_size, stride = 96, 8
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, out_size, out_size, 3)), train=False,
    )
    state = create_train_state(model, variables, make_optimizer(1e-4, 0.0))
    step = make_train_step(
        model, targets="raw", grid=(out_size // stride,) * 2
    )
    losses = []
    key = jax.random.PRNGKey(7)
    for epoch in range(2):
        for canvases, valid_hw, kpts in loader:
            key, sub = jax.random.split(key)
            state, logs = step(
                state, jnp.asarray(canvases), jnp.asarray(valid_hw),
                jnp.asarray(kpts), sub,
            )
            losses.append(float(logs["Loss"]))
    assert len(losses) == 6 and all(np.isfinite(losses))
    assert int(state.step) == 6
