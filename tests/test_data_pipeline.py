"""Transforms + dataset + loader tests (reference lib/datasets/transforms.py
and datasets.py semantics)."""

import json

import numpy as np
import PIL.Image
import pytest

from torch_ekpose_tpu import constants
from torch_ekpose_tpu.data import transforms as T
from torch_ekpose_tpu.data.dataset import BatchLoader, CocoKeypoints


def _image(w=200, h=150):
    arr = np.zeros((h, w, 3), dtype=np.uint8)
    arr[:, :, 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
    return PIL.Image.fromarray(arr)


def _ann(xys, w=200, h=150):
    kp = np.zeros((17, 3), dtype=np.float32)
    for i, (x, y) in enumerate(xys[:17]):
        kp[i] = (x, y, 2)
    return {
        "keypoints": kp.reshape(-1).tolist(),
        "bbox": [10.0, 10.0, 50.0, 60.0],
        "segmentation": [],
    }


def test_normalize_initializes_meta():
    img = _image()
    image, anns, meta = T.Normalize()(img, [_ann([(20, 30)])], None)
    assert meta["hflip"] is False
    assert tuple(meta["width_height"]) == (200, 150)
    assert anns[0]["keypoints"].shape == (17, 3)
    assert "segmentation" not in anns[0]


def test_hflip_swaps_and_mirrors():
    img = _image()
    _, anns, meta = T.Normalize()(img, [_ann([(20, 30), (40, 50)])], None)
    _, anns2, meta2 = T.HFlip()(img, anns, meta)
    # nose (idx 0) mirrors in place
    assert anns2[0]["keypoints"][0, 0] == pytest.approx(-20 - 1 + 200)
    # left_eye (idx 1) data lands at right_eye (idx 2)
    assert anns2[0]["keypoints"][2, 0] == pytest.approx(-40 - 1 + 200)
    assert anns2[0]["keypoints"][2, 1] == pytest.approx(50)
    assert meta2["hflip"] is True


def test_rescale_relative_scales_keypoints():
    rng = np.random.default_rng(0)
    img = _image()
    _, anns, meta = T.Normalize()(img, [_ann([(20, 30)])], None)
    img2, anns2, meta2 = T.RescaleRelative((0.5, 0.5))(img, anns, meta, rng)
    assert img2.size == (100, 75)
    assert anns2[0]["keypoints"][0, 0] == pytest.approx((20 + 0.5) * 0.5 - 0.5)
    assert meta2["scale"][0] == pytest.approx(0.5)


def test_center_pad_fill_and_offsets():
    img = _image(100, 80)
    _, anns, meta = T.Normalize()(img, [_ann([(20, 30)])], None)
    img2, anns2, meta2 = T.CenterPad(120)(img, anns, meta)
    assert img2.size == (120, 120)
    left, top = (120 - 100) // 2, (120 - 80) // 2
    assert anns2[0]["keypoints"][0, 0] == pytest.approx(20 + left)
    assert anns2[0]["keypoints"][0, 1] == pytest.approx(30 + top)
    assert img2.getpixel((0, 0)) == constants.PAD_FILL_RGB


def test_keypoint_sets_inverse_round_trip():
    rng = np.random.default_rng(3)
    img = _image(300, 220)
    pts = [(50, 60), (120, 100), (200, 180)]
    pipeline = T.Compose([
        T.Normalize(), T.RescaleRelative((0.5, 1.0)), T.CenterPad(368),
    ])
    _, anns, meta = pipeline(img, [_ann(pts, 300, 220)], None, rng)
    kps = anns[0]["keypoints"][None]
    back = T.Preprocess.keypoint_sets_inverse(kps, meta)
    for i, (x, y) in enumerate(pts):
        np.testing.assert_allclose(back[0, i, :2], [x, y], atol=1e-3)


def test_keypoint_sets_inverse_hflip_round_trip():
    rng = np.random.default_rng(4)
    img = _image(300, 220)
    pts = [(50, 60), (120, 100)]
    pipeline = T.Compose([T.Normalize(), T.HFlip(), T.CenterPad(368)])
    _, anns, meta = pipeline(img, [_ann(pts, 300, 220)], None, rng)
    back = T.Preprocess.keypoint_sets_inverse(
        anns[0]["keypoints"][None], meta
    )
    for i, (x, y) in enumerate(pts):
        np.testing.assert_allclose(back[0, i, :2], [x, y], atol=1e-3)


def test_mask_valid_area():
    img = np.ones((50, 60, 3), dtype=np.float32)
    T.mask_valid_area(img, (10, 5, 30, 20))
    assert np.all(img[:5] == 0) and np.all(img[:, :10] == 0)
    assert np.all(img[25:] == 0) and np.all(img[:, 40:] == 0)
    assert np.all(img[5:25, 10:40] == 1)


def test_random_rotate_keeps_all_keypoints():
    rng = np.random.default_rng(0)
    img = _image(100, 100)
    pts = [(50, 50)] + [(30 + i, 40 + i) for i in range(16)]
    _, anns, meta = T.Normalize()(img, [_ann(pts, 100, 100)], None)
    img2, anns2, _ = T.RandomRotate(30)(img, anns, meta, rng)
    # the center point stays near the (expanded) canvas center
    cx, cy = img2.size[0] / 2, img2.size[1] / 2
    np.testing.assert_allclose(
        anns2[0]["keypoints"][0, :2], [cx, cy], atol=2.0
    )


# ---------------------------------------------------------------------------
# dataset + loader
# ---------------------------------------------------------------------------

@pytest.fixture
def tiny_coco(tmp_path):
    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, 7):
        name = f"{img_id:012d}.jpg"
        PIL.Image.fromarray(
            rng.integers(0, 255, (240, 320, 3), dtype=np.uint8)
        ).save(img_dir / name)
        images.append({
            "id": img_id, "width": 320, "height": 240, "file_name": name,
        })
        kp = np.zeros((17, 3))
        kp[:, 0] = rng.uniform(40, 280, 17)
        kp[:, 1] = rng.uniform(40, 200, 17)
        kp[:, 2] = 2
        annotations.append({
            "id": ann_id, "image_id": img_id, "category_id": 1,
            "keypoints": [float(v) for v in kp.reshape(-1)],
            "num_keypoints": 17, "iscrowd": 0, "area": 100.0,
            "bbox": [40, 40, 100, 100], "segmentation": [],
        })
        ann_id += 1
    anno = tmp_path / "ann.json"
    anno.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": 1, "name": "person"}],
    }))
    return str(img_dir), str(anno)


def test_dataset_host_targets(tiny_coco):
    img_dir, anno = tiny_coco
    ds = CocoKeypoints(
        img_dir, anno, preprocess=T.TRAIN_PREPROCESS(368),
        image_transform=T.image_transform_train, target_mode="host",
    )
    assert len(ds) == 6
    image, heat, pafs = ds[0]
    assert image.shape == (368, 368, 3)
    assert heat.shape == (46, 46, 19)
    assert pafs.shape == (46, 46, 38)
    # deterministic per (seed, index)
    image2, heat2, _ = ds[0]
    np.testing.assert_array_equal(image, image2)
    np.testing.assert_array_equal(heat, heat2)


def test_dataset_device_targets(tiny_coco):
    img_dir, anno = tiny_coco
    ds = CocoKeypoints(
        img_dir, anno, preprocess=T.TRAIN_PREPROCESS(368),
        target_mode="device", max_people=8,
    )
    image, kpts = ds[0]
    assert image.shape == (368, 368, 3)
    assert kpts.shape == (8, 18, 3)
    # visible keypoints stay inside the crop
    vis = kpts[kpts[:, :, 2] > 0]
    assert np.all(vis[:, 0] >= 0) and np.all(vis[:, 0] < 368)


def test_batch_loader_orders_and_stacks(tiny_coco):
    img_dir, anno = tiny_coco
    ds = CocoKeypoints(
        img_dir, anno, preprocess=T.TRAIN_PREPROCESS(128),
        target_mode="device", max_people=4, input_size=128,
    )
    loader = BatchLoader(ds, batch_size=2, num_workers=3, seed=1)
    batches = list(loader)
    assert len(batches) == 3
    for images, kpts in batches:
        assert images.shape == (2, 128, 128, 3)
        assert kpts.shape == (2, 4, 18, 3)
    # same epoch sequence is reproducible with a fresh loader
    loader2 = BatchLoader(ds, batch_size=2, num_workers=1, seed=1)
    batches2 = list(loader2)
    np.testing.assert_array_equal(batches[0][0], batches2[0][0])


def test_loader_surfaces_worker_errors():
    """A raising dataset must fail the consumer, not hang it."""
    from torch_ekpose_tpu.data.dataset import BatchLoader

    class Bad:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise OSError("truncated image")
            return (np.zeros((4, 4, 3), np.float32),)

    loader = BatchLoader(Bad(), batch_size=2, shuffle=False, num_workers=2)
    with pytest.raises(RuntimeError, match="loader worker failed"):
        for _ in loader:
            pass


def test_random_rotate_image_keypoint_alignment():
    """A bright marker drawn at a keypoint must still be under the
    keypoint after rotation (a direction mismatch once put them ~60px
    apart at 30 degrees)."""
    import PIL.Image

    img = np.zeros((200, 300, 3), np.uint8)
    kx, ky = 220, 60
    img[ky - 3:ky + 4, kx - 3:kx + 4] = 255
    anns = [{
        "keypoints": np.array([[kx, ky, 2.0]]),
        "bbox": np.array([0, 0, 10, 10.0]),
        "valid_area": np.array([0, 0, 300, 200.0]), "iscrowd": 0,
    }]
    meta = {
        "valid_area": np.array([0, 0, 300, 200.0]),
        "offset": np.zeros(2), "scale": np.ones(2),
        "rotation": {"angle": 0.0, "width": 300, "height": 200},
        "hflip": False, "width_height": np.array([300, 200]),
    }

    class FixedRng:
        def random(self):
            return 0.875  # -> +30 degrees at max_rotate_degree=40

    out_img, out_anns, _ = T.RandomRotate(40.0)(
        PIL.Image.fromarray(img), anns, meta, rng=FixedRng()
    )
    arr = np.asarray(out_img)
    bright = np.argwhere(arr[:, :, 0] > 200)
    cy, cx = bright.mean(axis=0)
    kx2, ky2 = out_anns[0]["keypoints"][0, :2]
    assert np.hypot(cx - kx2, cy - ky2) < 3.0


def test_process_loader_matches_thread_loader(tiny_coco):
    """mode='process' (spawned workers) must produce byte-identical
    batches to mode='thread' — the per-item pipeline is deterministic
    given (seed, index), and the seed rides along with each task."""
    img_dir, anno = tiny_coco
    from torch_ekpose_tpu.data.dataset import BatchLoader, CocoKeypoints

    def make(mode):
        ds = CocoKeypoints(
            img_dir, anno,
            preprocess=T.TRAIN_PREPROCESS(64),
            image_transform=T.image_transform_train,
            target_mode="device", input_size=64,
        )
        ds.reseed(123)
        return BatchLoader(
            ds, 2, shuffle=True, num_workers=2, drop_last=False,
            seed=5, mode=mode,
        )

    threaded = make("thread")
    processed = make("process")
    try:
        for _ in range(2):  # two epochs: per-epoch seeds + shuffle agree
            tb = list(threaded)
            pb = list(processed)
            assert len(tb) == len(pb) == 3
            for a, b in zip(tb, pb):
                assert len(a) == len(b)
                for x, y in zip(a, b):
                    np.testing.assert_array_equal(x, y)
    finally:
        processed.close()


class _BrokenDataset:
    """Module-level so spawn can pickle it."""

    def __len__(self):
        return 4

    def __getitem__(self, index):
        raise ValueError("boom")


def test_process_loader_propagates_worker_error():
    from torch_ekpose_tpu.data.dataset import BatchLoader

    ds = _BrokenDataset()
    loader = BatchLoader(
        ds, 2, shuffle=False, num_workers=1, drop_last=False,
        mode="process",
    )
    try:
        with pytest.raises(RuntimeError, match="loader worker failed"):
            list(loader)
    finally:
        loader.close()


def _pil_jitter_chain(image, rng, strength=0.1):
    """The PIL ImageEnhance chain the vectorized jitter replaced
    (torchvision ColorJitter's PIL backend, reference
    transforms.py:92-95) — the parity target for the tests below."""
    import PIL.ImageEnhance

    ops = [
        ("brightness", PIL.ImageEnhance.Brightness),
        ("contrast", PIL.ImageEnhance.Contrast),
        ("saturation", PIL.ImageEnhance.Color),
        ("hue", None),
    ]
    order = rng.permutation(len(ops))
    for i in order:
        name, enhancer = ops[i]
        if name == "hue":
            shift = rng.uniform(-strength, strength)
            hsv = np.asarray(image.convert("HSV"), dtype=np.int16)
            hsv[..., 0] = (hsv[..., 0] + int(shift * 255)) % 256
            image = PIL.Image.fromarray(
                hsv.astype(np.uint8), "HSV"
            ).convert("RGB")
        else:
            factor = rng.uniform(1 - strength, 1 + strength)
            image = enhancer(image).enhance(factor)
    return np.asarray(image)


def test_jitter_enhance_ops_bit_exact_vs_pil():
    """brightness/contrast/saturation are BIT-IDENTICAL to
    PIL.ImageEnhance per op: each is Image.blend against a degenerate
    image, and _jitter_op reproduces Pillow's convert("L") fixed
    point, ImageStat's rounded mean, and Blend.c's float32
    deg + alpha*(img-deg) clip/truncate math exactly."""
    import PIL.ImageEnhance

    enhancers = {
        "brightness": PIL.ImageEnhance.Brightness,
        "contrast": PIL.ImageEnhance.Contrast,
        "saturation": PIL.ImageEnhance.Color,
    }
    master = np.random.default_rng(11)
    factors = [0.9, 0.903847, 1.0, 1.05, 1.1, 0.0, 1.5]
    for trial in range(4):
        arr = master.integers(0, 256, (37, 53, 3), dtype=np.uint8)
        for name, enhancer in enhancers.items():
            for factor in factors:
                want = np.asarray(
                    enhancer(PIL.Image.fromarray(arr)).enhance(factor)
                )
                got = T._jitter_op(arr, name, factor)
                np.testing.assert_array_equal(
                    got, want, err_msg=f"{name} f={factor} trial {trial}"
                )


def test_jitter_hue_close_to_pil():
    """The hue op runs through cv2's SIMD full-range HSV round-trip
    instead of PIL's scalar converter — same uint8 shift semantics,
    pinned to PIL within quantization noise (the two converters round
    H/S differently by ~1 unit; the shift itself is +-25 units)."""
    master = np.random.default_rng(7)
    for trial in range(6):
        arr = master.integers(0, 256, (41, 59, 3), dtype=np.uint8)
        shift = float(master.uniform(-0.1, 0.1))
        hsv = np.asarray(
            PIL.Image.fromarray(arr).convert("HSV"), dtype=np.int16
        )
        hsv[..., 0] = (hsv[..., 0] + int(shift * 255)) % 256
        want = np.asarray(
            PIL.Image.fromarray(hsv.astype(np.uint8), "HSV").convert("RGB")
        ).astype(np.int16)
        got = T._jitter_op(arr, "hue", shift).astype(np.int16)
        diff = np.abs(got - want)
        assert diff.mean() <= 2.0, f"trial {trial}: mean {diff.mean()}"
        assert diff.max() <= 32, f"trial {trial}: max {diff.max()}"


def test_color_jitter_chain_matches_pil_within_hue_noise():
    """The full random chain, same rng stream as the PIL chain: the
    only divergence allowed is the hue converter's quantization."""
    master = np.random.default_rng(11)
    for trial in range(8):
        arr = master.integers(0, 256, (37, 53, 3), dtype=np.uint8)
        seed = int(master.integers(1 << 30))
        want = _pil_jitter_chain(
            PIL.Image.fromarray(arr), np.random.default_rng(seed)
        ).astype(np.int16)
        got = T._color_jitter(arr, np.random.default_rng(seed)).astype(
            np.int16
        )
        diff = np.abs(got - want)
        assert diff.mean() <= 2.0, f"trial {trial}: mean {diff.mean()}"
        assert diff.max() <= 48, f"trial {trial}: max {diff.max()}"


def test_image_transform_train_grayscale_and_normalize_paths():
    """The rare-branch paths of image_transform_train: grayscale
    conversion equals PIL convert('L').convert('RGB'), and the
    normalize math equals the reference's ((x/255)-mean)/std."""
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    want_gray = np.asarray(
        PIL.Image.fromarray(arr).convert("L").convert("RGB")
    )
    got_gray = np.repeat(T._gray_u8(arr)[:, :, None], 3, axis=2)
    np.testing.assert_array_equal(got_gray, want_gray)

    out = T._normalize_hwc(arr)
    mean = np.asarray(constants.IMAGENET_MEAN, np.float32)
    std = np.asarray(constants.IMAGENET_STD, np.float32)
    want = ((arr.astype(np.float32) / 255.0) - mean) / std
    np.testing.assert_array_equal(out, want)
    # an f32 caller array is never mutated in place
    f32 = arr.astype(np.float32)
    before = f32.copy()
    T._normalize_hwc(f32)
    np.testing.assert_array_equal(f32, before)
