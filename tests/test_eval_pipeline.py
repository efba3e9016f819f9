"""End-to-end eval loop test with a fake estimator that emits ground-truth
targets: exercises COCO reading, the estimator contract, decode, the
append_result coordinate math (reference eval.py:93-125,166), and the
evaluator. A perfect-output model must score near-perfect AP."""

import json

import numpy as np
import pytest

from torch_ekpose_tpu import constants
from torch_ekpose_tpu.config import Config
from torch_ekpose_tpu.data import gen_targets_np
from torch_ekpose_tpu.evaluate import run_eval
from torch_ekpose_tpu.runtime.estimator import padding

IMG_W, IMG_H = 640, 480

OFFSETS = np.array([
    (0, -95), (0, -70), (-25, -70), (-32, -35), (-36, 0), (25, -70),
    (32, -35), (36, 0), (-18, 0), (-20, 45), (-20, 90), (18, 0),
    (20, 45), (20, 90), (-8, -103), (8, -103), (-17, -99), (17, -99),
])


def _internal_to_coco_ann(kpts18):
    """18 internal keypoints -> COCO 17-keypoint annotation row."""
    coco = np.zeros((17, 3))
    for coco_idx in range(17):
        coco[coco_idx] = kpts18[constants.ORDER_COCO[coco_idx]]
    return coco


def _build_dataset(tmp_path, n_images=3):
    from PIL import Image

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    images, annotations, gt18 = [], [], {}
    ann_id = 1
    for img_id in range(1, n_images + 1):
        name = f"{img_id:012d}.png"
        # solid fill encodes the image id so batched fakes can recover it
        fill = img_id * 20
        Image.new("RGB", (IMG_W, IMG_H), (fill, fill, fill)).save(
            img_dir / name
        )
        images.append({
            "id": img_id, "width": IMG_W, "height": IMG_H, "file_name": name,
        })
        people = []
        for _ in range(int(rng.integers(1, 3))):
            c = np.array([rng.uniform(150, 500), rng.uniform(160, 330)])
            kp18 = np.zeros((18, 3))
            kp18[:, :2] = c + OFFSETS * rng.uniform(0.7, 1.1)
            kp18[:, 2] = 2
            people.append(kp18)
            coco = _internal_to_coco_ann(kp18)
            x0, y0 = coco[:, 0].min(), coco[:, 1].min()
            w = coco[:, 0].max() - x0
            h = coco[:, 1].max() - y0
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": 1,
                "keypoints": [float(v) for v in coco.reshape(-1)],
                "num_keypoints": 17, "iscrowd": 0,
                "area": float(w * h), "bbox": [x0, y0, w, h],
            })
            ann_id += 1
        gt18[img_id] = people
    anno = tmp_path / "annotations_val.json"
    anno.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": 1, "name": "person"}],
    }))
    return str(img_dir), str(anno), gt18


class FakeEstimator:
    """Emits ground-truth heatmaps/PAFs in the padded-image frame."""

    def __init__(self, gt18):
        self.gt18 = gt18
        self.config = Config()
        self.decode_backend = "numpy"
        self.dest_size = 368
        self._img_id = None

    def _targets(self, img_id, gy, gx, scale):
        kpts = np.stack(self.gt18[img_id]).copy()
        kpts[:, :, :2] *= scale
        return gen_targets_np(kpts, gy, gx, 8, 7.0)

    def get_outputs(self, image):
        im_pad, scale, _ = padding(image, 368, 8)
        gy, gx = im_pad.shape[0] // 8, im_pad.shape[1] // 8
        heat, pafs = self._targets(self._img_id, gy, gx, scale)
        return pafs, heat, scale

    def get_outputs_batch(self, images):
        # images carry their id as a solid fill color (id * 20)
        scale = 368.0 / max(IMG_W, IMG_H)
        gy, gx = images.shape[1] // 8, images.shape[2] // 8
        pafs_b, heat_b = [], []
        for im in images:
            img_id = int(round(float(im[0, 0, 0]) / 20.0))
            heat, pafs = self._targets(img_id, gy, gx, scale)
            pafs_b.append(pafs)
            heat_b.append(heat)
        return np.stack(pafs_b), np.stack(heat_b)


def test_eval_pipeline_perfect_model(tmp_path):
    pytest.importorskip("PIL")
    img_dir, anno, gt18 = _build_dataset(tmp_path)

    est = FakeEstimator(gt18)

    # run_eval reads images in id order; track which image is being served
    from torch_ekpose_tpu.evaluate import evaluator as ev_mod

    orig_read = ev_mod.read_image_bgr
    ids = iter(sorted(gt18))

    def tracking_read(path):
        est._img_id = next(ids)
        return orig_read(path)

    ev_mod.read_image_bgr = tracking_read
    try:
        ap = run_eval(img_dir, anno, est, mode="val", progress=False)
    finally:
        ev_mod.read_image_bgr = orig_read
    assert ap > 0.75, f"AP {ap}"


def test_eval_pipeline_batched_matches_single(tmp_path):
    pytest.importorskip("PIL")
    img_dir, anno, gt18 = _build_dataset(tmp_path, n_images=5)
    est = FakeEstimator(gt18)
    ap_batched = run_eval(
        img_dir, anno, est, mode="val", progress=False, batch_size=2
    )
    assert ap_batched > 0.75, f"AP {ap_batched}"


def test_batched_forward_matches_single_forward():
    import jax.numpy as jnp

    from torch_ekpose_tpu.runtime import PoseEstimator

    est = PoseEstimator(
        "vgg2016", decode_backend="numpy", dest_size=64,
        compute_dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    pafs_b, heat_b = est.get_outputs_batch(images)
    for i in range(2):
        pafs_1, heat_1, _ = est.get_outputs(images[i])
        np.testing.assert_allclose(pafs_b[i], pafs_1, atol=2e-4)
        np.testing.assert_allclose(heat_b[i], heat_1, atol=2e-4)


def test_estimate_batch_matches_single_estimate():
    """Batched fused forward+vmapped-decode returns the same people as the
    single-image fused path."""
    import jax.numpy as jnp

    from torch_ekpose_tpu.runtime import PoseEstimator

    est = PoseEstimator(
        "vgg2016", decode_backend="jax", dest_size=64,
        compute_dtype=jnp.float32,
    )
    rng = np.random.default_rng(1)
    images = rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    humans_b = est.estimate_batch(images)

    def sig(humans):
        return sorted(
            sorted(
                (p, round(bp.x, 6), round(bp.y, 6), round(bp.score, 5))
                for p, bp in h.body_parts.items()
            )
            for h in humans
        )

    for i in range(2):
        humans_1, _ = est.estimate(images[i])
        assert sig(humans_b[i]) == sig(humans_1)


def test_eval_pipeline_jax_backend_batched(tmp_path):
    """The batched eval path through the DEVICE decoder (decode_backend
    'jax' -> estimate_batch) scores near-perfect AP on ground-truth maps."""
    pytest.importorskip("PIL")
    img_dir, anno, gt18 = _build_dataset(tmp_path, n_images=4)

    class JaxFake(FakeEstimator):
        def __init__(self, gt18):
            super().__init__(gt18)
            self.decode_backend = "jax"

        def estimate_batch(self, images):
            return self.collect_batch(self.estimate_batch_async(images))

        def estimate_batch_async(self, images):
            # handle-based protocol like the real PoseEstimator: the
            # evaluator dispatches, then collects later
            return self.get_outputs_batch(images)

        def collect_batch(self, handle):
            from torch_ekpose_tpu.decode.device import paf_to_pose_jax

            pafs_b, heat_b = handle
            return [
                paf_to_pose_jax(heat, pafs, self.config)
                for heat, pafs in zip(heat_b, pafs_b)
            ]

    est = JaxFake(gt18)
    ap = run_eval(
        img_dir, anno, est, mode="val", progress=False, batch_size=2
    )
    assert ap > 0.75, f"AP {ap}"


def test_eval_batch1_jax_rides_device_decode(tmp_path):
    """batch_size=1 with decode_backend='jax' must NOT fall back to host
    decode: it rides the batched device pipeline and produces the same
    result rows as batch_size=2 (cli.eval's TPU default relies on this)."""
    pytest.importorskip("PIL")
    img_dir, anno, gt18 = _build_dataset(tmp_path, n_images=4)

    class JaxFake(FakeEstimator):
        def __init__(self, gt18):
            super().__init__(gt18)
            self.decode_backend = "jax"
            self.async_calls = 0

        def estimate_batch_async(self, images):
            self.async_calls += 1
            return self.get_outputs_batch(images)

        def collect_batch(self, handle):
            from torch_ekpose_tpu.decode.device import paf_to_pose_jax

            pafs_b, heat_b = handle
            return [
                paf_to_pose_jax(heat, pafs, self.config)
                for heat, pafs in zip(heat_b, pafs_b)
            ]

    rows = {}
    for bs in (1, 2):
        est = JaxFake(gt18)
        out = tmp_path / f"rows_b{bs}.json"
        ap = run_eval(
            img_dir, anno, est, mode="val", progress=False,
            batch_size=bs, results_json=str(out),
        )
        assert ap > 0.75, f"AP {ap} at batch {bs}"
        assert est.async_calls > 0, "device decode path was skipped"
        rows[bs] = sorted(
            json.loads(out.read_text()),
            key=lambda r: (r["image_id"], r["keypoints"]),
        )
    assert rows[1] == rows[2]


def test_prefetch_read_preserves_order_and_values(tmp_path):
    """The background reader yields exactly the synchronous sequence:
    same (seq, img_id) order and bit-identical padded arrays/scales."""
    pytest.importorskip("PIL")
    import os

    from torch_ekpose_tpu.data.coco import COCO
    from torch_ekpose_tpu.evaluate.evaluator import (
        _prefetch_read, read_image_bgr,
    )

    img_dir, anno, _ = _build_dataset(tmp_path, n_images=5)
    coco = COCO(str(anno))
    img_ids = coco.getImgIds()

    got = list(_prefetch_read(iter(img_ids), str(img_dir), coco,
                              dest_size=368, stride=8, depth=2))
    assert [g[0] for g in got] == list(range(len(img_ids)))
    assert [g[1] for g in got] == list(img_ids)
    for seq, img_id in enumerate(img_ids):
        info = coco.loadImgs(img_id)[0]
        image = read_image_bgr(os.path.join(str(img_dir),
                                            info["file_name"]))
        im_pad, scale, _ = padding(image, 368, 8)
        assert np.array_equal(got[seq][2], image)
        assert np.array_equal(got[seq][3], im_pad)
        assert got[seq][4] == scale


def test_prefetch_read_propagates_reader_errors(tmp_path):
    """A failure inside the reader thread (missing file) surfaces as an
    exception in the consuming loop, not a silent truncation or hang."""
    pytest.importorskip("PIL")
    from torch_ekpose_tpu.data.coco import COCO
    from torch_ekpose_tpu.evaluate.evaluator import _prefetch_read

    img_dir, anno, _ = _build_dataset(tmp_path, n_images=3)
    coco = COCO(str(anno))
    img_ids = coco.getImgIds()
    missing = coco.loadImgs(img_ids[1])[0]["file_name"]
    (tmp_path / "images" / missing).unlink()

    out = []
    with pytest.raises(Exception):
        for item in _prefetch_read(iter(img_ids), str(img_dir), coco,
                                   dest_size=368, stride=8, depth=2):
            out.append(item)
    assert len(out) <= 1  # only the image before the failure


def test_prefetch_read_ticks_tqdm_in_consumer(tmp_path):
    """A tqdm-wrapped iterator is unwrapped: the reader thread consumes
    the raw ids while the bar ticks HERE in the consumer as items are
    yielded (round-4 advisory: the bar ran 2*batch images ahead and
    updated off the main thread)."""
    pytest.importorskip("PIL")
    import threading

    from torch_ekpose_tpu.data.coco import COCO
    from torch_ekpose_tpu.evaluate.evaluator import _prefetch_read

    img_dir, anno, _ = _build_dataset(tmp_path, n_images=4)
    coco = COCO(str(anno))
    img_ids = coco.getImgIds()

    main_thread = threading.get_ident()

    class FakeBar:
        """Duck-typed tqdm: .iterable + .update + .close."""

        def __init__(self, iterable):
            self.iterable = iterable
            self.ticks = 0
            self.tick_threads = set()
            self.closed = False

        def update(self, n=1):
            self.ticks += n
            self.tick_threads.add(threading.get_ident())

        def close(self):
            self.closed = True

    bar = FakeBar(iter(img_ids))
    seen = []
    for item in _prefetch_read(bar, str(img_dir), coco,
                               dest_size=368, stride=8, depth=2):
        # the bar may only have ticked for items ALREADY yielded — never
        # ahead of the consumer
        assert bar.ticks <= len(seen) + 1
        seen.append(item[1])
    assert seen == list(img_ids)
    assert bar.ticks == len(img_ids)
    assert bar.tick_threads == {main_thread}
    assert bar.closed
