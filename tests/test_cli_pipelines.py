"""End-to-end drives of the remaining CLI surfaces — run_video (threaded
3-stage pipeline incl. the batch-remainder path and error propagation),
run_webcam (headless loop), vis_output, test_loader, bench_latency —
none of which the module-level unit tests can exercise.

Reference behaviors pinned: run_video.py:31-64 (per-frame video decode ->
estimate -> draw -> mp4), run_webcam.py:40-82 (rolling FPS meter,
max/avg/min report), vis_output.py (all heatmap+PAF channels),
test_loader.py (one training batch visualization)."""

import json
import os

import numpy as np
import PIL.Image
import pytest

cv2 = pytest.importorskip("cv2")

MODEL = "mobilenetV2_small"


@pytest.fixture(scope="module")
def tiny_video(tmp_path_factory):
    """18 frames at 120x160: with --batch 4 that is 4 full batches plus a
    2-frame remainder, driving the padded-dispatch path."""
    path = str(tmp_path_factory.mktemp("video") / "in.mp4")
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (160, 120)
    )
    rng = np.random.default_rng(0)
    for _ in range(18):
        writer.write(rng.integers(0, 255, (120, 160, 3), dtype=np.uint8))
    writer.release()
    return path


def _count_frames(path):
    cap = cv2.VideoCapture(path)
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    return n


def test_run_video_batched_pipeline(tiny_video, tmp_path, capsys):
    from torch_ekpose_tpu.cli.run_video import main

    out = str(tmp_path / "out.mp4")
    main(["-m", MODEL, "-v", tiny_video, "-o", out, "-b", "4"])
    stdout = capsys.readouterr().out
    assert os.path.exists(out)
    # every input frame (including the 2-frame remainder batch) is written
    assert _count_frames(out) == 18
    assert "FPS" in stdout and "18 frames" in stdout


def test_run_video_single_frame_path(tiny_video, tmp_path):
    from torch_ekpose_tpu.cli.run_video import main

    out = str(tmp_path / "out1.mp4")
    main(["-m", MODEL, "-v", tiny_video, "-o", out,
          "--max-frames", "3"])
    assert _count_frames(out) == 3


def test_run_video_batch_requires_jax_backend(tiny_video):
    from torch_ekpose_tpu.cli.run_video import main

    with pytest.raises(SystemExit):
        main(["-m", MODEL, "-v", tiny_video, "-b", "4",
              "--decode-backend", "numpy"])


def test_run_video_pipeline_propagates_stage_errors(
    tiny_video, tmp_path, monkeypatch
):
    """An exception in the writer stage must reach the caller (not hang
    the bounded queues or be swallowed by a daemon thread)."""
    from torch_ekpose_tpu.cli import run_video

    def boom(frame, humans):
        raise RuntimeError("draw failed")

    monkeypatch.setattr(run_video, "draw_humans", boom)
    with pytest.raises(RuntimeError, match="draw failed"):
        run_video.main([
            "-m", MODEL, "-v", tiny_video,
            "-o", str(tmp_path / "err.mp4"), "-b", "4",
        ])


class _FakeCapture:
    """Stands in for cv2.VideoCapture: endless random frames."""

    def __init__(self, *a, **kw):
        self._rng = np.random.default_rng(0)

    def isOpened(self):
        return True

    def read(self):
        return True, self._rng.integers(
            0, 255, (120, 160, 3), dtype=np.uint8
        )

    def release(self):
        pass


def test_run_webcam_headless(monkeypatch, capsys):
    from torch_ekpose_tpu.cli.run_webcam import main

    monkeypatch.setattr(cv2, "VideoCapture", _FakeCapture)
    main(["-m", MODEL, "--headless", "--max-frames", "4"])
    out = capsys.readouterr().out
    # the reference's closing report: max/avg/min of the rolling FPS
    assert "FPS" in out and "avg" in out and "min" in out


def test_run_webcam_unopenable_camera(monkeypatch):
    from torch_ekpose_tpu.cli.run_webcam import main

    class Closed(_FakeCapture):
        def isOpened(self):
            return False

    monkeypatch.setattr(cv2, "VideoCapture", Closed)
    with pytest.raises(SystemExit, match="cannot open camera"):
        main(["-m", MODEL, "--headless"])


def test_vis_output_writes_channel_grid(tmp_path):
    pytest.importorskip("matplotlib")
    from torch_ekpose_tpu.cli.vis_output import main

    img = tmp_path / "img.jpg"
    PIL.Image.fromarray(
        np.random.default_rng(0).integers(
            0, 255, (96, 128, 3), dtype=np.uint8
        )
    ).save(img)
    out = str(tmp_path / "channels.png")
    main(["-m", MODEL, "-i", str(img), "-o", out])
    assert os.path.exists(out) and os.path.getsize(out) > 0


@pytest.fixture
def tiny_coco_tree(tmp_path):
    """The on-disk layout cli.test_loader/train expect:
    <data-dir>/<dataset>/images/<mode>/ + annotations_<mode>.json."""
    img_dir = tmp_path / "data" / "coco" / "images" / "train"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    images, annotations = [], []
    for img_id in (1, 2):
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
            "id": img_id, "image_id": img_id, "category_id": 1,
            "keypoints": [float(v) for v in kp.reshape(-1)],
            "num_keypoints": 17, "iscrowd": 0, "area": 100.0,
            "bbox": [40, 40, 100, 100], "segmentation": [],
        })
    (tmp_path / "data" / "coco" / "annotations_train.json").write_text(
        json.dumps({
            "images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "person"}],
        })
    )
    return str(tmp_path / "data")


def test_test_loader_cli(tiny_coco_tree, tmp_path, capsys):
    pytest.importorskip("matplotlib")
    from torch_ekpose_tpu.cli.test_loader import main

    out = str(tmp_path / "loader_vis.png")
    main(["-d", "coco", "--data-dir", tiny_coco_tree,
          "--square_size", "128", "-o", out])
    assert os.path.exists(out)
    assert "dataset has 2 images" in capsys.readouterr().out


def test_bench_latency_cli(capsys):
    from torch_ekpose_tpu.cli.bench_latency import main

    main(["-m", MODEL, "--sizes", "64", "96", "--frames", "2"])
    rows = [
        json.loads(line)
        for line in capsys.readouterr().out.splitlines()
        if line.startswith("{")
    ]
    assert [r["size"] for r in rows] == [64, 96]
    assert all(r["p50_ms"] > 0 and r["fps"] > 0 for r in rows)
