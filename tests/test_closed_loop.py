"""The full reference workflow as ONE chain: cli.train on a synthetic
multi-person dataset -> full-state checkpoint -> cli.eval loads that
checkpoint end-to-end -> OKS AP above a fixed bar (reference
train.py:341-430 -> eval.py:129-170, driven through this package's CLI
surfaces rather than as separately-tested pieces).

The dataset renders each joint as a colored disk. Colors are
mirror-symmetric (left/right joint pairs share a color) and the person
layout is left/right symmetric, so the HFlip augmentation inside
TRAIN_PREPROCESS keeps the color+side -> joint mapping consistent and
the model can actually memorize the mapping in a CPU-sized run."""

import json
import os
import re

import numpy as np
import PIL.Image
import pytest

SIZE = 96          # source image = train square = eval dest size
MODEL = "mobilenetV2_small"

# anatomical layout around the person center, in SIZE-relative units;
# left/right pairs are exact mirrors so HFlip produces in-distribution
# samples. COCO order: nose, l/r eye, l/r ear, l/r shoulder, l/r elbow,
# l/r wrist, l/r hip, l/r knee, l/r ankle.
_UNIT = np.array([
    (0.00, -0.46),                      # nose
    (0.05, -0.50), (-0.05, -0.50),      # eyes
    (0.10, -0.47), (-0.10, -0.47),      # ears
    (0.16, -0.30), (-0.16, -0.30),      # shoulders
    (0.21, -0.10), (-0.21, -0.10),      # elbows
    (0.23, 0.10), (-0.23, 0.10),        # wrists
    (0.11, 0.06), (-0.11, 0.06),        # hips
    (0.12, 0.28), (-0.12, 0.28),        # knees
    (0.13, 0.48), (-0.13, 0.48),        # ankles
])

# one distinctive color per joint GROUP (shared across a left/right pair)
_GROUP = [0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8]
_COLORS = np.array([
    (255, 40, 40), (40, 255, 40), (40, 40, 255), (255, 255, 40),
    (255, 40, 255), (40, 255, 255), (255, 140, 40), (140, 40, 255),
    (40, 140, 140), (230, 230, 230),   # last: neck marker
])


def render_person(img, cx, cy, scale=80.0, radius=4):
    """Draw the 17 joint disks plus a neck marker; returns the COCO
    keypoint array actually drawn."""
    kp = np.zeros((17, 3))
    kp[:, :2] = np.array([cx, cy]) + _UNIT * scale
    kp[:, 2] = 2
    yy, xx = np.mgrid[0: img.shape[0], 0: img.shape[1]]
    for j in range(17):
        mask = (xx - kp[j, 0]) ** 2 + (yy - kp[j, 1]) ** 2 < radius ** 2
        img[mask] = _COLORS[_GROUP[j]]
    neck = (kp[5, :2] + kp[6, :2]) / 2.0
    mask = (xx - neck[0]) ** 2 + (yy - neck[1]) ** 2 < radius ** 2
    img[mask] = _COLORS[9]
    return kp


def build_synth_tree(root, n_train=4, n_val=2, size=SIZE, seed=0):
    """<root>/synth/{images/{train,val}, annotations_{train,val}.json}"""
    rng = np.random.default_rng(seed)
    for mode, n in (("train", n_train), ("val", n_val)):
        img_dir = os.path.join(root, "synth", "images", mode)
        os.makedirs(img_dir, exist_ok=True)
        images, annotations = [], []
        for img_id in range(1, n + 1):
            img = np.zeros((size, size, 3), dtype=np.uint8)
            cx = size / 2 + rng.uniform(-6, 6)
            cy = size / 2 + rng.uniform(-4, 4)
            kp = render_person(img, cx, cy)
            name = f"{img_id:012d}.png"
            PIL.Image.fromarray(img).save(os.path.join(img_dir, name))
            images.append({
                "id": img_id, "width": size, "height": size,
                "file_name": name,
            })
            x0, y0 = kp[:, 0].min(), kp[:, 1].min()
            w = kp[:, 0].max() - x0
            h = kp[:, 1].max() - y0
            annotations.append({
                "id": img_id, "image_id": img_id, "category_id": 1,
                "keypoints": [float(v) for v in kp.reshape(-1)],
                "num_keypoints": 17, "iscrowd": 0,
                "area": float(w * h), "bbox": [x0, y0, w, h],
                "segmentation": [],
            })
        with open(
            os.path.join(root, "synth", f"annotations_{mode}.json"), "w"
        ) as f:
            json.dump({
                "images": images, "annotations": annotations,
                "categories": [{"id": 1, "name": "person"}],
            }, f)
    return root


def test_train_checkpoint_eval_chain(tmp_path, capsys):
    from torch_ekpose_tpu.cli.eval import main as eval_main
    from torch_ekpose_tpu.cli.train import main as train_main

    data_dir = build_synth_tree(str(tmp_path / "data"), n_train=8)
    out_dir = str(tmp_path / "ckpts")
    # calibrated on this CPU image: 320 steps reach AP ~0.70, so 400
    # steps leave a wide margin over the 0.5 bar (~4-5 min total)
    train_main([
        "-m", MODEL, "-d", "synth", "--data-dir", data_dir,
        "-b", "2", "-e", "100", "--square_size", str(SIZE),
        "--workers", "0", "--loader-mode", "thread",
        "--num-devices", "1", "--lr", "4e-3", "--save_epoch", "100",
        "--out-dir", out_dir, "--logdir", str(tmp_path / "logs"),
    ])
    ckpt = os.path.join(out_dir, "epoch_99.ckpt")
    assert os.path.exists(ckpt), os.listdir(out_dir)

    vis_dir = str(tmp_path / "results")
    eval_main([
        "-m", MODEL, "-c", ckpt, "-d", "synth", "--data-dir", data_dir,
        "--mode", "val", "--dest-size", str(SIZE), "-b", "2",
        "--json", "--vis-dir", vis_dir,
    ])
    out = capsys.readouterr().out
    m = re.search(r"AP@OKS = ([-\d.]+)", out)
    assert m, out[-2000:]
    ap = float(m.group(1))

    results = json.load(open(os.path.join(vis_dir, "results.json")))
    assert {r["image_id"] for r in results} == {1, 2}
    assert all(len(r["keypoints"]) == 51 for r in results)
    # the chain bar: the trained checkpoint must actually localize the
    # synthetic people, not merely flow through the pipeline
    assert ap > 0.5, (ap, out[-2000:])


def test_eval_cli_sharded_over_mesh(tmp_path, capsys):
    """cli.eval --num-devices N drives the bucketed eval loop through a
    ShardedPoseEstimator on an N-device mesh end-to-end (random-init
    model; this certifies the CLI wiring + remainder-bucket padding, not
    AP quality — test_sharded_eval_loop_matches_single_device pins the
    numerics)."""
    from torch_ekpose_tpu.cli.eval import main as eval_main

    data_dir = build_synth_tree(str(tmp_path / "data"), n_train=1, n_val=3)
    vis_dir = str(tmp_path / "results")
    eval_main([
        "-m", MODEL, "-d", "synth", "--data-dir", data_dir,
        "--mode", "val", "--dest-size", str(SIZE),
        "-b", "8", "--num-devices", "8",
        "--json", "--vis-dir", vis_dir,
    ])
    out = capsys.readouterr().out
    assert re.search(r"AP@OKS = ([-\d.]+)", out), out[-2000:]
    results = json.load(open(os.path.join(vis_dir, "results.json")))
    assert all(len(r["keypoints"]) == 51 for r in results)

    with pytest.raises(SystemExit, match="multiple of"):
        eval_main([
            "-m", MODEL, "-d", "synth", "--data-dir", data_dir,
            "--mode", "val", "-b", "6", "--num-devices", "4",
        ])


def test_preempt_ckpt_supersedes_explicit_resume(tmp_path, capsys):
    """A preempt.ckpt in out_dir wins over --pretrained_path (it is
    strictly newer state of that out_dir: a scheduler relaunching the
    original command line after preemption must not restart from the
    initial checkpoint), is consumed on restore, and forces the
    warmup-skip path."""
    from torch_ekpose_tpu.cli.train import main as train_main

    data_dir = build_synth_tree(str(tmp_path / "data"), n_train=2)
    out_dir = str(tmp_path / "ckpts")
    base = [
        "-m", MODEL, "-d", "synth", "--data-dir", data_dir,
        "-b", "2", "--square_size", str(SIZE),
        "--workers", "0", "--loader-mode", "thread",
        "--num-devices", "1", "--save_epoch", "1",
        "--out-dir", out_dir, "--logdir", str(tmp_path / "logs"),
    ]
    train_main(base + ["-e", "1"])
    first = os.path.join(out_dir, "epoch_0.ckpt")
    assert os.path.exists(first), os.listdir(out_dir)

    # simulate a preemption checkpoint newer than the explicit one
    preempt = os.path.join(out_dir, "preempt.ckpt")
    import shutil

    shutil.copy(first, preempt)
    capsys.readouterr()

    train_main(base + ["-e", "2", "--warmup_epochs", "1",
                       "--pretrained_path", first])
    out = capsys.readouterr().out
    assert "supersedes --pretrained_path" in out, out[-2000:]
    assert "skipping warmup" in out, out[-2000:]
    assert f"auto-resumed from {preempt}" in out, out[-2000:]
    assert not os.path.exists(preempt)          # consumed on restore


def test_train_cli_raw_targets_with_cache(tmp_path):
    """--targets raw --raw-cache: decode-only loader + pre-decoded memmap
    cache + on-device augmentation/targets, end-to-end through cli.train.
    Certifies the wiring (cache built once then reused, checkpoint
    written, finite decreasing loss); device_aug numerics are pinned in
    tests/test_device_aug.py."""
    from torch_ekpose_tpu.cli.train import main as train_main

    data_dir = build_synth_tree(str(tmp_path / "data"), n_train=8)
    out_dir = str(tmp_path / "ckpts")
    cache = str(tmp_path / "rawcache")

    def run(epochs):
        train_main([
            "-m", MODEL, "-d", "synth", "--data-dir", data_dir,
            "-b", "2", "-e", str(epochs), "--square_size", str(SIZE),
            "--workers", "0", "--num-devices", "1", "--lr", "1e-3",
            "--targets", "raw", "--raw-cache", cache,
            "--save_epoch", str(epochs), "--out-dir", out_dir,
            "--logdir", str(tmp_path / "logs"),
        ])

    run(2)
    assert os.path.exists(cache + "_meta.json")
    ckpt = os.path.join(out_dir, "epoch_1.ckpt")
    assert os.path.exists(ckpt)
    built = os.path.getmtime(cache + "_images.npy")

    from flax import serialization

    payload = serialization.msgpack_restore(open(ckpt, "rb").read())
    losses = list(payload["train_curve"]["train"])
    assert len(losses) == 2
    assert all(np.isfinite(losses)), losses
    # second run must REUSE the cache, not rebuild it
    run(1)
    assert os.path.getmtime(cache + "_images.npy") == built
