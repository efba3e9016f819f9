"""User-facing CLI surfaces, driven in-process on the CPU backend with a
small model — locks down argument wiring and output artifacts that unit
tests of the underlying modules cannot see."""

import json
import os

import numpy as np
import PIL.Image
import pytest


@pytest.fixture
def tiny_image(tmp_path):
    rng = np.random.default_rng(0)
    p = tmp_path / "img.jpg"
    PIL.Image.fromarray(
        rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
    ).save(p)
    return str(p)


def test_run_image_cli(tiny_image, tmp_path):
    from torch_ekpose_tpu.cli.run_image import main

    out = str(tmp_path / "out.jpg")
    main([
        "-m", "mobilenetV2_small", "-i", tiny_image, "-o", out,
    ])
    assert os.path.exists(out)


def test_run_image_cli_analyze(tiny_image, tmp_path):
    pytest.importorskip("matplotlib")
    from torch_ekpose_tpu.cli.run_image import main

    out = str(tmp_path / "out.jpg")
    main([
        "-m", "mobilenetV2_small", "-i", tiny_image, "-o", out,
        "--analyze",
    ])
    assert os.path.exists(str(tmp_path / "out_analyze.jpg"))


def test_run_image_cli_spatial_mesh(tiny_image, tmp_path):
    """--num-devices N runs the height-sharded (sp) estimator end to
    end; vgg family since sp targets the dense-conv flagship."""
    from torch_ekpose_tpu.cli.run_image import main

    out = str(tmp_path / "out_sp.jpg")
    main([
        "-m", "vgg2016", "-i", tiny_image, "-o", out,
        "--num-devices", "8", "--dest-size", "128",
    ])
    assert os.path.exists(out)


def test_summary_cli(capsys):
    from torch_ekpose_tpu.cli.summary import main

    main([])
    out = capsys.readouterr().out
    assert "vgg2016" in out and "GFLOPs" in out


def test_metrics_writer_jsonl_roundtrip(tmp_path):
    from torch_ekpose_tpu.training.metrics import MetricsWriter

    w = MetricsWriter(str(tmp_path))
    w.add_scalar("Loss/train", 1.5, 0)
    w.add_scalars({"paf1/train": 0.25}, 0)
    w.flush()
    rows = [
        json.loads(line)
        for line in (tmp_path / "metrics.jsonl").read_text().splitlines()
    ]
    by_name = {r["name"]: r for r in rows}
    assert by_name["Loss/train"]["value"] == 1.5
    assert by_name["paf1/train"]["step"] == 0
