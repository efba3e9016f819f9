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


def test_run_image_cli_s2d_blocks(tiny_image, tmp_path):
    """--s2d-blocks N serves through the space-to-depth-prefix vgg
    model (exact on every backend; A/Bed on TPU by
    scripts/profile_s2d.py)."""
    from torch_ekpose_tpu.cli.run_image import main

    out = str(tmp_path / "out_s2d.jpg")
    main([
        "-m", "vgg2016", "-i", tiny_image, "-o", out,
        "--s2d-blocks", "2", "--dest-size", "128",
    ])
    assert os.path.exists(out)


def test_run_image_cli_spatial_mesh(tiny_image, tmp_path):
    """--num-devices N runs the height-sharded (sp) estimator end to
    end; vgg family since sp targets the dense-conv flagship.
    --s2d-blocks must be honored on the sharded path too (it was once
    silently dropped by build_model_and_variables)."""
    from torch_ekpose_tpu.cli.run_image import main

    out = str(tmp_path / "out_sp.jpg")
    main([
        "-m", "vgg2016", "-i", tiny_image, "-o", out,
        "--num-devices", "8", "--dest-size", "128", "--s2d-blocks", "1",
    ])
    assert os.path.exists(out)


def test_export_cli_int8_chain(vgg_model_and_vars, tiny_image, tmp_path):
    """cli.export quantizes a float checkpoint once offline; the
    inference CLIs then serve the pre-quantized msgpack directly
    (-c vgg_int8.msgpack --dtype int8) without re-quantizing."""
    import jax

    from torch_ekpose_tpu.cli.export import main as export_main
    from torch_ekpose_tpu.cli.run_image import main as run_image_main
    from torch_ekpose_tpu.runtime.checkpoint import save_checkpoint

    _, variables = vgg_model_and_vars
    float_ckpt = str(tmp_path / "vgg.msgpack")
    save_checkpoint(
        float_ckpt, jax.tree.map(np.asarray, dict(variables))
    )

    int8_ckpt = str(tmp_path / "vgg_int8.msgpack")
    export_main([
        "-m", "vgg2016", "-c", float_ckpt, "--dtype", "int8",
        "-o", int8_ckpt,
    ])
    assert os.path.exists(int8_ckpt)
    # int8 weights: well under half the float file's size
    assert os.path.getsize(int8_ckpt) < os.path.getsize(float_ckpt) / 2

    out = str(tmp_path / "out_int8.jpg")
    run_image_main([
        "-m", "vgg2016", "-c", int8_ckpt, "--dtype", "int8",
        "-i", tiny_image, "-o", out, "--dest-size", "96",
    ])
    assert os.path.exists(out)


def test_export_cli_int8_static_chain(vgg_model_and_vars, tiny_image, tmp_path):
    """cli.export --dtype int8_static calibrates static activation
    scales on --calib-images; the serving CLI then loads the calibrated
    msgpack with --dtype int8_static and skips runtime calibration."""
    import jax

    from torch_ekpose_tpu.cli.export import main as export_main
    from torch_ekpose_tpu.cli.run_image import main as run_image_main
    from torch_ekpose_tpu.models import has_act_scales
    from torch_ekpose_tpu.runtime.checkpoint import save_checkpoint

    _, variables = vgg_model_and_vars
    float_ckpt = str(tmp_path / "vgg.msgpack")
    save_checkpoint(
        float_ckpt, jax.tree.map(np.asarray, dict(variables))
    )

    static_ckpt = str(tmp_path / "vgg_int8_static.msgpack")
    export_main([
        "-m", "vgg2016", "-c", float_ckpt, "--dtype", "int8_static",
        "--calib-images", tiny_image, "--dest-size", "96",
        "-o", static_ckpt,
    ])
    assert os.path.exists(static_ckpt)

    # the saved tree carries calibrated act_scale leaves
    from torch_ekpose_tpu.cli.common import load_variables

    restored = load_variables("vgg2016", static_ckpt, quantized="static")
    assert has_act_scales(restored["params"])

    out = str(tmp_path / "out_int8_static.jpg")
    run_image_main([
        "-m", "vgg2016", "-c", static_ckpt, "--dtype", "int8_static",
        "-i", tiny_image, "-o", out, "--dest-size", "96",
    ])
    assert os.path.exists(out)


def test_export_cli_to_torch(vgg_model_and_vars, tmp_path):
    """--to-torch writes a reference-format state_dict torch can read
    back (the reference loader strips the module. prefix)."""
    import jax
    import torch

    from torch_ekpose_tpu.cli.export import main as export_main
    from torch_ekpose_tpu.runtime.checkpoint import save_checkpoint

    _, variables = vgg_model_and_vars
    float_ckpt = str(tmp_path / "vgg.msgpack")
    save_checkpoint(
        float_ckpt, jax.tree.map(np.asarray, dict(variables))
    )
    out_pth = str(tmp_path / "vgg_ref.pth")
    export_main([
        "-m", "vgg2016", "-c", float_ckpt, "--to-torch", "-o", out_pth,
    ])
    state = torch.load(out_pth, weights_only=True)
    assert all(k.startswith("module.") for k in state)


def test_run_image_cli_compilation_cache(tiny_image, tmp_path):
    """--compilation-cache persists compiled executables so a restarted
    serving process skips the cold compile; 'none' REALLY disables the
    cache (even one configured via env at import time)."""
    import jax

    from torch_ekpose_tpu.cli.common import enable_compilation_cache
    from torch_ekpose_tpu.cli.run_image import main

    prev_dir = jax.config.jax_compilation_cache_dir
    prev_enabled = jax.config.jax_enable_compilation_cache
    try:
        cache = str(tmp_path / "xla_cache")
        out = str(tmp_path / "out_cached.jpg")
        main([
            "-m", "vgg2016", "-i", tiny_image, "-o", out,
            "--dest-size", "96", "--compilation-cache", cache,
        ])
        assert os.path.exists(out)
        # the flag reached jax's config and the directory was created
        # (whether entries land depends on what still needed compiling
        # in this process — in-memory jit caches are shared across
        # tests)
        assert jax.config.jax_compilation_cache_dir == cache
        assert jax.config.jax_enable_compilation_cache
        assert os.path.isdir(cache)

        enable_compilation_cache("none")
        assert jax.config.jax_compilation_cache_dir is None
        assert not jax.config.jax_enable_compilation_cache
    finally:
        # global jax config: restore so later tests aren't order-coupled
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_enable_compilation_cache", prev_enabled)


def test_compilation_cache_unwritable_target_degrades(tmp_path):
    """An unwritable cache target serves uncached instead of dying."""
    import jax

    from torch_ekpose_tpu.cli.common import enable_compilation_cache

    prev_dir = jax.config.jax_compilation_cache_dir
    prev_enabled = jax.config.jax_enable_compilation_cache
    blocker = tmp_path / "not_a_dir"
    blocker.write_text("")  # a FILE where the cache dir would go
    try:
        enable_compilation_cache(str(blocker / "cache"))
        assert jax.config.jax_compilation_cache_dir == prev_dir
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_enable_compilation_cache", prev_enabled)


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
