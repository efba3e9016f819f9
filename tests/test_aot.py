"""AOT deployment artifacts (runtime/aot.py): export -> load -> serve
must reproduce the live estimator exactly, without model-building code.
"""

import json
import zipfile

import numpy as np
import pytest

from torch_ekpose_tpu.models import init_model
from torch_ekpose_tpu.runtime.aot import (
    AotPipeline,
    export_pipeline,
    load_pipeline,
)
from torch_ekpose_tpu.runtime.estimator import PoseEstimator

MODEL = "shufflenetV2_0.5x"  # smallest family member: fast init/trace


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    import jax.numpy as jnp

    _, variables = init_model(MODEL, input_shape=(1, 64, 64, 3))
    est = PoseEstimator(
        model_name=MODEL, variables=variables, compute_dtype=jnp.float32,
        dest_size=64,
    )
    path = tmp_path_factory.mktemp("aot") / "pose.ekx"
    meta = export_pipeline(est, str(path), batch=2, height=64, width=64)
    return est, str(path), meta


def _frames(batch=2, h=64, w=64, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (batch, h, w, 3)).astype(np.uint8)


def test_artifact_contents(artifact):
    _, path, meta = artifact
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
        assert names == {
            "meta.json", "variables.msgpack", "forward.bin", "decode.bin",
        }
        stored = json.loads(zf.read("meta.json"))
    assert stored == meta
    assert meta["model"] == MODEL
    assert meta["batch"] == 2
    assert meta["platform"] == "cpu"


def test_roundtrip_matches_live_estimator(artifact):
    est, path, _ = artifact
    pipe = load_pipeline(path)
    assert isinstance(pipe, AotPipeline)
    images = _frames()

    packed_aot = np.asarray(pipe.packed(images))
    handle = est.estimate_batch_async(images)
    packed_live = np.asarray(handle[0])
    np.testing.assert_array_equal(packed_aot, packed_live)

    humans_aot = pipe.estimate_batch(images)
    humans_live = est.collect_batch(
        (handle[0], *images.shape[:3])
    )
    assert repr(humans_aot) == repr(humans_live)


def test_rejects_wrong_shape(artifact):
    _, path, _ = artifact
    pipe = load_pipeline(path)
    with pytest.raises(ValueError, match="expects input"):
        pipe.packed(_frames(batch=1))
    with pytest.raises(ValueError, match="expects input"):
        pipe.packed(_frames(h=72))


def test_rejects_wrong_platform(artifact, tmp_path):
    _, path, _ = artifact
    tampered = tmp_path / "tpu.ekx"
    with zipfile.ZipFile(path) as src, \
            zipfile.ZipFile(tampered, "w") as dst:
        for name in src.namelist():
            data = src.read(name)
            if name == "meta.json":
                meta = json.loads(data)
                meta["platform"] = "tpu"
                data = json.dumps(meta)
            dst.writestr(name, data)
    with pytest.raises(ValueError, match="platform|exported for"):
        load_pipeline(str(tampered))


def test_rejects_future_format(artifact, tmp_path):
    _, path, _ = artifact
    tampered = tmp_path / "future.ekx"
    with zipfile.ZipFile(path) as src, \
            zipfile.ZipFile(tampered, "w") as dst:
        for name in src.namelist():
            data = src.read(name)
            if name == "meta.json":
                meta = json.loads(data)
                meta["format_version"] = 999
                data = json.dumps(meta)
            dst.writestr(name, data)
    with pytest.raises(ValueError, match="format"):
        load_pipeline(str(tampered))


def test_rejects_unpadded_size():
    import jax.numpy as jnp

    _, variables = init_model(MODEL, input_shape=(1, 64, 64, 3))
    est = PoseEstimator(
        model_name=MODEL, variables=variables, compute_dtype=jnp.float32,
    )
    with pytest.raises(ValueError, match="stride"):
        export_pipeline(est, "/tmp/nope.ekx", batch=1, height=65, width=64)


def test_serving_adapter(artifact):
    """AotServingAdapter: letterbox + partial batch + estimate()."""
    from torch_ekpose_tpu.runtime.aot import AotServingAdapter

    _, path, _ = artifact
    adapter = AotServingAdapter(load_pipeline(path))

    # non-artifact-shaped frame letterboxes into the 64x64 frame
    frame = _frames(batch=1, h=48, w=96)[0]
    im_pad, scale = adapter.pad_image(frame)
    assert im_pad.shape == (64, 64, 3)
    assert scale == pytest.approx(64 / 96)
    # the letterboxed content sits top-left, margin stays zero
    assert im_pad[: int(48 * scale)].any()
    assert not im_pad[int(48 * scale) + 1:].any()

    humans, scale2 = adapter.estimate(frame)
    assert scale2 == scale
    assert isinstance(humans, list)

    # partial batch (1 of 2) round-trips; oversize refuses
    out = adapter.estimate_batch(im_pad[None])
    assert len(out) == 1
    with pytest.raises(ValueError, match="exceeds"):
        adapter.estimate_batch(np.stack([im_pad] * 3))


def test_serve_aot_http(artifact):
    """PoseServer over an AOT artifact: health + one request end to end."""
    import io
    import json
    import urllib.request

    pytest.importorskip("PIL")
    from PIL import Image

    from torch_ekpose_tpu.runtime.aot import AotServingAdapter
    from torch_ekpose_tpu.runtime.server import PoseServer

    _, path, _ = artifact
    adapter = AotServingAdapter(load_pipeline(path))
    srv = PoseServer(
        adapter, port=0, max_batch=adapter.pipeline.batch,
        max_wait_ms=5.0,
    ).start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/healthz", timeout=30
        ) as resp:
            payload = json.loads(resp.read())
        assert payload["status"] == "ok"
        assert "AOT" in payload["model"]

        buf = io.BytesIO()
        Image.fromarray(_frames(batch=1, h=48, w=96)[0]).save(
            buf, format="PNG"
        )
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/pose", data=buf.getvalue(),
            headers={"Content-Type": "application/octet-stream"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            payload = json.loads(resp.read())
        assert "humans" in payload
    finally:
        srv.stop()


def test_cli_export_aot(tmp_path):
    """cli.export --aot end to end from a native msgpack checkpoint."""
    import jax

    from torch_ekpose_tpu.cli.export import main as export_main
    from torch_ekpose_tpu.runtime.checkpoint import save_checkpoint

    _, variables = init_model(MODEL, input_shape=(1, 64, 64, 3))
    ckpt = tmp_path / "m.msgpack"
    save_checkpoint(str(ckpt), jax.tree.map(np.asarray, variables))
    out = tmp_path / "m.ekx"
    export_main([
        "-m", MODEL, "-c", str(ckpt), "-o", str(out), "--aot",
        "--batch", "1", "--input-size", "64x64", "--dtype", "float32",
    ])
    pipe = load_pipeline(str(out))
    humans = pipe.estimate_batch(_frames(batch=1))
    assert len(humans) == 1  # one frame's (possibly empty) person list
