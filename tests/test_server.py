"""HTTP serving layer: health, single request, concurrent micro-batch."""

import json
import threading
import urllib.request

import numpy as np
import pytest


def _post(url, body, content_type="application/octet-stream"):
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": content_type}
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        return json.loads(resp.read())


@pytest.fixture(scope="module")
def server():
    import jax.numpy as jnp

    from torch_ekpose_tpu.runtime import PoseEstimator
    from torch_ekpose_tpu.runtime.server import PoseServer

    est = PoseEstimator(
        "vgg2016", decode_backend="jax", dest_size=64,
        compute_dtype=jnp.float32,
    )
    srv = PoseServer(est, port=0, max_batch=4, max_wait_ms=20.0).start()
    yield srv
    srv.stop()


def _png_bytes(rng):
    from PIL import Image
    import io

    img = rng.integers(0, 255, (48, 64, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def test_healthz(server):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/healthz", timeout=30
    ) as resp:
        payload = json.loads(resp.read())
    assert payload["status"] == "ok"
    assert payload["model"] == "vgg2016"


def test_pose_single(server):
    pytest.importorskip("PIL")
    rng = np.random.default_rng(0)
    payload = _post(
        f"http://127.0.0.1:{server.port}/pose", _png_bytes(rng)
    )
    assert "humans" in payload and "latency_ms" in payload
    for h in payload["humans"]:
        assert set(h) == {"score", "parts"}


def test_pose_concurrent_microbatch(server):
    pytest.importorskip("PIL")
    rng = np.random.default_rng(1)
    bodies = [_png_bytes(rng) for _ in range(4)]
    results = [None] * 4

    def hit(i):
        results[i] = _post(
            f"http://127.0.0.1:{server.port}/pose", bodies[i]
        )

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r is not None and "humans" in r for r in results)


def test_bad_request(server):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/pose", data=b"not an image"
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
