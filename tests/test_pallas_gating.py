"""Pallas gating: programs built with pallas disabled must carry NO
Pallas custom calls, even when the default backend claims to be a TPU.

The regression this pins: a process that initializes the TPU backend
and then builds decode programs for CPU devices (entry() followed by
dryrun_multichip, or a virtual CPU mesh next to a live TPU) used to
crash with "Only interpret mode is supported on CPU backend" — the
kernels gated on ``jax.default_backend()``, which reports the default
platform, not the platform the program actually lowers for. The fix
threads ``use_pallas_loops`` through every kernel choice
(decode/device.py) and gates the mesh estimators on their devices'
platform (parallel/inference.py, parallel/spatial.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torch_ekpose_tpu.config import get_default_config
from torch_ekpose_tpu.decode import device as decode_device


@pytest.fixture
def fake_tpu_backend(monkeypatch):
    """Make jax.default_backend() lie — the mixed-state scenario where a
    TPU backend was initialized but this program lowers for CPU."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")


def _toy_maps(b=None):
    rng = np.random.default_rng(0)
    shape = (24, 24, 19) if b is None else (b, 24, 24, 19)
    heat = rng.uniform(0, 1, shape).astype(np.float32)
    paf = rng.uniform(-1, 1, shape[:-1] + (38,)).astype(np.float32)
    return jnp.asarray(heat), jnp.asarray(paf)


def test_disabled_pallas_lowers_for_cpu_under_tpu_backend(
    fake_tpu_backend,
):
    """pallas=False decoders must lower (and run) on CPU even while the
    default backend claims tpu — no Pallas custom call anywhere."""
    cfg = get_default_config()
    heat, paf = _toy_maps(b=2)
    dec = decode_device.build_packed_decoder(
        cfg, batched=True, pallas=False
    )
    packed = jax.device_get(dec(heat, paf))
    assert packed.shape[0] == 2

    heat1, paf1 = _toy_maps()
    dec1 = decode_device.build_packed_decoder(cfg, pallas=False)
    packed1 = jax.device_get(dec1(heat1, paf1))
    assert packed1.ndim == 1


def test_enabled_pallas_fails_fast_for_cpu_under_tpu_backend(
    fake_tpu_backend,
):
    """The converse guard: with pallas REQUESTED under the lying
    backend, CPU lowering raises (rather than silently producing a
    different program) — proving the gate actually switched kernels in
    the test above."""
    cfg = get_default_config()
    heat, paf = _toy_maps(b=2)
    dec = decode_device.build_packed_decoder(
        cfg, batched=True, pallas=True
    )
    with pytest.raises(Exception, match="interpret|Pallas|pallas|custom"):
        jax.block_until_ready(dec(heat, paf))


def test_sharded_estimator_gates_on_mesh_platform(fake_tpu_backend):
    """ShardedPoseEstimator on a CPU mesh must disable Pallas even on a
    size-1 mesh while the default backend claims tpu."""
    from torch_ekpose_tpu.models import init_model
    from torch_ekpose_tpu.parallel import ShardedPoseEstimator, make_mesh

    model, variables = init_model(
        "mobilenet_thin", input_shape=(1, 64, 64, 3)
    )
    est = ShardedPoseEstimator(
        model, variables,
        mesh=make_mesh(1, devices=jax.devices("cpu")[:1]),
        dest_size=64,
    )
    images = np.zeros((1, 64, 64, 3), dtype=np.uint8)
    humans = est.estimate_batch(images)
    assert len(humans) == 1
