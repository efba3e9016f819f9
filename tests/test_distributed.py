"""Multi-host data parallelism: two coordinated processes forming one
global mesh must reproduce single-process numerics exactly.

Each subprocess hosts 2 virtual CPU devices; jax's coordination service
joins them into a 4-device global mesh. The same global batch is fed
half-per-process through ``shard_batch`` and one SGD train step runs;
both processes' losses must equal each other AND the single-process
4-device result computed in this parent process.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

S = 64
_WORKER = r"""
import json, os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["EKPOSE_REPO"])
from torch_ekpose_tpu.parallel import init_distributed
init_distributed(f"localhost:{port}", num_processes=2, process_id=pid)

import numpy as np
import optax
from torch_ekpose_tpu.models import init_model
from torch_ekpose_tpu.parallel import make_mesh, place_replicated, shard_batch
from torch_ekpose_tpu.training import create_train_state, make_train_step

S = 64
model, variables = init_model("vgg2016", input_shape=(1, S, S, 3))
mesh = make_mesh()
assert mesh.size == 4, mesh.size
state = place_replicated(mesh, create_train_state(model, variables, optax.sgd(1e-4)))
step = make_train_step(model, targets="device", grid=(8, 8))

rng = np.random.default_rng(3)
images = rng.normal(0, 1, (4, S, S, 3)).astype(np.float32)
kpts = np.zeros((4, 2, 18, 3), dtype=np.float32)
kpts[:, 0, :, 0] = rng.uniform(10, 54, (4, 18))
kpts[:, 0, :, 1] = rng.uniform(10, 54, (4, 18))
kpts[:, 0, :, 2] = 2
# each process feeds ITS half of the global batch
lo, hi = pid * 2, pid * 2 + 2
batch = shard_batch(mesh, (images[lo:hi], kpts[lo:hi]))
state, logs = step(state, *batch)
leaf = np.asarray(jax.tree.leaves(state.params)[0]).ravel()[:4]
print("RESULT " + json.dumps({
    "pid": pid, "loss": float(logs["Loss"]), "leaf": leaf.tolist(),
}), flush=True)
"""


@pytest.mark.skipif(os.name != "posix", reason="posix only")
def test_two_process_data_parallel_matches_single(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    # SO_REUSEADDR narrows the bind/close -> coordinator-bind race
    # window; a stolen port would fail initialize() and the assert below
    # reports it rather than hanging (workers have a 600 s cap)
    with socket.socket() as s:
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
            env={
                **os.environ,
                "EKPOSE_REPO": os.path.dirname(
                    os.path.dirname(os.path.abspath(__file__))
                ),
            },
        )
        for pid in range(2)
    ]
    results = {}
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out[-3000:]
        for line in out.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r["pid"]] = r
    assert set(results) == {0, 1}, results

    # single-process reference on a 4-device mesh, same global batch
    import optax

    from torch_ekpose_tpu.models import init_model
    from torch_ekpose_tpu.parallel import (
        make_mesh,
        place_replicated,
        shard_batch,
    )
    from torch_ekpose_tpu.training import create_train_state, make_train_step

    model, variables = init_model("vgg2016", input_shape=(1, S, S, 3))
    mesh = make_mesh(4)
    state = place_replicated(
        mesh, create_train_state(model, variables, optax.sgd(1e-4))
    )
    step = make_train_step(model, targets="device", grid=(8, 8))
    rng = np.random.default_rng(3)
    images = rng.normal(0, 1, (4, S, S, 3)).astype(np.float32)
    kpts = np.zeros((4, 2, 18, 3), dtype=np.float32)
    kpts[:, 0, :, 0] = rng.uniform(10, 54, (4, 18))
    kpts[:, 0, :, 1] = rng.uniform(10, 54, (4, 18))
    kpts[:, 0, :, 2] = 2
    state, logs = step(state, *shard_batch(mesh, (images, kpts)))
    want_loss = float(logs["Loss"])
    want_leaf = np.asarray(jax.tree.leaves(state.params)[0]).ravel()[:4]

    np.testing.assert_allclose(results[0]["loss"], results[1]["loss"])
    np.testing.assert_allclose(results[0]["loss"], want_loss, rtol=1e-5)
    np.testing.assert_allclose(
        results[0]["leaf"], want_leaf, rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(results[0]["leaf"], results[1]["leaf"])
