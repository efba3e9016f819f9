"""Spatially-sharded (sp) TRAINING over a 2-D (data, spatial) mesh.

`--spatial K` shards the image HEIGHT over K devices per batch shard;
GSPMD partitions every conv spatially and inserts the halo exchanges
(the same mechanism tests/test_spatial.py pins for inference). The
reference has no equivalent — its only training parallelism is
single-process ``nn.DataParallel`` over the batch (reference
train.py:106). These tests assert the sharding is an implementation
detail: the 2-D-mesh train step must reproduce the single-device step
on the same global batch.

Tolerances: dp-only reorders the batch sum (a handful of terms);
sp also reorders each image's H reduction (thousands of terms per
bias gradient), so params get atol=1e-6 instead of the dp test's 1e-7
— the measured worst case is ~6e-7 on near-zero bias grads.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from torch_ekpose_tpu.models import get_model, init_model
from torch_ekpose_tpu.parallel import (
    field_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from torch_ekpose_tpu.parallel.mesh import DATA_AXIS, SPATIAL_AXIS
from torch_ekpose_tpu.training import (
    create_train_state,
    make_eval_step,
    make_train_step,
)

S = 64            # square size -> 8x8 stride-8 grids
GRID = (8, 8)


@pytest.fixture(scope="module")
def vgg_small():
    return init_model("vgg2016", input_shape=(1, S, S, 3))


@pytest.fixture(scope="module")
def bn_small():
    # mobilenet trains through BatchNorm: the sp step must psum the
    # batch-stats reduction over BOTH mesh axes
    return init_model("mobilenet", input_shape=(1, S, S, 3))


def _batch(n, seed=11, people=3):
    rng = np.random.default_rng(seed)
    images = rng.normal(0, 1, (n, S, S, 3)).astype(np.float32)
    kpts = np.zeros((n, people, 18, 3), dtype=np.float32)
    kpts[:, 0, :, 0] = rng.uniform(10, 54, (n, 18))
    kpts[:, 0, :, 1] = rng.uniform(10, 54, (n, 18))
    kpts[:, 0, :, 2] = 2
    return images, kpts


def _run_step(model, variables, images, kpts, nd, sp, steps=1):
    mesh = make_mesh(nd, spatial=sp)
    state = jax.device_put(
        create_train_state(model, variables, optax.sgd(1e-4)),
        replicated(mesh),
    )
    fields = field_sharding(mesh) if sp > 1 else None
    step = make_train_step(
        model, targets="device", grid=GRID, field_sharding=fields
    )
    specs = (
        None if sp == 1
        else (P(DATA_AXIS, SPATIAL_AXIS), P(DATA_AXIS))
    )
    batch = shard_batch(mesh, (images, kpts), specs)
    for _ in range(steps):
        state, logs = step(state, *batch)
    return (
        float(logs["Loss"]),
        jax.tree.map(np.asarray, state.params),
        jax.tree.map(np.asarray, state.batch_stats),
    )


@pytest.mark.parametrize("nd,sp", [(8, 4), (8, 8)])
def test_spatial_train_step_matches_single_device(vgg_small, nd, sp):
    """dp x sp and pure-sp meshes reproduce the 1-device step: same
    loss, same parameter updates (SGD so any difference is real)."""
    model, variables = vgg_small
    images, kpts = _batch(4)
    loss_1, params_1, _ = _run_step(model, variables, images, kpts, 1, 1)
    loss_n, params_n, _ = _run_step(model, variables, images, kpts, nd, sp)
    np.testing.assert_allclose(loss_n, loss_1, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(params_1), jax.tree.leaves(params_n)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_spatial_train_bn_matches_dp_envelope(bn_small):
    """BatchNorm reduces over (N, H, W), and its GRADIENT amplifies
    last-ulp reduction-order differences through rsqrt(var+eps) — even
    plain dp=2 shifts some mobilenet gradients by ~1e-3 absolute
    (measured; the forward loss still agrees to ~1e-7). The spatial
    partition must not add any error class beyond that: its deviation
    from the 1-device step stays within the dp-only envelope, the
    forward loss matches tightly, and the accumulated batch-stats
    (plain momentum sums, no rsqrt) match to float32 noise."""
    model, variables = bn_small
    images, kpts = _batch(4, seed=3)
    loss_1, params_1, stats_1 = _run_step(
        model, variables, images, kpts, 1, 1, steps=1
    )
    loss_d, params_d, _ = _run_step(
        model, variables, images, kpts, 2, 1, steps=1
    )
    loss_n, params_n, stats_n = _run_step(
        model, variables, images, kpts, 8, 4, steps=1
    )
    np.testing.assert_allclose(loss_n, loss_1, rtol=1e-5)
    assert jax.tree.leaves(stats_1), "fixture model has no batch stats"
    for a, b in zip(jax.tree.leaves(stats_1), jax.tree.leaves(stats_n)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    def max_diff(p, q):
        return max(
            float(np.max(np.abs(a - b)))
            for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(q))
        )

    d_dp = max_diff(params_1, params_d)
    d_sp = max_diff(params_1, params_n)
    assert d_sp <= max(10.0 * d_dp, 1e-6), (d_sp, d_dp)


def test_spatial_eval_step_matches_single_device(vgg_small):
    """The validation pass under the same NHWC field sharding."""
    model, variables = vgg_small
    images, kpts = _batch(4, seed=7)

    def run(nd, sp):
        mesh = make_mesh(nd, spatial=sp)
        state = jax.device_put(
            create_train_state(model, variables, optax.sgd(1e-4)),
            replicated(mesh),
        )
        fields = field_sharding(mesh) if sp > 1 else None
        step = make_eval_step(
            model, targets="device", grid=GRID, field_sharding=fields
        )
        specs = (
            None if sp == 1
            else (P(DATA_AXIS, SPATIAL_AXIS), P(DATA_AXIS))
        )
        batch = shard_batch(mesh, (images, kpts), specs)
        return float(step(state, *batch)["Loss"])

    np.testing.assert_allclose(run(8, 4), run(1, 1), rtol=1e-5)


def test_spatial_zero1_compose(vgg_small):
    """--spatial + --zero1 compose: moments shard over the FULL 2-D
    mesh (1/8 per device on the 2x4 mesh) and params still match the
    replicated-optimizer dp step."""
    from torch_ekpose_tpu.parallel import place_tree, zero1_sharding_tree
    from torch_ekpose_tpu.training import make_optimizer

    model, variables = vgg_small
    images, kpts = _batch(4, seed=5)

    def run(zero1):
        mesh = make_mesh(8, spatial=4)
        st = create_train_state(
            model, variables, make_optimizer(1e-4, 5e-4)
        )
        shardings = jax.tree.map(lambda _: replicated(mesh), st)
        opt_sh = (
            zero1_sharding_tree(mesh, st.opt_state) if zero1 else None
        )
        if zero1:
            shardings = shardings.replace(opt_state=opt_sh)
        st = place_tree(mesh, st, shardings)
        step = make_train_step(
            model, targets="device", grid=GRID,
            opt_sharding=opt_sh, field_sharding=field_sharding(mesh),
        )
        batch = shard_batch(
            mesh, (images, kpts),
            (P(DATA_AXIS, SPATIAL_AXIS), P(DATA_AXIS)),
        )
        st, logs = step(st, *batch)
        return float(logs["Loss"]), st

    loss_r, st_r = run(False)
    loss_z, st_z = run(True)
    np.testing.assert_allclose(loss_z, loss_r, rtol=1e-6)
    for a, b in zip(
        jax.tree.leaves(jax.tree.map(np.asarray, st_r.params)),
        jax.tree.leaves(jax.tree.map(np.asarray, st_z.params)),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
    sharded = [
        leaf for leaf in jax.tree.leaves(st_z.opt_state)
        if hasattr(leaf, "sharding")
        and any(s is not None for s in getattr(leaf.sharding, "spec", ()))
    ]
    assert sharded, "zero1: no optimizer leaf is sharded on the 2-D mesh"
    big = max(sharded, key=lambda leaf: leaf.size)
    assert (
        np.prod(big.addressable_shards[0].data.shape) == big.size // 8
    ), (big.shape, big.addressable_shards[0].data.shape)


def test_trainer_spatial_fit_smoke(tmp_path, vgg_small):
    """Trainer(spatial=4) runs an epoch end-to-end on the 2-D mesh and
    its first-epoch train loss matches the 1-D-mesh trainer on the
    same (deterministic) loader items."""
    from torch_ekpose_tpu.config import get_default_config
    from torch_ekpose_tpu.training import Trainer

    model, variables = vgg_small
    images, kpts = _batch(4, seed=13)
    loader = [(images[:2], kpts[:2]), (images[2:], kpts[2:])]

    def fit(spatial):
        cfg = get_default_config()
        cfg.TRAIN.square_size = S
        # both meshes keep a 2-way data axis (the loader serves batch-2
        # items): 8 devices as 2x4 (dp x sp) vs the plain dp=2 mesh
        trainer = Trainer(
            "vgg2016", config=cfg, variables=variables,
            out_dir=str(tmp_path / f"ckpt{spatial}"),
            log_dir=str(tmp_path / f"logs{spatial}"),
            targets="device", num_devices=8 if spatial > 1 else 2,
            spatial=spatial,
        )
        trainer.fit(loader, loader, epochs=1, save_epoch=0)
        return trainer.train_curve["train"][0]

    np.testing.assert_allclose(fit(4), fit(1), rtol=1e-4)
