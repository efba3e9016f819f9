"""Training subsystem tests on the 8-virtual-device CPU mesh: loss
semantics, data-parallel train step (host + device targets), LR plateau,
frozen backbone, and full checkpoint resume."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torch_ekpose_tpu.config import Config
from torch_ekpose_tpu.models import get_model, init_model
from torch_ekpose_tpu.parallel import make_mesh, replicated, shard_batch
from torch_ekpose_tpu.training import (
    ReduceLROnPlateau,
    cpm_loss,
    create_train_state,
    loss_series_names,
    make_eval_step,
    make_optimizer,
    make_train_step,
    set_learning_rate,
)

S = 64            # square size -> 8x8 maps
GRID = (8, 8)


@pytest.fixture(scope="module")
def small_model():
    model = get_model("vgg2016")
    _, variables = init_model("vgg2016", input_shape=(1, S, S, 3))
    return model, variables


def test_loss_matches_reference_semantics(rng):
    saved = [
        jnp.asarray(rng.normal(0, 1, (2, 8, 8, 38 if i % 2 == 0 else 19))
                    .astype(np.float32))
        for i in range(12)
    ]
    heat_t = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 19)).astype(np.float32))
    paf_t = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 38)).astype(np.float32))
    total, logs = cpm_loss(saved, heat_t, paf_t)
    manual = sum(
        np.sum((np.asarray(saved[2 * j]) - np.asarray(paf_t)) ** 2)
        + np.sum((np.asarray(saved[2 * j + 1]) - np.asarray(heat_t)) ** 2)
        for j in range(6)
    ) / 2.0
    np.testing.assert_allclose(float(total), manual, rtol=1e-5)
    assert set(loss_series_names()).issubset(logs)
    assert float(logs["max_ht"]) == np.max(np.asarray(saved[-1])[..., :-1])


def test_train_step_decreases_loss_data_parallel(small_model):
    model, variables = small_model
    mesh = make_mesh(4)
    tx = make_optimizer(1e-4, 5e-4)
    state = jax.device_put(
        create_train_state(model, variables, tx), replicated(mesh)
    )
    step = make_train_step(model, targets="device", grid=GRID)

    rng = np.random.default_rng(0)
    images = rng.normal(0, 1, (4, S, S, 3)).astype(np.float32)
    kpts = np.zeros((4, 4, 18, 3), dtype=np.float32)
    kpts[:, 0, :, 0] = rng.uniform(10, 54, (4, 18))
    kpts[:, 0, :, 1] = rng.uniform(10, 54, (4, 18))
    kpts[:, 0, :, 2] = 2
    batch = shard_batch(mesh, (images, kpts))

    losses = []
    for _ in range(2):
        state, logs = step(state, *batch)
        losses.append(float(logs["Loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 2


def test_eval_step_runs_and_matches_loss_scale(small_model):
    model, variables = small_model
    mesh = make_mesh(8)
    tx = make_optimizer(1e-4, 5e-4)
    state = jax.device_put(
        create_train_state(model, variables, tx), replicated(mesh)
    )
    estep = make_eval_step(model, targets="device", grid=GRID)
    rng = np.random.default_rng(1)
    images = rng.normal(0, 1, (8, S, S, 3)).astype(np.float32)
    kpts = np.zeros((8, 2, 18, 3), dtype=np.float32)
    batch = shard_batch(mesh, (images, kpts))
    logs = estep(state, *batch)
    assert np.isfinite(float(logs["Loss"]))


def test_frozen_backbone_keeps_model0(small_model):
    model, variables = small_model
    tx = make_optimizer(1e-2, 0.0, freeze_backbone=True)
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, targets="host")
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(0, 1, (2, S, S, 3)).astype(np.float32))
    heat = jnp.zeros((2, 8, 8, 19), jnp.float32)
    pafs = jnp.zeros((2, 8, 8, 38), jnp.float32)
    before = jax.tree.map(np.asarray, state.params)
    state, _ = step(state, images, heat, pafs)
    after = jax.tree.map(np.asarray, state.params)
    # backbone frozen
    b0, a0 = before["model0"], after["model0"]
    for pb, pa in zip(jax.tree.leaves(b0), jax.tree.leaves(a0)):
        np.testing.assert_array_equal(pb, pa)
    # head trained
    changed = any(
        not np.array_equal(pb, pa)
        for pb, pa in zip(
            jax.tree.leaves(before["head"]), jax.tree.leaves(after["head"])
        )
    )
    assert changed


def test_set_learning_rate_changes_updates(small_model):
    model, variables = small_model
    tx = make_optimizer(1e-3, 0.0)
    state = create_train_state(model, variables, tx)
    state = set_learning_rate(state, 0.0)
    step = make_train_step(model, targets="host")
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(0, 1, (2, S, S, 3)).astype(np.float32))
    heat = jnp.ones((2, 8, 8, 19), jnp.float32)
    pafs = jnp.ones((2, 8, 8, 38), jnp.float32)
    before = jax.tree.leaves(jax.tree.map(np.asarray, state.params))
    state, _ = step(state, images, heat, pafs)
    after = jax.tree.leaves(jax.tree.map(np.asarray, state.params))
    for pb, pa in zip(before, after):
        np.testing.assert_array_equal(pb, pa)


def test_plateau_schedule():
    sched = ReduceLROnPlateau(1.0, factor=0.5, patience=1)
    assert sched.step(10.0) == 1.0      # first value becomes best
    assert sched.step(11.0) == 1.0      # 1 bad epoch (<= patience)
    assert sched.step(11.0) == 0.5      # 2nd bad epoch -> reduce
    assert sched.step(5.0) == 0.5       # improvement resets


def test_trainer_fit_and_resume(tmp_path, small_model):
    from torch_ekpose_tpu.training import Trainer

    cfg = Config()
    cfg.TRAIN.square_size = S
    cfg.TRAIN.lr = 1e-4
    cfg.TRAIN.seed = 0

    rng = np.random.default_rng(0)
    images = rng.normal(0, 1, (4, S, S, 3)).astype(np.float32)
    kpts = np.zeros((4, 2, 18, 3), dtype=np.float32)
    batches = [(images[:2], kpts[:2]), (images[2:], kpts[2:])]

    trainer = Trainer(
        "vgg2016", config=cfg, out_dir=str(tmp_path), log_dir=str(tmp_path),
        targets="device", num_devices=2,
    )
    trainer.fit(batches, batches, epochs=2, save_epoch=1, verbose=False)
    assert (tmp_path / "epoch_0.ckpt").exists()
    assert (tmp_path / "epoch_1.ckpt").exists()
    step_after = int(trainer.state.step)
    assert step_after == 4  # 2 epochs x 2 batches

    trainer2 = Trainer(
        "vgg2016", config=cfg, out_dir=str(tmp_path), log_dir=str(tmp_path),
        targets="device", num_devices=2,
    )
    trainer2.restore(str(tmp_path / "epoch_1.ckpt"))
    assert trainer2.epoch == 2
    assert int(trainer2.state.step) == step_after
    p1 = jax.tree.leaves(jax.tree.map(np.asarray, trainer.state.params))
    p2 = jax.tree.leaves(jax.tree.map(np.asarray, trainer2.state.params))
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(a, b)


def test_grad_accum_matches_full_batch(small_model):
    """grad_accum=2 over batch 4 produces (numerically) the same update
    as one full-batch step — the reference's big-batch recipe on fewer
    chips."""
    model, variables = small_model
    rng = np.random.default_rng(7)
    images = jnp.asarray(rng.normal(0, 1, (4, S, S, 3)).astype(np.float32))
    heat = jnp.asarray(rng.random((4, 8, 8, 19)).astype(np.float32))
    pafs = jnp.asarray(rng.normal(0, 0.2, (4, 8, 8, 38)).astype(np.float32))

    def run(accum):
        # SGD: the update is linear in the gradient, so the comparison
        # tests the accumulation math itself (Adam's rsqrt amplifies
        # last-bit gradient differences on near-zero second moments)
        import optax

        tx = optax.sgd(1e-4)
        state = create_train_state(model, variables, tx)
        step = make_train_step(model, targets="host", grad_accum=accum)
        new_state, logs = step(state, images, heat, pafs)
        return new_state, logs

    s1, logs1 = run(1)
    s2, logs2 = run(2)
    np.testing.assert_allclose(
        float(logs1["Loss"]), float(logs2["Loss"]), rtol=2e-5
    )
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
        )
    # the 12 per-stage sums cover the whole batch either way
    for name in loss_series_names():
        np.testing.assert_allclose(
            float(logs1[name]), float(logs2[name]), rtol=2e-4
        )


def test_trainer_preemption_checkpoint(tmp_path, small_model):
    """SIGTERM mid-epoch: the in-flight batch finishes, preempt.ckpt holds
    full resume state pointing at the interrupted epoch, and a fresh
    trainer resumes from it."""
    import os
    import signal

    from torch_ekpose_tpu.training import Trainer

    cfg = Config()
    cfg.TRAIN.square_size = S
    cfg.TRAIN.lr = 1e-4
    cfg.TRAIN.seed = 0

    rng = np.random.default_rng(0)
    images = rng.normal(0, 1, (4, S, S, 3)).astype(np.float32)
    kpts = np.zeros((4, 2, 18, 3), dtype=np.float32)

    trainer = Trainer(
        "vgg2016", config=cfg, out_dir=str(tmp_path), log_dir=str(tmp_path),
        targets="device", num_devices=2,
    )

    class PreemptingLoader:
        """Yields one batch, then delivers SIGTERM before the second."""

        def __iter__(self):
            yield images[:2], kpts[:2]
            os.kill(os.getpid(), signal.SIGTERM)
            yield images[2:], kpts[2:]

    trainer.fit(
        PreemptingLoader(), epochs=3, save_epoch=0, verbose=False
    )
    assert trainer.preempted
    assert int(trainer.state.step) == 1   # second batch never ran
    assert (tmp_path / "preempt.ckpt").exists()
    # the handler was restored, not left pointing at the trainer
    assert signal.getsignal(signal.SIGTERM) is signal.SIG_DFL

    trainer2 = Trainer(
        "vgg2016", config=cfg, out_dir=str(tmp_path), log_dir=str(tmp_path),
        targets="device", num_devices=2,
    )
    trainer2.restore(str(tmp_path / "preempt.ckpt"))
    assert trainer2.epoch == 0            # interrupted epoch re-runs
    assert int(trainer2.state.step) == 1
    p1 = jax.tree.leaves(jax.tree.map(np.asarray, trainer.state.params))
    p2 = jax.tree.leaves(jax.tree.map(np.asarray, trainer2.state.params))
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(a, b)


def test_data_parallel_matches_single_device(small_model):
    """The sharded 8-device train step must produce the same loss and
    (near-)identical parameter updates as a single-device step on the
    same global batch — the SPMD decomposition is an implementation
    detail, not a numerics change."""
    model, variables = small_model
    rng = np.random.default_rng(11)
    images = rng.normal(0, 1, (8, S, S, 3)).astype(np.float32)
    kpts = np.zeros((8, 3, 18, 3), dtype=np.float32)
    kpts[:, 0, :, 0] = rng.uniform(10, 54, (8, 18))
    kpts[:, 0, :, 1] = rng.uniform(10, 54, (8, 18))
    kpts[:, 0, :, 2] = 2

    def run(n_devices):
        import optax

        # SGD: linear in the gradient, so any difference seen is real
        # (Adam's rsqrt amplifies last-ulp reduction-order noise)
        mesh = make_mesh(n_devices)
        state = jax.device_put(
            create_train_state(model, variables, optax.sgd(1e-4)),
            replicated(mesh),
        )
        step = make_train_step(model, targets="device", grid=GRID)
        batch = shard_batch(mesh, (images, kpts))
        state, logs = step(state, *batch)
        return float(logs["Loss"]), jax.tree.map(np.asarray, state.params)

    loss_1, params_1 = run(1)
    loss_8, params_8 = run(8)
    np.testing.assert_allclose(loss_8, loss_1, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(params_1), jax.tree.leaves(params_8)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_bf16_train_step_tracks_fp32(small_model):
    """Mixed-precision training (--dtype bfloat16): bf16 activations,
    fp32 params/moments/loss. The first-step loss must agree with fp32
    to bf16 precision and training must still make progress."""
    model_f32, variables = small_model
    model_bf16 = get_model("vgg2016", dtype=jnp.bfloat16)
    mesh = make_mesh(4)

    rng = np.random.default_rng(1)
    images = rng.normal(0, 1, (4, S, S, 3)).astype(np.float32)
    kpts = np.zeros((4, 4, 18, 3), dtype=np.float32)
    kpts[:, 0, :, 0] = rng.uniform(10, 54, (4, 18))
    kpts[:, 0, :, 1] = rng.uniform(10, 54, (4, 18))
    kpts[:, 0, :, 2] = 2
    batch = shard_batch(mesh, (images, kpts))

    losses = {}
    for name, model in (("f32", model_f32), ("bf16", model_bf16)):
        tx = make_optimizer(1e-4, 5e-4)
        state = jax.device_put(
            create_train_state(model, variables, tx), replicated(mesh)
        )
        step = make_train_step(model, targets="device", grid=GRID)
        series = []
        for _ in range(2):
            state, logs = step(state, *batch)
            series.append(float(logs["Loss"]))
        losses[name] = series
        # params and optimizer moments stay fp32 regardless of dtype
        assert state.params["model0"]["conv_0"]["conv"][
            "kernel"].dtype == jnp.float32
        leaves = jax.tree.leaves(state.opt_state)
        assert all(
            leaf.dtype != jnp.bfloat16 for leaf in leaves
            if hasattr(leaf, "dtype")
        )
    assert losses["bf16"][-1] < losses["bf16"][0]
    rel = abs(losses["bf16"][0] - losses["f32"][0]) / losses["f32"][0]
    assert rel < 0.05, (losses["bf16"][0], losses["f32"][0])


def test_zero1_matches_data_parallel(small_model):
    """ZeRO-1 (sharded Adam moments) is a memory layout, not a numerics
    change: N steps over the 8-device mesh must match the replicated
    data-parallel optimizer, and the big moment leaves must actually be
    sharded (each device holds 1/8th)."""
    from torch_ekpose_tpu.parallel import (
        place_tree, zero1_sharding_tree,
    )

    model, variables = small_model
    mesh = make_mesh(8)
    rng = np.random.default_rng(5)
    images = rng.normal(0, 1, (8, S, S, 3)).astype(np.float32)
    kpts = np.zeros((8, 2, 18, 3), dtype=np.float32)
    kpts[:, 0, :, 0] = rng.uniform(10, 54, (8, 18))
    kpts[:, 0, :, 1] = rng.uniform(10, 54, (8, 18))
    kpts[:, 0, :, 2] = 2
    batch = shard_batch(mesh, (images, kpts))

    def run(zero1):
        tx = make_optimizer(1e-3, 5e-4)
        state = create_train_state(model, variables, tx)
        shardings = jax.tree.map(lambda _: replicated(mesh), state)
        opt_sharding = None
        if zero1:
            opt_sharding = zero1_sharding_tree(mesh, state.opt_state)
            shardings = shardings.replace(opt_state=opt_sharding)
        state = place_tree(mesh, state, shardings)
        step = make_train_step(
            model, targets="device", grid=GRID, opt_sharding=opt_sharding
        )
        for _ in range(3):
            state, logs = step(state, *batch)
        return state, float(logs["Loss"])

    state_dp, loss_dp = run(zero1=False)
    state_z1, loss_z1 = run(zero1=True)

    np.testing.assert_allclose(loss_z1, loss_dp, rtol=1e-5)
    for a, b in zip(
        jax.tree.leaves(jax.tree.map(np.asarray, state_dp.params)),
        jax.tree.leaves(jax.tree.map(np.asarray, state_z1.params)),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)

    # the moments really are distributed: a conv-kernel moment leaf has
    # a mesh axis in its sharding spec and 1/8-sized addressable shards
    sharded = [
        leaf for leaf in jax.tree.leaves(state_z1.opt_state)
        if hasattr(leaf, "sharding")
        and any(s is not None for s in getattr(
            leaf.sharding, "spec", ()))
    ]
    assert sharded, "no optimizer leaf is sharded"
    big = max(sharded, key=lambda leaf: leaf.size)
    shard_shape = big.addressable_shards[0].data.shape
    assert np.prod(shard_shape) == big.size // 8, (big.shape, shard_shape)
    # dp replicates every moment leaf by contrast
    assert all(
        not any(s is not None for s in getattr(leaf.sharding, "spec", ()))
        for leaf in jax.tree.leaves(state_dp.opt_state)
        if hasattr(leaf, "sharding")
    )


def test_zero1_trainer_checkpoint_roundtrip(tmp_path, small_model):
    """A --zero1 trainer saves a FULL (gathered) optimizer state that a
    plain dp trainer can restore, and vice versa — the checkpoint format
    is sharding-agnostic."""
    from torch_ekpose_tpu.training import Trainer

    cfg = Config()
    cfg.TRAIN.square_size = S
    cfg.TRAIN.lr = 1e-4
    cfg.TRAIN.seed = 0

    rng = np.random.default_rng(2)
    images = rng.normal(0, 1, (4, S, S, 3)).astype(np.float32)
    kpts = np.zeros((4, 2, 18, 3), dtype=np.float32)
    batches = [(images[:2], kpts[:2]), (images[2:], kpts[2:])]

    tr_z1 = Trainer(
        "vgg2016", config=cfg, out_dir=str(tmp_path),
        log_dir=str(tmp_path), targets="device", num_devices=2,
        zero1=True,
    )
    tr_z1.fit(batches, batches, epochs=1, save_epoch=1, verbose=False)

    tr_dp = Trainer(
        "vgg2016", config=cfg, out_dir=str(tmp_path),
        log_dir=str(tmp_path), targets="device", num_devices=2,
    )
    tr_dp.restore(str(tmp_path / "epoch_0.ckpt"))
    for a, b in zip(
        jax.tree.leaves(jax.tree.map(np.asarray, tr_z1.state.opt_state)),
        jax.tree.leaves(jax.tree.map(np.asarray, tr_dp.state.opt_state)),
    ):
        np.testing.assert_array_equal(a, b)

    # and back: a zero1 trainer restores the dp-written layout too
    tr_dp.save(str(tmp_path / "dp.ckpt"))
    tr_z1b = Trainer(
        "vgg2016", config=cfg, out_dir=str(tmp_path),
        log_dir=str(tmp_path), targets="device", num_devices=2,
        zero1=True,
    )
    tr_z1b.restore(str(tmp_path / "dp.ckpt"))
    for a, b in zip(
        jax.tree.leaves(jax.tree.map(np.asarray, tr_z1b.state.params)),
        jax.tree.leaves(jax.tree.map(np.asarray, tr_dp.state.params)),
    ):
        np.testing.assert_array_equal(a, b)
