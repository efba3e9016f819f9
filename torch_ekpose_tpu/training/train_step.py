"""Data-parallel training step over a device mesh.

Equivalent of the reference's hot loop body (reference train.py:360-382:
``.cuda()`` transfers, DataParallel forward, get_loss, backward, step) as a
single jitted XLA program: batches arrive sharded over the mesh's ``data``
axis, parameters are replicated, and XLA inserts the gradient all-reduce.
With ``targets="device"`` the heatmap/PAF rasterization itself
(:func:`~torch_ekpose_tpu.data.targets.gen_targets_jax`) runs inside the
same program, eliminating the reference's CPU-side target loop
(reference datasets.py:231-283).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from torch_ekpose_tpu import constants
from torch_ekpose_tpu.data.targets import gen_targets_jax
from torch_ekpose_tpu.training.loss import cpm_loss

__all__ = ["TrainState", "create_train_state", "make_optimizer",
           "make_train_step", "make_eval_step"]


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any            # empty dict for BN-free models
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=(
                new_batch_stats if new_batch_stats is not None
                else self.batch_stats
            ),
            opt_state=new_opt_state,
        )


def make_optimizer(
    lr: float,
    weight_decay: float,
    freeze_backbone: bool = False,
) -> optax.GradientTransformation:
    """torch ``Adam(lr, weight_decay)`` semantics — L2 added to the
    gradient before the Adam moments (reference train.py:177-181) — via
    add_decayed_weights + adam. The learning rate is exposed through
    ``inject_hyperparams`` so the plateau scheduler can change it in the
    optimizer state without recompiling.

    ``freeze_backbone`` zeroes updates for the ``model0`` subtree — the
    reference's warmup trains a separate optimizer over non-backbone
    params (reference train.py:130-166).
    """
    def base(learning_rate):
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.adam(learning_rate),
        )

    tx = optax.inject_hyperparams(base)(learning_rate=lr)
    if freeze_backbone:
        def label(params):
            return {
                k: ("frozen" if k == "model0" else "train")
                for k in params
            }

        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, label
        )
    return tx


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Write a new learning rate into the optimizer state."""
    opt_state = state.opt_state
    if isinstance(opt_state, optax.MultiTransformState):
        inner = dict(opt_state.inner_states)
        hs = inner["train"].inner_state
        hs = hs._replace(hyperparams={**hs.hyperparams,
                                      "learning_rate": jnp.asarray(lr)})
        inner["train"] = inner["train"]._replace(inner_state=hs)
        opt_state = opt_state._replace(inner_states=inner)
    else:
        opt_state = opt_state._replace(
            hyperparams={**opt_state.hyperparams,
                         "learning_rate": jnp.asarray(lr)}
        )
    return state.replace(opt_state=opt_state)


def create_train_state(
    model, variables: Dict, tx: optax.GradientTransformation
) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.asarray(0),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        tx=tx,
    )


def make_train_step(
    model,
    *,
    targets: str = "host",
    grid: Optional[Tuple[int, int]] = None,
    stride: int = constants.DOWNSAMPLE,
    sigma: float = constants.TARGET_SIGMA,
    grad_accum: int = 1,
    opt_sharding=None,
    field_sharding=None,
):
    """Build the jitted train step.

    ``targets="host"``: step(state, images, heatmaps, pafs).
    ``targets="device"``: step(state, images, keypoints) — targets are
    rasterized on device; ``grid`` must be the static (gy, gx).
    ``grad_accum=N``: the batch is split into N micro-batches processed
    by a ``lax.scan`` with gradients averaged before ONE optimizer update
    — how the reference's batch-128 recipe (train.py:106, 4 GPUs) fits a
    small chip count; loss/gradient math is identical because the
    reference's loss is a per-sample mean (train.py:311-339).
    ``opt_sharding``: a pytree of shardings matching ``state.opt_state``
    (:func:`~torch_ekpose_tpu.parallel.mesh.zero1_sharding_tree`). The
    updated optimizer state is pinned to it, which keeps XLA's sharding
    propagation from "helpfully" all-gathering the moments back to
    replicated and losing ZeRO-1's memory win.
    ``field_sharding``: a :class:`NamedSharding` for the NHWC field
    tensors (images + targets). Spatial training passes
    ``parallel.mesh.field_sharding(mesh)`` — batch over ``data``, image
    HEIGHT over ``spatial`` — and GSPMD partitions every conv spatially,
    inserting the halo exchanges over ICI; the constraint keeps
    device-generated targets (which arrive batch-sharded from the
    keypoint tensors) from pulling the whole loss onto one H shard.
    """
    if targets in ("device", "raw") and grid is None:
        raise ValueError(f"targets={targets!r} requires grid=(gy, gx)")

    def constrain_fields(*fields):
        if field_sharding is None:
            return fields
        return tuple(
            jax.lax.with_sharding_constraint(x, field_sharding)
            for x in fields
        )

    def constrain(state):
        if opt_sharding is None:
            return state
        return state.replace(opt_state=jax.tree.map(
            jax.lax.with_sharding_constraint, state.opt_state, opt_sharding
        ))

    def loss_fn(params, batch_stats, images, heat_t, paf_t):
        variables = {"params": params}
        mutable = []
        if batch_stats:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        if mutable:
            ((_, saved), updated) = model.apply(
                variables, images, train=True, mutable=mutable
            )
            new_stats = updated["batch_stats"]
        else:
            (_, saved) = model.apply(variables, images, train=True)
            new_stats = batch_stats
        total, logs = cpm_loss(saved, heat_t, paf_t)
        return total, (logs, new_stats)

    def compute(state, images, heat_t, paf_t):
        (loss, (logs, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, images, heat_t, paf_t)
        new_state = constrain(
            state.apply_gradients(grads, new_batch_stats=new_stats)
        )
        logs["Loss"] = loss
        return new_state, logs

    def compute_accum(state, images, heat_t, paf_t):
        n = grad_accum

        def split(x):
            return x.reshape((n, x.shape[0] // n) + x.shape[1:])

        def body(carry, mb):
            stats, grad_sum, loss_sum = carry
            mb_im, mb_ht, mb_paf = mb
            (loss, (logs, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, stats, mb_im, mb_ht, mb_paf)
            grad_sum = jax.tree.map(jnp.add, grad_sum, grads)
            return (new_stats, grad_sum, loss_sum + loss), logs

        init = (
            state.batch_stats,
            jax.tree.map(jnp.zeros_like, state.params),
            jnp.asarray(0.0, jnp.float32),
        )
        (new_stats, grad_sum, loss_sum), logs_stack = jax.lax.scan(
            body, init, (split(images), split(heat_t), split(paf_t))
        )
        grads = jax.tree.map(lambda g: g / n, grad_sum)
        new_state = constrain(
            state.apply_gradients(grads, new_batch_stats=new_stats)
        )
        # reduce the stacked per-micro-batch series like the reference's
        # per-iteration logs would: sums add, extrema take max/min
        logs = {}
        for key, vals in logs_stack.items():
            if key.startswith("max"):
                logs[key] = jnp.max(vals)
            elif key.startswith("min"):
                logs[key] = jnp.min(vals)
            else:
                logs[key] = jnp.sum(vals)
        logs["Loss"] = loss_sum / n
        return new_state, logs

    @jax.jit
    def step(state, images, heatmaps, pafs):
        images, heatmaps, pafs = constrain_fields(images, heatmaps, pafs)
        if grad_accum > 1:
            return compute_accum(state, images, heatmaps, pafs)
        return compute(state, images, heatmaps, pafs)

    if targets == "host":
        return step

    gy, gx = grid
    # Target rasterization is its own (trivially fast) executable chained
    # on device: fusing it into the fwd+bwd program sends XLA's
    # optimization passes on the merged graph into the multi-minute range
    # at full resolution, for no runtime benefit.
    target_fn = jax.jit(jax.vmap(
        functools.partial(
            gen_targets_jax, grid_y=gy, grid_x=gx, stride=stride, sigma=sigma
        )
    ))

    def step_device(state, images, keypoints):
        heatmaps, pafs = target_fn(keypoints)
        return step(state, images, heatmaps, pafs)

    if targets == "device":
        return step_device

    if targets != "raw":
        raise ValueError(f"unknown targets mode {targets!r}")

    # targets="raw": step(state, canvases_u8, valid_hw, keypoints, key).
    # The ENTIRE augmentation chain (flip/rescale/crop/pad + color
    # jitter + normalize — data/device_aug.py) runs on device from
    # decode-only host items, then chains into the device target
    # rasterizer and the fwd+bwd step. Host cost per image: one decode
    # (or one memcpy from data/raw_cache.py).
    from torch_ekpose_tpu.data.device_aug import augment_batch

    out_size = gy * stride

    def step_raw(state, canvases_u8, valid_hw, keypoints, key):
        images, kpts = augment_batch(
            canvases_u8, valid_hw, keypoints, key, out_size=out_size
        )
        return step_device(state, images, kpts)

    return step_raw


def make_eval_step(
    model,
    *,
    targets: str = "host",
    grid: Optional[Tuple[int, int]] = None,
    stride: int = constants.DOWNSAMPLE,
    sigma: float = constants.TARGET_SIGMA,
    field_sharding=None,
):
    """Validation loss step (reference train.py:395-430, no backward).

    ``field_sharding``: as in :func:`make_train_step` — spatial
    training's validation pass runs under the same NHWC sharding.
    """

    def compute(state, images, heat_t, paf_t):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        (_, saved) = model.apply(variables, images, train=False)
        total, logs = cpm_loss(saved, heat_t, paf_t)
        logs["Loss"] = total
        return logs

    @jax.jit
    def step(state, images, heatmaps, pafs):
        if field_sharding is not None:
            images, heatmaps, pafs = (
                jax.lax.with_sharding_constraint(x, field_sharding)
                for x in (images, heatmaps, pafs)
            )
        return compute(state, images, heatmaps, pafs)

    if targets == "host":
        return step

    gy, gx = grid
    target_fn = jax.jit(jax.vmap(
        functools.partial(
            gen_targets_jax, grid_y=gy, grid_x=gx, stride=stride, sigma=sigma
        )
    ))

    def step_device(state, images, keypoints):
        heatmaps, pafs = target_fn(keypoints)
        return step(state, images, heatmaps, pafs)

    return step_device
