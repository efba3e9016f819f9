"""The training driver (reference train.py main flow, :32-244):
optional frozen-backbone warmup, epoch train/validate loops, plateau LR
scheduling, checkpointing with FULL resume state (params + opt_state +
epoch + scheduler — the reference saves bare weights only and cannot
resume, train.py:207-218), metrics, and the training-curve PNG.
"""

from __future__ import annotations

import os
import signal
import threading
import time
from typing import Dict, Iterable, Optional

import jax
import numpy as np
from flax import serialization

from torch_ekpose_tpu.config import Config, cfg as default_cfg
from torch_ekpose_tpu.models import get_model, init_model
from torch_ekpose_tpu.parallel import (
    field_sharding,
    make_mesh,
    place_tree,
    replicated,
    shard_batch,
    zero1_sharding_tree,
)
from torch_ekpose_tpu.training.metrics import (
    AverageMeter,
    MetricsWriter,
    save_training_curve,
)
from torch_ekpose_tpu.training.schedule import ReduceLROnPlateau
from torch_ekpose_tpu.training.train_step import (
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
    set_learning_rate,
)

__all__ = ["Trainer"]


class _NullMetrics:
    """Metrics sink for non-zero processes of a multi-host run."""

    def add_scalar(self, *a, **k):
        pass

    def add_scalars(self, *a, **k):
        pass

    def flush(self):
        pass


class Trainer:
    def __init__(
        self,
        model_name: str = "vgg2016",
        config: Optional[Config] = None,
        variables: Optional[Dict] = None,
        out_dir: str = "checkpoints",
        log_dir: str = "logs",
        targets: str = "device",
        num_devices: int = 0,
        freeze_backbone: bool = False,
        compute_dtype=None,
        grad_accum: int = 1,
        zero1: bool = False,
        spatial: int = 1,
        remat: bool = False,
    ):
        self.config = config or default_cfg
        tc = self.config.TRAIN
        self.model_name = model_name
        # activations in bfloat16 keep the MXU at full rate; params and the
        # loss stay float32 (cpm_loss upcasts before the squared error)
        import jax.numpy as jnp

        dtype = compute_dtype or jnp.float32
        # remat: backward-pass rematerialization (jax.checkpoint) of the
        # backbone + each CPM branch — exact gradients, activation HBM
        # traded for ~one extra forward; the param tree is unchanged so
        # checkpoints are interchangeable with the non-remat model
        self.model = get_model(model_name, dtype=dtype, remat=remat)
        if variables is None:
            _, variables = init_model(
                model_name,
                rng=jax.random.PRNGKey(tc.seed),
                input_shape=(1, tc.square_size, tc.square_size, 3),
                dtype=dtype,
            )
        # spatial>1: 2-D (data, spatial) mesh — the batch splits over
        # `data` and the image HEIGHT over `spatial` (GSPMD partitions
        # every conv spatially with halo exchanges over ICI). This is
        # how one training step spans more chips than the batch size,
        # or fits a resolution one chip's HBM cannot: dp scales
        # throughput, sp scales the per-example footprint.
        self._spatial = spatial
        if spatial > 1 and jax.process_count() > 1:
            raise NotImplementedError(
                "spatial training is single-controller for now: the "
                "multi-host loader shards per-process batches along the "
                "batch axis only (mesh.shard_batch)"
            )
        self.mesh = make_mesh(num_devices or tc.num_devices,
                              spatial=spatial)
        tx = make_optimizer(
            tc.lr, tc.weight_decay, freeze_backbone=freeze_backbone
        )
        state = create_train_state(self.model, variables, tx)
        # params/stats replicate; with --zero1 the optimizer moments
        # shard across the data axis (ZeRO-1: reduce-scatter grads,
        # sharded Adam, all-gather updates — mesh.zero1_sharding_tree)
        self._state_shardings = jax.tree.map(
            lambda _: replicated(self.mesh), state
        )
        if zero1:
            self._state_shardings = self._state_shardings.replace(
                opt_state=zero1_sharding_tree(self.mesh, state.opt_state)
            )
        self.state = place_tree(self.mesh, state, self._state_shardings)

        grid = (tc.square_size // 8, tc.square_size // 8)
        self.targets = targets
        fields = field_sharding(self.mesh) if spatial > 1 else None
        self.train_step = make_train_step(
            self.model, targets=targets, grid=grid, grad_accum=grad_accum,
            opt_sharding=(
                self._state_shardings.opt_state if zero1 else None
            ),
            field_sharding=fields,
        )
        # raw mode augments TRAINING batches on device; validation never
        # augments, so its loader serves device-mode items (cli/train.py)
        # and the eval step stays the device-targets program
        self.eval_step = make_eval_step(
            self.model,
            targets="device" if targets == "raw" else targets,
            grid=grid,
            field_sharding=fields,
        )
        # per-batch device-augmentation keys: identical on every host of
        # a multi-host run (the batch is globally sharded, per-image keys
        # split inside augment_batch), deterministic across resume via
        # (epoch, batch) folding
        self._aug_base = jax.random.PRNGKey(tc.seed + 0x7261)
        self.scheduler = ReduceLROnPlateau(
            tc.lr, factor=tc.lr_factor, patience=tc.lr_patience
        )
        self.out_dir = out_dir
        # multi-host runs: every process computes identically, but only
        # process 0 owns the filesystem artifacts (metrics, checkpoints,
        # curve PNG)
        self.is_main_process = jax.process_index() == 0
        if self.is_main_process:
            # the training curve PNG lands here after the FIRST epoch,
            # before any checkpoint has created the directory
            os.makedirs(out_dir, exist_ok=True)
        self.metrics = (
            MetricsWriter(log_dir) if self.is_main_process
            else _NullMetrics()
        )
        self.epoch = 0
        self.best_val = float("inf")
        self.train_curve = {"train": [], "val": []}
        self.preempted = False
        self._n_processes = jax.process_count()
        # Multi-host preemption consensus cadence (in batches). The
        # allgather is a blocking collective that enqueues behind every
        # dispatched train step, so running it per batch would stall the
        # pipeline it exists to protect; every host runs it at the same
        # deterministic batch indices instead, and all hosts break at the
        # next agreed boundary together.
        self.preempt_sync_every = 16

    def _batch_specs(self, batch):
        """Per-element PartitionSpecs for :func:`shard_batch`.

        1-D mesh: ``None`` (uniform batch-axis sharding). Spatial mesh:
        NHWC fields split ``(data, spatial)``; keypoint/size tensors
        stay batch-sharded (their H-sharded targets materialize on
        device under the train step's field constraint). Raw-mode
        uint8 canvases stay batch-sharded too — the device augmenter's
        crops move rows across the H axis, so sharding its INPUT
        spatially would only buy resharding traffic.
        """
        if self._spatial <= 1:
            return None
        from jax.sharding import PartitionSpec as P

        from torch_ekpose_tpu.parallel.mesh import DATA_AXIS, SPATIAL_AXIS

        fields = P(DATA_AXIS, SPATIAL_AXIS)
        batch_only = P(DATA_AXIS)
        if self.targets == "host":
            return (fields,) * len(batch)          # images, heat, paf
        if len(batch) == 3:                        # raw: canvas, hw, kpts
            return (batch_only,) * 3
        return (fields, batch_only)                # device: images, kpts

    def _sync_preempted(self) -> bool:
        """Consensus preemption flag. Multi-host processes receive
        SIGTERM at slightly different times; if each stopped at its own
        batch boundary the others would hang in the next collective
        step, so the flag is agreed on (global OR) at every point the
        loop may break. Single-process: just the local flag."""
        if self._n_processes > 1:
            from jax.experimental import multihost_utils

            self.preempted = bool(np.any(
                multihost_utils.process_allgather(
                    np.asarray(self.preempted)
                )
            ))
        return self.preempted

    # -- epoch loops -----------------------------------------------------

    def _run_epoch(self, loader: Iterable, train: bool) -> float:
        data_time = AverageMeter()
        t_loop = time.time()
        end = t_loop
        logs = {}
        # the per-batch loss accumulates ON DEVICE: fetching the scalar
        # each step forces a host sync per batch (a full round trip on
        # remote-device setups) and stalls the dispatch pipeline; one
        # fetch per epoch costs nothing
        loss_sum = None
        n_seen = 0
        n_batches = 0
        for batch in loader:
            # single process: the local flag is free, check every batch.
            # multi-host: only the deterministic cadence points may run
            # the consensus collective (a host-local extra allgather
            # would deadlock the other hosts), so the local flag alone
            # never breaks the loop here.
            if self._n_processes == 1:
                if self.preempted:
                    break
            elif (n_batches % self.preempt_sync_every == 0
                    and self._sync_preempted()):
                break
            data_time.update(time.time() - end)
            batch = shard_batch(
                self.mesh, batch, self._batch_specs(batch)
            )
            if train and self.targets == "raw":
                key = jax.random.fold_in(
                    jax.random.fold_in(self._aug_base, self.epoch),
                    n_batches,
                )
                self.state, logs = self.train_step(self.state, *batch, key)
            elif train:
                self.state, logs = self.train_step(self.state, *batch)
            else:
                logs = self.eval_step(self.state, *batch)
            n = batch[0].shape[0]
            weighted = logs["Loss"] * n
            loss_sum = weighted if loss_sum is None else loss_sum + weighted
            n_seen += n
            n_batches += 1
            end = time.time()
        avg_loss = (
            float(loss_sum) / n_seen if loss_sum is not None else 0.0
        )
        # dispatch is async, so per-batch wall times would measure only
        # the host loop; the honest per-batch figure is the epoch wall —
        # measured AFTER the float() above synchronized — over batches
        batch_time = (time.time() - t_loop) / max(n_batches, 1)
        tag = "train" if train else "val"
        step = self.epoch
        self.metrics.add_scalar(f"Loss/{tag}", avg_loss, step)
        if logs:
            self.metrics.add_scalars(
                {
                    f"{k}/{tag}": float(v)
                    for k, v in logs.items() if k != "Loss"
                },
                step,
            )
        self.metrics.add_scalar(f"BatchTime/{tag}", batch_time, step)
        self.metrics.add_scalar(f"DataTime/{tag}", data_time.avg, step)
        return avg_loss

    def fit(
        self,
        train_loader: Iterable,
        val_loader: Optional[Iterable] = None,
        epochs: Optional[int] = None,
        save_epoch: Optional[int] = None,
        verbose: bool = True,
    ) -> Dict[str, list]:
        tc = self.config.TRAIN
        epochs = epochs if epochs is not None else tc.epochs
        save_epoch = save_epoch if save_epoch is not None else tc.save_epoch

        # Preemption safety (TPU pods are routinely preempted; the
        # reference loses everything since its last periodic save): on
        # SIGTERM/SIGINT finish the in-flight batch, write a
        # full-resume checkpoint, then stop cleanly. Signal handlers can
        # only be installed from the main thread; elsewhere (tests,
        # notebook executors) fit still honors an externally set
        # ``self.preempted``.
        prev_handlers = {}
        if threading.current_thread() is threading.main_thread():
            # counts signals DELIVERED TO THIS PROCESS — deliberately not
            # self.preempted, which the multi-host consensus allgather
            # also sets: a host whose flag came from a peer's signal must
            # treat its own first SIGTERM as the graceful one, not as a
            # force-abort in the middle of writing preempt.ckpt
            signals_seen = [0]

            def _on_signal(signum, frame):
                signals_seen[0] += 1
                if signals_seen[0] > 1:
                    # second LOCAL signal: the user wants out NOW, not at
                    # the next batch boundary — restore the previous
                    # handler and re-deliver so Ctrl-C force-aborts even
                    # inside a hung batch or collective
                    signal.signal(
                        signum, prev_handlers.get(signum, signal.SIG_DFL)
                    )
                    signal.raise_signal(signum)
                    return
                self.preempted = True

            for sig in (signal.SIGTERM, signal.SIGINT):
                prev_handlers[sig] = signal.signal(sig, _on_signal)
        try:
            return self._fit(
                train_loader, val_loader, epochs, save_epoch, verbose
            )
        finally:
            for sig, handler in prev_handlers.items():
                signal.signal(sig, handler)

    def _fit(
        self, train_loader, val_loader, epochs, save_epoch, verbose
    ) -> Dict[str, list]:
        tc = self.config.TRAIN
        start = self.epoch
        for epoch in range(start, epochs):
            self.epoch = epoch
            t0 = time.time()
            if hasattr(train_loader, "dataset") and hasattr(
                train_loader.dataset, "reseed"
            ):
                train_loader.dataset.reseed(tc.seed + epoch)
            train_loss = self._run_epoch(train_loader, train=True)
            if self._sync_preempted():
                # partial epoch: checkpoint everything but mark THIS
                # epoch as the resume point so it is re-run in full
                path = os.path.join(self.out_dir, "preempt.ckpt")
                self.save(path, resume_epoch=epoch)
                if verbose:
                    print(f"preempted: full resume state saved to {path}")
                break
            val_loss = (
                self._run_epoch(val_loader, train=False)
                if val_loader is not None else train_loss
            )
            if self._sync_preempted():
                # preempted during validation: the partial val loss must
                # not reach the scheduler / best-checkpoint logic; the
                # whole epoch re-runs on resume
                path = os.path.join(self.out_dir, "preempt.ckpt")
                self.save(path, resume_epoch=epoch)
                if verbose:
                    print(f"preempted: full resume state saved to {path}")
                break
            self.train_curve["train"].append(train_loss)
            self.train_curve["val"].append(val_loss)

            lr = self.scheduler.step(val_loss)
            self.state = set_learning_rate(self.state, lr)
            self.metrics.add_scalar("LearningRate", lr, epoch)
            self.metrics.flush()
            if verbose:
                print(
                    f"epoch {epoch}: train {train_loss:.2f} "
                    f"val {val_loss:.2f} lr {lr:.2e} "
                    f"({(time.time() - t0) / 60:.1f} min)"
                )

            if save_epoch and (epoch + 1) % save_epoch == 0:
                self.save(os.path.join(self.out_dir, f"epoch_{epoch}.ckpt"))
            if epoch > 5 and val_loss < self.best_val:
                self.best_val = val_loss
                self.save(os.path.join(self.out_dir, "best_epoch.ckpt"))
            if self.is_main_process:
                save_training_curve(
                    os.path.join(self.out_dir, "training_curve.png"),
                    self.train_curve["train"], self.train_curve["val"],
                )
        return self.train_curve

    # -- checkpointing (full resume state) -------------------------------

    def _full_host(self, tree):
        """Full host copy of a state subtree. ZeRO-1 moments in a
        multi-host run live partly on non-addressable devices, so they
        are re-gathered to replicated first — a collective, which is
        why save() computes its payload on EVERY process before the
        main-process check."""
        leaves = jax.tree.leaves(tree)
        if self._n_processes > 1 and any(
            not getattr(leaf, "is_fully_addressable", True)
            for leaf in leaves
        ):
            tree = jax.jit(
                lambda t: t, out_shardings=replicated(self.mesh)
            )(tree)
        return jax.device_get(tree)

    def save(self, path: str, resume_epoch: Optional[int] = None) -> None:
        host = {
            "params": self._full_host(self.state.params),
            "batch_stats": self._full_host(self.state.batch_stats),
            "opt_state": self._full_host(self.state.opt_state),
        }
        if not self.is_main_process:
            return
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        payload = {
            "params": serialization.to_state_dict(host["params"]),
            "batch_stats": serialization.to_state_dict(
                host["batch_stats"]
            ),
            "opt_state": serialization.to_state_dict(host["opt_state"]),
            "step": int(self.state.step),
            "epoch": (
                resume_epoch if resume_epoch is not None else self.epoch + 1
            ),
            "best_val": self.best_val,
            "scheduler": self.scheduler.state_dict(),
            "train_curve": self.train_curve,
        }
        with open(path, "wb") as f:
            f.write(serialization.msgpack_serialize(
                jax.tree.map(np.asarray, payload)
            ))

    def restore(self, path: str) -> None:
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        self.state = self.state.replace(
            params=serialization.from_state_dict(
                self._full_host(self.state.params), payload["params"]
            ),
            batch_stats=serialization.from_state_dict(
                self._full_host(self.state.batch_stats),
                payload["batch_stats"],
            ),
            opt_state=serialization.from_state_dict(
                self._full_host(self.state.opt_state),
                payload["opt_state"],
            ),
            step=payload["step"],
        )
        self.state = place_tree(
            self.mesh, self.state, self._state_shardings
        )
        self.epoch = int(payload["epoch"])
        self.best_val = float(payload["best_val"])
        self.scheduler.load_state_dict(payload["scheduler"])
        self.train_curve = {
            k: list(v) for k, v in payload["train_curve"].items()
        }
