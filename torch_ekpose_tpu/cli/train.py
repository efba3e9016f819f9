"""COCO keypoint training (reference train.py).

    python -m torch_ekpose_tpu.cli.train -m vgg2016 -d coco -b 128 -e 300 \
        --data-dir ./data/ --targets device

Data-parallel over all visible devices via a 1-D mesh (the reference's
``nn.DataParallel`` equivalent, train.py:106); ``--targets device``
rasterizes heatmap/PAF targets on the TPU inside the train step.
"""

from __future__ import annotations

import argparse
import datetime
import os
import sys

from torch_ekpose_tpu.cli import common
from torch_ekpose_tpu.config import get_default_config
from torch_ekpose_tpu.data import transforms as T
from torch_ekpose_tpu.data.dataset import BatchLoader, CocoKeypoints
from torch_ekpose_tpu.training import Logger, Trainer


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-m", "--model", type=str, default="vgg2016")
    parser.add_argument("-d", "--datasets", type=str, required=True)
    parser.add_argument("--data-dir", type=str, default="./data/")
    # defaults match the reference CLI (train.py:36-37); pass a larger
    # -b on real slices — one v5e chip sustains batch 128 via --grad-accum
    parser.add_argument("-b", "--batch_size", type=int, default=16)
    parser.add_argument("-e", "--epochs", type=int, default=100)
    parser.add_argument("-l", "--lr", type=float, default=1e-4)
    parser.add_argument("--weight_decay", type=float, default=5e-4)
    parser.add_argument("--square_size", type=int, default=368)
    parser.add_argument("--save_epoch", type=int, default=20)
    parser.add_argument(
        "--workers", "--loader_workers", type=int, default=8,
        help="loader worker count (the reference's --loader_workers)",
    )
    parser.add_argument(
        "--training_curve", action="store_true",
        help="accepted for reference CLI compatibility; the curve PNG "
        "is always saved here (reference train.py:44 gates it)",
    )
    parser.add_argument(
        "--loader-mode", type=str, default="process",
        choices=["process", "thread"],
        help="loader workers: real processes (like the reference's "
        "DataLoader; the host pipeline is GIL-bound under threads) or "
        "threads (lighter, fine for small runs)",
    )
    parser.add_argument("--n-images", type=int, default=None)
    parser.add_argument("--num-devices", type=int, default=0)
    parser.add_argument(
        "--gpus", type=str, default=None, metavar="IDS",
        help="reference-compatibility alias (train.py:38 takes "
        "comma-separated CUDA ids): the COUNT of ids becomes "
        "--num-devices; TPU meshes have no per-id selection",
    )
    parser.add_argument("--grad-accum", type=int, default=1,
                        help="micro-batches per optimizer step (fits the "
                        "reference's batch-128 recipe on few chips)")
    parser.add_argument("--zero1", action="store_true",
                        help="shard Adam moments across the mesh "
                        "(ZeRO-1): cuts optimizer HBM by the device "
                        "count, identical numerics")
    parser.add_argument("--spatial", type=int, default=1, metavar="K",
                        help="shard the image HEIGHT over K devices per "
                        "batch shard (2-D data x spatial mesh, GSPMD "
                        "conv halo exchanges): one step spans more "
                        "chips than the batch, or fits a resolution "
                        "one chip's HBM cannot; identical numerics")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize backbone + CPM-branch "
                        "activations in the backward pass "
                        "(jax.checkpoint): exact same gradients, "
                        "activation HBM traded for ~one extra forward "
                        "— fits larger batches or resolutions per chip "
                        "(measured in docs/PERF.md)")
    parser.add_argument("--targets", type=str, default="device",
                        choices=["device", "host", "raw"],
                        help="host: reference-shaped host pipeline; "
                        "device: targets rasterized on-chip; raw: the "
                        "host only decodes — augmentation AND targets "
                        "run on-chip (data/device_aug.py; measured free "
                        "at bf16, docs/PERF.md). Validation always "
                        "evaluates un-augmented device-target items")
    parser.add_argument("--raw-cache", type=str, default=None,
                        help="with --targets raw: path prefix for a "
                        "pre-decoded memmap cache (data/raw_cache.py), "
                        "built on first use; a train epoch's host cost "
                        "drops to a memcpy per image (~11,700 img/s/core "
                        "measured)")
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="activation/compute dtype for the train step; "
                        "bfloat16 runs the conv matmuls at full MXU rate "
                        "while params, optimizer moments, and the loss "
                        "stay float32")
    parser.add_argument("--pretrained_path", type=str, default=None,
                        help="resume checkpoint (.ckpt) or reference .pth")
    parser.add_argument(
        "--imagenet_pretrained", type=str, default=None, nargs="?",
        const="auto", metavar="VGG19_PTH",
        help="initialize the vgg2016 backbone from a torchvision "
        "ImageNet VGG19 classifier checkpoint (reference train.py:48 / "
        "vgg2016.py:137-143; implies a 5-epoch frozen-backbone warmup "
        "unless --warmup_epochs is given). With no value, looks in "
        "torchvision's cache (~/.cache/torch/hub/checkpoints/)",
    )
    parser.add_argument("--warmup_epochs", type=int, default=None,
                        help="frozen-backbone warmup epochs "
                        "(reference train.py:130-166; default 5 with "
                        "--imagenet_pretrained, else 0)")
    parser.add_argument("--logdir", type=str, default="./logs/")
    parser.add_argument("--out-dir", type=str, default="./checkpoints/")
    parser.add_argument(
        "--coordinator", type=str, default=None,
        help="multi-host: coordinator address host:port "
        "(process 0's machine); requires --num-processes/--process-id",
    )
    parser.add_argument("--num-processes", type=int, default=1)
    parser.add_argument("--process-id", type=int, default=0)
    parser.add_argument(
        "--compilation-cache", type=str, default=None,
        help="persistent XLA compilation cache directory (default: "
        "$JAX_COMPILATION_CACHE_DIR or ~/.cache/torch_ekpose_tpu/xla; "
        "'none' disables) — restarts and preemption resumes then skip "
        "the multi-minute train-step compile",
    )
    args = parser.parse_args(argv)

    if args.gpus:
        n = len([g for g in args.gpus.split(",") if g.strip() != ""])
        if args.num_devices and args.num_devices != n:
            raise SystemExit(
                f"--gpus lists {n} ids but --num-devices={args.num_devices}"
            )
        args.num_devices = n
        print(f"INFO: --gpus {args.gpus!r} -> data-parallel over "
              f"{n} device(s)")

    if args.coordinator:
        # must happen before any other jax use; afterwards jax.devices()
        # spans every host and the mesh/pjit program runs SPMD across them
        from torch_ekpose_tpu.parallel import init_distributed

        init_distributed(
            args.coordinator, args.num_processes, args.process_id
        )

    # mesh/batch shape validation up front — BEFORE datasets load or the
    # log dir appears, so a bad flag combination fails in milliseconds
    # with the fix spelled out (not as an opaque sharding error after a
    # multi-minute dataset scan)
    import jax

    n_proc = jax.process_count()
    n_dev = args.num_devices or jax.device_count()
    if args.spatial > 1 and n_dev % args.spatial:
        raise SystemExit(
            f"--spatial {args.spatial} must divide the "
            f"{n_dev}-device mesh"
        )
    if args.spatial > 1:
        # host-side device_put shards concrete arrays, which (unlike
        # GSPMD inside jit) requires EXACT divisibility — catch it here
        # instead of crashing later in an opaque jax ValueError mid-epoch
        stride = get_default_config().MODEL.DOWNSAMPLE  # grids: size//8
        if args.square_size % args.spatial:
            raise SystemExit(
                f"--spatial {args.spatial} must divide --square_size "
                f"{args.square_size}: input images are sharded along "
                "H on the spatial mesh axis"
            )
        if args.targets == "host" \
                and (args.square_size // stride) % args.spatial:
            raise SystemExit(
                f"--spatial {args.spatial} must divide the "
                f"{args.square_size // stride}-row target grids "
                f"(--square_size {args.square_size} / stride "
                f"{stride}) under --targets host, whose heat/paf "
                "batches are sharded spatially from the host; use "
                "--targets device (grids are built under GSPMD "
                "inside jit) or a spatial factor dividing "
                f"{args.square_size // stride}"
            )
    dp = n_dev // max(args.spatial, 1)
    if args.batch_size % max(dp, 1):
        # the data sharding splits the batch axis across the mesh's
        # data axis, so process-count divisibility alone is not enough
        raise SystemExit(
            f"--batch_size {args.batch_size} must divide evenly "
            f"across the {dp}-way data axis of the {n_dev}-device "
            f"mesh ({n_proc} processes)"
        )

    stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    log_dir = os.path.join(args.logdir, stamp)
    os.makedirs(log_dir, exist_ok=True)
    sys.stdout = Logger(os.path.join(log_dir, "logging.log"))
    print("command line:", " ".join(sys.argv))

    # the fused train step is a multi-minute compile at full resolution;
    # persist it so restarts (and preemption auto-resumes) skip it
    common.enable_compilation_cache(
        getattr(args, "compilation_cache", None)
    )
    common.report_devices()
    cfg = get_default_config()
    cfg.TRAIN.batch_size = args.batch_size
    cfg.TRAIN.epochs = args.epochs
    cfg.TRAIN.lr = args.lr
    cfg.TRAIN.weight_decay = args.weight_decay
    cfg.TRAIN.square_size = args.square_size
    cfg.TRAIN.save_epoch = args.save_epoch

    def make_loader(mode: str, train: bool):
        root = os.path.join(
            args.data_dir, args.datasets, "images", mode
        )
        anno = os.path.join(
            args.data_dir, args.datasets, f"annotations_{mode}.json"
        )
        # raw mode: the TRAIN loader serves decode-only uint8 canvases
        # (augmentation happens inside the jitted train step); validation
        # never augments, so its loader serves standard device-target
        # items and rides the unchanged eval step
        raw_train = args.targets == "raw" and train
        ds = CocoKeypoints(
            root, anno,
            preprocess=T.TRAIN_PREPROCESS(args.square_size),
            image_transform=(
                T.image_transform_train if train else T.image_transform
            ),
            target_mode="raw" if raw_train else (
                "device" if args.targets == "raw" else args.targets
            ),
            input_size=args.square_size,
            n_images=args.n_images,
        )
        if raw_train and args.raw_cache:
            from torch_ekpose_tpu.data.raw_cache import (
                RawArrayDataset, build_raw_cache, cache_exists,
            )
            import jax as _jax

            if not cache_exists(args.raw_cache):
                if _jax.process_index() == 0:
                    build_raw_cache(ds, args.raw_cache, progress=True)
                else:
                    # multi-host on a shared filesystem: process 0 builds
                    # (meta sidecar lands last, so cache_exists flips only
                    # on a COMPLETE build). Bounded wait: if the builder
                    # died mid-build the sidecar never appears and an
                    # unbounded poll would hang every other host silently.
                    import time as _time

                    deadline = _time.monotonic() + 30 * 60
                    while not cache_exists(args.raw_cache):
                        if _time.monotonic() > deadline:
                            raise SystemExit(
                                f"process {_jax.process_index()}: raw "
                                f"cache {args.raw_cache!r} still absent "
                                "after 30 min — process 0 (the builder) "
                                "likely died mid-build; check its log, "
                                "delete any partial cache files, and "
                                "restart"
                            )
                        _time.sleep(2.0)
            ds = RawArrayDataset(args.raw_cache)
        # mesh/batch divisibility was validated up front in main()
        # each process loads its strided shard of the dataset and feeds
        # its slice of the global batch (shard_batch assembles the rest)
        return BatchLoader(
            ds, args.batch_size // n_proc, shuffle=train,
            num_workers=args.workers, drop_last=train,
            mode=args.loader_mode,
            shard=(jax.process_index(), n_proc),
        )

    train_loader = make_loader("train", True)
    val_loader = make_loader("val", False)

    import jax.numpy as jnp

    compute_dtype = (
        jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    )

    if args.warmup_epochs is None:
        # the reference runs a 5-epoch frozen-backbone warmup whenever
        # it starts from imagenet weights (train.py:130-166)
        args.warmup_epochs = 5 if args.imagenet_pretrained else 0

    variables = None
    if args.pretrained_path and args.pretrained_path.endswith(
        (".pth", ".pt")
    ):
        variables = common.load_variables(args.model, args.pretrained_path)
    if args.imagenet_pretrained:
        if args.model != "vgg2016":
            raise SystemExit(
                "--imagenet_pretrained applies to vgg2016 only (the "
                "reference's flag likewise feeds vgg2016.load_model)"
            )
        if variables is not None:
            raise SystemExit(
                "--imagenet_pretrained conflicts with a .pth "
                "--pretrained_path (both would set the backbone)"
            )
        path = args.imagenet_pretrained
        if path == "auto":
            import glob

            hits = sorted(glob.glob(os.path.expanduser(
                "~/.cache/torch/hub/checkpoints/vgg19-*.pth"
            )))
            if not hits:
                raise SystemExit(
                    "--imagenet_pretrained: no vgg19-*.pth in "
                    "~/.cache/torch/hub/checkpoints/ (this environment "
                    "cannot download it; pass an explicit path)"
                )
            path = hits[-1]
        from torch_ekpose_tpu.models import init_model
        from torch_ekpose_tpu.runtime.checkpoint import (
            import_imagenet_vgg19,
        )

        _, variables = init_model(
            args.model,
            input_shape=(1, args.square_size, args.square_size, 3),
        )
        variables = import_imagenet_vgg19(path, variables)
        print(f"INFO: backbone initialized from imagenet VGG19 ({path})")

    # Resume decisions are made up front: when the main run will restore a
    # full-state checkpoint (explicit *.ckpt or an auto-resume
    # preempt.ckpt), re-running warmup would only produce parameters that
    # restore() immediately discards.
    preempt_ckpt = os.path.join(args.out_dir, "preempt.ckpt")
    resume_explicit = bool(
        args.pretrained_path and args.pretrained_path.endswith(".ckpt")
    )

    # ONE consensus decision, reused by the warmup-skip and the resume
    # branch below (two separate collectives could diverge if the
    # filesystem changes in between). Multi-host: process 0's view is
    # authoritative — shared storage can lag behind its write.
    import jax

    resume_preempt = os.path.exists(preempt_ckpt)
    if jax.process_count() > 1:
        import numpy as np
        from jax.experimental import multihost_utils

        resume_preempt = bool(multihost_utils.broadcast_one_to_all(
            np.asarray(resume_preempt)
        ))
        if resume_preempt and not os.path.exists(preempt_ckpt):
            raise SystemExit(
                f"{preempt_ckpt} exists on process 0 but not here: "
                "multi-host auto-resume requires the checkpoint "
                "directory on shared storage"
            )

    will_restore = resume_explicit or resume_preempt

    if args.warmup_epochs and will_restore:
        print(
            "INFO: skipping warmup: the main run restores a full-state "
            "checkpoint that would overwrite its result"
        )
    if args.warmup_epochs and not will_restore:
        print(f"INFO: {args.warmup_epochs}-epoch frozen-backbone warmup")
        # own out_dir: the frozen-backbone opt_state (multi_transform) is
        # structurally different from the main run's, so its preempt.ckpt
        # must never be picked up by the main trainer's auto-resume
        warmup = Trainer(
            args.model, config=cfg, variables=variables,
            out_dir=os.path.join(args.out_dir, "warmup"),
            log_dir=log_dir, targets=args.targets,
            num_devices=args.num_devices, freeze_backbone=True,
            compute_dtype=compute_dtype, grad_accum=args.grad_accum,
            zero1=args.zero1, spatial=args.spatial,
            remat=args.remat,
        )
        warmup.fit(
            train_loader, val_loader, epochs=args.warmup_epochs,
            save_epoch=0,
        )
        if warmup.preempted:
            print("INFO: preempted during warmup; exiting")
            return
        variables = {"params": warmup.state.params}
        if warmup.state.batch_stats:
            variables["batch_stats"] = warmup.state.batch_stats

    trainer = Trainer(
        args.model, config=cfg, variables=variables,
        out_dir=args.out_dir, log_dir=log_dir, targets=args.targets,
        num_devices=args.num_devices, compute_dtype=compute_dtype,
        grad_accum=args.grad_accum, zero1=args.zero1,
        spatial=args.spatial, remat=args.remat,
    )
    if resume_preempt:
        # A preemption checkpoint from a killed run: pick up where it
        # left off (the interrupted epoch re-runs in full). It wins even
        # over an explicit --pretrained_path *.ckpt: it is strictly newer
        # state of THIS out_dir, and a scheduler relaunching the original
        # command line after preemption must not silently restart from
        # the initial checkpoint (nor destroy the newer state). Consumed
        # on restore — otherwise every later run in this out_dir would
        # silently resume from stale state. A second preemption writes a
        # fresh one; periodic epoch_N.ckpt files cover crashes between.
        if resume_explicit:
            print(f"WARNING: {preempt_ckpt} supersedes --pretrained_path "
                  f"{args.pretrained_path} (it is newer state of this "
                  "out_dir); delete the file to restart from the "
                  "explicit checkpoint instead")
        trainer.restore(preempt_ckpt)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            # nobody deletes until everyone has restored
            multihost_utils.sync_global_devices("preempt-restore")
        if trainer.is_main_process:
            os.remove(preempt_ckpt)
        print(f"INFO: auto-resumed from {preempt_ckpt} "
              f"at epoch {trainer.epoch} (checkpoint consumed)")
    elif resume_explicit:
        trainer.restore(args.pretrained_path)
        print(f"INFO: resumed from {args.pretrained_path} "
              f"at epoch {trainer.epoch}")
    trainer.fit(train_loader, val_loader, epochs=args.epochs)


if __name__ == "__main__":
    main()
