"""Host data-pipeline throughput: can this host feed the TPU?

Training consumes ~167 img/s/chip (docs/PERF.md, bf16 batch-32 @368);
the reference feeds its GPU with 8 DataLoader worker processes
(reference train.py:269-297). This measures what OUR input pipeline
(`CocoKeypoints` decode + geometric/photometric transforms +
`BatchLoader`) sustains on this host, per stage and per loader mode, and
states the per-chip feeding ratio, so the multi-chip answer (how many
host cores per chip) is a measured number instead of a hope.

Stages measured on a generated synthetic_coco train set (PNG images on
disk, real cv2 decode):

- ``item_host``   — one dataset item, host target rasterization
  (reference-equivalent path: decode + augment + putGaussianMaps/putVecMaps)
- ``item_device`` — one dataset item, ``target_mode="device"`` (targets
  rasterized on-TPU by the train step; the host only decodes + augments)
- ``loader_sync/thread/process`` — full BatchLoader epoch throughput

Writes BENCH_INPUT.json. Usage:
    python scripts/bench_input_pipeline.py [--images 48] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

#: measured TPU v5e consumption at batch 32, bf16, 368px (docs/PERF.md)
CHIP_IMG_PER_S = 167.0


def time_items(ds, n: int) -> float:
    """Items/s through ds[i] (single process, includes cv2 PNG decode)."""
    ds[0]  # warm caches (COCO index, first image)
    t0 = time.perf_counter()
    for i in range(n):
        ds[i % len(ds)]
    return n / (time.perf_counter() - t0)


def time_loader(loader, epochs: int = 1) -> float:
    t0 = time.perf_counter()
    n = 0
    for _ in range(epochs):
        for batch in loader:
            n += batch[0].shape[0]
    return n / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=48)
    ap.add_argument("--size", type=int, default=368)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workers", type=int, default=max(os.cpu_count(), 1))
    ap.add_argument("--out", default="BENCH_INPUT.json")
    args = ap.parse_args()

    from torch_ekpose_tpu.data import BatchLoader, CocoKeypoints
    from torch_ekpose_tpu.data import transforms as T
    from torch_ekpose_tpu.data.synthetic_coco import write_coco_dataset

    workdir = tempfile.mkdtemp(prefix="inputbench_")
    image_dir, anno_file = write_coco_dataset(
        workdir, args.images, h=args.size, w=args.size, mode="train",
        seed=3, max_people=3,
    )

    # the REAL training chain, exactly as cli/train.py builds it:
    # TRAIN_PREPROCESS (rescale/rotate/crop/pad/flip) + color jitter
    train_kw = dict(
        preprocess=T.TRAIN_PREPROCESS(args.size),
        image_transform=T.image_transform_train,
        input_size=args.size,
    )
    ds_host = CocoKeypoints(
        image_dir, anno_file, target_mode="host", **train_kw
    )
    ds_device = CocoKeypoints(
        image_dir, anno_file, target_mode="device", **train_kw
    )

    n_probe = min(args.images, 32)
    item_host = time_items(ds_host, n_probe)
    item_device = time_items(ds_device, n_probe)

    rates = {}
    for mode, workers in (
        ("sync", 0),
        ("thread", args.workers),
        ("process", args.workers),
    ):
        loader = BatchLoader(
            ds_device, batch_size=args.batch, shuffle=True,
            num_workers=workers, drop_last=False,
            mode="process" if mode == "process" else "thread",
        )
        try:
            # one throwaway epoch spins up worker processes / warms caches
            time_loader(loader, 1)
            rates[f"loader_{mode}"] = round(time_loader(loader, 2), 1)
        finally:
            close = getattr(loader, "close", None)
            if close:
                close()

    best = max(rates.values())
    result = {
        "hardware": f"{os.cpu_count()}-core host",
        "dataset": f"{args.images} x {args.size}px PNG scenes "
                   "(synthetic_coco), real cv2 decode + full train "
                   "augmentation",
        "batch": args.batch,
        "workers": args.workers,
        "items_per_s": {
            "host_targets": round(item_host, 1),
            "device_targets": round(item_device, 1),
        },
        "loader_images_per_s": rates,
        "chip_demand_img_per_s": CHIP_IMG_PER_S,
        "host_cores_per_chip": round(CHIP_IMG_PER_S / best, 1),
        "note": "host_cores_per_chip assumes near-linear scaling of the "
                "process-mode loader with cores (each worker is an "
                "independent decode+augment process); on a multi-chip "
                "slice, shard the dataset across hosts (BatchLoader "
                "shard=) and budget this many cores per chip, or "
                "pre-decode to raw arrays.",
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
