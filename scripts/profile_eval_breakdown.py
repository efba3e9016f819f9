"""Eval-loop decomposition: where each millisecond of a batch goes.

Round 4 measured the batched eval loop at 91.5 img/s while the
streaming bench does 374 fps, and attributed the residual to scoring,
the device tunnel, and un-overlapped host work — in prose. This script
replaces the prose with numbers: it runs the SAME batch-16 eval
workload twice —

1. **serialized**: every stage timed alone with hard barriers
   (read+pad, host->device upload, forward, decode, device->host
   fetch, row conversion, scoring), with the exact bytes moved per
   batch, so the stage costs sum to a full accounting;
2. **pipelined**: the real ``evaluate.run_eval`` loop (prefetch reader,
   batches in flight, async device->host copies) at steady state.

The difference between the serialized sum and the pipelined s/batch is
the measured overlap win; the residual above the device-link floor
(bytes / link bandwidth + round trips x RTT) is what host work still
costs. Writes EVAL_BREAKDOWN.json. Usage:
    python scripts/profile_eval_breakdown.py [--images 64] [--batch 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=368)
    ap.add_argument("--ckpt", default="/tmp/synparity/trained_ref.pth")
    ap.add_argument("--link-probe-mb", type=float, default=8.0,
                    help="size of the direct link-bandwidth probe")
    ap.add_argument("--out", default="EVAL_BREAKDOWN.json")
    args = ap.parse_args()

    import jax.numpy as jnp

    from torch_ekpose_tpu.data.synthetic_coco import write_coco_dataset
    from torch_ekpose_tpu.decode import device as decode_device
    from torch_ekpose_tpu.evaluate import evaluator, run_eval
    from torch_ekpose_tpu.runtime import PoseEstimator
    from torch_ekpose_tpu.runtime.estimator import padding

    workdir = tempfile.mkdtemp(prefix="evalbrk_")
    image_dir, anno_file = write_coco_dataset(
        workdir, args.images, h=args.size, w=args.size, mode="val",
        seed=11, max_people=3,
    )

    variables, weights = None, "random init"
    if os.path.isfile(args.ckpt):
        import torch

        from torch_ekpose_tpu.runtime import convert_torch_checkpoint

        state = torch.load(args.ckpt, map_location="cpu")
        state = {
            (k[len("module."):] if k.startswith("module.") else k): v.numpy()
            for k, v in state.items()
        }
        variables = convert_torch_checkpoint(state, "vgg2016")
        weights = "trained (scripts/trained_parity.py checkpoint)"

    est = PoseEstimator(
        "vgg2016", variables=variables, decode_backend="jax",
        dest_size=args.size, compute_dtype=jnp.float32,
    )

    # ---- serialized stage timing ---------------------------------------
    from torch_ekpose_tpu.data.coco import COCO

    coco = COCO(anno_file)
    img_ids = coco.getImgIds()
    n_batches = len(img_ids) // args.batch
    stages = {k: 0.0 for k in (
        "read_pad", "upload", "forward", "decode", "fetch", "to_rows",
    )}
    bytes_up = bytes_down = 0
    rows = []

    # ---- direct link measurement (same-process, same tunnel state) -----
    # RANDOM payload: the tunnel compresses in flight, so a constant
    # probe measures the compressor (634 MB/s observed), not the link
    mb = 1024 * 1024
    rng = np.random.default_rng(0)
    probe = rng.standard_normal(
        int(args.link_probe_mb * mb // 4)).astype(np.float32)
    jax.block_until_ready(jnp.asarray(probe))  # warm path
    t0 = time.perf_counter()
    dev_probe = jax.block_until_ready(jnp.asarray(probe[::-1].copy()))
    up_s = time.perf_counter() - t0
    dev_probe.copy_to_host_async()
    t0 = time.perf_counter()
    jax.device_get(dev_probe)
    down_s = time.perf_counter() - t0
    tiny = jax.block_until_ready(jnp.zeros(()))
    t0 = time.perf_counter()
    for _ in range(5):
        jax.device_get(tiny)
    rtt_s = (time.perf_counter() - t0) / 5
    link = {
        "upload_mb_s": round(probe.nbytes / mb / up_s, 1),
        "download_mb_s": round(probe.nbytes / mb / down_s, 1),
        "rtt_ms": round(rtt_s * 1000, 1),
    }
    print("link:", json.dumps(link), flush=True)

    # warmup: compile both executables once outside the timed loop
    info = coco.loadImgs(img_ids[0])[0]
    img0 = evaluator.read_image_bgr(os.path.join(image_dir, info["file_name"]))
    pad0, _, _ = padding(img0, args.size, 8)
    warm = np.stack([pad0] * args.batch)
    fwd = est._batch_forward_fn(*warm.shape[1:3])
    dec = est._batch_decoder()
    paf, heat = fwd(est.variables, jnp.asarray(warm))
    jax.block_until_ready(dec(heat, paf))

    for bi in range(n_batches):
        ids = img_ids[bi * args.batch:(bi + 1) * args.batch]
        t0 = time.perf_counter()
        batch, scales = [], []
        for iid in ids:
            info = coco.loadImgs(iid)[0]
            im = evaluator.read_image_bgr(
                os.path.join(image_dir, info["file_name"]))
            im_pad, scale, _ = padding(im, args.size, 8)
            batch.append(im_pad)
            scales.append(scale)
        stack = np.stack(batch)
        t1 = time.perf_counter(); stages["read_pad"] += t1 - t0

        dev = jax.block_until_ready(jnp.asarray(stack))
        bytes_up += stack.nbytes
        t2 = time.perf_counter(); stages["upload"] += t2 - t1

        paf, heat = fwd(est.variables, dev)
        jax.block_until_ready((paf, heat))
        t3 = time.perf_counter(); stages["forward"] += t3 - t2

        packed = dec(heat, paf)
        jax.block_until_ready(packed)
        t4 = time.perf_counter(); stages["decode"] += t4 - t3

        # pre-staged fetch (copy_to_host_async then device_get) — the
        # efficient-but-unoverlapped transfer. A NAIVE device_get on the
        # same result measures ~2 orders of magnitude slower through the
        # tunnel (tiny-chunk fetch); measured once below as a footnote.
        for leaf in jax.tree.leaves(packed):
            if hasattr(leaf, "copy_to_host_async"):
                leaf.copy_to_host_async()
        host = jax.device_get(packed)
        bytes_down += sum(leaf.nbytes for leaf in jax.tree.leaves(host))
        t5 = time.perf_counter(); stages["fetch"] += t5 - t4

        h, w = stack.shape[1:3]
        for i, (iid, scale) in enumerate(zip(ids, scales)):
            humans = decode_device.packed_to_humans(
                host[i], h, w, est.config)
            evaluator.append_result(
                iid, humans, (h / scale, w / scale), rows)
        t6 = time.perf_counter(); stages["to_rows"] += t6 - t5

    t0 = time.perf_counter()
    ap_serial = evaluator.eval_coco(rows, anno_file, img_ids[: n_batches * args.batch])
    scoring_s = time.perf_counter() - t0

    # footnote: one NAIVE device_get (no pre-staging) on a fresh result
    paf, heat = fwd(est.variables, jnp.asarray(np.stack([pad0] * args.batch)))
    packed = dec(heat, paf)
    jax.block_until_ready(packed)
    t0 = time.perf_counter()
    jax.device_get(packed)
    naive_fetch_s = time.perf_counter() - t0

    serial_total = sum(stages.values()) + scoring_s
    per_batch = {k: round(v / n_batches, 4) for k, v in stages.items()}
    per_batch["scoring_total_s"] = round(scoring_s, 3)

    # ---- the real pipelined loop (steady state: second pass) ------------
    run_eval(image_dir, anno_file, est, mode="val", progress=False,
             batch_size=args.batch)
    t0 = time.perf_counter()
    ap_pipe = run_eval(image_dir, anno_file, est, mode="val",
                       progress=False, batch_size=args.batch)
    pipe_s = time.perf_counter() - t0

    # ---- device-link floor (from the MEASURED link, same process) -------
    # The tunnel defers uploads until first use and compresses in
    # flight, so the microbenchmark can read absurdly fast uploads and
    # near-zero fetch bandwidth on a congested session; in that case the
    # floor is unmodelable and the per-stage timings are the evidence.
    if link["download_mb_s"] > 0.05 and link["upload_mb_s"] < 2000:
        floor_s_per_batch = (
            bytes_up / n_batches / (link["upload_mb_s"] * mb)
            + bytes_down / n_batches / (link["download_mb_s"] * mb)
            + 2 * link["rtt_ms"] / 1000.0  # upload + fetch round trips
        )
    else:
        floor_s_per_batch = None

    out = {
        "backend": jax.devices()[0].platform,
        "device": jax.devices()[0].device_kind,
        "weights": weights,
        "workload": f"{n_batches * args.batch} x {args.size}px "
                    f"single-bucket val images, batch {args.batch}",
        "serialized": {
            "per_batch_s": per_batch,
            "per_batch_total_s": round(serial_total / n_batches, 4),
            "total_s": round(serial_total, 2),
            "img_per_s": round(n_batches * args.batch / serial_total, 1),
            "bytes_up_per_batch_mb": round(bytes_up / n_batches / mb, 2),
            "bytes_down_per_batch_mb": round(
                bytes_down / n_batches / mb, 3),
            "ap": round(float(ap_serial), 4),
        },
        "pipelined": {
            "steady_s": round(pipe_s, 2),
            "per_batch_s": round(pipe_s / (args.images / args.batch), 4),
            "img_per_s": round(args.images / pipe_s, 1),
            "ap": round(float(ap_pipe), 4),
        },
        "link_measured": link,
        "link_floor": (
            {
                "floor_s_per_batch": round(floor_s_per_batch, 4),
                "floor_img_per_s": round(
                    args.batch / floor_s_per_batch, 1),
            }
            if floor_s_per_batch else
            {"unmodelable": "link probe hit deferred-upload/compression "
                            "artifacts this session; the serialized "
                            "stage timings are the floor evidence"}
        ),
        "naive_device_get_s_per_batch": round(naive_fetch_s, 2),
        "overlap_win_s_per_batch": round(
            serial_total / n_batches - pipe_s / (args.images / args.batch),
            4),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
