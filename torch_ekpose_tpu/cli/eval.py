"""COCO keypoint evaluation (reference eval.py).

    python -m torch_ekpose_tpu.cli.eval -m vgg2016 -c ckpt.pth \
        -d coco --mode val --data-dir ./data/
"""

from __future__ import annotations

import argparse
import os

from torch_ekpose_tpu.cli import common
from torch_ekpose_tpu.evaluate import run_eval


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    common.add_model_args(parser)
    parser.add_argument("-d", "--datasets", type=str, required=True,
                        help="dataset directory name under --data-dir")
    parser.add_argument("--data-dir", type=str, default="./data/")
    parser.add_argument("--mode", type=str, default="val")
    parser.add_argument("--save", type=int, default=0,
                        help="save every Nth visualization (0 = never)")
    parser.add_argument("--json", action="store_true",
                        help="keep results.json")
    parser.add_argument("--vis-dir", type=str, default="results/")
    parser.add_argument("--n-images", type=int, default=None)
    parser.add_argument("-b", "--batch", type=int, default=None,
                        help="shape-bucketed batch size (>1 batches the "
                        "forward pass per padded-shape bucket). Default: "
                        "8 on TPU, 1 elsewhere (the reference's shape)")
    parser.add_argument("--num-devices", type=int, default=0,
                        help="shard each eval batch over an N-device "
                        "mesh (0 = single device); requires --batch to "
                        "be a multiple of N. The reference eval loop is "
                        "strictly batch-1 single-GPU; this scales it "
                        "linearly over ICI with no cross-chip "
                        "collectives")
    args = parser.parse_args(argv)

    # TPU-native defaults: bucketed batched forward + on-device decode.
    # Explicit --batch / --decode-backend flags always win; off-TPU the
    # defaults stay reference-shaped (batch 1, host decode). PERF.md
    # "Eval throughput" has the measured difference.
    common.apply_platform(getattr(args, "platform", "auto"))
    import jax

    on_tpu = jax.devices()[0].platform == "tpu"
    if args.batch is None:
        args.batch = 8 if on_tpu else 1
    if on_tpu and getattr(args, "decode_backend", "auto") == "auto" \
            and args.num_devices <= 1:
        args.decode_backend = "jax"

    if args.num_devices > 1:
        if args.batch % args.num_devices:
            raise SystemExit(
                f"--batch {args.batch} must be a multiple of "
                f"--num-devices {args.num_devices}"
            )
        from torch_ekpose_tpu.parallel import make_mesh
        from torch_ekpose_tpu.parallel.inference import ShardedPoseEstimator

        model, variables = common.build_model_and_variables(args)
        estimator = ShardedPoseEstimator(
            model,
            variables,
            mesh=make_mesh(args.num_devices),
            preprocess=args.preprocess,
            dest_size=args.dest_size,
            precision=args.precision,
        )
    else:
        estimator = common.build_estimator(args)
    image_dir = os.path.join(args.data_dir, args.datasets, "images", args.mode)
    anno = os.path.join(
        args.data_dir, args.datasets, f"annotations_{args.mode}.json"
    )
    ap = run_eval(
        image_dir=image_dir,
        anno_file=anno,
        estimator=estimator,
        mode=args.mode,
        vis_dir=args.vis_dir if args.save else None,
        save_every=args.save,
        results_json=(
            os.path.join(args.vis_dir, "results.json") if args.json else None
        ),
        n_images=args.n_images,
        batch_size=args.batch,
    )
    print(f"AP@OKS = {ap:.4f}")


if __name__ == "__main__":
    main()
