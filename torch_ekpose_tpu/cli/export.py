"""Offline checkpoint conversion/quantization.

    # reference .pth -> native msgpack (convert once, load fast forever)
    python -m torch_ekpose_tpu.cli.export -m vgg2016 -c ckpt.pth \
        -o vgg2016.msgpack

    # quantize once for int8 serving (then: run_image/serve/eval
    # --dtype int8 -c vgg2016_int8.msgpack)
    python -m torch_ekpose_tpu.cli.export -m vgg2016 -c ckpt.pth \
        --dtype int8 -o vgg2016_int8.msgpack

    # int8 with CALIBRATED static activation scales (the fastest
    # batch-1 serving path; then: run_image/serve --dtype int8_static)
    python -m torch_ekpose_tpu.cli.export -m vgg2016 -c ckpt.pth \
        --dtype int8_static --calib-images demo/ -o vgg2016_int8s.msgpack

    # native msgpack back to the reference's torch state_dict format
    python -m torch_ekpose_tpu.cli.export -m vgg2016 -c ours.msgpack \
        --to-torch -o theirs.pth

The reference has no conversion tooling at all — checkpoints are
whatever ``torch.save`` wrote during training (reference
train.py:341-430). Inference CLIs here convert ``.pth`` on the fly
already; this command exists so the conversion/quantization cost is
paid once, offline, instead of at every serving-process start."""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-m", "--model", type=str, default="vgg2016")
    parser.add_argument("-c", "--ckpt", type=str, required=True,
                        help="input checkpoint (.pth/.pt reference "
                        "format or .msgpack native)")
    parser.add_argument("-o", "--output", type=str, required=True)
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=["float32", "bfloat16", "int8",
                                 "int8_static"],
                        help="parameter dtype of the exported native "
                        "checkpoint (int8 = quantize once for the "
                        "serving mode; int8_static additionally "
                        "calibrates static activation scales on "
                        "--calib-images; ignored with --to-torch)")
    parser.add_argument("--calib-images", type=str, default=None,
                        help="image file or directory for int8_static "
                        "calibration (representative production frames)")
    parser.add_argument("--dest-size", type=int, default=368,
                        help="inference resolution the calibration "
                        "frames are padded to (match serving)")
    parser.add_argument("--to-torch", action="store_true",
                        help="write a reference-format torch "
                        "state_dict instead of a native msgpack")
    parser.add_argument("--aot", action="store_true",
                        help="write an AOT deployment artifact instead: "
                        "the batched serving pipeline as serialized "
                        "StableHLO + params + metadata, loadable with "
                        "runtime.aot.load_pipeline on the SAME platform "
                        "kind (run on TPU to export for TPU)")
    parser.add_argument("--batch", type=int, default=1,
                        help="(--aot) batch size baked into the artifact")
    parser.add_argument("--input-size", type=str, default=None,
                        metavar="HxW",
                        help="(--aot) fixed input frame size, e.g. "
                        "368x432; default: dest-size square")
    args = parser.parse_args(argv)

    if not args.aot:
        # CPU is always the right backend for an offline format shuffle —
        # never wait on (or transfer through) an accelerator for this.
        # (--aot instead exports FOR the running platform.)
        jax.config.update("jax_platforms", "cpu")

    from torch_ekpose_tpu.cli import common
    from torch_ekpose_tpu.runtime.checkpoint import (
        export_torch_checkpoint,
        save_checkpoint,
    )

    variables = common.load_variables(args.model, args.ckpt)

    if args.aot:
        _export_aot(args, variables)
        return

    if args.to_torch:
        export_torch_checkpoint(
            variables, model_name=args.model, path=args.output
        )
        print(f"INFO: wrote reference-format state_dict -> {args.output}")
        return

    if args.dtype == "int8":
        from torch_ekpose_tpu.models import get_model, quantize_variables

        qmodel = get_model(args.model, quantize=True)
        variables = quantize_variables(variables, qmodel)
    elif args.dtype == "int8_static":
        if args.calib_images is None:
            parser.error("--dtype int8_static requires --calib-images")
        variables = _quantize_static(args, variables)
    elif args.dtype == "bfloat16":
        from torch_ekpose_tpu.models import cast_params
        import jax.numpy as jnp

        variables = cast_params(variables, jnp.bfloat16)

    variables = jax.tree.map(np.asarray, variables)
    save_checkpoint(args.output, variables)
    n_bytes = sum(x.nbytes for x in jax.tree.leaves(variables))
    print(
        f"INFO: wrote {args.dtype} checkpoint "
        f"({n_bytes / 1e6:.1f} MB of params) -> {args.output}"
    )


def _export_aot(args, variables):
    """Write an AOT deployment artifact (runtime/aot.py)."""
    import jax.numpy as jnp

    from torch_ekpose_tpu.runtime.aot import export_pipeline
    from torch_ekpose_tpu.runtime.estimator import PoseEstimator

    if args.input_size:
        try:
            h, w = (int(v) for v in args.input_size.lower().split("x"))
        except ValueError:
            raise SystemExit(
                f"--input-size must be HxW, got {args.input_size!r}"
            )
    else:
        h = w = args.dest_size
    dtype = {
        "float32": jnp.float32, "bfloat16": jnp.bfloat16,
        "int8": "int8", "int8_static": "int8_static",
    }[args.dtype]
    est = PoseEstimator(
        model_name=args.model, variables=variables,
        compute_dtype=dtype, dest_size=max(h, w),
    )
    if args.dtype == "int8_static":
        if args.calib_images is None:
            raise SystemExit(
                "--aot --dtype int8_static requires --calib-images "
                "(static scales are baked into the artifact)"
            )
        _calibrate_est(args, est)
    meta = export_pipeline(
        est, args.output, batch=args.batch, height=h, width=w
    )
    size = os.path.getsize(args.output)
    print(
        f"INFO: wrote AOT artifact ({meta['platform']}, batch "
        f"{meta['batch']}, {h}x{w}, {args.dtype}; "
        f"{size / 1e6:.1f} MB) -> {args.output}"
    )


def _quantize_static(args, variables):
    """Quantize + calibrate static activation scales on real frames.

    Each calibration image goes through the exact serving preprocessing
    (resize-long-side + pad, runtime.estimator.padding) so the measured
    activation ranges match production traffic at --dest-size.
    """
    from torch_ekpose_tpu.runtime.estimator import PoseEstimator

    est = PoseEstimator(
        model_name=args.model, variables=variables,
        compute_dtype="int8_static", dest_size=args.dest_size,
    )
    _calibrate_est(args, est)
    return est.variables


def _calibrate_est(args, est) -> None:
    """Calibrate an int8_static estimator on --calib-images frames."""
    from torch_ekpose_tpu.evaluate.evaluator import read_image_bgr
    from torch_ekpose_tpu.runtime.estimator import padding

    path = args.calib_images
    if os.path.isdir(path):
        paths = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp"))
        )
    else:
        paths = [path]
    if not paths:
        raise SystemExit(f"no calibration images found under {path!r}")
    est.calibrate(
        padding(read_image_bgr(p), args.dest_size)[0] for p in paths
    )
    print(f"INFO: calibrated static int8 scales on {len(paths)} image(s)")


if __name__ == "__main__":
    main()
