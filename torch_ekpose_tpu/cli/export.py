"""Offline checkpoint conversion/quantization.

    # reference .pth -> native msgpack (convert once, load fast forever)
    python -m torch_ekpose_tpu.cli.export -m vgg2016 -c ckpt.pth \
        -o vgg2016.msgpack

    # quantize once for int8 serving (then: run_image/serve/eval
    # --dtype int8 -c vgg2016_int8.msgpack)
    python -m torch_ekpose_tpu.cli.export -m vgg2016 -c ckpt.pth \
        --dtype int8 -o vgg2016_int8.msgpack

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
                        choices=["float32", "bfloat16", "int8"],
                        help="parameter dtype of the exported native "
                        "checkpoint (int8 = quantize once for the "
                        "serving mode; ignored with --to-torch)")
    parser.add_argument("--to-torch", action="store_true",
                        help="write a reference-format torch "
                        "state_dict instead of a native msgpack")
    args = parser.parse_args(argv)

    # CPU is always the right backend for an offline format shuffle —
    # never wait on (or transfer through) an accelerator for this
    jax.config.update("jax_platforms", "cpu")

    from torch_ekpose_tpu.cli import common
    from torch_ekpose_tpu.runtime.checkpoint import (
        export_torch_checkpoint,
        save_checkpoint,
    )

    variables = common.load_variables(args.model, args.ckpt)

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


if __name__ == "__main__":
    main()
