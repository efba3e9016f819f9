"""Shared CLI plumbing: checkpoint auto-detection, estimator construction,
and device reporting (equivalent of reference lib/evaluate/estimator.py:7-42
``get_using_device``/``load_ckpt``)."""

from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import jax.numpy as jnp

from torch_ekpose_tpu.config import Config, cfg as default_cfg
from torch_ekpose_tpu.models import init_model
from torch_ekpose_tpu.runtime import (
    PoseEstimator,
    convert_torch_checkpoint,
    load_checkpoint,
)

__all__ = [
    "add_model_args", "apply_platform", "build_estimator",
    "enable_compilation_cache", "report_devices",
]


def report_devices() -> None:
    devs = jax.devices()
    kinds = {d.platform for d in devs}
    print(f">>>> Using {len(devs)} {'/'.join(sorted(kinds))} device(s) <<<<")


def apply_platform(platform: str) -> None:
    """Pin the jax backend (the reference's --device cpu|cuda|mps flag,
    estimator.py:7-19). 'auto' keeps jax's default platform selection.
    Must run before the first jax computation."""
    if platform and platform != "auto":
        jax.config.update("jax_platforms", platform)


def enable_compilation_cache(path: Optional[str] = None) -> None:
    """Persist compiled executables across process restarts.

    The full fused inference program takes tens of seconds to compile
    cold; a serving process (cli.serve, run_video, eval sweeps) should
    pay that once per (shape, model, dtype), not once per restart.
    ``path=None`` resolves to $JAX_COMPILATION_CACHE_DIR if set, else
    ``~/.cache/torch_ekpose_tpu/xla``; ``path="none"`` DISABLES the
    cache even when the env var set one at import time (the
    --compilation-cache CLI escape hatch for quota-full or shared
    mounts). The persistence threshold
    (jax_persistent_cache_min_compile_time_secs) is left alone so
    operator env configuration survives."""
    if path == "none":
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_enable_compilation_cache", False)
        return
    path = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.join(
            os.path.expanduser("~"), ".cache", "torch_ekpose_tpu", "xla"
        )
    )
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return  # unwritable target: serve uncached rather than die
    jax.config.update("jax_enable_compilation_cache", True)
    jax.config.update("jax_compilation_cache_dir", path)


def add_model_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument(
        "-m", "--model", type=str, default="vgg2016", help="model name"
    )
    parser.add_argument(
        "-c", "--ckpt", type=str, default=None,
        help="checkpoint path (.pth reference checkpoints are converted "
        "on the fly; .msgpack are native)",
    )
    parser.add_argument(
        "--preprocess", type=str, default="vgg", choices=["vgg", "rtpose"],
    )
    parser.add_argument(
        "--decode-backend", type=str, default="auto",
        choices=["auto", "native", "numpy", "jax"],
    )
    parser.add_argument(
        "--dtype", type=str, default=None,
        choices=["bfloat16", "float32", "int8", "int8_static"],
        help="activation compute dtype (default bfloat16, or float32 "
        "under --precision highest; params stay float32); int8 = "
        "quantized serving mode (vgg family only: int8 weights + "
        "dynamic activation scales, bf16 elsewhere); int8_static = "
        "calibrated static activation scales (fastest batch-1 path; "
        "calibrates on the first frame unless the checkpoint was "
        "exported with cli.export --dtype int8_static)",
    )
    parser.add_argument(
        "--precision", type=str, default="fast",
        choices=["fast", "highest"],
        help="conv/dot multiply precision on TPU: 'fast' keeps the MXU's "
        "default bf16 multiplies (even for f32 operands); 'highest' maps "
        "every conv/dot to jax.lax.Precision.HIGHEST (true f32 "
        "multiplies, matching the reference's torch-CPU numerics) and "
        "implies --dtype float32 unless set explicitly. PERF.md "
        "'Serving numerics' has the measured AP/throughput trade",
    )
    parser.add_argument(
        "--platform", type=str, default="auto",
        choices=["auto", "cpu", "tpu"],
        help="pin the jax backend (the reference's --device flag; no "
        "-d short form — that's taken by --datasets in train/eval)",
    )
    parser.add_argument(
        "--s2d-blocks", type=int, default=0, choices=[0, 1, 2, 3],
        help="run the first N VGG19 blocks through the weight-exact "
        "space-to-depth decomposition (vgg family; same checkpoint "
        "tree; block 1 measures ~19%% faster on v5e — see "
        "ops/s2d_conv.py)",
    )
    parser.add_argument(
        "--dest-size", type=int, default=368,
        help="inference resolution: the long image side is resized to "
        "this before padding (the reference hard-codes 368)",
    )
    parser.add_argument(
        "--compilation-cache", type=str, default=None,
        help="persistent XLA compilation cache directory (default: "
        "$JAX_COMPILATION_CACHE_DIR or ~/.cache/torch_ekpose_tpu/xla; "
        "'none' disables) — a restarted serving process then skips the "
        "tens-of-seconds cold compile per shape",
    )


def load_variables(
    model_name: str, ckpt: Optional[str], quantized=False
):
    """``quantized`` truthy restores a pre-quantized int8 msgpack (its
    tree has kernel_q/scale leaves, so the float template can't receive
    it); pass ``"static"`` when the msgpack was exported with calibrated
    ``act_scale`` leaves (cli.export --dtype int8_static)."""
    if ckpt is None:
        print("WARNING: no checkpoint given; using random initialization")
        _, variables = init_model(model_name, input_shape=(1, 64, 64, 3))
        return variables
    if ckpt.endswith((".pth", ".pt")):
        print(f"INFO: converting reference checkpoint {ckpt}")
        return convert_torch_checkpoint(ckpt, model_name)
    print(f"INFO: loading checkpoint {ckpt}")
    if quantized:
        import functools

        import numpy as np

        from torch_ekpose_tpu.models import get_model

        qmodel = get_model(model_name, quantize=quantized)
        shapes = jax.eval_shape(
            functools.partial(qmodel.init, train=False),
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        )
        template = jax.tree.map(
            lambda s: np.zeros(s.shape, s.dtype), dict(shapes)
        )
        return load_checkpoint(ckpt, template)
    _, template = init_model(model_name, input_shape=(1, 64, 64, 3))
    return load_checkpoint(ckpt, template)


def _resolve_dtype(args) -> None:
    """Resolve the --dtype default against --precision (idempotent).

    ``--precision highest`` exists to reproduce the reference's
    torch-CPU f32 numerics on the TPU serving platform
    (reference lib/evaluate/estimator.py:71-88) — true-f32 multiplies
    require f32 operands, so it flips the unset dtype default to
    float32. An explicit --dtype always wins; int8 + highest is a
    contradiction (int8 MXU passes are not f32) and is rejected.
    """
    if getattr(args, "dtype", None) is None:
        args.dtype = (
            "float32"
            if getattr(args, "precision", "fast") == "highest"
            else "bfloat16"
        )
    if getattr(args, "precision", "fast") == "highest" \
            and args.dtype in ("int8", "int8_static"):
        raise SystemExit(
            "--precision highest (true-f32 multiplies) cannot combine "
            f"with --dtype {args.dtype}; drop one of the two flags"
        )


def _compute_dtype(name: str):
    """--dtype string -> PoseEstimator compute_dtype ("int8" and
    "int8_static" pass through as quantized-mode sentinels)."""
    if name in ("int8", "int8_static"):
        return name
    return jnp.bfloat16 if name == "bfloat16" else jnp.float32


def _load_variables_for_dtype(args):
    """Load --ckpt honoring --dtype: a float/converted checkpoint loads
    through the float template; a pre-quantized msgpack (cli.export
    --dtype int8/int8_static) fails that template and retries with the
    matching quantized one. One place for the detection so every CLI
    path behaves identically."""
    try:
        return load_variables(args.model, args.ckpt)
    except (KeyError, ValueError):
        if args.dtype not in ("int8", "int8_static"):
            raise
        return load_variables(
            args.model, args.ckpt,
            quantized="static" if args.dtype == "int8_static" else True,
        )


def build_model_and_variables(args):
    """(model, ready-to-serve variables) honoring --platform, --ckpt,
    --dtype (including the int8 serving mode) and --s2d-blocks — the
    shared front half of every estimator construction; used directly by
    the mesh-sharded CLI paths that build their own estimator."""
    from torch_ekpose_tpu.models import get_model, quantize_variables

    _resolve_dtype(args)
    apply_platform(getattr(args, "platform", "auto"))
    enable_compilation_cache(getattr(args, "compilation_cache", None))
    report_devices()
    if args.dtype == "int8_static":
        raise NotImplementedError(
            "the mesh-sharded CLI paths serve --dtype int8 (dynamic "
            "scales); for static scales export a calibrated checkpoint "
            "first (cli.export --dtype int8_static) and serve it through "
            "the single-device estimator paths"
        )
    if args.dtype == "int8":
        model = get_model(
            args.model, dtype=jnp.bfloat16, quantize=True,
            s2d_blocks=getattr(args, "s2d_blocks", 0),  # raises on the
            # int8+s2d conflict rather than silently dropping the flag
        )
        variables = _load_variables_for_dtype(args)
        variables = quantize_variables(variables, model)  # no-op if int8
        return model, variables
    variables = load_variables(args.model, args.ckpt)
    dtype = _compute_dtype(args.dtype)
    model = get_model(
        args.model, dtype=dtype,
        s2d_blocks=getattr(args, "s2d_blocks", 0),
    )
    if dtype != jnp.float32:
        from torch_ekpose_tpu.models import cast_params

        variables = cast_params(variables, dtype)
    return model, variables


def build_estimator(
    args: argparse.Namespace, config: Optional[Config] = None
) -> PoseEstimator:
    _resolve_dtype(args)
    apply_platform(getattr(args, "platform", "auto"))
    enable_compilation_cache(getattr(args, "compilation_cache", None))
    report_devices()
    variables = _load_variables_for_dtype(args)
    return PoseEstimator(
        model_name=args.model,
        variables=variables,
        config=config or default_cfg,
        preprocess=args.preprocess,
        decode_backend=args.decode_backend,
        compute_dtype=_compute_dtype(args.dtype),
        dest_size=getattr(args, "dest_size", 368),
        s2d_blocks=getattr(args, "s2d_blocks", 0),
        precision=getattr(args, "precision", "fast"),
    )
