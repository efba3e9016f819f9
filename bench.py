"""Benchmark: sustained single-chip streaming-inference throughput of the
flagship vgg2016 pipeline at 432x368 (BASELINE.json headline metric) —
device preprocessing + 6-stage CPM forward (bfloat16) + fully on-device
pose decode (grid-batched Pallas match/merge kernels) on batches of 8
frames, results packed into one buffer per batch. ONE fused XLA program
per batch: preprocess + forward + decode + the chain scalar. (Earlier
rounds ran forward and decode as two chained programs because fusing
them compiled for minutes; once the decoder's gathers became one-hot
contractions the fused pair compiles in normal time and measures ~2%
faster than the chained pair — 373 vs 366 fps. An apparent ~20% gain
was a measurement artifact: a profiling program that returned only a
scalar derived from packed[0,0] let XLA dead-code-eliminate the decode
stage. This bench returns the full packed buffer, so nothing is DCE'd.)

Batch 8 is where per-chip throughput saturates on v5e (measured sweep in
docs/PERF.md). Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` divides by 12.0 frames/s — the reference publishes no
numbers (BASELINE.md) and cannot run in this image (no GPU, and its model
factory requires torchvision); 12 fps is the commonly reported desktop-GPU
throughput of this OpenPose-lineage VGG19 CPM family at ~368-input, used
as a provisional denominator until a measured reference number exists.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main(h: int = 368, w: int = 432, b: int = 8, n: int = 50) -> None:
    """Defaults are the headline configuration; the knobs exist so the
    same loop can be smoke-tested on CPU at tiny sizes."""
    import os

    import jax

    # persistent compilation cache: repeat bench runs skip the multi-minute
    # XLA compiles entirely. One shared enabling path with the CLIs
    # (cli.common); /tmp/jax_cache stays the fallback so existing warm
    # caches on bench machines keep hitting.
    from torch_ekpose_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache(
        os.environ.get("JAX_COMPILATION_CACHE_DIR") or "/tmp/jax_cache"
    )

    import jax.numpy as jnp

    from torch_ekpose_tpu.config import get_default_config
    from torch_ekpose_tpu.models import cast_params, init_model
    from torch_ekpose_tpu.decode import device as decode_device
    from torch_ekpose_tpu.runtime.estimator import preprocess_jax

    cfg = get_default_config()
    model, variables = init_model(
        "vgg2016", input_shape=(1, h, w, 3), dtype=jnp.bfloat16
    )
    # NOT s2d_blocks=1: the space-to-depth block-1 decomposition wins in
    # isolation (4.9 vs 6.0 ms, scripts/profile_s2d.py) but measures
    # ~0.6 ms SLOWER inside the full fused pipeline program (same-process
    # A/B, 2 reps) — the parity repack materializations beat the conv
    # gain once XLA schedules the whole program. docs/PERF.md has both.
    variables = cast_params(variables, jnp.bfloat16)
    packed_decoder = decode_device.build_packed_decoder(cfg, batched=True)

    @jax.jit
    def infer(variables, frames, tweak):
        # ``tweak`` is a uint8 scalar derived from the PREVIOUS batch's
        # decode output (always zero in value): it makes each iteration
        # data-dependent on the last, so the measured loop cannot be
        # reordered, overlapped, or skipped by any runtime — the final
        # scalar fetch transitively proves every batch really ran.
        x = jax.vmap(lambda f: preprocess_jax(f, "vgg"))(frames + tweak)
        (paf, heatmap), _ = model.apply(
            variables, x.astype(jnp.bfloat16), train=False
        )
        packed = packed_decoder(
            heatmap.astype(jnp.float32), paf.astype(jnp.float32)
        )
        return packed, (packed[0, 0] * 0).astype(jnp.uint8)

    # decode-kernel certification on the SAME device the bench runs on:
    # the grid-batched Pallas match/merge decoder must reproduce the numpy
    # oracle exactly on synthetic multi-person scenes. The CI suite can
    # only run these kernels in interpret/fallback mode on CPU; this is
    # the check that each recorded bench result also certifies the real
    # TPU kernels (scenes from decode/synthetic.py, the same generator
    # scripts/tpu_parity_check.py uses).
    from torch_ekpose_tpu.decode import device as decode_dev, oracle
    from torch_ekpose_tpu.decode.synthetic import canonical_humans, synth_scene

    prng = np.random.default_rng(7)
    scenes = [synth_scene(prng, int(prng.integers(1, 5))) for _ in range(4)]
    sh, sw = scenes[0][0].shape[:2]
    packed = jax.device_get(packed_decoder(
        jnp.asarray(np.stack([s[0] for s in scenes])),
        jnp.asarray(np.stack([s[1] for s in scenes])),
    ))
    parity_ok = all(
        canonical_humans(
            decode_dev.packed_to_humans(packed[i], sh * 8, sw * 8, cfg)
        ) == canonical_humans(oracle.paf_to_pose_numpy(ht, paf, cfg))
        for i, (ht, paf) in enumerate(scenes)
    )

    rng = np.random.default_rng(0)
    batches = [
        jnp.asarray(rng.integers(0, 255, (b, h, w, 3)), jnp.uint8)
        for _ in range(4)
    ]

    # warmup / compile
    tweak = jnp.asarray(0, jnp.uint8)
    _, tweak = infer(variables, batches[0], tweak)
    jax.block_until_ready(tweak)

    # best of three timing loops: a transient host<->device transport
    # stall can only make a loop slower, never faster, so the max is the
    # honest sustained-throughput figure
    fps = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(n):
            _, tweak = infer(variables, batches[i % len(batches)], tweak)
        # a real value fetch, not block_until_ready: it cannot return
        # until the whole dependency chain has executed (an unconditional
        # statement — an assert would vanish under python -O and stop the
        # clock early)
        final = int(jax.device_get(tweak))
        dt = time.perf_counter() - t0
        if final != 0:
            raise RuntimeError(f"chain scalar should be 0, got {final}")
        fps = max(fps, n * b / dt)

    # secondary metric: the int8 quantized serving mode with CALIBRATED
    # static activation scales (--dtype int8_static on the CLIs;
    # models/quant.py) through the same fused pipeline. The quantized
    # model approximates the f32 network (cosine > 0.99,
    # tests/test_quantize.py), so it does NOT replace the exact-model
    # headline — but it is the fastest production serving path measured
    # (489 static / 474 dynamic vs 373 bf16 fps at batch 8 on v5e,
    # docs/PERF.md). Calibration inputs here are the bench frames
    # themselves; scale VALUES don't affect speed.
    # Only SETUP (model build, quantization, calibration, first compile)
    # may fail soft to int8_fps=None — a backend without int8 support is
    # a missing secondary metric, not a broken bench. Once timing starts,
    # a chain-scalar integrity failure raises as loudly as the headline
    # loop's (a corrupt program must never read as "metric unavailable").
    int8_fps = None
    infer_q = None
    try:
        from torch_ekpose_tpu.models import (
            calibrate_act_scales,
            get_model,
            quantize_variables,
        )

        dyn_qmodel = get_model("vgg2016", dtype=jnp.bfloat16, quantize=True)
        qmodel = get_model("vgg2016", dtype=jnp.bfloat16, quantize="static")
        qvariables = quantize_variables(variables, dyn_qmodel)
        # calibrate on a TINY random batch: scale VALUES don't affect
        # speed, and the dynamic model's full-resolution calibration
        # program would be a multi-minute compile this bench never
        # times (the measured program below compiles regardless)
        calib_frames = jnp.asarray(
            np.random.default_rng(1).integers(0, 255, (2, 96, 96, 3)),
            jnp.uint8,
        )
        calib = jax.jit(
            jax.vmap(lambda f: preprocess_jax(f, "vgg"))
        )(calib_frames)
        qvariables = calibrate_act_scales(qvariables, dyn_qmodel, [calib])

        @jax.jit
        def infer_q(qvariables, frames, tweak):
            x = jax.vmap(lambda f: preprocess_jax(f, "vgg"))(frames + tweak)
            (paf, heatmap), _ = qmodel.apply(
                qvariables, x.astype(jnp.bfloat16), train=False
            )
            packed = packed_decoder(
                heatmap.astype(jnp.float32), paf.astype(jnp.float32)
            )
            return packed, (packed[0, 0] * 0).astype(jnp.uint8)

        _, qtweak = infer_q(qvariables, batches[0], jnp.asarray(0, jnp.uint8))
        jax.block_until_ready(qtweak)
    except Exception as e:  # soft metric — but always say why
        import sys

        print(f"int8 sweep unavailable: {e!r}", file=sys.stderr)
        infer_q = None
    if infer_q is not None:
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(n):
                _, qtweak = infer_q(
                    qvariables, batches[i % len(batches)], qtweak
                )
            final = int(jax.device_get(qtweak))
            dt = time.perf_counter() - t0
            if final != 0:
                raise RuntimeError(f"chain scalar should be 0, got {final}")
            int8_fps = max(int8_fps or 0.0, round(n * b / dt, 2))

    # model FLOPs utilization: XLA's cost analysis of the OPTIMIZED
    # forward program (post-compilation, FMA = 2 flops — same convention
    # as the peak specs) against the chip's bf16 peak. None when the
    # device kind is unrecognized.
    from torch_ekpose_tpu.utils.hardware import bf16_peak_flops

    mfu = None
    try:
        cost = infer.lower(
            variables, batches[0], tweak
        ).compile().cost_analysis()
        flops_batch = float((cost or {}).get("flops", 0.0))
        peak = bf16_peak_flops(jax.devices()[0].device_kind)
        if peak and flops_batch > 0:
            mfu = round((fps / b) * flops_batch / peak, 4)
    except Exception:
        pass

    print(json.dumps({
        "metric": "vgg2016 inference+on-device-decode frames/sec/chip @432x368",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 12.0, 2),
        # the reference publishes no numbers and cannot run in this image
        # (no GPU, no torchvision); the 12 fps denominator is the commonly
        # reported desktop-GPU figure for this model family, NOT a
        # measured-vs-measured ratio (BASELINE.md)
        "baseline_provisional": True,
        # exact device-vs-oracle agreement of the Pallas decode kernels on
        # the chip this bench ran on (see the parity block above)
        "decode_parity": "ok" if parity_ok else "FAIL",
        # fused-pipeline-program (preprocess+forward+decode) model-FLOPs
        # utilization vs the chip's bf16 peak
        "mfu": mfu,
        # the int8 quantized serving mode through the same pipeline
        # (approximate model — the headline value stays the exact one)
        "int8_fps": int8_fps,
    }))
    if not parity_ok:
        # loud like the chain-scalar check: a throughput figure from a
        # decoder producing wrong poses must not read as a clean result
        # (the JSON above is still emitted for the record)
        raise SystemExit("decode parity FAILED on this device")


if __name__ == "__main__":
    main()
