"""Benchmark: sustained single-chip streaming-inference throughput of the
flagship vgg2016 pipeline at 432x368 (BASELINE.json headline metric) —
device preprocessing + 6-stage CPM forward (bfloat16) + fully on-device
pose decode, one fused XLA program per frame.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

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


def main() -> None:
    import jax

    # persistent compilation cache: repeat bench runs skip the multi-minute
    # XLA compiles entirely
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from torch_ekpose_tpu.config import get_default_config
    from torch_ekpose_tpu.models import cast_params, init_model
    from torch_ekpose_tpu.decode import device as decode_device
    from torch_ekpose_tpu.runtime.estimator import preprocess_jax

    h, w = 368, 432
    cfg = get_default_config()
    model, variables = init_model(
        "vgg2016", input_shape=(1, h, w, 3), dtype=jnp.bfloat16
    )
    variables = cast_params(variables, jnp.bfloat16)
    decoder = decode_device.build_decoder(cfg)

    @jax.jit
    def infer(variables, frame):
        # preprocess -> 6-stage CPM forward -> full pose decode as ONE
        # fused XLA program: nothing returns to the host until the
        # fixed-shape DecodeResult
        x = preprocess_jax(frame, "vgg")[None].astype(jnp.bfloat16)
        (paf, heatmap), _ = model.apply(variables, x, train=False)
        return decoder(
            heatmap[0].astype(jnp.float32), paf[0].astype(jnp.float32)
        )

    rng = np.random.default_rng(0)
    frames = [
        jnp.asarray(rng.integers(0, 255, (h, w, 3)), jnp.uint8)
        for _ in range(8)
    ]

    # warmup / compile
    jax.block_until_ready(infer(variables, frames[0]))

    n = 50
    t0 = time.perf_counter()
    for i in range(n):
        result = infer(variables, frames[i % len(frames)])
    jax.block_until_ready(result)
    dt = time.perf_counter() - t0
    fps = n / dt

    print(json.dumps({
        "metric": "vgg2016 inference+on-device-decode frames/sec/chip @432x368",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 12.0, 2),
    }))


if __name__ == "__main__":
    main()
