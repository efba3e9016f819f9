"""TPU peak-FLOPs table for MFU reporting.

One authoritative copy shared by bench.py and the profiler scripts.
Peaks are dense bf16 TFLOP/s per chip from Google's public TPU specs.
"""

from __future__ import annotations

from typing import Optional

__all__ = ["BF16_PEAK_FLOPS", "bf16_peak_flops"]

#: lowercase device-kind substring -> dense bf16 peak FLOP/s per chip.
BF16_PEAK_FLOPS = {
    "v5 lite": 197e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v4": 275e12,
    "v6 lite": 918e12,
    "v6e": 918e12,
    "v3": 123e12,
}


def bf16_peak_flops(device_kind: str) -> Optional[float]:
    """Peak bf16 FLOP/s for a ``jax.Device.device_kind`` string, or None
    when the chip is unrecognized (e.g. the CPU backend)."""
    kind = device_kind.lower()
    return next(
        (v for k, v in BF16_PEAK_FLOPS.items() if k in kind), None
    )
