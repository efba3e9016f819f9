"""Unified pose-decode entry point with selectable backends.

``paf_to_pose(heatmaps, pafs)`` is the drop-in equivalent of the
reference's ``paf_to_pose_cpp`` (reference lib/utils/paf_to_pose.py:346-380):
[H, W, 19] heatmaps + [H, W, 38] PAFs for one image -> ``List[Human]``.

Backends:

- ``"native"`` — host NMS + the C++ assembler
  (:mod:`torch_ekpose_tpu.native`), the fast CPU path.
- ``"numpy"``  — the pure-numpy oracle (:mod:`~.decode.oracle`).
- ``"jax"``    — the fully on-device fixed-shape decoder
  (:mod:`~.decode.device`).
- ``"auto"``   — native when the shared library is available, else numpy.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from torch_ekpose_tpu import native
from torch_ekpose_tpu.config import Config, cfg as default_cfg
from torch_ekpose_tpu.decode import oracle
from torch_ekpose_tpu.utils.human import Human

__all__ = ["paf_to_pose", "flatten_peaks"]


def flatten_peaks(peaks_by_part: List[np.ndarray]) -> np.ndarray:
    """Per-part peak lists -> flat [P, 5] (x, y, score, gid, part) rows,
    with coordinates truncated to int as the assembler stores them
    (reference pafprocess.h:26-31)."""
    rows = []
    for part_id, plist in enumerate(peaks_by_part):
        for p in plist:
            rows.append([float(int(p[0])), float(int(p[1])), p[2], p[3],
                         float(part_id)])
    return (
        np.array(rows, dtype=np.float64)
        if rows else np.zeros((0, 5), dtype=np.float64)
    )


def paf_to_pose(
    heatmaps: np.ndarray,
    pafs: np.ndarray,
    config: Optional[Config] = None,
    backend: str = "auto",
) -> List[Human]:
    """Decode one image's network output into assembled people."""
    config = config or default_cfg
    if backend == "auto":
        backend = "native" if native.available() else "numpy"

    if backend == "jax":
        from torch_ekpose_tpu.decode import device

        return device.paf_to_pose_jax(heatmaps, pafs, config)
    if backend == "numpy":
        return oracle.paf_to_pose_numpy(heatmaps, pafs, config)
    if backend != "native":
        raise ValueError(f"unknown decode backend {backend!r}")

    stride = config.MODEL.DOWNSAMPLE
    peaks_by_part = oracle.nms(
        heatmaps, config.TEST.THRESH_HEATMAP, stride,
        config.MODEL.NUM_KEYPOINTS,
    )
    peaks_flat = flatten_peaks(peaks_by_part)
    subset = native.process_paf(
        peaks_flat, np.asarray(pafs, dtype=np.float32),
        stride=stride,
        n_steps=config.TEST.NUM_INTERMED_PTS_BETWEEN_KEYPOINTS,
        thresh_paf=config.TEST.THRESH_PAF,
        thresh_vector_cnt1=config.TEST.THRESH_VECTOR_CNT1,
        thresh_part_cnt=config.TEST.THRESH_PART_CNT,
        thresh_human_score=config.TEST.THRESH_HUMAN_SCORE,
    )
    return oracle.humans_from_decode(
        peaks_flat, subset,
        heatmaps.shape[0] * stride, heatmaps.shape[1] * stride,
    )
