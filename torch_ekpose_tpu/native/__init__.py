"""ctypes bridge to the native greedy PAF decoder.

Replaces the reference's SWIG module (reference lib/pafprocess/pafprocess.i,
setup.py, make.sh + the vendored 3k-line numpy.i) with a ~40-line ctypes
binding to a C ABI. The shared library is built on demand with ``make``;
callers should treat :func:`available` as the feature gate and fall back to
the numpy oracle when it returns False.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libpafdecode.so")
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _try_load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except (OSError, subprocess.SubprocessError):
            _load_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _load_failed = True
        return None
    lib.pafdecode_process.restype = ctypes.c_int
    lib.pafdecode_process.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,   # peaks, n_peaks
        ctypes.POINTER(ctypes.c_float),                 # pafs
        ctypes.c_int, ctypes.c_int,                     # h, w
        ctypes.c_int, ctypes.c_int,                     # stride, n_steps
        ctypes.c_float, ctypes.c_int,                   # thresh_paf, cnt1
        ctypes.c_float, ctypes.c_float,                 # part_cnt, human_score
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,   # out, max_people
    ]
    _lib = lib
    return _lib


def available() -> bool:
    """True when the shared library is present (building it if needed)."""
    return _try_load() is not None


def process_paf(
    peaks_flat: np.ndarray,
    pafs: np.ndarray,
    stride: int,
    n_steps: int,
    thresh_paf: float,
    thresh_vector_cnt1: int,
    thresh_part_cnt: float,
    thresh_human_score: float,
    max_people: int = 96,
) -> np.ndarray:
    """Run the native assembler.

    ``peaks_flat``: [P, 5] float32 (x, y, score, gid, part) in the
    upsampled frame. ``pafs``: [H, W, 38] float32 low-res PAF.
    Returns the [M, 20] person-row array.
    """
    lib = _try_load()
    if lib is None:
        raise RuntimeError(
            "native pafdecode library unavailable; build with "
            f"`make -C {_DIR}` or use the numpy backend"
        )
    peaks_flat = np.ascontiguousarray(peaks_flat, dtype=np.float32)
    pafs = np.ascontiguousarray(pafs, dtype=np.float32)
    if pafs.ndim != 3 or pafs.shape[2] != 38:
        raise ValueError(f"pafs must be [H, W, 38], got {pafs.shape}")
    out = np.zeros((max_people, 20), dtype=np.float32)
    n = lib.pafdecode_process(
        peaks_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(peaks_flat.shape[0]),
        pafs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(pafs.shape[0]), int(pafs.shape[1]),
        int(stride), int(n_steps),
        float(thresh_paf), int(thresh_vector_cnt1),
        float(thresh_part_cnt), float(thresh_human_score),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(max_people),
    )
    if n < 0:
        raise ValueError("pafdecode_process rejected its arguments")
    return out[:n].astype(np.float64)
