"""ctypes loader for the native DSP library (native/cosy_dsp.cpp).

Builds on first use with the system toolchain if the .so is absent; every
consumer has a pure-numpy fallback, so the framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from functools import lru_cache

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


@lru_cache(maxsize=1)
def load_library():
    so_path = os.path.abspath(os.path.join(_NATIVE_DIR, "libcosy_dsp.so"))
    if not os.path.exists(so_path):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True)
        except Exception as e:  # no toolchain: fall back to numpy paths
            logging.info("native cosy_dsp build unavailable: %s", e)
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError as e:
        logging.info("native cosy_dsp load failed: %s", e)
        return None
    lib.yin_f0.restype = ctypes.c_int
    lib.yin_f0.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
    ]
    return lib


def yin_f0_native(
    wav: np.ndarray,
    sample_rate: int = 24000,
    hop: int = 480,
    fmin: float = 60.0,
    fmax: float = 500.0,
    frame_len: int = 1920,
    threshold: float = 0.15,
) -> np.ndarray | None:
    """Native YIN; returns None when the library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    wav = np.ascontiguousarray(wav, np.float32)
    n_frames = len(wav) // hop
    out = np.zeros(n_frames, np.float32)
    lib.yin_f0(
        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(wav)), sample_rate, hop,
        ctypes.c_float(fmin), ctypes.c_float(fmax), frame_len,
        ctypes.c_float(threshold),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
