"""ctypes bindings for the native C++ host-preprocessing library.

Builds on demand (``make -C native``) and falls back to numpy when the
toolchain or .so is unavailable — all callers treat this as an optional
fast path.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO = _NATIVE_DIR / "libclimategan_native.so"


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    try:
        if not _SO.exists():
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)], check=True,
                capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(str(_SO))
        lib.pack_uint8_to_m11.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int,
        ]
        lib.unit_to_uint8_minmax.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
        ]
        lib.prepare_inference_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.prepare_inference_u8.restype = ctypes.c_int
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def pack_uint8_to_m11(img: np.ndarray, n_threads: int = 2) -> np.ndarray:
    """uint8 array -> float32 [-1,1], native when possible."""
    lib = _load()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if lib is None:
        return img.astype(np.float32) / 127.5 - 1.0
    out = np.empty(img.shape, np.float32)
    lib.pack_uint8_to_m11(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        img.size, n_threads,
    )
    return out


def prepare_inference(img: np.ndarray, target: int = 640) -> np.ndarray:
    """uint8 HWC -> float32 (target,target,C) in [-1,1]: resize-keep-AR +
    center crop + scale, all in C++ (fallback: numpy/cv2 path)."""
    lib = _load()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if lib is not None:
        out = np.empty((target, target, c), np.float32)
        rc = lib.prepare_inference_u8(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            h, w, c,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), target,
        )
        if rc == 0:
            return out
    # fallback
    import cv2

    if h < w:
        nh, nw = target, int(round(w * target / h))
    else:
        nh, nw = int(round(h * target / w)), target
    r = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    top, left = (nh - target) // 2, (nw - target) // 2
    crop = r[top: top + target, left: left + target]
    return crop.astype(np.float32) / 127.5 - 1.0
