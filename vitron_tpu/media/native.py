"""ctypes bindings for the native C++ media preprocessor.

Compiles vitron_tpu/media/native/preprocess.cpp on first use (g++ -O3,
cached next to the source) and exposes `resize_normalize_batch`. Falls back
to a numpy implementation when no compiler is available, so the import
never fails. See preprocess.cpp for what this replaces in the reference.
"""
from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

from vitron_tpu.constants import (
    OPENAI_DATASET_MEAN,
    OPENAI_DATASET_STD,
    VISION_IMAGE_SIZE,
)

_SRC = pathlib.Path(__file__).parent / "native" / "preprocess.cpp"
_SO = _SRC.with_suffix(".so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-std=c++17", "-pthread", str(_SRC), "-o", str(_SO)],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(str(_SO))
            lib.vitron_resize_normalize_batch.restype = ctypes.c_int
            lib.vitron_resize_normalize_batch.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int]
            lib.vitron_uniform_indices.argtypes = [
                ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def resize_normalize_batch(
    images: np.ndarray,
    out_size: int = VISION_IMAGE_SIZE,
    mean: Sequence[float] = OPENAI_DATASET_MEAN,
    std: Sequence[float] = OPENAI_DATASET_STD,
    n_threads: int = 8,
) -> np.ndarray:
    """[N, H, W, 3] uint8 -> [N, out, out, 3] float32 (resize short side,
    center crop, normalize). Uses the C++ library when available."""
    images = np.ascontiguousarray(images, np.uint8)
    n, h, w, c = images.shape
    assert c == 3
    lib = _load()
    out = np.empty((n, out_size, out_size, 3), np.float32)
    if lib is not None:
        m = np.asarray(mean, np.float32)
        s = np.asarray(std, np.float32)
        rc = lib.vitron_resize_normalize_batch(
            images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, h, w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_size,
            m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads)
        if rc == 0:
            return out
    return _numpy_fallback(images, out_size, mean, std)


def _numpy_fallback(images, out_size, mean, std):
    outs = []
    for img in images:
        h, w = img.shape[:2]
        scale = h / out_size if h <= w else w / out_size
        nh, nw = h / scale, w / scale  # fractional, like the C++ path
        ys = (np.arange(out_size) + (nh - out_size) * 0.5 + 0.5) * scale - 0.5
        xs = (np.arange(out_size) + (nw - out_size) * 0.5 + 0.5) * scale - 0.5
        yf = np.floor(ys).astype(int)
        xf = np.floor(xs).astype(int)
        wy = (ys - yf)[:, None, None]
        wx = (xs - xf)[None, :, None]
        y1 = np.clip(yf + 1, 0, h - 1)
        x1 = np.clip(xf + 1, 0, w - 1)
        y0 = np.clip(yf, 0, h - 1)
        x0 = np.clip(xf, 0, w - 1)
        f = img.astype(np.float32)
        v = (f[y0][:, x0] * (1 - wy) * (1 - wx) + f[y0][:, x1] * (1 - wy) * wx
             + f[y1][:, x0] * wy * (1 - wx) + f[y1][:, x1] * wy * wx) / 255.0
        outs.append((v - np.asarray(mean, np.float32)) / np.asarray(std, np.float32))
    return np.stack(outs)


def uniform_indices(num_total: int, num_out: int) -> np.ndarray:
    lib = _load()
    if lib is not None:
        out = np.empty((num_out,), np.int32)
        lib.vitron_uniform_indices(num_total, num_out,
                                   out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        return out
    return np.linspace(0, num_total - 1, num_out, dtype=int).astype(np.int32)
