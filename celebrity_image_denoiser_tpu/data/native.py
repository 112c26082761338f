"""Python bindings for the native (C++) preprocessing stage.

ctypes over a dependency-free shared library (data/_native/loader.cpp) —
no pybind11 needed.  The GIL is released for the duration of the native
call (ctypes does this for C functions), so the resize/normalize/assembly
pool runs truly in parallel with the Python decode thread.

Falls back gracefully: ``available()`` is False when g++ is missing or the
build fails, and callers use the numpy path.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

from celebrity_image_denoiser_tpu.utils.logging import get_logger

logger = get_logger("cid_tpu.data.native")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        from celebrity_image_denoiser_tpu.data._native.build import build

        path = build()
        lib = ctypes.CDLL(path)
        lib.cid_assemble_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),          # srcs
            ctypes.POINTER(ctypes.c_int),             # shs
            ctypes.POINTER(ctypes.c_int),             # sws
            ctypes.c_int, ctypes.c_int,               # n, c
            ctypes.c_void_p,                          # dst
            ctypes.c_int, ctypes.c_int,               # dh, dw
            ctypes.c_float, ctypes.c_float,           # mean, std
            ctypes.c_int,                             # threads
        ]
        lib.cid_resize_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.cid_version.restype = ctypes.c_int
        assert lib.cid_version() == 1
        _lib = lib
        logger.info("native preprocessing stage loaded (%s)", path)
    except Exception as e:
        logger.info("native preprocessing unavailable (%s); using numpy path", e)
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def assemble_batch(
    images: List[np.ndarray],
    out_hw: Tuple[int, int],
    mean: float = 0.5,
    std: float = 0.5,
    threads: Optional[int] = None,
    out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """uint8 HWC images (any sizes) → float32 NHWC batch, bicubic-resized to
    out_hw and normalized to (x/255 - mean)/std, in parallel C++ threads."""
    lib = _load()
    n = len(images)
    dh, dw = out_hw
    c = images[0].shape[2]
    if out is None:
        out = np.empty((n, dh, dw, c), np.float32)
    if lib is None:  # numpy fallback (no resize support here)
        for i, img in enumerate(images):
            if img.shape[:2] != (dh, dw):
                raise RuntimeError("numpy fallback needs pre-sized images")
            out[i] = (img.astype(np.float32) / 255.0 - mean) / std
        return out
    images = [np.ascontiguousarray(img, np.uint8) for img in images]
    srcs = (ctypes.c_void_p * n)(*[img.ctypes.data for img in images])
    shs = (ctypes.c_int * n)(*[img.shape[0] for img in images])
    sws = (ctypes.c_int * n)(*[img.shape[1] for img in images])
    lib.cid_assemble_batch(
        srcs, shs, sws, n, c, out.ctypes.data, dh, dw,
        ctypes.c_float(mean), ctypes.c_float(std),
        threads or min(8, os.cpu_count() or 1),
    )
    return out


def resize_u8(img: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native stage unavailable")
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    dh, dw = out_hw
    out = np.empty((dh, dw, c), np.uint8)
    lib.cid_resize_u8(img.ctypes.data, h, w, out.ctypes.data, dh, dw, c)
    return out
