"""ctypes bindings for the native data-pipeline kernels (native/*.cpp).

The shared library is built on first use (g++, cached next to the sources);
``available()`` gates all call sites so pure-Python fallbacks keep working
when no toolchain is present.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libfastcollate.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = _NATIVE_DIR / "fast_collate.cpp"
    if not src.exists():
        return False
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", str(_LIB_PATH), str(src), "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.collate_crop_u8.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_void_p),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
    ]
    lib.collate_crop_u8.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def fast_collate_crop(images: Sequence[np.ndarray],
                      labels: Optional[Sequence[np.ndarray]],
                      ys: np.ndarray, xs: np.ndarray,
                      out_h: int, out_w: int, num_threads: int = 4):
    """Crop+normalize+stack uint8 slices -> (f32 [N,H,W], i32 [N,H,W]|None)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    n = len(images)
    in_h, in_w = images[0].shape
    images = [np.ascontiguousarray(im, np.uint8) for im in images]
    img_ptrs = (ctypes.c_void_p * n)(
        *[im.ctypes.data_as(ctypes.c_void_p).value for im in images])
    lab_ptrs = None
    out_lab = None
    if labels is not None:
        labels = [np.ascontiguousarray(lb, np.uint8) for lb in labels]
        lab_ptrs = (ctypes.c_void_p * n)(
            *[lb.ctypes.data_as(ctypes.c_void_p).value for lb in labels])
        out_lab = np.empty((n, out_h, out_w), np.int32)
    out_img = np.empty((n, out_h, out_w), np.float32)
    ys32 = np.ascontiguousarray(ys, np.int32)
    xs32 = np.ascontiguousarray(xs, np.int32)
    lib.collate_crop_u8(
        img_ptrs, lab_ptrs, n, in_h, in_w,
        ys32.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        xs32.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out_h, out_w,
        out_img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        (out_lab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
         if out_lab is not None else
         ctypes.cast(None, ctypes.POINTER(ctypes.c_int32))),
        num_threads)
    return out_img, out_lab
