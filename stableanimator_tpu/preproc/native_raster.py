"""ctypes bindings for the first-party C++ raster kernels (native/raster.cpp).

Drop-in primitives for skeleton rendering: rotated-ellipse fill, filled
circle, thick line, canvas dim — the operations the reference delegates to
OpenCV's C++ (DWPose/skeleton_extraction.py:16-100). Auto-builds the shared
library on first use if a toolchain is available; callers fall back to cv2
when it is not.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libraster.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.fill_rotated_ellipse.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, f64p]
    lib.fill_circle.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, f64p]
    lib.draw_line.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, f64p]
    lib.scale_canvas.argtypes = [u8p, ctypes.c_int64, ctypes.c_double]
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def _canvas_args(canvas: np.ndarray):
    assert canvas.dtype == np.uint8 and canvas.ndim == 3 and canvas.flags.c_contiguous
    h, w, c = canvas.shape
    return (canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            int(h), int(w), int(c))


def _color(color: Sequence[float]) -> ctypes.POINTER(ctypes.c_double):
    arr = (ctypes.c_double * len(color))(*[float(v) for v in color])
    return ctypes.cast(arr, ctypes.POINTER(ctypes.c_double))


def fill_rotated_ellipse(canvas, cx, cy, a, b, angle_deg, color):
    load().fill_rotated_ellipse(*_canvas_args(canvas), float(cx), float(cy),
                                float(a), float(b), float(angle_deg),
                                _color(color))


def fill_circle(canvas, cx, cy, radius, color):
    load().fill_circle(*_canvas_args(canvas), int(cx), int(cy), int(radius),
                       _color(color))


def draw_line(canvas, x0, y0, x1, y1, thickness, color):
    load().draw_line(*_canvas_args(canvas), int(x0), int(y0), int(x1),
                     int(y1), int(thickness), _color(color))


def scale_canvas(canvas, factor: float):
    flat = canvas.reshape(-1)
    load().scale_canvas(flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                        ctypes.c_int64(flat.size), ctypes.c_double(factor))
