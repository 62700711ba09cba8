"""ctypes bindings for the first-party C++ raster kernels (native/raster.cpp).

Byte-exact re-implementations of the OpenCV drawing primitives the reference
uses for skeleton rendering (DWPose/skeleton_extraction.py:16-100):
ellipse2Poly+fillConvexPoly, filled circle, thick line (LINE_8, shift 0).
Auto-builds the shared library on first use if a toolchain is available;
callers fall back to cv2 when it is not.
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
    i64p = ctypes.POINTER(ctypes.c_int64)
    ci = ctypes.c_int
    lib.cv_fill_ellipse.argtypes = [u8p, ci, ci, ci, ci, ci, ci, ci, ci, ci,
                                    u8p]
    lib.cv_fill_convex_poly.argtypes = [u8p, ci, ci, ci, i64p, ci, u8p]
    lib.cv_fill_circle.argtypes = [u8p, ci, ci, ci, ci, ci, ci, u8p]
    lib.cv_thick_line.argtypes = [u8p, ci, ci, ci, ci, ci, ci, ci, ci, u8p]
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


def _color(color: Sequence[float], channels: int = 3):
    """OpenCV scalar -> uint8 raw color: saturate_cast (round-half-even,
    clamp) per channel."""
    vals = [int(np.clip(np.rint(float(v)), 0, 255)) for v in color]
    while len(vals) < channels:
        vals.append(0)
    arr = (ctypes.c_uint8 * channels)(*vals[:channels])
    return ctypes.cast(arr, ctypes.POINTER(ctypes.c_uint8))


def fill_ellipse(canvas, center, axes, angle, color, delta: int = 1):
    """cv2.ellipse2Poly(center, axes, angle, 0, 360, delta) +
    cv2.fillConvexPoly, byte-exact."""
    load().cv_fill_ellipse(*_canvas_args(canvas), int(center[0]),
                           int(center[1]), int(axes[0]), int(axes[1]),
                           int(angle), int(delta), _color(color))


def fill_convex_poly(canvas, pts, color):
    pts = np.ascontiguousarray(np.asarray(pts, np.int64).reshape(-1, 2))
    load().cv_fill_convex_poly(
        *_canvas_args(canvas),
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        int(len(pts)), _color(color))


def fill_circle(canvas, cx, cy, radius, color):
    load().cv_fill_circle(*_canvas_args(canvas), int(cx), int(cy),
                          int(radius), _color(color))


def draw_line(canvas, x0, y0, x1, y1, thickness, color):
    load().cv_thick_line(*_canvas_args(canvas), int(x0), int(y0), int(x1),
                         int(y1), int(thickness), _color(color))


def scale_canvas(canvas, factor: float):
    flat = canvas.reshape(-1)
    load().scale_canvas(flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                        ctypes.c_int64(flat.size), ctypes.c_double(factor))
