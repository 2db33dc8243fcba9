"""ctypes binding to the native C++ triangulator (mioc_tpu/native/triangle.cpp).

Provides constrained Delaunay triangulation of a polygon with Ruppert-style
quality refinement and a maximum-area constraint — the native-parity
replacement for the reference's Shewchuk Triangle dependency (SURVEY.md §2.9a).
Returns ``None`` from :func:`triangulate` when the shared library has not been
built; callers fall back to the Python generator.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _build(src, path) -> bool:
    """Compile the triangulator on first use if a C++ toolchain is around."""
    import shutil
    import subprocess

    gxx = shutil.which("g++") or shutil.which("clang++")
    if gxx is None:
        return False
    try:
        subprocess.run(
            [gxx, "-O2", "-shared", "-fPIC", "-std=c++17", "-o", path, src],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(path)
    except Exception:
        return False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    native_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
    )
    path = os.path.join(native_dir, "libmioc_triangle.so")
    src = os.path.join(native_dir, "triangle.cpp")
    if not os.path.exists(path) or (
        os.path.exists(src) and os.path.getmtime(path) < os.path.getmtime(src)
    ):
        _build(src, path)
    if os.path.exists(path):
        try:
            lib = ctypes.CDLL(path)
            lib.mioc_triangulate.restype = ctypes.c_longlong
            lib.mioc_triangulate.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,   # polygon
                ctypes.c_double,                                  # max area
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,    # out pts
                ctypes.POINTER(ctypes.c_int), ctypes.c_int,       # out tris
                ctypes.POINTER(ctypes.c_int), ctypes.c_int,       # out segs+mark
            ]
            _LIB = lib
        except OSError:
            _LIB = None
    return _LIB


def triangulate(vertices: np.ndarray, maxarea: float):
    lib = _load()
    if lib is None:
        return None
    nv = len(vertices)
    poly = np.ascontiguousarray(vertices, dtype=np.float64)
    # Generous output capacity estimates.
    area_poly = 0.5 * abs(
        np.sum(
            poly[:, 0] * np.roll(poly[:, 1], -1) - np.roll(poly[:, 0], -1) * poly[:, 1]
        )
    )
    cap_t = max(64, int(12 * area_poly / maxarea) + 16 * nv)
    cap_p = cap_t + 2 * nv + 8
    pts = np.zeros((cap_p, 2), dtype=np.float64)
    tris = np.zeros((cap_t, 3), dtype=np.int32)
    segs = np.zeros((cap_t, 3), dtype=np.int32)  # v1, v2, marker
    n = lib.mioc_triangulate(
        poly.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), nv,
        ctypes.c_double(maxarea),
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), cap_p,
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), cap_t,
        segs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), cap_t,
    )
    if n <= 0:
        return None
    npts = n & 0xFFFFF
    ntri = (n >> 20) & 0xFFFFF
    nseg = (n >> 40) & 0xFFFFF
    return (
        pts[:npts].copy(),
        tris[:ntri].astype(np.int64),
        segs[:nseg, :2].astype(np.int64),
        segs[:nseg, 2].astype(np.int64),
    )
