"""ctypes binding for the native C++ host kernels (``native/bioik_native.cpp``).

Provides the double-precision FK oracle (counterpart of the reference's
``RobotFK_MoveIt`` oracle, forward_kinematics.h:1468-1503) and the convex
support-point query.  The shared library is built on demand with g++; if
no toolchain is available the import still succeeds and ``available()``
returns False (tests fall back to the scipy oracle).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(os.path.dirname(_HERE), "native", "bioik_native.cpp")
_SO = os.path.join(os.path.dirname(_HERE), "native", "libbioik_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    c_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    c_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.bioik_fk_batch.argtypes = [
        ctypes.c_int64, c_i64p, c_i64p, c_f64p, c_f64p, c_f64p, c_i64p,
        ctypes.c_int64, c_i64p, c_f64p, c_f64p,
        ctypes.c_int64, c_f64p,
        ctypes.c_int64, c_i64p,
        c_f64p, c_f64p,
    ]
    lib.bioik_support_point.argtypes = [ctypes.c_int64, c_f64p, c_f64p]
    lib.bioik_support_point.restype = ctypes.c_int64
    lib.bioik_native_abi_version.restype = ctypes.c_int
    if lib.bioik_native_abi_version() != 1:
        return None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def oracle_fk(model, qs: np.ndarray, tip_links: Sequence[str]) -> tuple:
    """Double-precision batched FK oracle: ``qs (B, Vfull)`` →
    ``(pos (B, T, 3), quat (B, T, 4))``."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    qs = np.ascontiguousarray(np.atleast_2d(qs), dtype=np.float64)
    B = qs.shape[0]
    tips = np.asarray([model.link_index[t] for t in tip_links], dtype=np.int64)
    T = len(tips)
    out_pos = np.empty((B, T, 3), dtype=np.float64)
    out_quat = np.empty((B, T, 4), dtype=np.float64)
    lib.bioik_fk_batch(
        model.nlinks,
        np.ascontiguousarray(model.parent, np.int64),
        np.ascontiguousarray(model.jtype, np.int64),
        np.ascontiguousarray(model.origin_pos, np.float64),
        np.ascontiguousarray(model.origin_quat, np.float64),
        np.ascontiguousarray(model.axis, np.float64),
        np.ascontiguousarray(model.vstart, np.int64),
        model.nvars,
        np.ascontiguousarray(model.mimic_src, np.int64),
        np.ascontiguousarray(model.mimic_factor, np.float64),
        np.ascontiguousarray(model.mimic_offset, np.float64),
        B,
        qs,
        T,
        tips,
        out_pos,
        out_quat,
    )
    return out_pos, out_quat


def support_point(points: np.ndarray, direction: np.ndarray) -> int:
    """Index of the convex-hull support point along ``direction``."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    pts = np.ascontiguousarray(points, np.float64)
    d = np.ascontiguousarray(direction, np.float64)
    return int(lib.bioik_support_point(len(pts), pts, d))
