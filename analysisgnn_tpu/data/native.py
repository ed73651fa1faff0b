"""ctypes bridge to the native (C++) data-path kernels in ``native/``.

The reference's data path is C-accelerated (graphmuse ``csamplers``,
SURVEY §2.3); here the equivalent compiled core is built on demand with the
system toolchain and loaded via ctypes — no extension-module packaging
needed, automatic numpy fallback when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Dict, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_library() -> Optional[str]:
    src = os.path.join(_NATIVE_DIR, "graphbuild.cpp")
    if not os.path.exists(src):
        return None
    out = os.path.join(_NATIVE_DIR, "libagtnative.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", out],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return out
    except Exception:
        return None


def get_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        path = _build_library()
        if path:
            lib = ctypes.CDLL(path)
            lib.agt_build_edges.restype = ctypes.c_int64
            lib.agt_build_edges.argtypes = [
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
            ]
            _LIB = lib
    return _LIB


def native_available() -> bool:
    return get_library() is not None


def build_note_edges_native(
    onset_div: np.ndarray, duration_div: np.ndarray
) -> Optional[Dict[str, np.ndarray]]:
    """Typed note-note edges via the C++ builder; None when unavailable.

    Returns {relation: [2, E]} for the four base relations.
    """
    lib = get_library()
    if lib is None:
        return None
    onset = np.ascontiguousarray(onset_div, np.int64)
    dur = np.ascontiguousarray(duration_div, np.int64)
    n = len(onset)
    p_i64 = ctypes.POINTER(ctypes.c_int64)
    p_u8 = ctypes.POINTER(ctypes.c_uint8)
    need = lib.agt_build_edges(
        onset.ctypes.data_as(p_i64), dur.ctypes.data_as(p_i64), n,
        None, None, None, 0,
    )
    if need < 0:
        raise ValueError(f"native builder error {need}")
    src = np.empty(need, np.int64)
    dst = np.empty(need, np.int64)
    typ = np.empty(need, np.uint8)
    got = lib.agt_build_edges(
        onset.ctypes.data_as(p_i64), dur.ctypes.data_as(p_i64), n,
        src.ctypes.data_as(p_i64), dst.ctypes.data_as(p_i64),
        typ.ctypes.data_as(p_u8), need,
    )
    assert got == need
    names = ("onset", "consecutive", "during", "rest")
    return {
        names[t]: np.stack([src[typ == t], dst[typ == t]])
        for t in range(4)
    }
