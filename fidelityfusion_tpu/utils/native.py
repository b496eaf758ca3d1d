"""Native (C) host-runtime helpers: build-on-first-use + ctypes loading.

The TPU compute path is JAX/XLA/Pallas; the host data path (dataset
alignment for the multi-fidelity data manager) has a native C
implementation (`csrc/fastmatch.c`) compiled lazily with the system
compiler and loaded via ctypes.  Everything degrades gracefully to the
numpy implementations when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_dir() -> str:
    d = os.path.join(_repo_root(), "build", "native")
    os.makedirs(d, exist_ok=True)
    return d


def load_fastmatch() -> Optional[ctypes.CDLL]:
    """Compile (once) and load libfastmatch; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(_repo_root(), "csrc", "fastmatch.c")
    if not os.path.exists(src):
        return None
    so = os.path.join(_build_dir(), "libfastmatch.so")
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            cc = os.environ.get("CC", "cc")
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", so, src],
                check=True,
                capture_output=True,
                timeout=60,
            )
        lib = ctypes.CDLL(so)
        lib.match_rows.restype = ctypes.c_int
        lib.match_rows.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def match_rows_native(
    x1: np.ndarray, x2: np.ndarray
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native exact-row matching; None if the library is unavailable."""
    lib = load_fastmatch()
    if lib is None:
        return None
    x1 = np.ascontiguousarray(np.asarray(x1, np.float64))
    x2 = np.ascontiguousarray(np.asarray(x2, np.float64))
    if x1.ndim != 2 or x2.ndim != 2 or x1.shape[1] != x2.shape[1]:
        return None
    n1, d = x1.shape
    n2 = x2.shape[0]
    out1 = np.zeros(n1, np.uint8)
    out2 = np.zeros(n2, np.uint8)
    rc = lib.match_rows(
        x1.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n1,
        x2.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n2,
        d,
        out1.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out2.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        return None
    return out1.astype(bool), out2.astype(bool)
