"""Native (C++) golden-model verifier, loaded via ctypes.

The reference's verifier is native host C++ (``stencil.cpp:75-151``); ours
is too — ``golden.cpp``, compiled on first use with the system toolchain and
cached next to the source. ``golden_iterate_native`` mirrors
``stencil_tpu.ops.golden.golden_iterate`` exactly (cross-checked in tests)
at native multithreaded speed for large-grid differential checks. Falls
back to None (callers use the NumPy path) when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import tempfile
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "golden.cpp"
_LIB_NAME = "libstencil_golden.so"

_lib = None
_load_attempted = False


def _build(target: Path) -> bool:
    for cxx in ("g++", "c++", "clang++"):
        try:
            subprocess.run(
                [cxx, "-O3", "-std=c++17", "-shared", "-fPIC",
                 "-o", str(target), str(_SRC), "-pthread"],
                check=True, capture_output=True, timeout=120,
            )
            return True
        except (subprocess.CalledProcessError, FileNotFoundError,
                subprocess.TimeoutExpired):
            continue
    return False


def load() -> Optional[ctypes.CDLL]:
    """Build (if needed) and load the native library; None on failure."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    candidates = [_HERE / _LIB_NAME,
                  Path(tempfile.gettempdir()) / _LIB_NAME]
    for target in candidates:
        if not target.exists() or target.stat().st_mtime < _SRC.stat().st_mtime:
            try:
                if not _build(target):
                    continue
            except OSError:
                continue
        try:
            lib = ctypes.CDLL(str(target))
        except OSError:
            continue
        fn = lib.stencil_golden_iterate
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_double),  # input
            ctypes.POINTER(ctypes.c_double),  # output
            ctypes.POINTER(ctypes.c_int64),   # shape
            ctypes.c_int,                     # ndim
            ctypes.POINTER(ctypes.c_int64),   # offsets
            ctypes.POINTER(ctypes.c_double),  # weights
            ctypes.c_int,                     # num_taps
            ctypes.c_int,                     # radius
            ctypes.POINTER(ctypes.c_double),  # bc
            ctypes.c_int64,                   # iterations
            ctypes.c_int,                     # num_threads
        ]
        _lib = lib
        return _lib
    return None


def available() -> bool:
    return load() is not None


def golden_iterate_native(interior0, spec, iterations, bc=None,
                          num_threads: int = 0) -> Optional[np.ndarray]:
    """Native float64 golden iterate; None if the library is unavailable."""
    from stencil_tpu.core.grid import DirichletBC

    lib = load()
    if lib is None:
        return None
    x = np.ascontiguousarray(interior0, dtype=np.float64)
    ndim = x.ndim
    if ndim not in (2, 3):
        return None
    if bc is None:
        bc = DirichletBC.reference_default(ndim)
    out = np.empty_like(x)
    shape = np.asarray(x.shape, dtype=np.int64)
    offsets = np.asarray(spec.offsets, dtype=np.int64).reshape(-1)
    weights = np.asarray(spec.weights, dtype=np.float64)
    bcv = np.asarray(bc.values, dtype=np.float64).reshape(-1)

    def p64(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

    def pi64(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    rc = lib.stencil_golden_iterate(
        p64(x), p64(out), pi64(shape), ndim, pi64(offsets), p64(weights),
        len(spec.weights), spec.radius, p64(bcv), iterations, num_threads,
    )
    if rc != 0:
        return None
    return out
