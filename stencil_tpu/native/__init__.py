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

_libs: dict = {}
_attempted: set = set()


def _build(src: Path, target: Path) -> bool:
    for cxx in ("g++", "c++", "clang++"):
        try:
            subprocess.run(
                [cxx, "-O3", "-std=c++17", "-shared", "-fPIC",
                 "-o", str(target), str(src), "-pthread"],
                check=True, capture_output=True, timeout=120,
            )
            return True
        except (subprocess.CalledProcessError, FileNotFoundError,
                subprocess.TimeoutExpired):
            continue
    return False


def _load_lib(stem: str, configure) -> Optional[ctypes.CDLL]:
    """Build (if stale/missing) and load ``<stem>.cpp`` as a shared lib,
    run ``configure(lib)`` to declare its ABI; None on any failure."""
    if stem in _libs:
        return _libs[stem]
    if stem in _attempted:
        return None
    _attempted.add(stem)
    src = _HERE / f"{stem}.cpp"
    lib_name = f"libstencil_{stem}.so"
    candidates = [_HERE / lib_name, Path(tempfile.gettempdir()) / lib_name]
    for target in candidates:
        if not target.exists() or target.stat().st_mtime < src.stat().st_mtime:
            try:
                if not _build(src, target):
                    continue
            except OSError:
                continue
        try:
            lib = ctypes.CDLL(str(target))
            configure(lib)
        except (OSError, AttributeError):
            continue
        _libs[stem] = lib
        return lib
    return None


def _configure_golden(lib):
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
        ctypes.POINTER(ctypes.c_int32),   # BC mode mask (ndim):
                                          # 0=Dirichlet 1=periodic 2=Neumann
    ]


def _configure_bmp(lib):
    w = lib.stencil_bmp_write
    w.restype = ctypes.c_int
    w.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                  ctypes.c_int64, ctypes.c_int64]
    c = lib.stencil_colorize
    c.restype = None
    c.argtypes = [ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                  ctypes.c_double, ctypes.c_double,
                  ctypes.POINTER(ctypes.c_uint8)]


def load() -> Optional[ctypes.CDLL]:
    """The native golden-model library; None on failure."""
    return _load_lib("golden", _configure_golden)


def load_bmp() -> Optional[ctypes.CDLL]:
    """The native BMP writer/colorizer library; None on failure."""
    return _load_lib("bmp", _configure_bmp)


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
    per = np.asarray(bc.periodic_mask(ndim), dtype=np.int32)
    neu = np.asarray(bc.neumann_mask(ndim), dtype=np.int32)
    modes = per + 2 * neu  # 0=Dirichlet, 1=periodic, 2=Neumann

    def p64(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

    def pi64(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    rc = lib.stencil_golden_iterate(
        p64(x), p64(out), pi64(shape), ndim, pi64(offsets), p64(weights),
        len(spec.weights), spec.radius, p64(bcv), iterations, num_threads,
        modes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        return None
    return out
