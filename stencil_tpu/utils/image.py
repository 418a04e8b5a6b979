"""Heat-map image output: 24-bit BMP with blue->green->red colorization.

Analog of the reference's ``BMPImage`` writer
(``/root/reference/include/stencil/bmp_image.hpp:10-31``,
``src/stencil/bmp_image.cpp:7-64``: hand-rolled headers) and
``Stencil::to_bmp()`` colorization (blue->green->red over [0, 1],
``src/stencil/stencil.cpp:153-188``). In the reference this is dead code —
never called from ``main``; here it is wired to the CLI's ``--dump-image``.
Pure stdlib (struct), no image deps.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np


def colorize(values: np.ndarray, vmin: float = 0.0, vmax: float = 1.0) -> np.ndarray:
    """Map scalars to RGB uint8 via the reference's exact 4-segment
    piecewise ramp (``stencil.cpp:162-183``): blue -> cyan (v=0.25) ->
    green -> yellow -> red, channels truncated to u8 exactly like the
    reference's ``static_cast<unsigned char>``. Values are normalized to
    [vmin, vmax] and clamped (the reference asserts v <= 1 instead)."""
    span = (vmax - vmin) if vmax > vmin else 1.0
    v = np.clip((np.asarray(values, dtype=np.float64) - vmin) / span,
                0.0, 1.0)
    r = np.where(v < 0.5, 0.0, np.where(v < 0.75, 4.0 * (v - 0.5), 1.0))
    g = np.where(v < 0.25, 4.0 * v,
                 np.where(v < 0.75, 1.0, 1.0 + 4.0 * (0.75 - v)))
    b = np.where(v < 0.25, 1.0,
                 np.where(v < 0.5, 1.0 + 4.0 * (0.25 - v), 0.0))
    rgb = np.stack([r, g, b], axis=-1)
    return np.trunc(rgb * 255.0).astype(np.uint8)


def write_bmp(path: str | Path, rgb: np.ndarray) -> None:
    """Serialize an (H, W, 3) uint8 RGB array as a 24-bit uncompressed BMP.

    Hand-rolled BITMAPFILEHEADER + BITMAPINFOHEADER, rows bottom-up and
    4-byte padded, pixels stored BGR — the same wire format the reference
    emits (``bmp_image.cpp:28-64``).
    """
    rgb = np.asarray(rgb, dtype=np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) uint8, got {rgb.shape}")
    h, w, _ = rgb.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    image_size = (row_bytes + pad) * h
    data_offset = 14 + 40
    file_size = data_offset + image_size

    header = struct.pack(
        "<2sIHHI", b"BM", file_size, 0, 0, data_offset
    ) + struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0,
    )

    bgr = rgb[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    if pad:
        rows = np.zeros((h, row_bytes + pad), dtype=np.uint8)
        rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
        body = rows.tobytes()
    else:
        body = bgr.tobytes()

    Path(path).write_bytes(header + body)


def colorize_native(values: np.ndarray, vmin: float = 0.0,
                    vmax: float = 1.0) -> np.ndarray | None:
    """Native (C++) colorizer; None if the library is unavailable.
    Byte-identical to :func:`colorize` (cross-checked in tests)."""
    import ctypes

    from stencil_tpu import native

    lib = native.load_bmp()
    if lib is None:
        return None
    v = np.ascontiguousarray(values, dtype=np.float64)
    out = np.empty(v.shape + (3,), dtype=np.uint8)
    lib.stencil_colorize(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), v.size,
        float(vmin), float(vmax),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out


def write_bmp_native(path: str | Path, rgb: np.ndarray) -> bool:
    """Native (C++) BMP serializer; False if unavailable. Same wire format
    as :func:`write_bmp` (cross-checked in tests)."""
    import ctypes

    from stencil_tpu import native

    lib = native.load_bmp()
    if lib is None:
        return False
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    rc = lib.stencil_bmp_write(
        str(path).encode(),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
    )
    if rc != 0:
        raise OSError(f"native BMP write failed with code {rc}")
    return True


def dump_heatmap(path: str | Path, values: np.ndarray,
                 vmin: float = 0.0, vmax: float = 1.0) -> None:
    """Colorize a 2D field (or the middle slice of a 3D field) and write a
    BMP. Uses the native C++ writer when available (reference parity:
    its writer is native, ``bmp_image.cpp``), the Python one otherwise."""
    values = np.asarray(values)
    if values.ndim == 3:
        values = values[values.shape[0] // 2]
    if values.ndim != 2:
        raise ValueError(f"expected 2D or 3D field, got shape {values.shape}")
    rgb = colorize_native(values, vmin, vmax)
    if rgb is None:
        write_bmp(path, colorize(values, vmin, vmax))
        return
    if not write_bmp_native(path, rgb):
        write_bmp(path, rgb)
