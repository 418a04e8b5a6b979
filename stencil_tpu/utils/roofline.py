"""Roofline accounting: GLUPS, bytes/point, and fraction of measured HBM
bandwidth.

The reference reports only wall-clock ms (``main.cpp:33-43``); the TPU
build's north star is stated as a fraction of the HBM-bandwidth roofline
(BASELINE.json), so the driver derives:

  GLUPS      = grid points * sweeps / seconds / 1e9
  roofline   = measured_HBM_BW / ideal_bytes_per_point_per_sweep
  fraction   = GLUPS / roofline    (can exceed 1.0 with temporal blocking)

``ideal_bytes_per_point`` is the compulsory traffic of a non-temporally-
blocked sweep: one read + one write per point.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import numpy as np


def ideal_bytes_per_point(dtype: str = "float32") -> int:
    return 2 * np.dtype(dtype).itemsize


_measured_bw_cache: dict = {}


def _platform_defaults(nbytes, loops):
    """Scale the measurement to the platform: the TPU protocol (256MB x
    400 loops, sized so the timed difference is ~1s at ~700 GB/s) takes
    minutes at CPU memory bandwidth."""
    import jax

    if nbytes is None or loops is None:
        on_tpu = jax.devices()[0].platform == "tpu"
        nbytes = nbytes or (256 * 1024 * 1024 if on_tpu else 32 * 1024 * 1024)
        loops = loops or (400 if on_tpu else 8)
    return nbytes, loops


def prepare_hbm_measurement(nbytes: int = None, loops: int = None):
    """Compile/dispatch the bandwidth kernel now (no device->host fetch);
    returns a thunk that performs the timed measurement. Lets callers
    overlap compilation with the one-time fetch warmup
    (``utils.timing.warmup_fetch_async``)."""
    import jax

    nbytes, loops = _platform_defaults(nbytes, loops)
    n = nbytes // 4
    side = int(np.sqrt(n))
    compiled = _hbm_run_fn()
    x = jax.jit(lambda: jax.numpy.ones((side, side), jax.numpy.float32))()
    compiled(x, 2)  # compile both loop shapes ahead of the fetch warmup
    compiled(x, loops)
    compiled(x, 3 * loops)

    def thunk() -> float:
        return measure_hbm_bandwidth(nbytes, loops)

    return thunk


_hbm_run_cached = None


def _hbm_run_fn():
    # singleton: jax.jit caches per function object, so prepare/measure
    # must share one jitted callable for the precompile to stick
    global _hbm_run_cached
    if _hbm_run_cached is None:
        import functools

        import jax

        @functools.partial(jax.jit, static_argnames=("iters",))
        def run(x, iters):
            return jax.lax.fori_loop(
                0, iters, lambda _, c: c * 1.000001 + 1e-7, x
            )

        _hbm_run_cached = run
    return _hbm_run_cached


def measure_hbm_bandwidth(nbytes: int = None, loops: int = None) -> float:
    """Measured aggregate HBM bandwidth (GB/s) of a fused read+write stream
    (``x*a+b`` loop under one jit, marginal over two loop counts).

    Requires the process's one-time fetch warmup to have been paid (see
    ``utils.timing.force``) for honest numbers."""
    nbytes, loops = _platform_defaults(nbytes, loops)
    key = (nbytes, loops)
    if key in _measured_bw_cache:
        return _measured_bw_cache[key]
    import jax
    import jax.numpy as jnp

    n = nbytes // 4
    side = int(np.sqrt(n))
    x = jnp.ones((side, side), jnp.float32)
    run = _hbm_run_fn()

    from stencil_tpu.utils.timing import force

    def timed(iters):
        # fetch-based fence (block_until_ready is a stub on the tunneled
        # backend); callers must have paid the one-time fetch warmup
        # (utils.timing.warmup_fetch_async) first
        t0 = time.perf_counter()
        force(run(x, iters))
        return time.perf_counter() - t0

    timed(2)
    lo, hi = loops, 3 * loops
    t_lo, t_hi = timed(lo), timed(hi)
    dt = (t_hi - t_lo) / (hi - lo)
    if dt <= 0:
        # scheduler noise can make the marginal negative on tiny CPU
        # problems; one retry, then give up (callers print no roofline
        # clause for a None bandwidth rather than a nonsense negative)
        t_lo, t_hi = timed(lo), timed(hi)
        dt = (t_hi - t_lo) / (hi - lo)
        if dt <= 0:
            _measured_bw_cache[key] = None
            return None
    bw = x.size * 4 * 2 / dt / 1e9
    _measured_bw_cache[key] = bw
    return bw


@dataclasses.dataclass
class PerfReport:
    seconds_per_sweep: float
    glups: float
    effective_gbps: float       # ideal traffic moved per second
    hbm_gbps: Optional[float]   # measured device bandwidth
    roofline_glups: Optional[float]
    roofline_fraction: Optional[float]

    def summary(self) -> str:
        s = (f"{self.seconds_per_sweep * 1e3:.3f} ms/sweep, "
             f"{self.glups:.2f} GLUPS")
        if self.roofline_fraction is not None:
            s += (f", {100 * self.roofline_fraction:.0f}% of HBM roofline "
                  f"({self.roofline_glups:.1f} GLUPS @ "
                  f"{self.hbm_gbps:.0f} GB/s)")
        return s


def report(
    points: int,
    sweeps: int,
    seconds: float,
    dtype: str = "float32",
    hbm_gbps: Optional[float] = None,
) -> PerfReport:
    sec_per_sweep = seconds / max(sweeps, 1)
    glups = points * sweeps / seconds / 1e9
    bpp = ideal_bytes_per_point(dtype)
    eff = glups * bpp
    roof = hbm_gbps / bpp if hbm_gbps else None
    return PerfReport(
        seconds_per_sweep=sec_per_sweep,
        glups=glups,
        effective_gbps=eff,
        hbm_gbps=hbm_gbps,
        roofline_glups=roof,
        roofline_fraction=(glups / roof) if roof else None,
    )
