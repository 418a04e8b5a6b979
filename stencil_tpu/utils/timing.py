"""Timing utilities.

``TinyTimer`` is the analog of the reference's pause/resume accumulating
timer (``/root/reference/include/stencil/tiny_timer.hpp:40-78``) — which is
dead code there; here it is actually used by the CLI driver.

``measure`` implements the benchmark protocol: the reference brackets
spawn→join with ``std::chrono::steady_clock`` and averages ``-R`` repeats
(``main.cpp:27-43``). On TPU behind a remote tunnel, a fixed dispatch
overhead (observed ~30 ms on the axon tunnel) would swamp per-run wall
clock, so we time *marginally*: run the jitted loop at two iteration counts
and divide the time difference by the iteration delta. Results are fenced
with a device->host fetch of ONE element (see :func:`force`) — on the
tunneled backend ``block_until_ready``/``is_ready`` are no-op stubs, so a
fetch is the only real fence; its one-time first-use cost (minutes) is
paid up front via :func:`warmup_fetch_async`.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


class TinyTimer:
    """Accumulating start/pause/restart timer (seconds)."""

    def __init__(self):
        self._acc = 0.0
        self._t0 = None

    def start(self) -> "TinyTimer":
        if self._t0 is None:
            self._t0 = time.perf_counter()
        return self

    def pause(self) -> "TinyTimer":
        if self._t0 is not None:
            self._acc += time.perf_counter() - self._t0
            self._t0 = None
        return self

    def restart(self) -> "TinyTimer":
        self._acc = 0.0
        self._t0 = time.perf_counter()
        return self

    @property
    def seconds(self) -> float:
        extra = (time.perf_counter() - self._t0) if self._t0 is not None else 0.0
        return self._acc + extra

    def pretty(self) -> str:
        s = self.seconds
        if s < 1e-6:
            return f"{s * 1e9:.1f} ns"
        if s < 1e-3:
            return f"{s * 1e6:.1f} us"
        if s < 1.0:
            return f"{s * 1e3:.2f} ms"
        return f"{s:.3f} s"


def force(x) -> None:
    """Force execution of a device computation and fence on it.

    The ONLY reliable fence on the axon-tunneled TPU backend is a
    device->host fetch: ``block_until_ready``/``is_ready`` are stubs there
    (measured: ``is_ready()`` returns True instantly mid-computation, and
    marginal times over different iteration counts come out negative), and
    host callbacks are UNIMPLEMENTED. So we fetch one element of one leaf.

    CAVEAT: the FIRST device->host transfer of a process takes 3-9
    *minutes* on that backend (measured 187-544 s across fresh processes,
    any array size, any API — ``float()``, ``device_get``, cross-backend
    ``device_put``); subsequent fetches take ~30 ms. Call
    :func:`warmup_fetch_async` as early as possible (it overlaps the cost
    with kernel compilation) before any timed region.
    """
    leaves = jax.tree_util.tree_leaves(x)
    for leaf in leaves:
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    for leaf in leaves:
        if hasattr(leaf, "ravel"):
            jax.device_get(leaf.ravel()[:1])
            break


_warmup_thread = None


def warmup_fetch() -> float:
    """Pay the backend's one-time device->host cost; returns seconds."""
    t0 = time.perf_counter()
    jax.device_get(jnp.zeros((1,), jnp.float32))
    return time.perf_counter() - t0


def warmup_fetch_async():
    """Start :func:`warmup_fetch` on a daemon thread (idempotent); returns
    the thread to ``join()`` before the first timed fetch."""
    global _warmup_thread
    import threading

    if _warmup_thread is None:
        _warmup_thread = threading.Thread(target=warmup_fetch, daemon=True)
        _warmup_thread.start()
    return _warmup_thread


@dataclasses.dataclass
class Measurement:
    seconds_per_iteration: float
    iterations_measured: int
    raw_seconds: tuple
    # per-repeat marginal seconds/iteration (median of these is
    # seconds_per_iteration): the noise band, so a cross-round delta can
    # be judged against within-process spread (round-3 verdict item 5)
    marginals: tuple = ()


def measure_marginal(
    run: Callable[[int], object],
    iters_lo: int = 0,
    iters_hi: int = 0,
    warmup_iters: int = 2,
    repeats: int = 2,
    granularity: int = 1,
    min_signal_seconds: float = 0.75,
) -> Measurement:
    """Marginal per-iteration time of ``run(n)``.

    ``run(n)`` must execute n iterations on device and return a jax value.
    Returns median-over-repeats of (t(hi) - t(lo)) / (hi - lo), which
    cancels the fixed dispatch+fetch overhead; compilation is excluded by
    the warmup call.

    By default the iteration counts AUTORANGE (like ``timeit``): ``lo`` is
    grown until one run takes >= ``min_signal_seconds / 3`` and ``hi`` is
    ``4 * lo``, so the measured difference is >= ``min_signal_seconds``.
    This matters on tunneled TPU backends where per-call dispatch+fetch
    noise is tens of ms — a 16-iteration delta of a fast kernel (~5 ms)
    drowns in it and can even come out negative. Explicit
    ``iters_lo``/``iters_hi`` skip autoranging (use only when the cost per
    iteration is large and known).
    """
    import statistics

    g = max(1, granularity)
    force(run(max(warmup_iters, g)))

    def timed(n: int) -> float:
        t0 = time.perf_counter()
        force(run(n))
        return time.perf_counter() - t0

    if not iters_lo or not iters_hi:
        # Autorange on the marginal SIGNAL t(n) - t(g), not on t(n): some
        # runners carry a large fixed per-call cost (host gather/scatter,
        # dispatch), and thresholding total time would stop growing while
        # the iteration-dependent part is still noise-sized.
        t_base = timed(g)
        lo = 4 * g
        t_lo = timed(lo)
        while (t_lo - t_base) < min_signal_seconds / 3 and lo < 1_000_000:
            per_iter = max((t_lo - t_base) / max(lo - g, 1), 1e-7)
            need = (min_signal_seconds / 3) / per_iter
            grow = max(2.0, min(need / lo, 64.0))
            lo = int(-(-int(lo * grow) // g) * g)
            t_lo = timed(lo)
        iters_lo, iters_hi = lo, 4 * lo

    marginals = []
    raws = []
    for _ in range(repeats):
        t_lo = timed(iters_lo)
        t_hi = timed(iters_hi)
        raws.append((t_lo, t_hi))
        marginal = (t_hi - t_lo) / (iters_hi - iters_lo)
        # guard against residual noise: never report below the
        # overhead-inclusive bound of the big run
        marginals.append(max(marginal, 0.0) or t_hi / iters_hi)
    best = statistics.median(marginals)
    return Measurement(
        seconds_per_iteration=best,
        iterations_measured=iters_hi - iters_lo,
        raw_seconds=tuple(raws),
        marginals=tuple(marginals),
    )


def measure_wall(run: Callable[[], object], repeats: int = 3) -> Sequence[float]:
    """Plain wall-clock repeats (reference protocol, ``main.cpp:29-43``):
    returns the per-repeat seconds including dispatch overhead."""
    force(run())
    out = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        force(run())
        out.append(time.perf_counter() - t0)
    return out
