"""Out-of-core streaming: grids larger than device HBM.

The host (RAM) holds the full iterate; the device sweeps it one
d0-chunk at a time through the tiled Pallas kernel. Per outer step
(``k`` virtual sweeps), every chunk is padded host-side with
``k*r``-deep ghost rows taken from the PREVIOUS outer iterate —
neighbor-chunk rows on chunk-internal faces, the global BC at physical
faces (Dirichlet constants, periodic wrap, or Neumann mirror) — then
uploaded, swept ``k`` times in ONE kernel call with Dirichlet pinning
disabled on chunk-internal d0 faces (the same runtime ``pins`` vector
the sharded paths use for mesh-internal faces,
``parallel/pallas_sharded.py``), and its interior core fetched back
into the ping-pong destination buffer. Chunks within one outer step
all read the source buffer, so the schedule is iteration-order exact:
the result matches the single-chip tiled kernel bit for bit (same
kernel, same per-point tap order).

Upload/compute overlap: chunk ``c+1`` is padded, uploaded, and its
kernel dispatched BEFORE chunk ``c``'s result is fetched (JAX dispatch
is async; the fetch is the only fence on the tunneled backend), so the
device computes chunk ``c+1`` while the host round-trips chunk ``c``.
Peak device footprint is bounded by ~5 padded chunk buffers (cur + nxt
for two in-flight chunks plus one fetched core), which is what the
auto-chunking budget provisions for.

Analog: the reference DOCUMENTS this capability as "multiple rounds"
for matrices exceeding one round's memory but never implements it —
``/root/reference/include/stencil/program_options.hpp:11-14``
("Currently we only support data of one round."). Here it is
implemented, differential-tested against both golden models, and
auto-sized from the attached device's HBM (``device_model.hbm_bytes``).

Correctness constraints (each raised eagerly with guidance):

- every chunk must be at least ``k*r`` planes deep when chunked: a
  chunk-internal face within ``k*r`` of a physical Dirichlet face would
  let the trapezoid recompute treat pinned ghost rows as evolving data;
- dynamic (periodic/Neumann) dims need interior extent >= ``k*r``
  (same gate as the in-core kernels); Neumann dims at ``k>1`` need the
  stencil mirror-symmetric in that dim; a dynamic LANE dim needs
  ``k=1`` plus a ghost-reading tap mode — all identical to
  ``TiledPallasStencil``'s gates, because it is the same kernel.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

from stencil_tpu.core.grid import DirichletBC, HaloGrid, fill_halo_np
from stencil_tpu.core.spec import StencilSpec
from stencil_tpu.ops.pallas_tiled import (
    TiledPlan, _cached_tiled_sweep, make_tiled_plan,
)


def host_halo_grid(
    interior_shape,
    halo: int = 1,
    bc: Optional[DirichletBC] = None,
    dtype="float32",
    interior=None,
) -> HaloGrid:
    """A HaloGrid whose ``data`` is a host NumPy array — the entry point
    for grids exceeding device HBM (``HaloGrid.create`` would allocate
    on device). Same initial conditions: interior 0 (or the given
    array), halo = BC values (``fill_halo_np``)."""
    ndim = len(interior_shape)
    if bc is None:
        bc = DirichletBC.reference_default(ndim)
    if interior is None:
        interior = np.zeros(tuple(interior_shape), np.dtype(dtype))
    else:
        interior = np.asarray(interior, np.dtype(dtype))
    padded = np.pad(interior, halo)
    padded = fill_halo_np(padded, halo, bc)
    return HaloGrid(data=padded, halo=halo, bc=bc)


def _chunk_bounds(n0: int, chunks: int) -> Tuple[Tuple[int, int], ...]:
    """Near-equal chunk extents along d0 (first ``n0 % chunks`` chunks
    one plane deeper)."""
    base, extra = divmod(n0, chunks)
    bounds = []
    start = 0
    for c in range(chunks):
        stop = start + base + (1 if c < extra else 0)
        bounds.append((start, stop))
        start = stop
    return tuple(bounds)


def auto_chunks(spec: StencilSpec, interior_shape, dtype, sweeps_per_call,
                hbm: Optional[int] = None) -> int:
    """Smallest chunk count whose in-flight device footprint (~5 padded
    chunk buffers, see module docstring) fits a conservative share of
    the attached device's HBM."""
    from stencil_tpu import device_model
    from stencil_tpu.ops.layout import PaddedLayout, round_up

    n0, n1, n2 = interior_shape
    kr = sweeps_per_call * spec.radius
    itemsize = np.dtype(dtype).itemsize
    # minor-dim padded extents are chunk-independent; build them the way
    # make_tiled_plan does (the d2 ghost columns differ per tap mode by
    # at most one 128-lane block — immaterial for sizing)
    lay = PaddedLayout.for_halo((n0, n1, n2), max(kr, 1))
    p1 = lay.padded_shape[1]
    p2 = round_up(n2 + 2 * kr, 128)
    usable = int(0.4 * (device_model.hbm_bytes() if hbm is None else hbm))
    cap = usable // 5

    def chunk_bytes(c: int) -> int:
        b0 = -(-n0 // c)
        return (b0 + 2 * kr) * p1 * p2 * itemsize

    c = 1
    while chunk_bytes(c) > cap:
        c += 1
        if c > n0 or (c > 1 and n0 // c < max(kr, 1)):
            raise ValueError(
                f"grid {tuple(interior_shape)} ({dtype}) cannot be "
                f"streamed at temporal depth k={sweeps_per_call}: even "
                f"{c - 1} chunks exceed the device budget "
                f"({cap / 2**20:.2f} MiB/chunk) while chunks must stay "
                f">= k*r = {kr} planes; reduce -k or the grid"
            )
    return c


@functools.lru_cache(maxsize=64)
def _cached_chunk_step(plan: TiledPlan, bc: DirichletBC, interpret: bool):
    """Jitted chunk step: one kernel call (``k`` virtual sweeps) on a
    padded chunk buffer, returning only the interior core (the ghost
    recompute zones are discarded — their final-sweep values belong to
    the neighbor chunks). Single dispatch per chunk; ``pins`` is a
    runtime argument so one executable serves first/interior/last
    chunks of the same shape."""
    import jax
    import jax.numpy as jnp

    sweep = _cached_tiled_sweep(plan, bc, interpret)
    core = plan.layout.interior_index

    @jax.jit
    def step(cur, pins):
        nxt = jnp.copy(cur)
        return sweep(cur, nxt, pins)[core]

    return step


class StreamedStencil:
    """Out-of-core d0-chunked iteration driver (host-resident iterate).

    ``chunks=None`` auto-sizes from the device's HBM; an explicit count
    forces it (tests stream tiny grids in 3 chunks). ``tiles``,
    ``tap_mode``, ``vmem_budget`` pass through to the per-chunk tiled
    plans.
    """

    def __init__(self, spec: StencilSpec, interior_shape, dtype="float32",
                 sweeps_per_call: int = 1, chunks: Optional[int] = None,
                 tiles=None, tap_mode=None, interpret: bool = False,
                 vmem_budget: Optional[int] = None):
        if spec.ndim != 3 or len(interior_shape) != 3:
            raise ValueError(
                "streamed method is 3D-only (it drives the tiled 3D "
                "kernel); 2D grids fit the slab path in-core"
            )
        self.spec = spec
        self.interior_shape = tuple(int(s) for s in interior_shape)
        self.dtype = str(np.dtype(dtype))
        self.k = int(sweeps_per_call)
        self.interpret = interpret
        self._tiles = tiles
        self._tap_mode = tap_mode
        self._vmem_budget = vmem_budget
        n0 = self.interior_shape[0]
        if chunks is None:
            chunks = auto_chunks(spec, self.interior_shape, self.dtype,
                                 self.k)
        chunks = int(chunks)
        if chunks < 1 or chunks > n0:
            raise ValueError(f"chunks={chunks} out of range [1, {n0}]")
        kr = self.k * spec.radius
        if chunks > 1 and n0 // chunks < kr:
            raise ValueError(
                f"chunk depth {n0 // chunks} < k*r = {kr}: a chunk-"
                "internal face within k*r of a physical face would "
                "recompute pinned Dirichlet ghosts as data; use fewer "
                "chunks or a shallower -k"
            )
        self.num_chunks = chunks
        self.bounds = _chunk_bounds(n0, chunks)
        self._plans = self._build_plans(self.k)

    # -- plans ------------------------------------------------------------

    def _build_plans(self, k: int) -> Tuple[TiledPlan, ...]:
        """One plan per distinct chunk shape (at most two: base + tail),
        mapped per chunk."""
        cache = {}
        plans = []
        for start, stop in self.bounds:
            c0 = stop - start
            if c0 not in cache:
                cache[c0] = make_tiled_plan(
                    self.spec, (c0,) + self.interior_shape[1:],
                    self.dtype, k, tiles=self._tiles,
                    vmem_budget=self._vmem_budget,
                    tap_mode=self._tap_mode,
                )
            plans.append(cache[c0])
        return tuple(plans)

    @property
    def plan(self) -> TiledPlan:
        """The base-chunk plan (reported by the CLI's plan_info)."""
        return self._plans[0]

    # -- host-side chunk padding ------------------------------------------

    def _pad_chunk(self, host: np.ndarray, ci: int, plan: TiledPlan,
                   bc: DirichletBC) -> np.ndarray:
        """NumPy twin of ``PaddedLayout.pad`` + ``refresh_dynamic_layout``
        for one chunk, with the d0 ghost rings additionally seeded from
        the previous outer iterate (``host``): neighbor-chunk rows on
        chunk-internal faces, wrap/mirror images on dynamic global
        faces, face constants (left from the base fill) on physical
        Dirichlet faces. Fill order replicates the device path exactly —
        per-dim constant slabs in increasing dim order (later dims win
        in corners), then dynamic rings in increasing dim order over the
        full extent of the other dims — so corner ghosts carry the same
        transitively wrapped/mirrored values as every other method."""
        layout = plan.layout
        start, stop = self.bounds[ci]
        (lo0, _), (lo1, _), (lo2, _) = layout.pads
        c0, n1, n2 = layout.interior_shape
        n0 = self.interior_shape[0]
        kr = layout.halo
        dt = np.dtype(self.dtype)
        per = bc.periodic_mask(3)
        neu = bc.neumann_mask(3)

        out = np.empty(layout.padded_shape, dt)
        # base fill = PaddedLayout.pad: interior, then per-dim BC slabs
        out[lo0:lo0 + c0, lo1:lo1 + n1, lo2:lo2 + n2] = host[start:stop]
        out[:lo0] = bc.values[0][0]
        out[lo0 + c0:] = bc.values[0][1]
        out[:, :lo1] = bc.values[1][0]
        out[:, lo1 + n1:] = bc.values[1][1]
        out[:, :, :lo2] = bc.values[2][0]
        out[:, :, lo2 + n2:] = bc.values[2][1]

        # d0 ghost rings 1..kr: previous-iterate rows where they exist
        def src_index(gi: int) -> Optional[int]:
            if 0 <= gi < n0:
                return gi
            if per[0]:
                return gi % n0
            if neu[0]:
                return -gi - 1 if gi < 0 else 2 * n0 - 1 - gi
            return None  # physical Dirichlet face: keep the constant

        for j in range(kr):
            si = src_index(start - kr + j)
            if si is not None:
                out[lo0 - kr + j, lo1:lo1 + n1, lo2:lo2 + n2] = host[si]
            si = src_index(stop + j)
            if si is not None:
                out[lo0 + c0 + j, lo1:lo1 + n1, lo2:lo2 + n2] = host[si]

        # dynamic d1/d2 rings at full temporal depth (refresh_dynamic_layout
        # twin): wrap/mirror copies over the full extent of the other dims,
        # AFTER the d0 seeding so corner ghosts wrap the seeded rows too
        for d, (nd, lod) in ((1, (n1, lo1)), (2, (n2, lo2))):
            if not (per[d] or neu[d]):
                continue

            def at(a, b, _d=d):
                return tuple(slice(a, b) if i == _d else slice(None)
                             for i in range(3))

            if per[d]:
                out[at(lod - kr, lod)] = out[at(lod + nd - kr, lod + nd)]
                out[at(lod + nd, lod + nd + kr)] = out[at(lod, lod + kr)]
            else:
                out[at(lod - kr, lod)] = np.flip(
                    out[at(lod, lod + kr)], axis=d)
                out[at(lod + nd, lod + nd + kr)] = np.flip(
                    out[at(lod + nd - kr, lod + nd)], axis=d)
        return out

    def _pins(self, ci: int, bc: DirichletBC) -> np.ndarray:
        """Kernel pins (d0lo, d0hi, d1lo, d1hi) for chunk ``ci``: 0 on
        chunk-internal d0 faces and on dynamic dims (their ghosts hold
        live data), 1 on physical Dirichlet faces."""
        dyn = bc.dynamic_mask(3)
        lo = 0 if (dyn[0] or ci > 0) else 1
        hi = 0 if (dyn[0] or ci < self.num_chunks - 1) else 1
        d1 = 0 if dyn[1] else 1
        return np.asarray([lo, hi, d1, d1], np.int32)

    # -- gates (same rules as TiledPallasStencil.iterate) -------------------

    def _validate_bc(self, bc: DirichletBC, k: int) -> None:
        dyn = bc.dynamic_mask(3)
        per = bc.periodic_mask(3)
        neu = bc.neumann_mask(3)
        kr = k * self.spec.radius
        problems = []
        if dyn[2] and k != 1:
            problems.append(
                "a periodic/Neumann lane (last) dim needs "
                "sweeps_per_call=1 (use -k 1)")
        if dyn[2] and self._plans[0].tap_mode not in ("slice", "roll"):
            problems.append(
                f"a periodic/Neumann lane (last) dim needs a ghost-"
                f"reading tap mode, not {self._plans[0].tap_mode!r} "
                "(use slice or roll)")
        if k > 1:
            for d in range(3):
                if neu[d] and not self.spec.symmetric_in(d):
                    problems.append(
                        f"a Neumann dim {d} at sweeps_per_call>1 needs "
                        f"the stencil mirror-symmetric in dim {d} "
                        "(use -k 1 for asymmetric taps)")
        for d in range(3):
            if (per[d] or neu[d]) and self.interior_shape[d] < kr:
                problems.append(
                    f"dynamic dim {d} needs interior extent >= k*r "
                    f"({self.interior_shape[d]} < {kr})")
        if problems:
            raise ValueError(
                "periodic/Neumann BCs on the streamed method: "
                + "; ".join(problems))

    # -- iteration ----------------------------------------------------------

    def _outer_step(self, src: np.ndarray, dst: np.ndarray,
                    plans: Tuple[TiledPlan, ...], bc: DirichletBC) -> None:
        """One outer step (k sweeps) over all chunks, prefetching chunk
        c+1's upload+dispatch before fetching chunk c's result."""
        import jax

        C = self.num_chunks
        steps = [_cached_chunk_step(p, bc, self.interpret) for p in plans]

        def launch(ci: int):
            buf = jax.device_put(self._pad_chunk(src, ci, plans[ci], bc))
            return steps[ci](buf, self._pins(ci, bc))

        pending = launch(0)
        for ci in range(C):
            nxt = launch(ci + 1) if ci + 1 < C else None
            start, stop = self.bounds[ci]
            dst[start:stop] = np.asarray(pending)
            pending = nxt

    def iterate_host(self, x0: np.ndarray, iterations: int,
                     bc: Optional[DirichletBC] = None) -> np.ndarray:
        """Run ``iterations`` sweeps on a host-resident interior array;
        returns the new host interior. Remainder sweeps (``iterations %
        k``) run through shallower remainder plans, like the in-core
        temporal kernels."""
        if bc is None:
            bc = DirichletBC.reference_default(3)
        x0 = np.asarray(x0)
        if x0.shape != self.interior_shape:
            raise ValueError(
                f"interior shape {x0.shape} != plan shape "
                f"{self.interior_shape}")
        self._validate_bc(bc, self.k)
        src = np.array(x0, np.dtype(self.dtype), copy=True)
        dst = np.empty_like(src)
        n_outer, rem = divmod(int(iterations), self.k)
        for _ in range(n_outer):
            self._outer_step(src, dst, self._plans, bc)
            src, dst = dst, src
        if rem:
            self._validate_bc(bc, rem)
            rem_plans = self._build_plans(rem)
            self._outer_step(src, dst, rem_plans, bc)
            src, dst = dst, src
        return src

    def iterate(self, grid: HaloGrid, iterations: int) -> HaloGrid:
        """Registry/CLI adapter: HaloGrid in (host or device), host
        HaloGrid out (never allocates the full grid on device)."""
        if np.dtype(str(grid.dtype)) != np.dtype(self.dtype):
            raise ValueError(
                f"grid dtype {grid.dtype} != plan dtype {self.dtype}")
        out = self.iterate_host(np.asarray(grid.interior()), iterations,
                                bc=grid.bc)
        return host_halo_grid(self.interior_shape, halo=grid.halo,
                              bc=grid.bc, dtype=self.dtype, interior=out)
