"""Multi-chip production path: per-device Pallas slab kernels composed with
``ppermute`` halo exchange over the device mesh.

This is the composition of the framework's two performance levers — the
single-chip slab-streaming/temporal-blocking Pallas kernel
(``stencil_tpu.ops.pallas``) and the inter-chip halo exchange
(``stencil_tpu.parallel.halo``) — targeting BASELINE.json config 5
("Sharded 3D 7-point Jacobi, 1024^3 on v5e-16, ppermute halo exchange
overlapped with interior compute").

Where the reference composes 64 CPEs over one chip (RMA halo push between
scratchpads, ``/root/reference/src/stencil/slave/stencil_rma.cpp:198-255``),
this composes N chips over ICI, each running the full intra-chip pipeline:

  mesh level   halo movement                        compute
  -----------  -----------------------------------  ----------------------
  inter-chip   ``lax.ppermute`` edge strips of      --
               depth ``k*r`` once per outer step
  intra-chip   Pallas double-buffered HBM<->VMEM    k temporal sweeps per
               slab DMA (overfetch = halo)          HBM round trip

The grid is sharded along the leading dimension only (planes of a 3D grid,
rows of a 2D grid). Leading-dim ghost layers of mesh-interior devices hold
live neighbor data; the Pallas kernel's boundary pinning is disabled there
via its ``pins`` argument and the overlap region is recomputed redundantly
each virtual sweep (standard deep-halo temporal blocking). Mesh-edge
devices synthesize the physical Dirichlet boundary locally — the analog of
the reference's ``generate_boundary`` (``stencil_rma.cpp:150-166``).

Because each device's state stays in the kernel's padded layout end to end,
an outer step moves only ``2 * k * r`` planes over ICI and re-enters the
kernel with zero repacking.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stencil_tpu.core.grid import DirichletBC, HaloGrid
from stencil_tpu.core.spec import StencilSpec
from stencil_tpu.ops.pallas import SlabPlan, _cached_sweep, make_plan
from stencil_tpu.ops.pallas_tiled import (
    TiledPlan, _cached_tiled_sweep, make_tiled_plan,
)


@functools.lru_cache(maxsize=64)
def _sharded_pallas_iterate_fn(method: "ShardedPallasStencil", mesh: Mesh,
                               bc: DirichletBC):
    n = mesh.shape[method.axis_name]
    plan = method.local_plan(n)
    pspec = P(method.axis_name)
    device_fn = method._device_fn(plan, bc)
    # check_vma=False: pallas_call's out_shape carries no varying-mesh-
    # axes annotation, so shard_map's collective-safety check can't see
    # through it. The outer-step count is traced (a static count would
    # recompile the whole shard_map per benchmarked n).
    mapped = jax.shard_map(
        device_fn, mesh=mesh, in_specs=(pspec, pspec, P()),
        out_specs=(pspec, pspec), check_vma=False,
    )
    return jax.jit(mapped)


@functools.lru_cache(maxsize=64)
def _sharded_pallas_full_fn(method: "ShardedPallasStencil", mesh: Mesh,
                            bc: DirichletBC, grid_halo: int):
    """End-to-end jitted grid.data -> grid.data: scatter (per-block pad),
    n outer steps under shard_map, gather (per-block unpad) — ONE
    device-resident dispatch per iterate() call.

    This is the fix for the same flaw the round-1 review flagged on
    RmaStencil (host-NumPy scatter/gather per call): on the tunneled TPU
    backend the old NumPy path cost ~170 ms/sweep of device<->host
    round trips at 256^3 (measured), reducing the production multi-chip
    method to 0.1 GLUPS on hardware while being invisible on the CPU
    mesh where host memory is device memory.
    """
    from stencil_tpu.core.grid import fill_halo

    n = mesh.shape[method.axis_name]
    plan = method.local_plan(n)
    pspec = P(method.axis_name)
    device_fn = method._device_fn(plan, bc)
    mapped = jax.shard_map(
        device_fn, mesh=mesh, in_specs=(pspec, pspec, P()),
        out_specs=(pspec, pspec), check_vma=False,
    )
    sharding = NamedSharding(mesh, pspec)
    P0l = plan.layout.padded_shape[0]

    @jax.jit
    def run(data, n_outer):
        h = grid_halo
        idx = tuple(slice(h, s - h) for s in data.shape)
        interior = data[idx]
        blocks = jnp.split(interior, n, axis=0)
        stacked = jnp.concatenate(
            [plan.layout.pad(b, bc) for b in blocks], axis=0
        )
        stacked = lax.with_sharding_constraint(stacked, sharding)
        # distinct buffer for the aliased kernel write (WAR hazard if it
        # aliased ``stacked``, cf. PallasStencil.prepare)
        scratch = jnp.copy(stacked)
        out, _ = mapped(stacked, scratch, n_outer)
        interiors = [
            plan.layout.unpad(
                lax.slice_in_dim(out, i * P0l, (i + 1) * P0l, axis=0)
            )
            for i in range(n)
        ]
        res = jnp.pad(jnp.concatenate(interiors, axis=0), h)
        return fill_halo(res, h, bc)

    return run


@dataclasses.dataclass(frozen=True)
class ShardedPallasStencil:
    """Distributed Jacobi iteration: leading-dim sharding, per-device Pallas.

    ``axis_name`` names the mesh axis sharding grid dim 0. The per-device
    interior block must satisfy the kernel's slab constraints (2D: rows
    divisible by 8).
    """

    spec: StencilSpec
    interior_shape: Tuple[int, ...]   # GLOBAL interior shape
    axis_name: str = "x"
    dtype: str = "float32"
    sweeps_per_call: int = 1
    slab: Optional[int] = None
    interpret: bool = False
    vmem_budget: Optional[int] = None  # None = per-kernel default
    tap_mode: Optional[str] = None     # None = per-dtype/per-spec default

    def local_plan(self, n_devices: int):
        """Per-device kernel plan: the 2D-tiled kernel for 3D grids (full
        minor planes with deep temporal halos do not fit VMEM at
        production sizes), the slab kernel for 2D."""
        lead = self.interior_shape[0]
        if lead % n_devices:
            raise ValueError(
                f"leading dim {lead} not divisible by mesh size {n_devices}"
            )
        local_shape = (lead // n_devices,) + tuple(self.interior_shape[1:])
        if len(self.interior_shape) == 3:
            kwargs = ({"vmem_budget": self.vmem_budget}
                      if self.vmem_budget else {})
            return make_tiled_plan(
                self.spec, local_shape, self.dtype, self.sweeps_per_call,
                tap_mode=self.tap_mode, **kwargs,
            )
        kwargs = {"vmem_budget": self.vmem_budget} if self.vmem_budget else {}
        return make_plan(
            self.spec, local_shape, self.dtype, self.sweeps_per_call,
            self.slab, tap_mode=self.tap_mode, **kwargs,
        )

    # -- the per-device outer step (runs inside shard_map) -------------------

    def _device_fn(self, plan, bc: DirichletBC):
        """Builds block -> block over the device-local PADDED array."""
        if isinstance(plan, TiledPlan):
            sweep = _cached_tiled_sweep(plan, bc, self.interpret)
        else:
            sweep = _cached_sweep(plan, bc, self.interpret)
        kr = plan.halo                      # ghost depth = k * radius
        lead_lo = plan.layout.pads[0][0]    # may exceed kr (2D alignment)
        n0 = plan.interior_shape[0]
        axis = self.axis_name

        def exchange(padded):
            """Refresh the kr-deep lead-dim ghosts from mesh neighbors
            (push model, ``stencil_rma.cpp:198-255`` analog); mesh-edge
            devices synthesize the physical BC faces locally."""
            n = lax.axis_size(axis)
            idx = lax.axis_index(axis)
            lo_strip = lax.slice_in_dim(padded, lead_lo, lead_lo + kr, axis=0)
            hi_strip = lax.slice_in_dim(
                padded, lead_lo + n0 - kr, lead_lo + n0, axis=0
            )
            # my low rows -> previous device's high ghosts; my high rows ->
            # next device's low ghosts
            hi_ghost = lax.ppermute(
                lo_strip, axis, [(i, i - 1) for i in range(1, n)]
            )
            lo_ghost = lax.ppermute(
                hi_strip, axis, [(i, i + 1) for i in range(n - 1)]
            )
            # Mesh-edge devices keep their own ghost rows, which were
            # BC-filled by PaddedLayout.pad at scatter time and are never
            # written by the kernel: this preserves the later-dims-win
            # corner convention (a uniform lead-BC face would clobber the
            # minor-dim face values in corner columns, which box stencils
            # read — cf. core.grid.DirichletBC docstring).
            own_lo = lax.slice_in_dim(padded, lead_lo - kr, lead_lo, axis=0)
            own_hi = lax.slice_in_dim(
                padded, lead_lo + n0, lead_lo + n0 + kr, axis=0
            )
            lo_ghost = jnp.where(idx == 0, own_lo, lo_ghost)
            hi_ghost = jnp.where(idx == n - 1, own_hi, hi_ghost)
            zeros = (0,) * (padded.ndim - 1)
            padded = lax.dynamic_update_slice(
                padded, lo_ghost, (lead_lo - kr,) + zeros
            )
            padded = lax.dynamic_update_slice(
                padded, hi_ghost, (lead_lo + n0,) + zeros
            )
            return padded

        def device_fn(padded, scratch, n_outer):
            # ``scratch`` is a distinct buffer with the same BC-carrying pad
            # layout — the kernel writes into it in place (ping-pong WAR
            # hazard if it aliased ``padded``, cf. PallasStencil.prepare).
            n = lax.axis_size(axis)
            idx = lax.axis_index(axis)
            pins = jnp.stack(
                [(idx == 0).astype(jnp.int32),
                 (idx == n - 1).astype(jnp.int32)]
            )

            def body(_, carry):
                cur, nxt = carry
                cur = exchange(cur)
                new = sweep(cur, nxt, pins)
                return (new, cur)

            out, other = lax.fori_loop(0, n_outer, body, (padded, scratch))
            return out, other

        return device_fn

    # -- public API ----------------------------------------------------------

    def iterate_fn(self, mesh: Mesh, bc: DirichletBC):
        """Jitted padded-global-array -> padded-global-array step function.

        The global array is the per-device padded layouts concatenated along
        dim 0 (each device block carries its own ghost/alignment rows — the
        natural distributed layout; use :meth:`scatter`/:meth:`gather` to
        convert to/from a plain interior array).

        Cached per (self, mesh, bc): rebuilding the jit closure per call
        would re-trace every call (ops.pallas._cached_runner); the
        outer-step count is traced.
        """
        return _sharded_pallas_iterate_fn(self, mesh, bc)

    def scatter(self, grid: HaloGrid, mesh: Mesh) -> jax.Array:
        """Global interior -> sharded stacked-padded-blocks array."""
        n = mesh.shape[self.axis_name]
        plan = self.local_plan(n)
        interior = np.asarray(grid.interior())
        blocks = [
            np.asarray(plan.layout.pad(
                jnp.asarray(b), grid.bc
            ))
            for b in np.split(interior, n, axis=0)
        ]
        stacked = np.concatenate(blocks, axis=0)
        sharding = NamedSharding(mesh, P(self.axis_name))
        return jax.device_put(stacked, sharding)

    def gather(self, stacked: jax.Array, mesh: Mesh,
               grid: HaloGrid) -> HaloGrid:
        """Sharded stacked-padded-blocks array -> HaloGrid."""
        n = mesh.shape[self.axis_name]
        plan = self.local_plan(n)
        arr = np.asarray(stacked)
        blocks = np.split(arr, n, axis=0)
        interiors = [np.asarray(plan.layout.unpad(b)) for b in blocks]
        interior = np.concatenate(interiors, axis=0)
        return HaloGrid.from_interior(
            jnp.asarray(interior), halo=grid.halo, bc=grid.bc
        )

    def iterate(self, grid: HaloGrid, iterations: int, mesh: Mesh) -> HaloGrid:
        if jnp.dtype(grid.data.dtype) != jnp.dtype(self.dtype):
            raise ValueError(
                f"grid dtype {grid.data.dtype} != plan dtype {self.dtype}; "
                "pass dtype= when constructing ShardedPallasStencil")
        k = self.sweeps_per_call
        n_outer, rem = divmod(iterations, k)
        data = grid.data
        if n_outer:
            run = _sharded_pallas_full_fn(self, mesh, grid.bc, grid.halo)
            data = run(data, jnp.int32(n_outer))
        if rem:
            # run the remainder at temporal depth = rem via a fresh handle
            rem_method = dataclasses.replace(self, sweeps_per_call=rem)
            run = _sharded_pallas_full_fn(rem_method, mesh, grid.bc,
                                          grid.halo)
            data = run(data, jnp.int32(1))
        return HaloGrid(data=data, halo=grid.halo, bc=grid.bc)
