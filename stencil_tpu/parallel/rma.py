"""In-kernel RMA halo exchange: VMEM-resident iteration with remote DMA.

This is the most literal TPU analog of the reference's RMA kernel
(``/root/reference/src/stencil/slave/stencil_rma.cpp``): where that kernel
keeps each CPE's block resident in LDM for the whole run and pushes edge
strips scratchpad-to-scratchpad over the 8x8 CPE mesh, this one keeps each
chip's block resident in VMEM for the whole run and pushes edge strips
VMEM-to-VMEM over ICI with ``pltpu.make_async_remote_copy`` — the halo
never touches HBM inside the iteration loop.

Faithful structural mapping (cites into the reference):

  ``athread_rma_iput(local, …, target_cpe, remote, recv_rply)``
      -> ``make_async_remote_copy(src, dst, send_sem, recv_sem, device_id)``
         (``stencil_rma.cpp:198-255``)
  double-buffered reply counters ``replies[i % 2 * 2]`` pipelining
  successive iterations without a global barrier
      -> send/recv DMA semaphore arrays indexed ``i % 2``
         (``stencil_rma.cpp:333-361``)
  one ``athread_ssync_array`` before the loop (avoid racing counter init)
      -> one neighbor barrier via ``get_barrier_semaphore``
         (``stencil_rma.cpp:326-330``)
  edge CPEs synthesize the physical Dirichlet boundary locally
      -> mesh-edge devices' ghost rows hold BC from the initial load and
         are simply never overwritten (``generate_boundary``,
         ``stencil_rma.cpp:150-166``)
  interior-first compute overlapping the in-flight puts
      -> interior rows computed between ``.start()`` and the recv wait

Why no write hazard without a barrier: at iteration i a device pushes the
edge rows of its INPUT block into the neighbors' ghost rows of THEIR input
block; compute writes only interior rows of the output block, so a push
for iteration i+1 landing early touches disjoint cells, and the causality
chain through the i%2 semaphore waits bounds the pipeline skew below 2
iterations (same argument as the reference's 2-deep reply-counter
pipeline).

Scope: the whole per-device padded block (x2 ping-pong) must fit VMEM —
~1.7M fp32 cells per block on a 16MB core (e.g. 1024^2 in 2D, ~96^3 in
3D). For bigger blocks use ``parallel.pallas_sharded`` (ppermute + slab
streaming). Sharding is 1D over dim 0. Sweeps are radius-r, k=1 — the
reference's RMA kernel is likewise radius-1-only, ``stencil_rma.cpp:466``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stencil_tpu.core.grid import DirichletBC, HaloGrid
from stencil_tpu.core.spec import StencilSpec
from stencil_tpu.ops.layout import PaddedLayout, sublane_for_dtype

VMEM_BLOCK_BUDGET = 13 * 1024 * 1024  # both ping-pong blocks + headroom


@dataclasses.dataclass(frozen=True)
class RmaPlan:
    spec: StencilSpec
    local_shape: Tuple[int, ...]   # per-device interior
    dtype: str
    layout: PaddedLayout           # per-device padded layout, halo = radius

    @property
    def block_shape(self) -> Tuple[int, ...]:
        return self.layout.padded_shape


def make_rma_plan(spec: StencilSpec, local_shape, dtype="float32") -> RmaPlan:
    if spec.ndim not in (2, 3):
        raise ValueError("rma kernel supports 2D and 3D grids")
    sublane = sublane_for_dtype(dtype)
    layout = PaddedLayout.for_halo(tuple(local_shape), spec.radius, sublane)
    itemsize = np.dtype(dtype).itemsize
    block = int(np.prod(layout.padded_shape)) * itemsize
    if 2 * block > VMEM_BLOCK_BUDGET:
        raise ValueError(
            f"per-device block {layout.padded_shape} x2 = {2 * block} B "
            f"exceeds the VMEM-resident budget {VMEM_BLOCK_BUDGET}; use "
            "the sharded_pallas method for blocks this large"
        )
    if spec.ndim == 2 and local_shape[0] % sublane:
        raise ValueError(f"2D local rows must be a multiple of {sublane}")
    if local_shape[0] < 4 * spec.radius:
        raise ValueError(
            f"per-device lead dim {local_shape[0]} < 4*radius "
            f"({4 * spec.radius}): the interior/edge-band overlap split "
            "needs at least that many rows per device"
        )
    return RmaPlan(spec=spec, local_shape=tuple(local_shape), dtype=dtype,
                   layout=layout)


def build_rma_iterate(plan: RmaPlan, bc: DirichletBC, axis_name: str,
                      collective_id: int = 7, interpret: bool = False,
                      detect_races: bool = False):
    """Compile ``iterate(padded_local, n_iters) -> padded_local`` to run
    inside ``shard_map`` over a 1D mesh along ``axis_name``."""
    spec = plan.spec
    ndim = spec.ndim
    r = spec.radius
    dtype = jnp.dtype(plan.dtype)
    layout = plan.layout
    B = layout.padded_shape             # block shape (with pads)
    n_local = plan.local_shape
    lead_lo = layout.pads[0][0]
    n0 = n_local[0]
    minor_lo = tuple(layout.pads[d][0] for d in range(1, ndim))
    minor_n = tuple(n_local[1:])

    def interior_idx(lead_slice):
        return (lead_slice,) + tuple(
            slice(minor_lo[d], minor_lo[d] + minor_n[d])
            for d in range(ndim - 1)
        )

    def taps_into(src_ref, a0, m0):
        """Stencil outputs for lead rows [a0, a0+m0), minor interior.

        Loads slice the REF per tap (no whole-block pre-load): the edge
        bands' loads must observe the remote-DMA'd ghost rows, so they
        have to stay as distinct memory reads ordered after the recv
        semaphore wait — a single full-block load before the wait could
        be reused across it.
        """
        uw = spec.uniform_weight
        acc = None
        for off, wgt in zip(spec.offsets, spec.weights):
            st = (a0 + off[0],) + tuple(
                minor_lo[d - 1] + off[d] for d in range(1, ndim)
            )
            idx = tuple(
                slice(st[d], st[d] + ((m0,) + minor_n)[d])
                for d in range(ndim)
            )
            tap = src_ref[idx]
            term = tap if uw is not None else tap * jnp.asarray(wgt, dtype)
            acc = term if acc is None else acc + term
        if uw is not None:
            acc = acc * jnp.asarray(uw, dtype)
        return acc

    def kernel(n_ref, cur_hbm, out_hbm, blocks, lsem, send_sem, recv_sem):
        my = lax.axis_index(axis_name)
        n_dev = lax.axis_size(axis_name)
        has_left = my > 0
        has_right = my < n_dev - 1
        expected = has_left.astype(jnp.int32) + has_right.astype(jnp.int32)

        # initial load: the full padded block (ghosts hold BC values from
        # HBM — physical-edge devices keep them forever: generate_boundary
        # analog). Load into BOTH ping-pong blocks so each block's
        # never-pushed ghost faces (minor dims + physical lead edges)
        # carry BC.
        cp0 = pltpu.make_async_copy(cur_hbm, blocks.at[0], lsem)
        cp0.start()
        cp0.wait()
        cp1 = pltpu.make_async_copy(cur_hbm, blocks.at[1], lsem)
        cp1.start()
        cp1.wait()

        # one pre-loop neighbor barrier (reference: single ssync_array
        # before the loop) — nobody pushes into a block that has not been
        # initialized yet
        bsem = pltpu.get_barrier_semaphore()

        @pl.when(has_left)
        def _():
            pltpu.semaphore_signal(
                bsem, inc=1, device_id=my - 1,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )

        @pl.when(has_right)
        def _():
            pltpu.semaphore_signal(
                bsem, inc=1, device_id=my + 1,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )

        pltpu.semaphore_wait(bsem, expected)

        def left_send_desc(i):
            """My send to the LEFT neighbor: my first r interior rows ->
            its hi ghost rows. By SPMD symmetry, the same descriptor
            constructed on the receiver describes the incoming copy, so it
            also serves as the mirror for ``wait_recv`` of a strip
            arriving FROM the right. Slot parity i%2 doubles as the
            reference's double-buffered reply-counter index."""
            sl = lax.rem(i, 2)
            return pltpu.make_async_remote_copy(
                src_ref=blocks.at[sl].at[interior_idx(pl.ds(lead_lo, r))],
                dst_ref=blocks.at[sl].at[
                    interior_idx(pl.ds(lead_lo + n0, r))],
                send_sem=send_sem.at[sl, 0],
                recv_sem=recv_sem.at[sl, 0],
                device_id=my - 1,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )

        def right_send_desc(i):
            sl = lax.rem(i, 2)
            return pltpu.make_async_remote_copy(
                src_ref=blocks.at[sl].at[
                    interior_idx(pl.ds(lead_lo + n0 - r, r))],
                dst_ref=blocks.at[sl].at[
                    interior_idx(pl.ds(lead_lo - r, r))],
                send_sem=send_sem.at[sl, 1],
                recv_sem=recv_sem.at[sl, 1],
                device_id=my + 1,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )

        def send(i):
            @pl.when(has_left)
            def _():
                left_send_desc(i).start()

            @pl.when(has_right)
            def _():
                right_send_desc(i).start()

        def wait_recv(i):
            # from the RIGHT neighbor (its left-send) -> my hi ghosts,
            # recv_sem[sl, 0]; from the LEFT -> my lo ghosts, [sl, 1]
            @pl.when(has_right)
            def _():
                left_send_desc(i).wait_recv()

            @pl.when(has_left)
            def _():
                right_send_desc(i).wait_recv()

        def wait_sends(i):
            @pl.when(has_left)
            def _():
                left_send_desc(i).wait_send()

            @pl.when(has_right)
            def _():
                right_send_desc(i).wait_send()

        def body(i, _):
            src = lax.rem(i, 2)
            dst = lax.rem(i + 1, 2)
            send(i)
            # WAR: iteration i-1's sends read edges of block[dst]; wait
            # them out before overwriting that block (cheap — they are a
            # full compute phase old)
            @pl.when(i >= 1)
            def _():
                wait_sends(i - 1)

            # interior rows [2r, n0 - 2r): no dependence on ghosts —
            # computed while the strips fly (stencil_rma.cpp:341-357)
            y_int = taps_into(blocks.at[src], lead_lo + 2 * r,
                              n0 - 4 * r)
            blocks.at[dst][interior_idx(
                pl.ds(lead_lo + 2 * r, n0 - 4 * r))] = y_int
            wait_recv(i)
            # edge bands [0, 2r) and [n0-2r, n0): read the fresh ghosts
            y_lo = taps_into(blocks.at[src], lead_lo, 2 * r)
            blocks.at[dst][interior_idx(pl.ds(lead_lo, 2 * r))] = y_lo
            y_hi = taps_into(blocks.at[src], lead_lo + n0 - 2 * r,
                             2 * r)
            blocks.at[dst][interior_idx(
                pl.ds(lead_lo + n0 - 2 * r, 2 * r))] = y_hi
            return 0

        n_iters = n_ref[0]
        lax.fori_loop(0, n_iters, body, 0)
        # drain the last iteration's sends before the kernel exits
        @pl.when(n_iters >= 1)
        def _():
            wait_sends(n_iters - 1)

        final = lax.rem(n_iters, 2)
        cpo = pltpu.make_async_copy(blocks.at[final], out_hbm, lsem)
        cpo.start()
        cpo.wait()

    @jax.jit
    def iterate(padded, n_iters):
        n_arr = jnp.asarray([n_iters], jnp.int32)
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct(B, dtype),
            scratch_shapes=[
                pltpu.VMEM((2,) + B, dtype),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            # off-TPU this runs under pltpu TPU-interpret mode, which
            # simulates VMEM/HBM, remote DMAs, semaphores and barriers on
            # CPU — plain interpret=True cannot model the cross-device
            # primitives. detect_races enables its vector-clock race
            # detector (SURVEY §5: the reference has no race detection at
            # all; its async DMA/RMA correctness is by construction).
            interpret=(
                pltpu.InterpretParams(
                    dma_execution_mode="on_wait",
                    detect_races=bool(detect_races),
                )
                if interpret else False
            ),
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                collective_id=collective_id,
            ),
        )(n_arr, padded)

    return iterate


class RmaStencil:
    """Distributed iteration where the block lives in VMEM for the whole
    run and halos move chip-to-chip with remote DMA (RMA analog)."""

    def __init__(self, spec: StencilSpec, interior_shape, axis_name="x",
                 dtype="float32", interpret=False, detect_races=False):
        self.spec = spec
        self.interior_shape = tuple(interior_shape)
        self.axis_name = axis_name
        self.dtype = dtype
        self.interpret = interpret
        self.detect_races = detect_races

    def local_plan(self, n_devices: int) -> RmaPlan:
        lead = self.interior_shape[0]
        if lead % n_devices:
            raise ValueError(
                f"leading dim {lead} not divisible by mesh size {n_devices}"
            )
        local = (lead // n_devices,) + self.interior_shape[1:]
        return make_rma_plan(self.spec, local, self.dtype)

    def iterate_fn(self, mesh: Mesh, bc: DirichletBC):
        return _rma_iterate_fn(self, mesh, bc)

    def iterate(self, grid: HaloGrid, iterations: int, mesh: Mesh) -> HaloGrid:
        n = mesh.shape[self.axis_name]
        plan = self.local_plan(n)
        interior = np.asarray(grid.interior())
        blocks = [
            np.asarray(plan.layout.pad(jnp.asarray(b), grid.bc))
            for b in np.split(interior, n, axis=0)
        ]
        stacked = jax.device_put(
            np.concatenate(blocks, axis=0),
            NamedSharding(mesh, P(self.axis_name)),
        )
        out = self.iterate_fn(mesh, grid.bc)(stacked, iterations)
        blocks = np.split(np.asarray(out), n, axis=0)
        interiors = [np.asarray(plan.layout.unpad(b)) for b in blocks]
        return HaloGrid.from_interior(
            jnp.asarray(np.concatenate(interiors, axis=0)),
            halo=grid.halo, bc=grid.bc,
        )

    def __hash__(self):
        return hash((self.spec, self.interior_shape, self.axis_name,
                     self.dtype, self.interpret, self.detect_races))

    def __eq__(self, other):
        return isinstance(other, RmaStencil) and (
            (self.spec, self.interior_shape, self.axis_name, self.dtype,
             self.interpret, self.detect_races)
            == (other.spec, other.interior_shape, other.axis_name,
                other.dtype, other.interpret, other.detect_races)
        )


@functools.lru_cache(maxsize=32)
def _rma_iterate_fn(method: RmaStencil, mesh: Mesh, bc: DirichletBC):
    n = mesh.shape[method.axis_name]
    plan = method.local_plan(n)
    inner = build_rma_iterate(plan, bc, method.axis_name,
                              interpret=method.interpret,
                              detect_races=method.detect_races)
    pspec = P(method.axis_name)

    def device_fn(padded, n_iters):
        return inner(padded, n_iters)

    mapped = jax.shard_map(
        device_fn, mesh=mesh, in_specs=(pspec, P()),
        out_specs=pspec, check_vma=False,
    )
    return jax.jit(mapped)
