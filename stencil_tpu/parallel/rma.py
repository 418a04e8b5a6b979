"""In-kernel RMA halo exchange: VMEM-resident iteration with remote DMA.

This is the most literal TPU analog of the reference's RMA kernel
(``/root/reference/src/stencil/slave/stencil_rma.cpp``): where that kernel
keeps each CPE's block resident in LDM for the whole run and pushes edge
strips scratchpad-to-scratchpad over the 8x8 CPE mesh, this one keeps each
chip's block resident in VMEM for the whole run and pushes edge strips
VMEM-to-VMEM over ICI with ``pltpu.make_async_remote_copy`` — the halo
never touches HBM inside the iteration loop.

Faithful structural mapping (cites into the reference):

  2D device mesh with 4-neighbor push (``stencil_rma.cpp:194-196`` target
  ``row*8+col``, ``:198-255`` four ``athread_rma_iput`` strips)
      -> 1D or 2D ``jax.sharding.Mesh``; one remote-DMA strip per mesh
         neighbor per exchange, ``device_id={axis: index +- 1}``
  double-buffered reply counters ``replies[i % 2 * 2]`` pipelining
  successive iterations without a global barrier
      -> send/recv DMA semaphore arrays indexed ``i % 2``
         (``stencil_rma.cpp:333-361``)
  one ``athread_ssync_array`` before the loop (avoid racing counter init)
      -> one neighbor barrier via ``get_barrier_semaphore``
         (``stencil_rma.cpp:326-330``)
  edge CPEs synthesize the physical Dirichlet boundary locally
      -> mesh-edge devices' ghost cells hold BC from the initial load and
         are never overwritten; temporal sweeps re-pin the recompute zone
         on physical faces (``generate_boundary``, ``stencil_rma.cpp:150-166``)
  interior-first compute overlapping the in-flight puts
      -> core region computed between ``.start()`` and the recv waits

Two departures from the reference, both deliberate generalizations:

* **Corners ride phase-ordered strips, not diagonal sends.** The reference
  is radius-1 star only, so its 4 pushes need no corner data. Box stencils
  and temporal blocking (whose k-sweep dependency cone is a Chebyshev
  ball) do. Strips are exchanged dim-by-dim: the dim-d strip spans the
  *full padded extent* of every earlier sharded dim — including the ghost
  zone just refreshed along that dim — so diagonal-neighbor data arrives
  transitively (the same trick ``parallel.halo`` uses at the XLA level).
  The dim-d strip covers only the *interior* of later sharded dims, so no
  two incoming DMAs ever write the same corner cell (write-write race).

* **Temporal blocking** (``sweeps_per_call`` = k): each exchange moves
  ``k*r``-deep strips and k sweeps run back-to-back in VMEM, with the
  standard overlapping-recompute zones on mesh-internal faces. Sweeps
  1..k-1 write dedicated compute buffers (never the ping-pong blocks), so
  in-flight remote DMAs — which target only the blocks' ghost zones — can
  never race local compute. The reference pipelines *iterations* 2 deep
  (``stencil_rma.cpp:333-361``); this pipelines the same way (i%2 slots)
  *and* deepens each stage to k sweeps.

Why no write hazard without a barrier: at iteration i a device pushes edge
strips of its INPUT block (slot i%2) into the neighbors' ghost zones of
THEIR slot-i%2 block; compute writes only compute buffers and the OUTPUT
block's (slot (i+1)%2) interior — disjoint from every in-flight DMA target.
The causality chain through the i%2 semaphore waits bounds pipeline skew
below 2 iterations (same argument as the reference's 2-deep reply-counter
pipeline); `wait_sends(i-1)` runs before iteration i's sends so a send's
*read* of a block is also ordered before any future remote write to it.

Alignment: every remote-DMA window obeys Mosaic's rules by construction —
sharded-dim ghost zones are padded to the DMA-legal depth for that dim's
role (untiled: exact, sublane: multiple of the sublane count, lane:
multiple of 128) and strips span whole padded minor dims, so pushes are
whole-dim or aligned-offset windows.

Scope: the whole per-device padded block (x2 ping-pong, +1..2 compute
buffers when k>1) must fit VMEM. For bigger blocks use
``parallel.pallas_sharded`` (ppermute + slab streaming).
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
from jax.sharding import Mesh, PartitionSpec as P

from stencil_tpu.core.grid import DirichletBC, HaloGrid, fill_halo
from stencil_tpu.core.spec import StencilSpec
from stencil_tpu.ops.layout import PaddedLayout, round_up, sublane_for_dtype

# Total of all VMEM-resident buffers (2 ping-pong blocks + up to 2
# compute buffers); v5e handles explicit buffers well past Mosaic's 16MB
# default. 40MiB budget / 48MiB scoped limit at the 128MiB reference
# VMEM, scaled per device kind by stencil_tpu.device_model.


def _block_budget() -> int:
    from stencil_tpu import device_model

    return device_model.budgets().rma_block_budget


def _vmem_limit() -> int:
    from stencil_tpu import device_model

    b = device_model.budgets()
    return device_model.cap_limit(b.rma_limit, b)

AXIS_NAMES = ("x", "y")


@dataclasses.dataclass(frozen=True)
class RmaPlan:
    spec: StencilSpec
    local_shape: Tuple[int, ...]   # per-device interior
    dtype: str
    mesh_shape: Tuple[int, ...]    # mesh axis sizes sharding dims 0..len-1
    sweeps_per_call: int           # k: sweeps per halo exchange
    layout: PaddedLayout           # per-device padded layout, halo = k*r

    @property
    def halo(self) -> int:
        return self.sweeps_per_call * self.spec.radius

    @property
    def block_shape(self) -> Tuple[int, ...]:
        return self.layout.padded_shape

    @property
    def sharded_dims(self) -> Tuple[int, ...]:
        return tuple(range(len(self.mesh_shape)))

    @property
    def num_compute_bufs(self) -> int:
        k = self.sweeps_per_call
        return 0 if k == 1 else (1 if k == 2 else 2)


def _dma_quantum(ndim: int, d: int, sublane: int) -> int:
    """Mosaic DMA-window granule for dim ``d`` of a rank-``ndim`` array:
    lane dim needs 128-multiples, sublane dim ``sublane``-multiples, higher
    dims are unconstrained."""
    if d == ndim - 1:
        return 128
    if d == ndim - 2:
        return sublane
    return 1


def _rma_layout(local_shape, halo: int, dtype, sharded_dims) -> PaddedLayout:
    """Padded per-device layout whose sharded-dim ghost zones are exactly
    one DMA-legal push window deep (symmetric), and whose unsharded dims
    follow the standard deep-halo layout."""
    ndim = len(local_shape)
    sublane = sublane_for_dtype(dtype)
    pads = []
    for d in range(ndim):
        n = local_shape[d]
        if d in sharded_dims:
            q = _dma_quantum(ndim, d, sublane)
            pd = round_up(halo, q)
            pads.append((pd, pd))
        elif d == ndim - 1:
            lo = halo
            total = round_up(n + 2 * halo, 128)
            pads.append((lo, total - n - lo))
        elif d == ndim - 2:
            pd = round_up(halo, sublane)
            pads.append((pd, pd))
        else:
            pads.append((halo, halo))
    return PaddedLayout(interior_shape=tuple(local_shape), pads=tuple(pads),
                        halo=halo)


def make_rma_plan(spec: StencilSpec, local_shape, dtype="float32",
                  mesh_shape: Tuple[int, ...] = (1,),
                  sweeps_per_call: int = 1) -> RmaPlan:
    if spec.ndim not in (2, 3):
        raise ValueError("rma kernel supports 2D and 3D grids")
    ndim = spec.ndim
    if len(local_shape) != ndim:
        raise ValueError("local_shape rank must match spec.ndim")
    if not 1 <= len(mesh_shape) <= min(2, ndim):
        raise ValueError("mesh must be 1D or 2D over the leading grid dims")
    if sweeps_per_call < 1:
        raise ValueError("sweeps_per_call must be >= 1")
    kr = sweeps_per_call * spec.radius
    sharded = tuple(range(len(mesh_shape)))
    sublane = sublane_for_dtype(dtype)
    layout = _rma_layout(local_shape, kr, dtype, sharded)
    for d in sharded:
        q = _dma_quantum(ndim, d, sublane)
        n = local_shape[d]
        if n % q:
            raise ValueError(
                f"sharded dim {d} local size {n} must be a multiple of the "
                f"DMA granule {q} (lane dim: 128, sublane dim: {sublane})"
            )
        pd = layout.pads[d][0]
        if n < pd or n < 2 * kr:
            raise ValueError(
                f"sharded dim {d} local size {n} too small: needs >= "
                f"max(push depth {pd}, 2*k*r = {2 * kr})"
            )
    # unsharded sublane dim: interior+recompute writes slice at arbitrary
    # offsets (VMEM refs, unconstrained) — no divisibility requirement
    itemsize = np.dtype(dtype).itemsize
    block = int(np.prod(layout.padded_shape)) * itemsize
    nbuf = 2 + (0 if sweeps_per_call == 1 else
                (1 if sweeps_per_call == 2 else 2))
    budget = _block_budget()
    if nbuf * block > budget:
        raise ValueError(
            f"per-device block {layout.padded_shape} x{nbuf} buffers = "
            f"{nbuf * block} B exceeds the VMEM-resident budget "
            f"{budget}; use the sharded_pallas method for "
            "blocks this large"
        )
    return RmaPlan(spec=spec, local_shape=tuple(local_shape), dtype=dtype,
                   mesh_shape=tuple(mesh_shape),
                   sweeps_per_call=sweeps_per_call, layout=layout)


def push_bytes_per_step(plan: RmaPlan) -> int:
    """Bytes a mesh-INTERIOR device pushes over ICI per outer step.

    Mirrors the kernel's descriptor geometry exactly (``strip_extent`` /
    ``push_desc`` in ``build_rma_iterate``): per sharded dim ``sd``, two
    pushes (lo + hi neighbor) of depth ``pads[sd][0]`` — ``k*r`` rounded
    up to that dim's DMA granule — spanning the full padded extent of
    earlier sharded dims and all unsharded dims, interior-only in later
    sharded dims. Depends on the LOCAL block geometry only: mesh size
    never enters, which is the static property behind the >=90%
    weak-scaling target (tests/test_comm_volume.py pins it).
    """
    ndim = len(plan.local_shape)
    B = plan.layout.padded_shape
    nn = plan.local_shape
    sharded = plan.sharded_dims
    itemsize = np.dtype(plan.dtype).itemsize
    total = 0
    for sd in sharded:
        depth = plan.layout.pads[sd][0]
        ext = 1
        for d in range(ndim):
            if d == sd:
                continue
            ext *= nn[d] if (d in sharded and d > sd) else B[d]
        total += 2 * depth * ext * itemsize
    return total


def build_rma_iterate(plan: RmaPlan, bc: DirichletBC,
                      collective_id: int = 7, interpret: bool = False,
                      detect_races: bool = False):
    """Compile ``iterate(padded_local, n_outer) -> padded_local`` to run
    inside ``shard_map`` over the plan's mesh. One outer iteration = one
    halo exchange + ``sweeps_per_call`` stencil sweeps in VMEM."""
    spec = plan.spec
    ndim = spec.ndim
    r = spec.radius
    k = plan.sweeps_per_call
    kr = plan.halo
    dtype = jnp.dtype(plan.dtype)
    layout = plan.layout
    B = layout.padded_shape
    nn = plan.local_shape
    pp = tuple(layout.pads[d][0] for d in range(ndim))
    sharded = plan.sharded_dims
    nsh = len(sharded)
    axes = AXIS_NAMES[:nsh]
    pd = tuple(layout.pads[d][0] if d in sharded else 0 for d in range(ndim))
    # periodic SHARDED dims close the push topology into a ring (the
    # reference's open 8x8 CPE mesh has no such mode; on TPU the ICI
    # torus physically provides the wraparound links). has_lo/has_hi
    # become all-true, which also disables pin()'s physical-face
    # branches on those dims — periodic dims have no physical faces.
    # Neumann SHARDED dims keep the open chain: mesh-edge devices
    # synthesize their own k*r-deep mirror ghosts in-kernel each outer
    # step (``mirror_dim``), phase-ordered with the pushes.
    per_sh = tuple(bool(bc.periodic_mask(ndim)[d]) for d in sharded)
    neu_sh = tuple(bool(bc.neumann_mask(ndim)[d]) for d in sharded)
    # unsharded dynamic LEADING dims refresh their own k*r-deep ghosts
    # locally at iteration start (``refresh_unsharded``) and join the
    # temporal recompute trapezoid; the lane dim is gated in iterate()
    per_all = bc.periodic_mask(ndim)
    neu_all = bc.neumann_mask(ndim)
    dyn_uns = tuple(d for d in range(ndim - 1)
                    if d not in sharded and (per_all[d] or neu_all[d]))
    ext_dims = frozenset(sharded) | frozenset(dyn_uns)

    def region_idx(starts, sizes):
        return tuple(slice(starts[d], starts[d] + sizes[d])
                     for d in range(ndim))

    def taps_into(src_ref, starts, sizes):
        """Stencil outputs for the given padded-coordinate region.

        Loads slice the REF per tap (no whole-block pre-load): edge-band
        loads must observe remote-DMA'd ghost cells, so they have to stay
        distinct memory reads ordered after the recv semaphore waits — a
        single full-block load hoisted above the wait could be reused
        across it.
        """
        uw = spec.uniform_weight
        acc = None
        for wgt, offs in spec.weight_groups():
            gacc = None
            for off in offs:
                idx = tuple(
                    slice(starts[d] + off[d], starts[d] + off[d] + sizes[d])
                    for d in range(ndim)
                )
                tap = src_ref[idx]
                gacc = tap if gacc is None else gacc + tap
            term = gacc if uw is not None else gacc * jnp.asarray(wgt, dtype)
            acc = term if acc is None else acc + term
        if uw is not None:
            acc = acc * jnp.asarray(uw, dtype)
        return acc

    # region helpers (all static): ext = how far the compute region extends
    # beyond the interior into the ghost zone of each SHARDED or dynamic
    # unsharded leading dim (the overlapping-recompute zone of temporal
    # blocking); Dirichlet unsharded dims are always exactly interior
    # (their ghosts are time-independent constants).
    def rect(ext):
        starts = tuple(pp[d] - (ext if d in ext_dims else 0)
                       for d in range(ndim))
        sizes = tuple(nn[d] + (2 * ext if d in ext_dims else 0)
                      for d in range(ndim))
        return starts, sizes

    def kernel(n_ref, cur_hbm, out_hbm, blocks, *rest):
        cbufs = rest[:plan.num_compute_bufs]
        lsem, send_sem, recv_sem = rest[plan.num_compute_bufs:]

        my = [lax.axis_index(a) for a in axes]
        sizes_sh = [lax.axis_size(a) for a in axes]
        has_lo = [jnp.bool_(True) if per_sh[i] else my[i] > 0
                  for i in range(nsh)]
        has_hi = [jnp.bool_(True) if per_sh[i] else my[i] < sizes_sh[i] - 1
                  for i in range(nsh)]

        def lo_nbr(i):
            """Ring-wrapped low neighbor index for periodic dims."""
            if per_sh[i]:
                return lax.rem(my[i] - 1 + sizes_sh[i], sizes_sh[i])
            return my[i] - 1

        def hi_nbr(i):
            if per_sh[i]:
                return lax.rem(my[i] + 1, sizes_sh[i])
            return my[i] + 1

        # initial load: the full padded block into every buffer. Ghost
        # cells hold BC face values from HBM (later-dims-win corners);
        # physical-edge faces keep them forever (generate_boundary analog)
        # and the compute buffers need them for intermediate-sweep reads.
        for buf in (blocks.at[0], blocks.at[1]) + tuple(cbufs):
            cp = pltpu.make_async_copy(cur_hbm, buf, lsem)
            cp.start()
            cp.wait()

        # one pre-loop neighbor barrier (reference: single ssync_array
        # before the loop) — nobody pushes into an uninitialized block
        bsem = pltpu.get_barrier_semaphore()
        expected = jnp.int32(0)
        for i in range(nsh):
            expected = (expected + has_lo[i].astype(jnp.int32)
                        + has_hi[i].astype(jnp.int32))

            @pl.when(has_lo[i])
            def _(i=i):
                pltpu.semaphore_signal(bsem, inc=1,
                                       device_id={axes[i]: lo_nbr(i)})

            @pl.when(has_hi[i])
            def _(i=i):
                pltpu.semaphore_signal(bsem, inc=1,
                                       device_id={axes[i]: hi_nbr(i)})

        pltpu.semaphore_wait(bsem, expected)

        def strip_extent(d, sd):
            """Per-dim (start, size) of the strip pushed along sharded dim
            ``sd``: full padded extent in earlier sharded dims (corners
            ride transitively) and in unsharded dims (their ghost cells are
            identical BC constants on both ends), interior-only in later
            sharded dims (avoids two DMAs writing one corner cell)."""
            if d == sd:
                raise AssertionError
            if d in sharded and d > sd:
                return pp[d], nn[d]
            return 0, B[d]

        def push_desc(it, si, hi_side):
            """My push along sharded dim sd to the lo/hi neighbor: my edge
            rows -> their opposite ghost zone, same i%2 slot. Constructed
            identically on sender and receiver (SPMD symmetry), so the
            same descriptor serves as the receiver's mirror for
            ``wait_recv``. Slot parity doubles as the reference's
            double-buffered reply-counter index (stencil_rma.cpp:333-336).
            """
            sd = sharded[si]
            sl = lax.rem(it, 2)
            depth = pd[sd]
            if hi_side:
                src_d = (pp[sd] + nn[sd] - depth, depth)
                dst_d = (0, depth)
                nbr = {axes[si]: hi_nbr(si)}
            else:
                src_d = (pp[sd], depth)
                dst_d = (pp[sd] + nn[sd], depth)
                nbr = {axes[si]: lo_nbr(si)}
            src_idx = []
            dst_idx = []
            for d in range(ndim):
                if d == sd:
                    src_idx.append(pl.ds(*src_d))
                    dst_idx.append(pl.ds(*dst_d))
                else:
                    st, sz = strip_extent(d, sd)
                    src_idx.append(pl.ds(st, sz))
                    dst_idx.append(pl.ds(st, sz))
            di = 2 * si + (1 if hi_side else 0)
            return pltpu.make_async_remote_copy(
                src_ref=blocks.at[sl].at[tuple(src_idx)],
                dst_ref=blocks.at[sl].at[tuple(dst_idx)],
                send_sem=send_sem.at[sl, di],
                recv_sem=recv_sem.at[sl, di],
                device_id=nbr,
            )

        def send_dim(it, si):
            @pl.when(has_lo[si])
            def _():
                push_desc(it, si, False).start()

            @pl.when(has_hi[si])
            def _():
                push_desc(it, si, True).start()

        def wait_recv_dim(it, si):
            # a strip arriving FROM the hi neighbor is its lo-side push:
            # by SPMD symmetry my own lo-push descriptor mirrors it
            @pl.when(has_hi[si])
            def _():
                push_desc(it, si, False).wait_recv()

            @pl.when(has_lo[si])
            def _():
                push_desc(it, si, True).wait_recv()

        def wait_sends(it):
            for si in range(nsh):
                @pl.when(has_lo[si])
                def _(si=si):
                    push_desc(it, si, False).wait_send()

                @pl.when(has_hi[si])
                def _(si=si):
                    push_desc(it, si, True).wait_send()

        def mirror_dim(buf, si):
            """Neumann mesh-edge faces synthesize their own ``k*r``-deep
            mirror ghosts (ghost layer j = interior layer j-1, the golden
            ``mode='symmetric'`` reflection) in the same per-dim phase as
            the remote pushes, with exactly the strip footprint
            (``strip_extent``): full padded extent of earlier sharded
            dims — whose ghosts are already fresh, recv'd or mirrored —
            and of unsharded dims (whose Dirichlet constants mirror to
            themselves, carrying the golden corner semantics), interior
            only in later sharded dims. Corners therefore transit to the
            later phase exactly as with remote strips, and no ghost cell
            is ever written by two phases (the incoming dim-``sj`` push
            spanning my dim-``si`` ghost zone would race a full-extent
            local mirror). The deeper DMA-granule pad rows beyond ``kr``
            keep their load values — taps never read past ``kr``.
            """
            if not neu_sh[si]:
                return
            sd = sharded[si]

            def face_idx(dst_row, src_row):
                dst, src = [], []
                for d in range(ndim):
                    if d == sd:
                        dst.append(pl.ds(dst_row, 1))
                        src.append(pl.ds(src_row, 1))
                    else:
                        st, sz = strip_extent(d, sd)
                        dst.append(pl.ds(st, sz))
                        src.append(pl.ds(st, sz))
                return tuple(dst), tuple(src)

            @pl.when(jnp.logical_not(has_lo[si]))
            def _():
                for j in range(1, kr + 1):
                    di, si_ = face_idx(pp[sd] - j, pp[sd] + j - 1)
                    buf[di] = buf[si_]

            @pl.when(jnp.logical_not(has_hi[si]))
            def _():
                for j in range(1, kr + 1):
                    di, si_ = face_idx(pp[sd] + nn[sd] + j - 1,
                                       pp[sd] + nn[sd] - j)
                    buf[di] = buf[si_]

        def refresh_unsharded(buf):
            """Refresh the ``k*r``-deep ghosts of dynamic UNSHARDED
            leading dims from the block's own rows (wrap for periodic,
            golden ``symmetric`` mirror for Neumann) at iteration start —
            before the sends, whose strips span these ghost zones and
            carry the fresh values into neighbor corners.

            Footprint: INTERIOR on sharded dims (their ghost zones are
            in-flight remote-DMA targets — writing them here would race
            incoming pushes; the sharded-ghost x unsharded-ghost corners
            arrive transitively instead, because pushes and ``mirror_dim``
            span the full padded unsharded extent and per-dim refreshes
            commute: they remap indices in orthogonal dims), full padded
            extent on unsharded dims in increasing-dim order (golden
            later-dims-win corners between two dynamic unsharded dims).
            """
            for d in dyn_uns:
                def span(e):
                    if e in sharded:
                        return pp[e], nn[e]
                    return 0, B[e]

                def row_idx(which_d, row):
                    return tuple(
                        pl.ds(row, 1) if e == which_d
                        else pl.ds(*span(e))
                        for e in range(ndim)
                    )

                for j in range(1, kr + 1):
                    if per_all[d]:
                        # wrap: lo ghost layer j <- far interior row,
                        # hi ghost layer j <- near interior row
                        lo_src = pp[d] + nn[d] - j
                        hi_src = pp[d] + j - 1
                    else:
                        # mirror: ghost layer j <- interior layer j-1
                        lo_src = pp[d] + j - 1
                        hi_src = pp[d] + nn[d] - j
                    buf[row_idx(d, pp[d] - j)] = buf[row_idx(d, lo_src)]
                    buf[row_idx(d, pp[d] + nn[d] + j - 1)] = \
                        buf[row_idx(d, hi_src)]

        def write_buf(t, dst_block):
            """Buffer written by sweep t (1-indexed): the output block for
            the final sweep, dedicated compute buffers otherwise — the
            ping-pong blocks' ghost zones are remote-DMA targets and must
            never be written (or read mid-pipeline) by local compute."""
            if t == k:
                return dst_block
            return cbufs[(t - 1) % len(cbufs)]

        def pin(buf, ext):
            """Re-pin BC face values over the recompute zone on physical
            faces after an intermediate sweep (the zone extends into the
            ghost ring, where true Dirichlet values are time-independent).
            Sharded dims in increasing order so later physical dims win in
            corners; unsharded dims' ghost cells are never written by
            compute and keep their initial-load values.
            """
            if ext == 0:
                return
            starts, sizes = rect(ext)
            for si in range(nsh):
                if per_sh[si] or neu_sh[si]:
                    # dynamic faces have no Dirichlet constants to
                    # re-pin: periodic faces are ring-pushed, Neumann
                    # bands carry the mirror extension forward by the
                    # spec's symmetry (gated in iterate())
                    continue
                d = sharded[si]
                lo_v, hi_v = bc.values[d]

                def band_idx(d_start):
                    return tuple(
                        pl.ds(d_start, ext) if e == d
                        else pl.ds(starts[e], sizes[e])
                        for e in range(ndim)
                    )

                shape = tuple(ext if e == d else sizes[e]
                              for e in range(ndim))

                @pl.when(jnp.logical_not(has_lo[si]))
                def _(d=d, lo_v=lo_v, shape=shape):
                    buf[band_idx(pp[d] - ext)] = jnp.full(shape, lo_v,
                                                          dtype)

                @pl.when(jnp.logical_not(has_hi[si]))
                def _(d=d, hi_v=hi_v, shape=shape):
                    buf[band_idx(pp[d] + nn[d])] = jnp.full(shape, hi_v,
                                                            dtype)

        def sweep1_regions(ext):
            """Partition of the sweep-1 region (interior +- ext on the
            ``ext_dims``) into a remote-ghost-free core plus per-sharded-dim
            edge bands, ordered by the dim whose fresh ghosts they read.
            Dynamic UNSHARDED dims extend BOTH core and bands by ``ext``:
            their ghosts are refreshed locally before the core computes
            (``refresh_unsharded``), so they add no recv dependence."""
            core = []
            for d in range(ndim):
                if d in sharded:
                    core.append((pp[d] + kr, nn[d] - 2 * kr))
                elif d in dyn_uns:
                    core.append((pp[d] - ext, nn[d] + 2 * ext))
                else:
                    core.append((pp[d], nn[d]))
            bands = []  # bands[si] = [(starts, sizes), ...]
            for si in range(nsh):
                d = sharded[si]
                dim_bands = []
                for hi_side in (False, True):
                    st = []
                    sz = []
                    for e in range(ndim):
                        if e == d:
                            if hi_side:
                                st.append(pp[e] + nn[e] - kr)
                            else:
                                st.append(pp[e] - ext)
                            sz.append(kr + ext)
                        elif e in sharded and e < d:
                            # earlier dims: full extended span (this band
                            # covers their corners, fed by phase-ordered
                            # strips)
                            st.append(pp[e] - ext)
                            sz.append(nn[e] + 2 * ext)
                        elif e in sharded:
                            # later dims: core columns only (their bands
                            # cover the rest)
                            st.append(pp[e] + kr)
                            sz.append(nn[e] - 2 * kr)
                        elif e in dyn_uns:
                            # locally-refreshed ghosts: full extended span
                            st.append(pp[e] - ext)
                            sz.append(nn[e] + 2 * ext)
                        else:
                            st.append(pp[e])
                            sz.append(nn[e])
                    dim_bands.append((tuple(st), tuple(sz)))
                bands.append(dim_bands)
            return tuple(core), bands

        def body(it, _):
            src_sl = lax.rem(it, 2)
            dst_sl = lax.rem(it + 1, 2)
            src = blocks.at[src_sl]
            dst = blocks.at[dst_sl]

            # WAR: iteration it-1's sends read blocks[dst_sl] (its src);
            # drain them before compute overwrites that block — and before
            # this iteration's sends, so a send's read is ordered before
            # any future remote write to the same cells (see module doc)
            @pl.when(it >= 1)
            def _():
                wait_sends(it - 1)

            # dynamic unsharded leading dims: local wrap/mirror refresh
            # BEFORE the sends (strips span these ghost zones — neighbors'
            # corners need this iteration's values)
            refresh_unsharded(src)

            # phase 0: push strips along the first sharded dim
            send_dim(it, 0)

            ext1 = (k - 1) * r
            core, bands = sweep1_regions(ext1)
            b1 = write_buf(1, dst)

            # sweep 1 core: no ghost dependence — computed while strips
            # fly (stencil_rma.cpp:341-357)
            core_starts = tuple(c[0] for c in core)
            core_sizes = tuple(c[1] for c in core)
            if all(s > 0 for s in core_sizes):
                b1[region_idx(core_starts, core_sizes)] = taps_into(
                    src, core_starts, core_sizes
                )

            # per sharded dim: wait its strips, launch the next phase
            # (whose strips span this dim's now-fresh ghosts — corners
            # ride along), then compute the bands that read this dim's
            # ghosts while the next phase is in flight
            for si in range(nsh):
                wait_recv_dim(it, si)
                # Neumann physical faces refresh now — after this dim's
                # recvs (program order puts the mirror writes before the
                # next phase's sends, whose strips span this ghost zone,
                # and before this dim's band reads)
                mirror_dim(src, si)
                if si + 1 < nsh:
                    send_dim(it, si + 1)
                for starts, sizes in bands[si]:
                    if all(s > 0 for s in sizes):
                        b1[region_idx(starts, sizes)] = taps_into(
                            src, starts, sizes
                        )
            pin(b1, ext1)

            # sweeps 2..k: fully local, region shrinks by r per sweep
            for t in range(2, k + 1):
                ext = (k - t) * r
                starts, sizes = rect(ext)
                src_buf = write_buf(t - 1, dst)
                dst_buf = write_buf(t, dst)
                dst_buf[region_idx(starts, sizes)] = taps_into(
                    src_buf, starts, sizes
                )
                pin(dst_buf, ext)
            return 0

        n_iters = n_ref[0]
        lax.fori_loop(0, n_iters, body, 0)
        # drain the last iteration's sends before the kernel exits (every
        # incoming push was recv-waited inside the loop, so nothing is in
        # flight toward this device at exit)
        @pl.when(n_iters >= 1)
        def _():
            wait_sends(n_iters - 1)

        final = lax.rem(n_iters, 2)
        cpo = pltpu.make_async_copy(blocks.at[final], out_hbm, lsem)
        cpo.start()
        cpo.wait()

    scratch = [pltpu.VMEM((2,) + B, dtype)]
    scratch += [pltpu.VMEM(B, dtype)] * plan.num_compute_bufs
    scratch += [
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA((2, 2 * nsh)),
        pltpu.SemaphoreType.DMA((2, 2 * nsh)),
    ]

    @jax.jit
    def iterate(padded, n_outer):
        n_arr = jnp.asarray([n_outer], jnp.int32)
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct(B, dtype),
            scratch_shapes=scratch,
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
                vmem_limit_bytes=_vmem_limit(),
            ),
        )(n_arr, padded)

    return iterate


class RmaStencil:
    """Distributed iteration where the block lives in VMEM for the whole
    run and halos move chip-to-chip with remote DMA (RMA analog).

    The mesh may be 1D or 2D over the leading grid dims (the reference
    runs an 8x8 2D CPE mesh, ``stencil_rma.cpp:194-196``); ``sweeps_per_call``
    enables temporal blocking (k sweeps per exchange, ``k*r``-deep strips).
    """

    def __init__(self, spec: StencilSpec, interior_shape,
                 dtype="float32", sweeps_per_call: int = 1,
                 interpret=False, detect_races=False):
        self.spec = spec
        self.interior_shape = tuple(interior_shape)
        self.dtype = dtype
        self.sweeps_per_call = sweeps_per_call
        self.interpret = interpret
        self.detect_races = detect_races

    def _mesh_shape(self, mesh: Mesh) -> Tuple[int, ...]:
        return tuple(mesh.shape[a] for a in mesh.axis_names)

    def local_plan(self, mesh_shape: Tuple[int, ...],
                   sweeps: Optional[int] = None) -> RmaPlan:
        local = list(self.interior_shape)
        for d, n_dev in enumerate(mesh_shape):
            if local[d] % n_dev:
                raise ValueError(
                    f"grid dim {d} ({local[d]}) not divisible by mesh "
                    f"axis size {n_dev}"
                )
            local[d] //= n_dev
        return make_rma_plan(
            self.spec, tuple(local), self.dtype, tuple(mesh_shape),
            self.sweeps_per_call if sweeps is None else sweeps,
        )

    def iterate_fn(self, mesh: Mesh, bc: DirichletBC, halo: int,
                   sweeps: Optional[int] = None):
        """Cached jitted ``(grid_data, n_outer) -> grid_data`` — fully
        device-resident: scatter (pad) and gather (unpad + halo refill)
        run inside the jit under ``shard_map``, so a timed call makes no
        host round trips (unlike round 1, which split/padded via NumPy
        per call)."""
        key_sweeps = self.sweeps_per_call if sweeps is None else sweeps
        return _rma_full_fn(self, mesh, bc, halo, key_sweeps)

    def iterate(self, grid: HaloGrid, iterations: int, mesh: Mesh) -> HaloGrid:
        if jnp.dtype(grid.data.dtype) != jnp.dtype(self.dtype):
            raise ValueError(
                f"grid dtype {grid.data.dtype} != plan dtype {self.dtype}; "
                "pass dtype= when constructing RmaStencil")
        if grid.bc.any_dynamic:
            # dynamic LEADING dims are supported: SHARDED periodic
            # closes the push topology into the ring the ICI torus
            # physically provides (circular neighbor ids), SHARDED
            # Neumann mesh-edge devices synthesize their own k*r-deep
            # mirror ghosts in-kernel (``mirror_dim``), and UNSHARDED
            # dynamic leading dims wrap/mirror-refresh locally at
            # iteration start and join the temporal recompute trapezoid
            # (``refresh_unsharded``). At k>1 a Neumann extension only
            # survives a sweep if the spec is mirror-symmetric in the
            # dim — same gate as the single-chip kernels. The LANE dim
            # gates: its ghost ring is lane-alignment-padded and the
            # in-VMEM sweeps cannot see the opposite lane face mid-call.
            ndim = grid.ndim
            per = grid.bc.periodic_mask(ndim)
            neu = grid.bc.neumann_mask(ndim)
            kr = self.sweeps_per_call * self.spec.radius
            problems = []
            if per[ndim - 1] or neu[ndim - 1]:
                problems.append(
                    "a periodic/Neumann LANE (last) dim is unsupported "
                    "(use 'xla', or 'pallas_tiled' at -k 1)")
            if self.sweeps_per_call > 1:
                asym = [d for d in range(ndim - 1)
                        if neu[d] and not self.spec.symmetric_in(d)]
                if asym:
                    problems.append(
                        f"Neumann dim(s) {asym} at sweeps_per_call>1 "
                        "need the stencil mirror-symmetric in those "
                        "dims (use -k 1 for asymmetric taps)")
            nsh = len(mesh.axis_names)
            shallow = [d for d in range(nsh, ndim - 1)
                       if (per[d] or neu[d])
                       and grid.interior_shape[d] < kr]
            if shallow:
                problems.append(
                    f"dynamic unsharded dim(s) {shallow} are shallower "
                    f"than the temporal ghost depth k*r = {kr}")
            if problems:
                raise ValueError(
                    "periodic/Neumann BCs on the 'rma' method: "
                    + "; ".join(problems))
        k = self.sweeps_per_call
        n_outer, rem = divmod(iterations, k)
        data = grid.data
        if n_outer:
            run = self.iterate_fn(mesh, grid.bc, grid.halo)
            data = run(data, n_outer)
        if rem:
            run = self.iterate_fn(mesh, grid.bc, grid.halo, sweeps=rem)
            data = run(data, 1)
        return HaloGrid(data=data, halo=grid.halo, bc=grid.bc)

    def __hash__(self):
        return hash((self.spec, self.interior_shape, self.dtype,
                     self.sweeps_per_call, self.interpret,
                     self.detect_races))

    def __eq__(self, other):
        return isinstance(other, RmaStencil) and (
            (self.spec, self.interior_shape, self.dtype,
             self.sweeps_per_call, self.interpret, self.detect_races)
            == (other.spec, other.interior_shape, other.dtype,
                other.sweeps_per_call, other.interpret, other.detect_races)
        )


@functools.lru_cache(maxsize=32)
def _rma_full_fn(method: RmaStencil, mesh: Mesh, bc: DirichletBC,
                 grid_halo: int, sweeps: int):
    mesh_shape = method._mesh_shape(mesh)
    plan = method.local_plan(mesh_shape, sweeps=sweeps)
    inner = build_rma_iterate(plan, bc, interpret=method.interpret,
                              detect_races=method.detect_races)
    ndim = method.spec.ndim
    axes = mesh.axis_names
    pspec = P(*(list(axes) + [None] * (ndim - len(axes))))

    # the plain later-dims-win pad fill is correct for every device:
    # mesh-internal ghost zones are overwritten by pushes before any
    # read, physical faces/corners match the global padded array (the
    # d-face value is only read where dim d is physically outermost)
    def scatter_local(interior_local):
        return plan.layout.pad(interior_local, bc)

    if not method.interpret:
        def device_fn(interior_local, n_outer):
            return plan.layout.unpad(inner(scatter_local(interior_local),
                                           n_outer))

        mapped = jax.shard_map(
            device_fn, mesh=mesh, in_specs=(pspec, P()), out_specs=pspec,
            check_vma=False,
        )

        @jax.jit
        def run(data, n_outer):
            h = grid_halo
            idx = tuple(slice(h, s - h) for s in data.shape)
            out_interior = mapped(data[idx], n_outer)
            out = jnp.pad(out_interior, h)
            return fill_halo(out, h, bc)

        return run

    # Interpret mode (CPU tests): the simulator's io_callbacks BLOCK their
    # executor thread on np.array(operand). An operand that is still a
    # pending cross-program transfer — which is exactly what a
    # NON-CONTIGUOUS shard of a 2-axis-sharded rank-3 array is — then
    # deadlocks on a small-CPU host: every device thread blocks inside a
    # callback and the transfer has no thread left to run on. So feed the
    # kernel a block-stacked layout whose dim 0 is sharded jointly by all
    # mesh axes (always-contiguous shards, materialized in place), with
    # callback-free XLA scatter/gather steps doing the resharding, and
    # explicit materialization between dispatches. The TPU path keeps the
    # fused single-dispatch form above (no callbacks there).
    pspec_blocks = P(tuple(axes))

    scatter_m = jax.jit(jax.shard_map(
        scatter_local, mesh=mesh, in_specs=pspec, out_specs=pspec_blocks,
        check_vma=False,
    ))
    kernel_m = jax.jit(jax.shard_map(
        inner, mesh=mesh, in_specs=(pspec_blocks, P()),
        out_specs=pspec_blocks, check_vma=False,
    ))
    gather_m = jax.jit(jax.shard_map(
        plan.layout.unpad, mesh=mesh, in_specs=pspec_blocks,
        out_specs=pspec, check_vma=False,
    ))

    def run(data, n_outer):
        h = grid_halo
        idx = tuple(slice(h, s - h) for s in data.shape)
        stacked = jax.block_until_ready(scatter_m(data[idx]))
        out_stacked = jax.block_until_ready(kernel_m(stacked, n_outer))
        out = jnp.pad(gather_m(out_stacked), h)
        return fill_halo(out, h, bc)

    return run
