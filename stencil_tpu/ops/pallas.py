"""Pallas TPU stencil kernels: slab-streaming with double buffering and
temporal blocking.

TPU-native re-design of the reference's four hand-written CPE kernels
(``/root/reference/src/stencil/slave/``). The mapping of concepts:

  =====================================  =====================================
  reference (Sunway athread)             here (Pallas TPU)
  =====================================  =====================================
  64KB LDM scratchpad per CPE            ~16MB VMEM per core
  ``athread_dma_iget/iput`` descriptors  ``pltpu.make_async_copy`` HBM<->VMEM
  reply counters + ``dma_wait_value``    DMA semaphores (``SemaphoreType.DMA``)
  8x8 CPE grid over ``block_subview``    sequential Pallas grid over slabs
  double-buffered iteration pipeline     2 static scratch slots + prefetch
  ``<BoundaryWidth>`` template unroll    trace-time specialization on the spec
  ping-pong LDM blocks + host views      ``input_output_aliases`` ping-pong
  =====================================  =====================================

Design notes (why slabs, not 2D tiles): Mosaic DMA windows on tiled memrefs
must be 8/128-aligned in the last two dims. Slabs spanning the full minor
dims are contiguous in HBM, satisfy alignment via the deep-halo layout
(``layout.PaddedLayout``), and turn the halo exchange *within* a chip into
plain overfetch of ``halo`` extra leading-dim layers per slab.

Scheduling: the whole sweep runs as ONE kernel invocation with an internal
``fori_loop`` over slabs and two DMA slots (slab count forced even by
clamping slab starts to ``lead - slab``; duplicate coverage of overlap
rows is recomputed identically and written twice — benign). For 3D grids
the registry routes to ``ops.pallas_tiled`` instead, whose 2D tile windows
keep deep temporal halos within VMEM (this slab kernel's full-minor-plane
windows cannot); measured v5e 256^3 fp32: slab k=1 18.2 GLUPS vs tiled
k=8 56.2 GLUPS vs pure-XLA 11.5 GLUPS.

Temporal blocking (``sweeps_per_call = k > 1``): each slab is loaded once
with a ``k*radius``-deep halo and advanced k sweeps entirely in VMEM,
cutting HBM traffic per sweep by ~k. The compute region shrinks by
``radius`` layers per virtual sweep; ghost layers that represent the
physical Dirichlet boundary are re-pinned after every sweep (the
reference's RMA kernel does the same spatially: edge CPEs synthesize the
boundary locally, ``stencil_rma.cpp:150-166``). Because the leading-dim pad
is ``round_up(k*r, 8)`` in 2D, temporal depths up to ``8 // radius`` add
*zero* extra HBM traffic over k=1. Minor-dim ghost cells arrive via DMA
already holding BC values (the padded arrays maintain them end to end), so
only the single compute ping-pong buffer needs a one-time minor-ghost fill.
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

from stencil_tpu.core.grid import DirichletBC, HaloGrid
from stencil_tpu.core.spec import StencilSpec
from stencil_tpu.ops.layout import PaddedLayout, round_up
from stencil_tpu.ops.rolls import lane_roll

# Budget for explicit VMEM buffers (bytes). Mosaic's default scoped limit
# is 16MB but the kernel raises it to 32MB (vmem_limit_bytes), which v5e
# handles — measured 2D 4096^2 k=8: slab 256 (~22MB explicit buffers) runs
# at 137.5 GLUPS vs 124 for the 10MB-budget slab 88. 24MiB at the 128MiB
# reference VMEM, scaled per device kind by stencil_tpu.device_model.


def _resolve_budget(vmem_budget):
    if vmem_budget is None:
        from stencil_tpu import device_model

        return device_model.budgets().slab_budget
    return vmem_budget


@dataclasses.dataclass(frozen=True)
class SlabPlan:
    """Static geometry for one compiled kernel — the analog of the
    reference's ``Arguments`` host->device ABI (``stencil_slave.hpp:13-24``),
    except everything is trace-time static."""

    spec: StencilSpec
    interior_shape: Tuple[int, ...]
    dtype: str
    sweeps_per_call: int  # temporal blocking depth k
    slab: int             # leading-dim tile size
    layout: PaddedLayout
    # 'synth' (2D default for 32- and 16-bit dtypes): no lane-dim ghost
    # columns in HBM; boundary lanes synthesized in-register via
    # roll+where (16-bit rolls lower through ops.rolls.lane_roll's int32
    # bitcast — plain pltpu.roll crashes Mosaic on sub-32-bit dtypes);
    # 'slice' — shifted slices over a ghost-padded layout
    tap_mode: str = "slice"
    # fused source term: every virtual sweep computes u' = S(u) + src
    # (src a static pre-scaled padded array streamed per slab window
    # through its own DMA slots) — see ops/pallas_tiled.TiledPlan
    has_source: bool = False

    @property
    def num_slab_pairs(self) -> int:
        lead = self.interior_shape[0]
        nt = max(1, -(-lead // self.slab))
        return (nt + 1) // 2

    @property
    def halo(self) -> int:
        return self.sweeps_per_call * self.spec.radius

    @property
    def window_lead(self) -> int:
        lo, hi = self.layout.pads[0]
        return self.slab + lo + hi


def _slab_vmem_limit(spec, plan, k, slab, win_shape, dtype) -> int:
    """Scoped-VMEM limit for a slab kernel: the buffer estimate with the
    round-2 margin, floored at the device-scaled 32MiB floor (v5e value)
    and capped below the device's physical VMEM on non-reference
    capacities (identity on the 128MiB v5e so bisected limit VALUES stay
    bit-exact — the value changes Mosaic's schedule, see CLAUDE.md)."""
    from stencil_tpu import device_model

    b = device_model.budgets()
    return device_model.cap_limit(
        max(
            b.slab_limit_floor,
            int(_explicit_vmem_bytes(
                spec, plan.interior_shape, plan.dtype, k, slab,
                plan.has_source,
            ) * 1.25)
            + (2 * int(np.prod(win_shape)) * dtype.itemsize
               if plan.tap_mode == "rotacc" else 0),
        ),
        b,
    )


def _explicit_vmem_bytes(spec, shape, dtype, k, slab,
                         has_source=False) -> int:
    from stencil_tpu.ops.layout import sublane_for_dtype

    layout = PaddedLayout.for_halo(tuple(shape), k * spec.radius,
                                   sublane_for_dtype(dtype))
    minor = 1
    for s in layout.padded_shape[1:]:
        minor *= s
    lo, hi = layout.pads[0]
    win = slab + lo + hi
    itemsize = np.dtype(dtype).itemsize
    # 2 input slots + 1 compute ping-pong + 2 output slots, plus roughly one
    # window of Mosaic tap temporaries; a fused source adds its own 2
    # window slots (+1 win of sweep-slice temporaries)
    src = 3 * win if has_source else 0
    return (2 * win + win + 2 * slab + win + src) * minor * itemsize


def choose_slab(
    spec: StencilSpec,
    interior_shape: Tuple[int, ...],
    dtype: str = "float32",
    sweeps_per_call: int = 1,
    vmem_budget: Optional[int] = None,
    has_source: bool = False,
) -> Optional[int]:
    """Largest feasible leading-dim slab within the VMEM budget.

    2D: the leading dim is the sublane dim — slab and row count must be
    multiples of 8. 3D: the leading dim is untiled — any slab size.
    """
    from stencil_tpu.ops.layout import sublane_for_dtype

    vmem_budget = _resolve_budget(vmem_budget)
    ndim = len(interior_shape)
    lead = interior_shape[0]
    step = sublane_for_dtype(dtype) if ndim == 2 else 1
    if ndim == 2 and lead % step != 0:
        return None
    best = None
    cand = step
    while cand <= lead:
        if _explicit_vmem_bytes(
            spec, interior_shape, dtype, sweeps_per_call, cand, has_source
        ) <= vmem_budget:
            best = cand
            cand += step
        else:
            break
    return best


def make_plan(
    spec: StencilSpec,
    interior_shape: Tuple[int, ...],
    dtype: str = "float32",
    sweeps_per_call: int = 1,
    slab: Optional[int] = None,
    vmem_budget: Optional[int] = None,
    tap_mode: Optional[str] = None,
    has_source: bool = False,
) -> SlabPlan:
    vmem_budget = _resolve_budget(vmem_budget)
    if spec.ndim != len(interior_shape):
        raise ValueError("spec rank does not match shape rank")
    if spec.ndim not in (2, 3):
        raise ValueError("pallas kernels support 2D and 3D grids")
    if slab is None:
        slab = choose_slab(spec, interior_shape, dtype, sweeps_per_call,
                           vmem_budget, has_source)
        if slab is None:
            raise ValueError(
                f"no feasible slab for shape {interior_shape} "
                f"(k={sweeps_per_call}) within VMEM budget {vmem_budget}"
            )
    from stencil_tpu.ops.layout import sublane_for_dtype

    sublane = sublane_for_dtype(dtype)
    if len(interior_shape) == 2 and (slab % sublane
                                     or interior_shape[0] % sublane):
        raise ValueError(
            f"2D pallas path requires slab and rows % {sublane} == 0 "
            f"(sublane multiple for dtype {dtype})"
        )
    if slab > interior_shape[0]:
        raise ValueError("slab larger than leading dim")
    layout = PaddedLayout.for_halo(
        tuple(interior_shape), sweeps_per_call * spec.radius, sublane
    )
    if tap_mode is None:
        # measured on v5e (results/baseline_configs.md): rotacc is ~2x on
        # the separable box at shallow k (9-pt 4096^2 k=4: 103.5 vs 52.7
        # GLUPS) but ~3% behind synth on deep-k stars (5-pt 4096^2 k=32:
        # 170.0 vs 174-177 — full-window rotates compute the whole window
        # every sweep where synth's shrinking slices do not), so the 2D
        # fp32 default is spec-aware. 16-bit dtypes cannot rotate sublanes
        # (odd shifts) and keep synth.
        if len(interior_shape) != 2:
            tap_mode = "slice"
        elif np.dtype(dtype).itemsize == 4:
            tap_mode = ("rotacc" if spec.uniform_box_minus_center is not None
                        else "synth")
        elif np.dtype(dtype).itemsize == 2:
            tap_mode = "synth"
        else:
            tap_mode = "slice"
    if tap_mode not in ("slice", "synth", "rotacc"):
        raise ValueError(
            f"slab kernel tap_mode {tap_mode!r} not in slice/synth/rotacc"
        )
    if tap_mode in ("synth", "rotacc") and len(interior_shape) != 2:
        raise ValueError(f"{tap_mode} tap mode is 2D-only in the slab kernel")
    if tap_mode == "rotacc" and np.dtype(dtype).itemsize != 4:
        raise ValueError(
            "rotacc tap mode needs a 4-byte dtype (sublane rotates of "
            "16-bit dtypes have no Mosaic-safe lowering for odd shifts)"
        )
    if tap_mode in ("synth", "rotacc"):
        # drop the lane ghosts: synthesize boundary lanes in-register
        n1 = interior_shape[1]
        layout = PaddedLayout(
            interior_shape=layout.interior_shape,
            pads=(layout.pads[0], (0, round_up(n1, 128) - n1)),
            halo=layout.halo,
        )
    return SlabPlan(
        spec=spec,
        interior_shape=tuple(interior_shape),
        dtype=dtype,
        sweeps_per_call=sweeps_per_call,
        slab=slab,
        layout=layout,
        tap_mode=tap_mode,
        has_source=has_source,
    )


def build_sweep(plan: SlabPlan, bc: DirichletBC, interpret: bool = False):
    """Compile one outer step: k virtual sweeps over the whole grid.

    Returns ``sweep(cur, nxt) -> new`` over padded arrays. ``nxt`` is
    aliased to the output, so its BC ring survives (the functional analog of
    the reference applying BCs to both ping-pong buffers up front,
    ``stencil.cpp:199-207``).
    """
    spec = plan.spec
    ndim = spec.ndim
    k = plan.sweeps_per_call
    r = spec.radius
    dtype = jnp.dtype(plan.dtype)
    layout = plan.layout
    padded_shape = layout.padded_shape
    slab = plan.slab
    lead = plan.interior_shape[0]
    lead_lo = layout.pads[0][0]
    win_lead = plan.window_lead
    minor_padded = padded_shape[1:]
    win_shape = (win_lead,) + minor_padded
    otile_shape = (slab,) + minor_padded
    minor_interior = plan.interior_shape[1:]
    minor_lo = tuple(layout.pads[d][0] for d in range(1, ndim))

    nt = max(1, -(-lead // slab))
    nt += nt % 2  # force even; clamped starts make the extra slab benign
    ns = nt // 2

    lead_lo_bc, lead_hi_bc = bc.values[0]

    def taps_into(src_val, lead_a: int, n0: int) -> jax.Array:
        """Apply the stencil for output region: leading rows
        [lead_a, lead_a + n0), minor dims = exact interior extents.

        Static ``lax.slice`` windows per tap — the trace-time analog of the
        reference's fold-expression unrolling
        (``stencil_dma_static_unroll.cpp:605-624``). Uniform-weight specs
        sum first and multiply once (``stencil.cpp:85-125``).
        """
        uw = spec.uniform_weight
        acc = None
        for w, offs in spec.weight_groups():
            gacc = None
            for off in offs:
                start = (lead_a + off[0],) + tuple(
                    minor_lo[d - 1] + off[d] for d in range(1, ndim)
                )
                limit = (start[0] + n0,) + tuple(
                    start[d] + minor_interior[d - 1] for d in range(1, ndim)
                )
                tap = lax.slice(src_val, start, limit)
                gacc = tap if gacc is None else gacc + tap
            term = gacc if uw is not None else gacc * jnp.asarray(w, dtype)
            acc = term if acc is None else acc + term
        if uw is not None:
            acc = acc * jnp.asarray(uw, dtype)
        return acc

    # 2D-only: boundary-lane synthesis (see ops.pallas_tiled.taps_synth)
    n1_2d = minor_interior[0] if ndim == 2 else 0
    P1_2d = minor_padded[0] if ndim == 2 else 0
    lane_lo_bc, lane_hi_bc = bc.values[-1]

    def taps_synth(src_val, lead_a: int, n0: int) -> jax.Array:
        # one full-window (aligned) rotate per distinct lane offset, shared
        # by all taps with that offset — rolling an already-sliced
        # (sublane-misaligned) operand crashes the Mosaic compiler for
        # diagonal taps, and hoisting makes box stencils 2r rolls total
        uw = spec.uniform_weight
        rolled = {0: src_val}
        lanes = None

        def get_rolled(o1):
            nonlocal lanes
            if o1 not in rolled:
                t = lane_roll(src_val, (-o1) % P1_2d, 1)
                if lanes is None:
                    lanes = lax.broadcasted_iota(jnp.int32, (1, P1_2d), 1)
                if o1 > 0:
                    t = jnp.where(lanes >= n1_2d - o1,
                                  jnp.asarray(lane_hi_bc, dtype), t)
                else:
                    t = jnp.where(lanes < -o1,
                                  jnp.asarray(lane_lo_bc, dtype), t)
                rolled[o1] = t
            return rolled[o1]

        ubmc = spec.uniform_box_minus_center
        if ubmc is not None:
            # separable: w * (S1(S0(x)) - x); the lane pass rolls the
            # row-summed partial and pins wrapped ghost lanes to
            # (2r+1) * face value (the whole ghost lane is the constant
            # face value by the later-dims-win convention)
            r = spec.radius
            side = 2 * r + 1
            u = None
            for o in range(-r, r + 1):
                t = lax.slice(src_val, (lead_a + o, 0),
                              (lead_a + o + n0, P1_2d))
                u = t if u is None else u + t
            lanes2 = lax.broadcasted_iota(jnp.int32, (1, P1_2d), 1)
            wsum = None
            for o in range(-r, r + 1):
                if o == 0:
                    t = u
                else:
                    t = lane_roll(u, (-o) % P1_2d, 1)
                    if o > 0:
                        t = jnp.where(lanes2 >= n1_2d - o,
                                      jnp.asarray(lane_hi_bc * side, dtype),
                                      t)
                    else:
                        t = jnp.where(lanes2 < -o,
                                      jnp.asarray(lane_lo_bc * side, dtype),
                                      t)
                wsum = t if wsum is None else wsum + t
            center = lax.slice(src_val, (lead_a, 0), (lead_a + n0, P1_2d))
            out = (wsum - center) * jnp.asarray(ubmc, dtype)
            return lax.slice(out, (0, 0), (n0, n1_2d))

        acc = None
        for w, offs in spec.weight_groups():
            gacc = None
            for off in offs:
                base = get_rolled(off[1])
                tap = lax.slice(base, (lead_a + off[0], 0),
                                (lead_a + off[0] + n0, n1_2d))
                gacc = tap if gacc is None else gacc + tap
            term = gacc if uw is not None else gacc * jnp.asarray(w, dtype)
            acc = term if acc is None else acc + term
        if uw is not None:
            acc = acc * jnp.asarray(uw, dtype)
        return acc

    def taps_rotacc(src_val, lead_a: int, n0: int) -> jax.Array:
        """Full-extent rotate-accumulate (2D, 32-bit dtypes).

        taps_synth pays one sublane-misaligned slice relayout per LEAD
        tap; here lead offsets are sublane rotates of the full window
        (cached per distinct (o0, o1) with the lane rotate + boundary
        synthesis composed), and the single misaligned slice happens
        once on the accumulated result. Wrapped rotate values never
        reach used output cells: every used read stays >= r inside the
        window in the lead dim (lead_a >= r by construction).
        """
        uw = spec.uniform_weight
        lanes = lax.broadcasted_iota(jnp.int32, (1, P1_2d), 1)
        rolled = {(0, 0): src_val}

        def get_rot(o0, o1):
            if (o0, o1) not in rolled:
                t = src_val
                if o0:
                    t = pltpu.roll(t, (-o0) % win_lead, 0)
                if o1:
                    t = lane_roll(t, (-o1) % P1_2d, 1)
                    if o1 > 0:
                        t = jnp.where(lanes >= n1_2d - o1,
                                      jnp.asarray(lane_hi_bc, dtype), t)
                    else:
                        t = jnp.where(lanes < -o1,
                                      jnp.asarray(lane_lo_bc, dtype), t)
                rolled[(o0, o1)] = t
            return rolled[(o0, o1)]

        ubmc = spec.uniform_box_minus_center
        if ubmc is not None:
            # separable box in rotacc form: the lead pass is sublane
            # rotates instead of misaligned slices; lane pass as in
            # taps_synth (ghost lanes pin to (2r+1) * face value)
            rr = spec.radius
            side = 2 * rr + 1
            u = None
            for o in range(-rr, rr + 1):
                t = src_val if o == 0 else pltpu.roll(src_val,
                                                      (-o) % win_lead, 0)
                u = t if u is None else u + t
            wsum = None
            for o in range(-rr, rr + 1):
                if o == 0:
                    t = u
                else:
                    t = lane_roll(u, (-o) % P1_2d, 1)
                    if o > 0:
                        t = jnp.where(lanes >= n1_2d - o,
                                      jnp.asarray(lane_hi_bc * side, dtype),
                                      t)
                    else:
                        t = jnp.where(lanes < -o,
                                      jnp.asarray(lane_lo_bc * side, dtype),
                                      t)
                wsum = t if wsum is None else wsum + t
            out = (wsum - src_val) * jnp.asarray(ubmc, dtype)
            return lax.slice(out, (lead_a, 0), (lead_a + n0, n1_2d))

        acc = None
        for w, offs in spec.weight_groups():
            gacc = None
            for off in offs:
                tap = get_rot(off[0], off[1])
                gacc = tap if gacc is None else gacc + tap
            term = gacc if uw is not None else gacc * jnp.asarray(w, dtype)
            acc = term if acc is None else acc + term
        if uw is not None:
            acc = acc * jnp.asarray(uw, dtype)
        return lax.slice(acc, (lead_a, 0), (lead_a + n0, n1_2d))

    def minor_interior_idx(lead_slice):
        return (lead_slice,) + tuple(
            slice(minor_lo[d - 1], minor_lo[d - 1] + minor_interior[d - 1])
            for d in range(1, ndim)
        )

    def fill_minor_ghosts(ref, n_lead: int):
        """One-time BC fill of minor-dim ghost slabs of a VMEM buffer
        (increasing dim order: later dims win in corners, matching
        ``layout.PaddedLayout.pad``)."""
        for d in range(1, ndim):
            lo_v, hi_v = bc.values[d]
            lo_w = layout.pads[d][0]
            hi_w = padded_shape[d] - minor_interior[d - 1] - lo_w
            pre = tuple(
                slice(None) for _ in range(d - 1)
            )
            idx_lo = (slice(0, n_lead),) + pre + (slice(0, lo_w),)
            idx_hi = (slice(0, n_lead),) + pre + (
                slice(padded_shape[d] - hi_w, None),
            )
            shape_lo = (n_lead,) + padded_shape[1:d] + (lo_w,) + padded_shape[d + 1:]
            shape_hi = (n_lead,) + padded_shape[1:d] + (hi_w,) + padded_shape[d + 1:]
            if lo_w:
                ref[idx_lo] = jnp.full(shape_lo, lo_v, dtype)
            if hi_w:
                ref[idx_hi] = jnp.full(shape_hi, hi_v, dtype)

    def kernel(pins_ref, cur_hbm, nxt_hbm, *rest):
        if plan.has_source:
            (src_hbm, out_hbm, scratch, cbuf, otile, isem, osem,
             sscratch, ssem) = rest
        else:
            (out_hbm, scratch, cbuf, otile, isem, osem) = rest
            src_hbm = sscratch = ssem = None
        # The whole sweep runs as ONE kernel invocation with an internal
        # fori_loop over slabs and double-buffered DMA slots; at temporal
        # depth 16+ the 2D path sustains >1.3 TB/s effective on v5e
        # (synth taps, slab 256 — see docs/performance.md).

        def slab_start(slab_i):
            from stencil_tpu.ops.layout import sublane_for_dtype

            s = jnp.minimum(slab_i * slab, lead - slab)
            if ndim == 2:
                s = pl.multiple_of(s, sublane_for_dtype(dtype))
            return s

        def in_copy(slab_i, sl):
            return pltpu.make_async_copy(
                cur_hbm.at[pl.ds(slab_start(slab_i), win_lead)],
                scratch.at[sl],
                isem.at[sl],
            )

        def src_copy(slab_i, sl):
            return pltpu.make_async_copy(
                src_hbm.at[pl.ds(slab_start(slab_i), win_lead)],
                sscratch.at[sl],
                ssem.at[sl],
            )

        def out_copy(slab_i, sl):
            return pltpu.make_async_copy(
                otile.at[sl],
                out_hbm.at[pl.ds(slab_start(slab_i) + lead_lo, slab)],
                osem.at[sl],
            )

        def compute(sl, slab_i):
            """k virtual sweeps on slot ``sl``; result lands in otile[sl]."""
            taps = {"synth": taps_synth,
                    "rotacc": taps_rotacc}.get(plan.tap_mode, taps_into)
            start = slab_start(slab_i)
            # Re-pin physical Dirichlet ghosts with static-size bands and
            # dynamic per-slab thresholds (cf. ops/pallas_tiled.pin): any
            # slab whose window crosses a physical lead face re-pins
            # exactly the rows at/beyond it — edge slabs AND mid slabs
            # whose per-sweep recompute extension (k-t)*r exceeds the
            # slab pitch. The round-2 kernel pinned edge slabs only and
            # read stencil-updated ghost rows back at slab < (k-1)*r
            # (measured 2.3e-4 vs golden at k=8 r=2 slab=8 on 32x40;
            # regression test in tests/test_pallas.py). pins_ref[0]/[1]
            # are 0 on mesh-interior devices in the sharded path (their
            # lead-dim ghosts hold live neighbor data, redundantly
            # recomputed each virtual sweep).
            pin_lo = (pins_ref[0] != 0) & (start < lead_lo)
            pin_hi = (pins_ref[1] != 0) & (start > lead - slab - lead_lo)
            rows_band = lax.broadcasted_iota(
                jnp.int32, (lead_lo,) + (1,) * (ndim - 1), 0
            )
            bufs = (scratch.at[sl], cbuf)
            for t in range(1, k + 1):
                need = (k - t) * r
                lead_a = lead_lo - need
                n0 = slab + 2 * need
                src = bufs[(t - 1) % 2]
                y = taps(src[...], lead_a, n0)
                if plan.has_source:
                    # affine update u' = S(u) + src over the shrinking
                    # band extent, added BEFORE re-pinning (cf.
                    # ops/pallas_tiled.py compute)
                    y = y + sscratch.at[sl][
                        minor_interior_idx(slice(lead_a, lead_a + n0))]
                if t < k:
                    dst = bufs[t % 2]
                    dst[minor_interior_idx(pl.ds(lead_a, n0))] = y

                    @pl.when(pin_lo)
                    def _():
                        bi = minor_interior_idx(slice(0, lead_lo))
                        dst[bi] = jnp.where(
                            rows_band < lead_lo - start,
                            jnp.asarray(lead_lo_bc, dtype), dst[bi]
                        )

                    @pl.when(pin_hi)
                    def _():
                        bi = minor_interior_idx(
                            slice(win_lead - lead_lo, None)
                        )
                        dst[bi] = jnp.where(
                            rows_band >= lead - slab - start,
                            jnp.asarray(lead_hi_bc, dtype), dst[bi]
                        )
                else:
                    otile[(sl,) + minor_interior_idx(slice(None))] = y

        # one-time minor-ghost BC fill of persistent buffers; scratch slots
        # are refilled by DMA (windows include ghosts with BC values
        # straight from HBM), so only cbuf/otile need it.
        if k > 1:
            fill_minor_ghosts(cbuf, win_lead)
        fill_minor_ghosts(otile.at[0], slab)
        fill_minor_ghosts(otile.at[1], slab)

        in_copy(0, 0).start()
        in_copy(1, 1).start()
        if plan.has_source:
            src_copy(0, 0).start()
            src_copy(1, 1).start()

        def body(i, _):
            sl = lax.rem(i, 2)
            in_copy(i, sl).wait()
            if plan.has_source:
                src_copy(i, sl).wait()

            @pl.when(i >= 2)
            def _():
                out_copy(i - 2, sl).wait()  # frees otile[sl]

            compute(sl, i)

            @pl.when(i + 2 < nt)
            def _():
                in_copy(i + 2, sl).start()
                if plan.has_source:
                    src_copy(i + 2, sl).start()

            out_copy(i, sl).start()
            return 0

        lax.fori_loop(0, nt, body, 0)
        out_copy(nt - 2, 0 if nt % 2 == 0 else 1).wait()
        out_copy(nt - 1, 1 if nt % 2 == 0 else 0).wait()

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    scratch_shapes = [
        pltpu.VMEM((2,) + win_shape, dtype),
        pltpu.VMEM(win_shape if k > 1 else (1,) * ndim, dtype),
        pltpu.VMEM((2,) + otile_shape, dtype),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if plan.has_source:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch_shapes += [
            pltpu.VMEM((2,) + win_shape, dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]

    def _call(pins, *arrays):
        return pl.pallas_call(
            kernel,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct(padded_shape, dtype),
            scratch_shapes=scratch_shapes,
            input_output_aliases={2: 0},
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                # Mosaic's tap/stack temporaries for wide 2D rows can
                # exceed the 16MB default scoped limit even when the
                # explicit buffers respect the budget; scale with the
                # actual buffer estimate (+2 windows for rotacc's live
                # rolled temporaries, cf. make_tiled_plan) so explicit
                # large -b values don't hit a hardcoded wall
                vmem_limit_bytes=_slab_vmem_limit(
                    spec, plan, k, slab, win_shape, dtype
                ),
            ),
        )(pins, *arrays)

    if plan.has_source:
        @jax.jit
        def sweep(cur, nxt, src, pins=None):
            if pins is None:
                pins = jnp.ones((2,), jnp.int32)
            return _call(pins, cur, nxt, src)
    else:
        @jax.jit
        def sweep(cur, nxt, pins=None):
            """One outer step (k virtual sweeps). ``pins`` is an int32
            (2,) array: pins[0]/pins[1] nonzero -> the low/high lead-dim
            edge of this block is a physical Dirichlet boundary (both,
            for single-device runs). The sharded path passes 0 for
            mesh-interior edges, whose ghosts hold live neighbor data
            from the halo exchange."""
            if pins is None:
                pins = jnp.ones((2,), jnp.int32)
            return _call(pins, cur, nxt)

    return sweep


@functools.lru_cache(maxsize=64)
def _cached_sweep(plan: SlabPlan, bc: DirichletBC, interpret: bool):
    return build_sweep(plan, bc, interpret)


@functools.lru_cache(maxsize=64)
def _cached_runner(plan: SlabPlan, bc: DirichletBC, interpret: bool):
    """n-outer-steps loop over the cached sweep.

    MUST be cached: constructing a fresh ``jax.jit`` closure per call
    defeats jit's function-identity cache, so every ``iterate()`` would
    re-trace and re-lower the pallas call (~0.7 s on the remote-compile
    TPU backend) — measured to dwarf the actual compute and to have been
    the dominant cost of every benchmark run before the fix.
    """
    sweep = _cached_sweep(plan, bc, interpret)

    @jax.jit
    def run(cur, nxt, n_outer):
        def body(_, carry):
            c, n = carry
            return (sweep(c, n), c)

        return lax.fori_loop(0, n_outer, body, (cur, nxt))

    return run


@functools.lru_cache(maxsize=64)
def _cached_iterate(plan: SlabPlan, bc: DirichletBC, interpret: bool,
                    grid_halo: int):
    """End-to-end jitted iterate: grid.data -> grid.data after n_outer
    outer steps, including the pad/unpad relayout.

    One jit = ONE dispatch per call. The eager pad/fill/unpad path costs
    ~10 separate dispatches, which on a tunneled backend (~30 ms each)
    adds a ~0.3 s fixed cost per call that dwarfs the kernel itself.
    """
    from stencil_tpu.core.grid import fill_halo
    from stencil_tpu.ops.layout import refresh_dynamic_layout

    sweep = _cached_sweep(plan, bc, interpret)
    depth = plan.layout.halo  # k*r: seed the full temporal ghost depth
    dyn = bc.dynamic_mask(2)
    # lead-dim pins off on a dynamic (periodic/Neumann) d0: the deep
    # refresh between kernel calls seeds k*r ghost rows, so the kernel
    # treats the faces like mesh-internal ones (same mechanism as the
    # sharded path)
    pins = np.asarray([0 if dyn[0] else 1] * 2, np.int32)

    @jax.jit
    def run(data, n_outer):
        h = grid_halo
        idx = tuple(slice(h, s - h) for s in data.shape)
        cur = plan.layout.pad(data[idx], bc)
        if bc.any_dynamic:
            # dynamic ghosts must hold the current iterate's wrapped /
            # mirrored rows (re-refreshed after every kernel call below)
            cur = refresh_dynamic_layout(cur, plan.layout, bc, depth)
        # distinct output buffer for the aliased kernel write; XLA's
        # copy-removal is aliasing-aware and must keep this copy because
        # cur is still read by the first sweep
        nxt = jnp.copy(cur)

        def body(_, carry):
            c, n = carry
            if bc.any_dynamic:
                out = sweep(c, n, jnp.asarray(pins))
                out = refresh_dynamic_layout(out, plan.layout, bc, depth)
            else:
                out = sweep(c, n)
            return (out, c)

        cur, nxt = lax.fori_loop(0, n_outer, body, (cur, nxt))
        out = jnp.pad(plan.layout.unpad(cur), h)
        return fill_halo(out, h, bc)

    return run


@functools.lru_cache(maxsize=64)
def _cached_source_iterate(plan: SlabPlan, bc: DirichletBC,
                           interpret: bool, grid_halo: int):
    """Source-term twin of ``_cached_iterate``: threads the (static,
    pre-padded) source operand into every kernel call."""
    from stencil_tpu.core.grid import fill_halo
    from stencil_tpu.ops.layout import refresh_dynamic_layout

    sweep = _cached_sweep(plan, bc, interpret)
    depth = plan.layout.halo
    dyn = bc.dynamic_mask(len(plan.interior_shape))
    pins = np.asarray([0 if dyn[0] else 1] * 2, np.int32)

    @jax.jit
    def run(data, n_outer, src_padded):
        h = grid_halo
        idx = tuple(slice(h, s - h) for s in data.shape)
        cur = plan.layout.pad(data[idx], bc)
        if bc.any_dynamic:
            cur = refresh_dynamic_layout(cur, plan.layout, bc, depth)
        nxt = jnp.copy(cur)

        def body(_, carry):
            c, n = carry
            if bc.any_dynamic:
                out = sweep(c, n, src_padded, jnp.asarray(pins))
                out = refresh_dynamic_layout(out, plan.layout, bc, depth)
            else:
                out = sweep(c, n, src_padded)
            return (out, c)

        cur, nxt = lax.fori_loop(0, n_outer, body, (cur, nxt))
        out = jnp.pad(plan.layout.unpad(cur), h)
        return fill_halo(out, h, bc)

    return run


class PallasStencil:
    """User-facing handle: iterate a HaloGrid with the slab kernel.

    ``sweeps_per_call`` is the temporal-blocking depth k; iteration counts
    that are not multiples of k run the remainder on a k'=remainder kernel.
    ``source`` (interior-shaped, static) makes every virtual sweep the
    affine update ``u' = S(u) + source_scale*source`` (2D Jacobi-Poisson
    at slab-kernel speed).
    """

    def __init__(
        self,
        spec: StencilSpec,
        interior_shape: Tuple[int, ...],
        dtype: str = "float32",
        sweeps_per_call: int = 1,
        slab: Optional[int] = None,
        interpret: bool = False,
        vmem_budget: Optional[int] = None,
        tap_mode: Optional[str] = None,
        source=None,
        source_scale=1.0,
    ):
        self.plan = make_plan(
            spec, tuple(interior_shape), dtype, sweeps_per_call, slab,
            vmem_budget, tap_mode, has_source=source is not None,
        )
        if source is not None \
                and tuple(np.shape(source)) != self.plan.interior_shape:
            raise ValueError(
                f"source shape {tuple(np.shape(source))} != interior "
                f"{self.plan.interior_shape}")
        self.spec = spec
        self.interpret = interpret
        self.vmem_budget = vmem_budget
        self.source = source
        self.source_scale = source_scale
        self._src_padded = {}

    def _padded_source(self, plan: SlabPlan, bc: DirichletBC):
        from stencil_tpu.ops.pallas_tiled import pad_source

        key = (plan, bc)
        if key not in self._src_padded:
            self._src_padded[key] = pad_source(plan, self.source,
                                               self.source_scale, bc)
        return self._src_padded[key]

    # -- plumbing ------------------------------------------------------------

    def prepare(self, grid: HaloGrid) -> Tuple[jax.Array, jax.Array]:
        padded = self.plan.layout.pad_grid(grid)
        # nxt must be a distinct buffer: the kernel reads cur while writing
        # into the aliased nxt (ping-pong WAR hazard otherwise). jnp.array
        # on a concrete array makes a real device copy.
        return padded, jnp.array(padded, copy=True)

    def extract(self, padded: jax.Array, grid: HaloGrid) -> HaloGrid:
        interior = self.plan.layout.unpad(padded)
        return HaloGrid.from_interior(interior, halo=grid.halo, bc=grid.bc)

    def _runner(self, bc: DirichletBC):
        return _cached_runner(self.plan, bc, self.interpret)

    # -- main entry ------------------------------------------------------------

    def iterate(self, grid: HaloGrid, iterations: int) -> HaloGrid:
        if jnp.dtype(grid.data.dtype) != jnp.dtype(self.plan.dtype):
            raise ValueError(
                f"grid dtype {grid.data.dtype} != plan dtype "
                f"{self.plan.dtype}; pass dtype= when constructing "
                "PallasStencil")
        if grid.bc.any_dynamic:
            # a dynamic (periodic/Neumann) LEAD dim runs at any temporal
            # depth (deep refresh between kernel calls + lead pins off;
            # Neumann additionally needs the spec mirror-symmetric in
            # d0 at k>1, so the sweep preserves the mirror extension);
            # a dynamic LANE dim needs k=1 + the ghost-reading slice
            # mode (synth/rotacc synthesize the lane boundary
            # in-register, and the in-VMEM virtual sweeps cannot see
            # the lane face mid-call)
            # rank-general (make_plan accepts 3D slabs too): the LANE
            # dim is always the LAST dim, whatever the rank
            ndim = grid.ndim
            dyn = grid.bc.dynamic_mask(ndim)
            neu = grid.bc.neumann_mask(ndim)
            problems = []
            if dyn[-1] and self.plan.sweeps_per_call != 1:
                problems.append(
                    "a periodic/Neumann lane (last) dim needs "
                    "sweeps_per_call=1 (use -k 1)")
            if dyn[-1] and self.plan.tap_mode != "slice":
                problems.append(
                    f"a periodic/Neumann lane (last) dim needs the "
                    f"slice tap mode, not {self.plan.tap_mode!r}")
            for d in range(1, ndim - 1):
                # the slab kernel's pins cover d0 only: a dynamic MIDDLE
                # dim (3D slabs) has no pin-disable hook, so its deep
                # ghosts are not advanced by the in-VMEM virtual sweeps
                # (measured wrong at k=2: err 0.19) — k=1 refreshes
                # between calls and is exact
                if dyn[d] and self.plan.sweeps_per_call != 1:
                    problems.append(
                        f"a periodic/Neumann middle dim {d} on the slab "
                        "kernel needs sweeps_per_call=1 (use -k 1, or "
                        "the tiled 3D kernel, which runs dynamic d0/d1 "
                        "at any temporal depth)")
            if self.plan.sweeps_per_call > 1:
                for d in range(ndim - 1):
                    if neu[d] and not self.spec.symmetric_in(d):
                        problems.append(
                            f"a Neumann dim {d} at sweeps_per_call>1 "
                            f"needs the stencil mirror-symmetric in dim "
                            f"{d} (use -k 1 for asymmetric taps)")
            if problems:
                raise ValueError(
                    "periodic/Neumann BCs on the 2D slab Pallas kernel: "
                    + "; ".join(problems)
                )
        k = self.plan.sweeps_per_call
        n_outer, rem = divmod(iterations, k)
        data = grid.data
        has_src = self.plan.has_source
        if n_outer:
            if has_src:
                run = _cached_source_iterate(self.plan, grid.bc,
                                             self.interpret, grid.halo)
                data = run(data, n_outer,
                           self._padded_source(self.plan, grid.bc))
            else:
                run = _cached_iterate(self.plan, grid.bc, self.interpret,
                                      grid.halo)
                data = run(data, n_outer)
        if rem:
            rem_method = PallasStencil(
                self.spec, self.plan.interior_shape, self.plan.dtype,
                sweeps_per_call=rem, slab=self.plan.slab,
                interpret=self.interpret, vmem_budget=self.vmem_budget,
                tap_mode=self.plan.tap_mode,
                source=self.source, source_scale=self.source_scale,
            )
            if has_src:
                run = _cached_source_iterate(rem_method.plan, grid.bc,
                                             self.interpret, grid.halo)
                data = run(data, 1,
                           self._padded_source(rem_method.plan, grid.bc))
            else:
                run = _cached_iterate(rem_method.plan, grid.bc,
                                      self.interpret, grid.halo)
                data = run(data, 1)
        return HaloGrid(data=data, halo=grid.halo, bc=grid.bc)
