"""3D temporal-blocked Pallas kernel with 2D (plane x row-panel) tiling.

Why this exists: the slab kernel in ``ops.pallas`` streams full minor
planes, so for a 256^3+ grid a temporally-blocked window (k*r-deep halo)
of whole (d1, d2) planes cannot fit VMEM — 3D temporal blocking needs the
window tiled in d1 as well. The Pallas auto-pipeline cannot express that:
overlapping ``pl.Element`` windows along the sublane dim crash the Mosaic
AOT compiler (bisected on v5e; overlap along the untiled d0 is fine), so
this kernel issues its own double-buffered ``pltpu.make_async_copy`` DMAs
with 8-aligned d1 window offsets — the TPU equivalent of the reference's
per-CPE LDM tiles (``/root/reference/src/stencil/slave/stencil_dma.cpp``:
a 2D grid of scratchpad tiles, pull-model halos re-read from main memory
each iteration, async get/put descriptors overlapping compute).

Geometry per tile (window-local coordinates):

  d0: [0, s0 + 2*kr)      pad kr each side (untiled dim, exact)
  d1: [0, t1 + 2*p1)      p1 = round_up(kr, sublane) — aligned overfetch
  d2: [0, P2)             full padded width (lane dim, 128-aligned)

``k`` virtual sweeps run in VMEM per HBM round trip; the compute region
shrinks by ``r`` per sweep in d0 and d1 (redundant overlap recompute), and
physical Dirichlet ghosts are re-pinned between sweeps on any tile whose
window crosses a physical face — static-size bands with dynamic per-tile
thresholds (later-dims-win corner order: d0, then d1, then d2). The
4-entry ``pins`` vector (d0lo, d0hi, d1lo, d1hi) disables pinning on
mesh-internal faces, so this kernel drops into the 1D- or 2D-mesh
sharded path unchanged. Tiles need not divide the grid dims (clamped
overlapping last tiles); ``slots`` deepens the input-DMA pipeline and
``slide`` enables sliding-d1 window reuse (see the class docstrings).
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
from stencil_tpu.ops.layout import PaddedLayout, round_up, sublane_for_dtype
from stencil_tpu.ops.rolls import lane_roll

# v5e handles explicit-buffer footprints well past Mosaic's 16MB default
# scoped limit (the kernel raises vmem_limit_bytes accordingly); measured
# 256^3 fp32 k=8 synth taps: tiles 64x64 (~35MB buffers) -> 106.3 GLUPS
# vs 32x64 slice taps -> 61.3 GLUPS vs pure XLA -> 11.5 GLUPS. The 52MB
# budget (at the 128MiB reference VMEM; scaled per device by
# stencil_tpu.device_model) admits 64x64 for the radius-2 384^3 config
# (measured 47.3 vs 45.1 GLUPS at 32x64, ~50MB buffers at an 80MB scoped
# limit) while still excluding the tile shapes measured to hard-crash
# the compiler (bf16 64x256 / 128x128, ~64MB+).


def _resolve_budget(vmem_budget: Optional[int]) -> int:
    if vmem_budget is None:
        from stencil_tpu import device_model

        return device_model.budgets().tiled_budget
    return vmem_budget


def _tiled_limit_floor() -> int:
    from stencil_tpu import device_model

    return device_model.budgets().tiled_limit_floor


def _wants_wide_budget(interior_shape, dtype, tap_mode) -> bool:
    """True when a DEFAULTED budget should widen to admit the larger
    windows measured to win: fp32 synth/rotacc with a fat lane dim
    (P2 >= 512) or a ragged d0/d1 (no pow2-ish divisor — clamp/embed
    territory, where small windows multiply per-tile overheads)."""
    if np.dtype(dtype).itemsize != 4 or tap_mode not in ("synth",
                                                         "rotacc"):
        return False
    n0, n1, n2 = interior_shape
    if round_up(n2, 128) >= 512:
        return True
    ragged0 = all(n0 % s for s in (4, 8, 16, 32, 64, 128, 256)
                  if s <= n0) and n0 not in (1, 2)
    ragged1 = all(n1 % t for t in (8, 16, 32, 48, 64, 96, 128, 256)
                  if t <= n1)
    return ragged0 or ragged1


@dataclasses.dataclass(frozen=True)
class TiledPlan:
    spec: StencilSpec
    interior_shape: Tuple[int, int, int]
    dtype: str
    sweeps_per_call: int
    s0: int            # d0 tile size (planes)
    t1: int            # d1 tile size (rows)
    layout: PaddedLayout
    # raise Mosaic's scoped-VMEM limit (default 16MB) for large windows;
    # None keeps the compiler default
    vmem_limit: Optional[int] = None
    # tap evaluation strategy: 'slice' = shifted lax.slice per tap;
    # 'roll' = pltpu.roll full-window rotates for minor-dim taps (lane /
    # sublane rotates instead of general shifted-window relayouts — the
    # wrapped edge values never reach used output cells because reads stay
    # >= 1 element inside the window); 'synth' = no d2 ghost columns in
    # HBM at all, boundary lanes synthesized in-register (fastest:
    # measured 106 vs 61 GLUPS at 256^3 k=8 on v5e)
    tap_mode: str = "synth"
    # False = serialized DMA (wait every copy around compute): the
    # measurement baseline that quantifies the double-buffered pipeline's
    # DMA/compute overlap (results/overlap.md)
    pipeline: bool = True
    # input-window DMA slots / prefetch lookahead (2 = classic double
    # buffering with i+2 prefetch; 3-4 = deeper pipeline against
    # DMA+compute issue contention — measured on v5e cfg4: neutral, see
    # docs/performance.md)
    slots: int = 2
    # sliding-d1 window reuse: consecutive tiles in a d0 row share their
    # 2*p1-row window overlap; with slide=True the overlap rows are
    # copied VMEM->VMEM from the previous tile's slot (hidden behind
    # compute) and the HBM fetch shrinks to the t1 NEW rows — removing
    # the d1 halo read overfetch entirely. Costs one extra compute
    # ping-pong window at k>1 (the DMA slots must stay pristine, so
    # intermediate sweeps can no longer overwrite the window in place).
    # Requires d1-divisible tiles with t1 >= 2*p1.
    slide: bool = False
    # On-chip core parallelism: cores > 1 expresses the tile walk as a
    # `cores`-step Pallas grid dimension with 'parallel' semantics —
    # each grid step runs the SAME pipelined DMA schedule over a
    # contiguous chunk of the tile list, priming and draining its own
    # pipeline, so chunks are hazard-free whether the steps execute
    # sequentially on one TensorCore (v5e: measured-neutral, only a
    # pipeline refill between chunks) or concurrently on two (v4/v5p
    # megacore: Mosaic partitions parallel grid dims across cores).
    # This is the analog of the reference's 64 CPEs claiming tiles
    # concurrently (stencil_dma.cpp:405-407). Incompatible with slide
    # (its overlap chain crosses the whole walk).
    cores: int = 1
    # Ragged-grid strategy: False = clamp the last tile per dim (its
    # window starts early and overlaps its neighbor; overlap rows are
    # written twice with identical values). True = EMBED the interior in
    # the next tile-multiple per d0/d1 — the overhang rows are thick
    # trailing ghosts carrying the face value (pinned every sweep, like
    # the reference's generate_boundary idea, stencil_rma.cpp:150-166),
    # tiles divide exactly, windows are disjoint, and d1 becomes
    # slide-legal. Encoded purely in the layout pads: the kernel reads
    # extra0/extra1 off them, so clamp and embed share every code path.
    embed: bool = False
    # Fused source term: every virtual sweep computes the AFFINE update
    # u' = S(u) + src (src a static padded array with this layout, its
    # scale pre-applied, streamed per tile through its own DMA slots and
    # added before the ghost re-pinning). This is the Jacobi-Poisson /
    # forced-diffusion update (models/poisson.py) at full tiled-kernel
    # speed; the reference's update is purely homogeneous
    # (stencil.cpp:85-125).
    has_source: bool = False
    # Two-level (leapfrog) recursion: every virtual sweep computes
    # u_{t+1} = S(u_t) - u_{t-1} — the wave-equation update
    # (models/wave.py) temporally blocked k sweeps per HBM round trip.
    # The kernel streams TWO input windows per tile (levels n and n-1),
    # carries the two most recent levels through the in-VMEM sweep
    # recursion (the subtrahend at sweep t is the buffer written at
    # t-2, whose extent strictly contains sweep t's), and writes TWO
    # outputs (levels n+k and n+k-1 — the next call's inputs). The
    # reference's one-buffer ping-pong cannot express a second-order
    # recursion at all (stencil.cpp:23-57).
    two_level: bool = False
    # tap_mode == 'coeff' (variable-coefficient / heterogeneous taps,
    # models/diffusion.py — a per-point generalization of the
    # reference's hardcoded constant weighting, stencil.cpp:85-125):
    # the kernel streams the cell-centered coefficient a(x) as ONE
    # extra window per tile and synthesizes the 2*ndim harmonic-mean
    # face weights IN-REGISTER, once per tile (5 stored weight windows:
    # 3 lo faces + the d2 hi face + the center), amortized over the k
    # virtual sweeps. The update is
    #   u' = ctr*u + sum_d [w_lo_d * u(-e_d) + w_hi_d * u(+e_d)],
    #   w_lo_d = coeff_nb * harm(a(p), a(p-e_d)),
    #   ctr    = coeff_c0 + coeff_cs * sum(6 face means)
    # (FTCS diffusion: nb=+dt/h^2, c0=1, cs=-dt/h^2; the steady
    # operator A: nb=-1/h^2, c0=0, cs=+1/h^2). d0/d1 hi faces need no
    # stored window: w_hi_d(p)*u(p+e_d) = shift_+d(w_lo_d ⊙ u).
    # Coefficient ghosts are edge-replicated (pad_coeff), so the face
    # mean reduces to edge replication at walls — exactly
    # models.diffusion.face_harmonic_means.
    coeff_nb: float = 0.0
    coeff_c0: float = 0.0
    coeff_cs: float = 0.0
    # cheby_coeffs (non-empty = Chebyshev mode, multigrid.py smoother):
    # per-VIRTUAL-SWEEP affine recurrence
    #   u_t = n_t * nbsum(u_{t-1}) + c_t * u_{t-1} + pv_t * u_{t-2}
    #         + s_t * f
    # as a tuple of k (c, n, pv, s) float tuples. The virtual-sweep loop
    # is a trace-time Python loop, so the per-sweep scalars are plain
    # compile-time constants — the spec is the CENTER-LESS neighbor-sum
    # star and the Chebyshev weights multiply in-register. pv_1 = 0 by
    # construction (each smoother application restarts the recurrence),
    # so unlike the wave leapfrog no prev window crosses the call: the
    # extra state is just two dedicated ping-pong buffers + the fused
    # source stream. This is what lifts the round-4 gate "chebyshev is
    # XLA-only": the fixed-spec temporal blocking could not express
    # per-sweep coefficients, per-sweep SPECS at trace time can.
    cheby_coeffs: Tuple = ()
    # cheby_dual: the final virtual sweep's output goes to a SECOND
    # aliased output while the PENULTIMATE sweep's result ships as the
    # first-class iterate — the multigrid "fused smooth+residual":
    # sweeps 1..k-1 are the Chebyshev (or any affine) smoother, sweep k
    # evaluates r = f - A u_{k-1} as one more affine tuple
    # ((-2 ndim/h^2, 1/h^2, 0, +1)), and the kernel returns
    # (r, u_{k-1}) in one HBM round trip — saving the standalone
    # residual kernel's full window movement plus one layout round trip
    # per V-cycle (measured r5c: the two_level dual-output machinery,
    # reused verbatim on the output side).
    cheby_dual: bool = False

    @property
    def has_coeff(self) -> bool:
        return self.tap_mode == "coeff"

    @property
    def has_cheby(self) -> bool:
        return bool(self.cheby_coeffs)

    @property
    def halo(self) -> int:
        return self.sweeps_per_call * self.spec.radius

    @property
    def p1(self) -> int:
        return self.layout.pads[1][0]

    @property
    def window_shape(self) -> Tuple[int, int, int]:
        kr = self.halo
        return (self.s0 + 2 * kr, self.t1 + 2 * self.p1,
                self.layout.padded_shape[2])


def _vmem_bytes(spec, shape, dtype, k, s0, t1, tap_mode="synth",
                slots=2, slide=False, has_source=False,
                two_level=False, cheby=False, cheby_dual=False) -> int:
    sublane = sublane_for_dtype(dtype)
    kr = k * spec.radius
    p1 = round_up(kr, sublane)
    P2 = (round_up(shape[2], 128)
          if tap_mode in ("synth", "rotacc", "coeff")
          else round_up(shape[2] + 2 * kr, 128))
    w0, w1 = s0 + 2 * kr, t1 + 2 * p1
    itemsize = np.dtype(dtype).itemsize
    win = w0 * w1 * P2
    out = s0 * t1 * P2
    # `slots` input slots + compute ping-pong (x2 when sliding: the DMA
    # window must stay pristine) + 2 output slots + ~1 win of Mosaic tap
    # temporaries; a fused source streams through its own `slots` window
    # slots (plus sweep-slice temporaries, charged as one more window);
    # the two-level recursion adds `slots` prev-level windows, a second
    # compute ping-pong, and 2 more output slots; coeff mode adds its
    # `slots` coefficient stream, the 5 stored weight windows, and ~1
    # win of weight-prep temporaries
    cbuf = (2 * win if (slide or cheby) else win) if k > 1 else 0
    src = (slots + 1) * win if has_source else 0
    lvl2 = (slots * win + win + 2 * out) if two_level else 0
    coeff = (slots + 6) * win if tap_mode == "coeff" else 0
    out2 = 2 * out if cheby_dual else 0
    return (slots * win + cbuf + 2 * out + win + src + lvl2
            + coeff + out2) * itemsize


def rank_tiles(spec, interior_shape, dtype="float32", sweeps_per_call=1,
               vmem_budget=None, tap_mode="synth",
               s0_fixed=None, has_source=False, two_level=False,
               cheby=False, cheby_dual=False):
    """All VMEM-feasible (s0, t1) candidates, best-ranked first, by the
    same fetched/useful ratio ``choose_tiles`` uses. The autotuner
    measures the head of this list on the attached device."""
    ranked = _ranked_tiles(spec, tuple(interior_shape), dtype,
                           sweeps_per_call, vmem_budget, tap_mode, s0_fixed,
                           has_source, two_level, cheby, cheby_dual)
    return [t for _, t in ranked]


def choose_tiles(spec, interior_shape, dtype="float32", sweeps_per_call=1,
                 vmem_budget=None,
                 tap_mode="synth", s0_fixed=None,
                 has_source=False,
                 two_level=False, cheby=False,
                 cheby_dual=False) -> Optional[Tuple[int, int]]:
    """Pick (s0, t1) minimizing the fetched-window/useful-points ratio
    ceil(n0/s0)*ceil(n1/t1)*(s0+2kr)(t1+2p1)/(n0*n1) within budget;
    t1 % sublane == 0 (or the whole dim). Tiles need NOT divide the grid
    dims: the kernel clamps the last tile per dim (overlapping windows,
    identical overlap values), and the ceil-based ratio charges that
    overlap, so divisors win whenever one is competitive. For divisible
    candidates the ratio reduces to the round-2 halo-overfetch form,
    which predicts the measured winners exactly where max-volume does
    not: fp32 jacobi7 256^3 k=8 -> 64x64 (106.3 GLUPS, beats same-volume
    32x128 at 103.4) and bf16 -> 64x128 (139.7, beats same-volume 32x256
    at 129.5). ``s0_fixed`` pins the d0 tile size (the CLI's -b/--block
    flag) and only t1 is chosen."""
    ranked = _ranked_tiles(spec, tuple(interior_shape), dtype,
                           sweeps_per_call, vmem_budget, tap_mode, s0_fixed,
                           has_source, two_level, cheby, cheby_dual)
    return ranked[0][1] if ranked else None


def _ranked_tiles(spec, interior_shape, dtype, sweeps_per_call,
                  vmem_budget, tap_mode, s0_fixed, has_source=False,
                  two_level=False, cheby=False, cheby_dual=False):
    widened = False
    doubled_stream = has_source or two_level or tap_mode == "coeff"
    if vmem_budget is None and doubled_stream:
        widened = True
        # Doubled-input-stream classes (fused source, two-level wave,
        # variable-coefficient): round-4 flagged the default chooser
        # ~8% low here; round-5 silicon shows the measured winners sit
        # ABOVE the default budget but ARE the fetch-ratio winners once
        # admitted — wave 256^3 k8 (64,128) est 116MB runs 62.1 vs 57.1
        # at the default (64,48); source 512^3 k8 (64,64) est 108MB
        # runs 91.8 vs 87.3 at (64,48); coeff 256^3 k8 (64,64) est 87MB
        # runs 62.6 vs 58.0 at (32,64). All compile via the normal
        # auto-limit path (cap_limit bounds the scoped limit); the
        # infeasible-on-chip coeff (64,128) (163MB scoped, hard compile
        # OOM) stays excluded at this budget (est 158MB).
        from stencil_tpu import device_model

        b = device_model.budgets()
        vmem_budget = max(b.tiled_budget, b.vmem * 118 // 128)
    elif vmem_budget is None \
            and _wants_wide_budget(interior_shape, dtype, tap_mode):
        widened = True
        # Fat lane dims / ragged grids: window bytes scale with P2 (and
        # ragged dims lack small divisors), so the default budget prunes
        # the measured winners — round-4 silicon: 512^3 k=8 (64,64) est
        # 69MB runs 95.8 GLUPS vs 89-91 for every 52MB-feasible tile;
        # 256x256x1024 (32,64) est 80MB runs 86.6 (= 1.09x roofline) vs
        # 78.8 at the 52MB default; ragged 257^3 (86,88) est 88.5MB runs
        # 61.6 vs 54.0 at (32,88). All compile with auto limits
        # (107-125MB) under the 128MiB chip. Gated to fp32 synth/rotacc
        # so every pinned divisible P2 <= 384 winner (and the
        # untested-at-large-window bf16) is untouched.
        from stencil_tpu import device_model

        b = device_model.budgets()
        vmem_budget = max(b.tiled_budget, b.vmem * 92 // 128)
    else:
        vmem_budget = _resolve_budget(vmem_budget)
    sublane = sublane_for_dtype(dtype)
    n0, n1, _ = interior_shape
    kr = sweeps_per_call * spec.radius
    p1 = round_up(kr, sublane)
    if s0_fixed is not None:
        if s0_fixed > n0:
            raise ValueError(
                f"block (d0 tile) {s0_fixed} exceeds dim 0 ({n0})"
            )
        s0_c = [s0_fixed]
    else:
        s0_c = sorted({s for s in (4, 8, 16, 32, 64, 128, 256, n0)
                       if s <= n0})
        # "has a divisor candidate" must ignore the full dim itself
        # (n0 % n0 == 0 always): a whole-dim window is never a practical
        # divisor for large ragged dims, and counting it suppressed the
        # ceil-division candidates entirely (round-4 fix — on silicon
        # 257^3 (86,88) runs 61.6 GLUPS vs 54.0 for the pow2 clamps)
        if all(n0 % s for s in s0_c if s != n0):
            # properly ragged dim (no divisor candidate): ceil-division
            # sizes minimize the clamp overlap — e.g. 257 planes as
            # 3 tiles of 86 fetch 306 rows vs 5 tiles of 64 fetching
            # 400 (the ratio model then decides; divisible dims are
            # untouched so measured-pinned defaults cannot shift)
            s0_c = sorted(set(s0_c) | {-(-n0 // m) for m in range(2, 9)
                                       if -(-n0 // m) <= n0})
    # t1 must be a sublane multiple for aligned DMA window offsets — OR
    # the full dim (whole-dim windows are legal in the plan, but Mosaic
    # rejects a NON-sublane-multiple window extent on hardware: round-4
    # silicon, 125x130x135 auto plan picked t1=130 and the 146-row
    # working window crashed the compile with "slice shape along
    # dimension 2 must be aligned to tiling (8)" — so AUTO only offers
    # the whole dim when it is aligned or nothing else fits)
    base_t1 = {t for t in (sublane, 16, 32, 48, 64, 96, 128, 256)
               if t % sublane == 0 and t <= n1}
    if base_t1 and all(n1 % t for t in base_t1):
        base_t1 |= {round_up(-(-n1 // m), sublane) for m in range(2, 9)
                    if round_up(-(-n1 // m), sublane) <= n1}
    if n1 % sublane == 0 or not base_t1:
        t1_c = sorted(base_t1 | {n1})
    else:
        t1_c = sorted(base_t1)
    from fractions import Fraction

    # whole-d1 windows only ever fit under the widened budget for shapes
    # where they were never measured — and round-2 silicon measured
    # full-d1 (contiguous-segment) windows WORSE everywhere (jacobi7 k=8
    # 32xfull: 94.2 vs 111.3; cfg4 k=2 16xfull: 33.8) while the ratio
    # model loves their zero d1 overfetch. Hold them to the base budget
    # (explicit user budgets are not second-guessed).
    base_budget = _resolve_budget(None) if widened else vmem_budget
    out = []
    for s0 in s0_c:
        for t1 in t1_c:
            cap = base_budget if t1 == n1 else vmem_budget
            if _vmem_bytes(spec, interior_shape, dtype, sweeps_per_call,
                           s0, t1, tap_mode, has_source=has_source,
                           two_level=two_level, cheby=cheby,
                           cheby_dual=cheby_dual) <= cap:
                nt0 = -(-n0 // s0)
                nt1 = -(-n1 // t1)
                vol = s0 * t1
                ratio = Fraction(
                    nt0 * nt1 * (s0 + 2 * kr) * (t1 + 2 * p1), n0 * n1
                )
                key = (-ratio, vol, t1)  # min ratio; ties: vol, then t1
                out.append((key, (s0, t1)))
    out.sort(key=lambda kt: kt[0], reverse=True)
    if (has_source and not two_level and tap_mode != "coeff"
            and interior_shape[2] <= 256 and n0 % 32 == 0
            and any(t == (32, 64) for _, t in out)):
        # measured v5e EXCEPTION to the ratio model (bisected twice:
        # ROUND4 sec 14 and the round-5 re-run): the single-level
        # source class at P2 <= 256 runs (32,64) at 102.9 GLUPS vs the
        # ratio winner (64,64)'s 91.7 — the doubled stream favors the
        # smaller d0 window there, and ONLY there (512^3 flips back:
        # (32,64) 87.0 < (64,64) 91.8). Pin the measured winner first;
        # the ratio ranking keeps ordering the rest.
        out.sort(key=lambda kt: kt[1] != (32, 64))
    return out


def make_tiled_plan(spec, interior_shape, dtype="float32",
                    sweeps_per_call=1, tiles=None,
                    vmem_budget=None,
                    vmem_limit=None, tap_mode=None,
                    pipeline=True, slots=2, slide=False,
                    cores=1, embed=False, has_source=False,
                    two_level=False, coeff_scales=None,
                    cheby_coeffs=None, cheby_dual=False) -> TiledPlan:
    # budget resolution is delegated to choose_tiles: a defaulted (None)
    # budget gets the device-scaled default plus the fat-lane widening
    if spec.ndim != 3 or len(interior_shape) != 3:
        raise ValueError("tiled kernel is 3D-only")
    if slots < 2:
        raise ValueError("the DMA pipeline needs >= 2 input slots")
    if (tap_mode == "coeff") != (coeff_scales is not None):
        raise ValueError(
            "tap_mode='coeff' and coeff_scales=(nb, c0, cs) go together")
    if coeff_scales is not None:
        if np.dtype(dtype).itemsize != 4:
            raise ValueError(
                "coeff tap mode needs a 4-byte dtype (its d1 shifts are "
                "sublane rotates, which have no Mosaic-safe lowering "
                "for 16-bit dtypes)")
        if slide or two_level:
            raise ValueError(
                "coeff tap mode composes with the plain pipelined "
                "schedule only (no slide/two_level)")
        if spec.radius != 1:
            raise ValueError(
                "coeff tap mode is the radius-1 face-weight stencil; "
                "pass a radius-1 spec")
    if slide and not pipeline:
        raise ValueError("slide requires the pipelined DMA schedule")
    if cores < 1:
        raise ValueError("cores must be >= 1")
    if cores > 1 and slide:
        raise ValueError(
            "slide's sliding-window overlap chain crosses the whole tile "
            "walk and cannot be split across cores; use cores=1 or "
            "slide=False")
    if slide and has_source:
        raise ValueError(
            "slide's partial-window fetch schedule is not implemented "
            "for the source operand; use slide=False with a source")
    if two_level and (has_source or slide or cores > 1 or embed):
        raise ValueError(
            "the two-level (leapfrog) recursion composes with the plain "
            "pipelined schedule only (no source/slide/cores/embed)")
    has_cheby = cheby_coeffs is not None
    if has_cheby:
        if not has_source:
            raise ValueError(
                "cheby_coeffs needs the fused source stream "
                "(has_source=True): every sweep reads s_t * f")
        if slide or two_level or embed or coeff_scales is not None:
            raise ValueError(
                "the Chebyshev recurrence composes with the plain "
                "pipelined source schedule only "
                "(no slide/two_level/embed/coeff)")
        if spec.radius != 1:
            raise ValueError(
                "cheby_coeffs expects the radius-1 neighbor-sum spec")
        if len(cheby_coeffs) != sweeps_per_call:
            raise ValueError(
                f"cheby_coeffs has {len(cheby_coeffs)} sweeps, plan has "
                f"sweeps_per_call={sweeps_per_call}")
        cheby_coeffs = tuple(
            tuple(float(v) for v in c) for c in cheby_coeffs)
        if any(len(c) != 4 for c in cheby_coeffs):
            raise ValueError("each cheby sweep needs (c, n, pv, s)")
        if cheby_dual and sweeps_per_call < 2:
            raise ValueError(
                "cheby_dual fuses the final sweep as a second output; "
                "it needs sweeps_per_call >= 2 (smoother + final)")
    elif cheby_dual:
        raise ValueError("cheby_dual needs cheby_coeffs")
    defaulted = tap_mode is None
    if defaulted:
        # measured on v5e: rotacc matches synth on stars (jacobi7 256^3
        # k=8: 111.3 vs 111.7) and beats it on boxes (27-pt 256^3 k=8:
        # 109.7 vs 93.4) for fp32; 16-bit dtypes cannot rotate sublanes
        # (odd shifts have no Mosaic-safe bitcast lowering) and use synth,
        # whose lane rotates go through ops.rolls.lane_roll's int32
        # bitcast (plain pltpu.roll crashes Mosaic on sub-32-bit dtypes)
        itemsize = np.dtype(dtype).itemsize
        tap_mode = {4: "rotacc", 2: "synth"}.get(itemsize, "slice")
    if tiles is None:
        tiles = choose_tiles(spec, interior_shape, dtype, sweeps_per_call,
                             vmem_budget, tap_mode, has_source=has_source,
                             two_level=two_level, cheby=has_cheby,
                             cheby_dual=cheby_dual)
        if tiles is None:
            sublane = sublane_for_dtype(dtype)
            raise ValueError(
                f"no feasible (s0, t1) tiling for {interior_shape} "
                f"(k={sweeps_per_call}): no tile size (candidates: "
                f"powers-of-two-ish >= {sublane}) fits the VMEM budget "
                f"{_resolve_budget(vmem_budget)}"
            )
    s0, t1 = tiles
    sublane = sublane_for_dtype(dtype)
    n0, n1, _ = interior_shape
    if s0 > n0 or t1 > n1:
        raise ValueError(f"tiles {tiles} exceed grid dims {interior_shape[:2]}")
    if t1 % sublane and -(-n1 // t1) > 1:
        raise ValueError(
            f"t1 must be a multiple of the sublane size {sublane} "
            f"(or the full dim {n1})"
        )
    if slide:
        p1_ = round_up(sweeps_per_call * spec.radius, sublane)
        # embed makes ragged d1 slide-legal: tiles divide the EMBEDDED
        # extent, so consecutive windows keep the unclamped overlap
        # relation the VMEM-copy chain assumes
        n1_eff = -(-n1 // t1) * t1 if embed else n1
        if n1_eff % t1:
            raise ValueError(
                "slide requires d1-divisible tiles (the overlap-row "
                "relation between consecutive windows assumes unclamped "
                "tile starts); ragged d1 needs embed=True")
        if t1 < 2 * p1_:
            raise ValueError(
                f"slide requires t1 >= 2*p1 = {2 * p1_} (the previous "
                "tile's NEW rows must contain the next tile's overlap)")
    if defaulted and tap_mode == "rotacc" and t1 % sublane:
        # whole-dim d1 tiles with a non-sublane-multiple extent give a
        # window whose sublane dim is misaligned; rotacc's sublane
        # rotates on such shapes are an untested-on-hardware Mosaic
        # pattern (the repo's bisected crashers are all in this family),
        # so the DEFAULT falls back to synth, which never sublane-rolls.
        # An explicit tap_mode='rotacc' is honored.
        tap_mode = "synth"
    layout = PaddedLayout.for_halo(tuple(interior_shape),
                                   sweeps_per_call * spec.radius, sublane)
    if tap_mode not in ("slice", "roll", "synth", "rotacc", "coeff"):
        raise ValueError(
            f"tiled kernel tap_mode {tap_mode!r} not in "
            "slice/roll/synth/rotacc/coeff"
        )
    if tap_mode == "rotacc" and jnp.dtype(dtype).itemsize != 4:
        raise ValueError(
            "rotacc tap mode needs a 4-byte dtype (sublane rotates of "
            "16-bit dtypes have no Mosaic-safe lowering for odd shifts)"
        )
    if tap_mode == "roll" and jnp.dtype(dtype).itemsize != 4:
        # taps_roll issues raw pltpu.roll on both minor axes; sub-32-bit
        # pltpu.roll is in the bisected Mosaic-crasher family (hard
        # HTTP-500 on v5e, no diagnostic) — refuse cleanly instead.
        # synth routes its lane rotates through ops.rolls.lane_roll's
        # int32 bitcast and is the supported 16-bit path.
        raise ValueError(
            "roll tap mode needs a 4-byte dtype (pltpu.roll crashes the "
            "Mosaic compiler on sub-32-bit dtypes); use synth for 16-bit"
        )
    if tap_mode in ("synth", "rotacc", "coeff"):
        # no d2 ghost columns in HBM at all: lane width is exactly
        # round_up(n2, 128); boundary columns are synthesized in-register
        n2 = interior_shape[2]
        layout = PaddedLayout(
            interior_shape=layout.interior_shape,
            pads=layout.pads[:2] + ((0, round_up(n2, 128) - n2),),
            halo=layout.halo,
        )
    if embed:
        # embed-and-pin: extend the d0/d1 hi pads to the next tile
        # multiple. The overhang rows are thick trailing ghosts: the
        # padded-array fill seeds them with the face value, the kernel's
        # dynamic pin bands re-assert it every sweep, and tiles divide
        # the embedded extents exactly (disjoint windows, no clamping).
        extra0 = -(-n0 // s0) * s0 - n0
        extra1 = -(-n1 // t1) * t1 - n1
        if extra0 or extra1:
            layout = PaddedLayout(
                interior_shape=layout.interior_shape,
                pads=((layout.pads[0][0], layout.pads[0][1] + extra0),
                      (layout.pads[1][0], layout.pads[1][1] + extra1),
                      layout.pads[2]),
                halo=layout.halo,
            )
    elif -(-n1 // t1) > 1:
        # ragged d1 (clamp strategy): the last tile's window start is
        # clamped DOWN to the nearest sublane multiple
        # C1 = round_up(n1 - t1, sublane) (DMA d1 offsets must be
        # sublane-aligned), so its t1-row output band
        # overhangs the interior by extra1 = C1 + t1 - n1 < sublane rows;
        # the hi pad grows by extra1 so the window stays in-bounds, and
        # the kernel re-pins those rows to the d1-hi face value
        extra1 = round_up(n1 - t1, sublane) + t1 - n1
        if extra1:
            layout = PaddedLayout(
                interior_shape=layout.interior_shape,
                pads=(layout.pads[0],
                      (layout.pads[1][0], layout.pads[1][1] + extra1),
                      layout.pads[2]),
                halo=layout.halo,
            )
    if vmem_limit is None:
        # scale Mosaic's scoped-VMEM limit with the actual buffer estimate
        # (with headroom for tap temporaries) so budget-legal tile choices
        # never trip the compiler's default 16MB / our 48MB floor. rotacc
        # keeps rolled full-window temporaries live across the weight-group
        # accumulation, which needs ~2 windows beyond the generic headroom
        # (bisected on v5e: the radius-2 64x64 k=4 plan compiles at an
        # 80MB limit and hard-crashes at 61MB).
        # cheby's double compute ping-pong has slide's VMEM shape:
        # estimate it as slide + source
        est = _vmem_bytes(spec, interior_shape, dtype, sweeps_per_call,
                          s0, t1, tap_mode, slots, slide,
                          has_source, two_level, has_cheby, cheby_dual)
        kr_ = sweeps_per_call * spec.radius
        win_b = ((s0 + 2 * kr_) * (t1 + 2 * round_up(kr_, sublane))
                 * layout.padded_shape[2] * np.dtype(dtype).itemsize)
        # coeff keeps rolled full-window temporaries live across the
        # face-term accumulation like rotacc does across weight groups
        extra = 2 * win_b if tap_mode in ("rotacc", "coeff") else 0
        # The margin is a PER-CLASS compromise, bisected on v5e:
        # - the limit VALUE changes Mosaic's schedule: jacobi7 k=8 64x64
        #   rotacc runs 111 GLUPS at a 56.1MB limit and ~93 at >=58.8MB
        #   (A/B with identical plans) — so plans that never OOM'd keep
        #   the round-2 margin (est*1.25, and the floor) untouched;
        # - non-rotacc radius>=2 plans NEED ~1.30x est + Mosaic's ~3MB
        #   reserve (the 384^3 synth 64x64 plan wanted 64.28M against a
        #   51.9M estimate) and are floor-bound, so the bigger margin
        #   costs them nothing;
        # - slide plans need ~1.19x est + reserve (the 60KB-short OOM at
        #   est*1.25) — the 0.35 margin covers it (64x64 compiled at
        #   87M, 64x96 at 123M; adding more pushes past the 128MB chip).
        if (spec.radius >= 2 and tap_mode == "synth"
                and np.dtype(dtype).itemsize == 2):
            # bf16 radius>=2 synth wants ~1.75-1.8x est (round-4
            # silicon: cfg4 bf16 default tiles needed 86.9M against a
            # ~49.5M estimate — the 16-bit select/roll temporaries
            # double up; 0.35 margin compile-OOMs cleanly). Measured
            # compiling and correct at 92MB for the default (64,128).
            margin = int(est * 0.85) + 4 * 1024 * 1024
        elif tap_mode in ("slice", "roll") and spec.num_taps >= 14:
            # many-tap box stencils in the ghost-reading modes keep a
            # shifted-window temporary live per tap: jacobi27 (26 taps)
            # slice 128^3 k=1 default tiles wanted ~85-88M against a
            # 43.8M estimate (round-4 silicon bisect: 88M compiles
            # bitwise, 84M OOMs; the old 54.8M limit hard-failed). roll
            # needs more still — its rotated windows double up (93.9M
            # OOMs, 110M compiles bitwise). Star specs (<= 13 taps)
            # keep their round-2 values.
            ratio = 1.5 if tap_mode == "roll" else 1.05
            margin = int(est * ratio) + 4 * 1024 * 1024
        elif slide or (spec.radius >= 2 and tap_mode != "rotacc") \
                or tap_mode == "coeff" or has_cheby:
            margin = int(est * 0.35) + 4 * 1024 * 1024
        else:
            margin = int(est * 0.25)
        from stencil_tpu import device_model

        b = device_model.budgets()
        vmem_limit = device_model.cap_limit(
            max(b.tiled_limit_floor, est + margin + extra), b
        )
    cnb, cc0, ccs = (coeff_scales if coeff_scales is not None
                     else (0.0, 0.0, 0.0))
    return TiledPlan(spec=spec, interior_shape=tuple(interior_shape),
                     dtype=dtype, sweeps_per_call=sweeps_per_call,
                     s0=s0, t1=t1, layout=layout, vmem_limit=vmem_limit,
                     tap_mode=tap_mode, pipeline=pipeline, slots=slots,
                     slide=slide, cores=cores, embed=embed,
                     has_source=has_source, two_level=two_level,
                     coeff_nb=float(cnb), coeff_c0=float(cc0),
                     coeff_cs=float(ccs),
                     cheby_coeffs=cheby_coeffs if has_cheby else (),
                     cheby_dual=bool(cheby_dual))


def build_tiled_sweep(plan: TiledPlan, bc: DirichletBC,
                      interpret: bool = False, subset=None):
    """Compile one outer step (k virtual sweeps) over the whole 3D grid,
    or — with ``subset`` (a tuple of tile ids) — over just those tiles.

    Subsets enable the interior/edge phase split of the overlapped
    sharded path (``parallel/pallas_sharded.py``): the interior-tile
    kernel has no data dependency on the halo exchange, so XLA may
    overlap it with the ppermutes; the edge-tile kernel runs after.
    Tiles outside the subset pass through untouched via the output
    aliasing. Returns ``sweep(cur, nxt, pins=None) -> new`` over padded
    arrays, same contract as ``ops.pallas.build_sweep``.
    """
    spec = plan.spec
    k = plan.sweeps_per_call
    r = spec.radius
    kr = plan.halo
    dtype = jnp.dtype(plan.dtype)
    layout = plan.layout
    n0, n1, n2 = plan.interior_shape
    P0, P1, P2 = layout.padded_shape
    s0, t1 = plan.s0, plan.t1
    p1 = plan.p1
    w0, w1, _ = plan.window_shape
    S = plan.slots
    d2_lo = layout.pads[2][0]
    nt0, nt1 = -(-n0 // s0), -(-n1 // t1)
    nt = nt0 * nt1
    # ragged-grid clamps (identity when tiles divide the dims): the last
    # tile per dim starts at C* instead of i*tile so its window stays
    # in-bounds; overlapping output rows are written twice with identical
    # values (same input iterate, same tap order). C1 is sublane-aligned
    # by construction; extra1 = rows the last d1 tile overhangs past n1.
    # trailing overhangs read off the layout pads: clamp gives extra0 = 0
    # and extra1 < sublane; embed gives the tile-multiple paddings. Both
    # strategies share C* = (embedded extent) - tile: tile starts are
    # min(i*tile, C*) — an identity under embed (divisible), the clamped
    # early-start for the last tile otherwise.
    extra0 = layout.pads[0][1] - layout.pads[0][0]
    C0 = n0 + extra0 - s0
    extra1 = layout.pads[1][1] - layout.pads[1][0]
    C1 = n1 + extra1 - t1
    ids = tuple(range(nt)) if subset is None else tuple(subset)
    if subset is not None:
        if plan.slide:
            raise ValueError(
                "tile subsets break the sliding-window overlap chain; "
                "use slide=False for phase-split sweeps")
        if plan.two_level:
            raise ValueError(
                "tile subsets are not implemented for the two-level "
                "(leapfrog) recursion")
        if not ids or any(t < 0 or t >= nt for t in ids):
            raise ValueError(f"tile subset out of range [0, {nt})")
    nt_run = len(ids)

    (d0_lo_bc, d0_hi_bc), (d1_lo_bc, d1_hi_bc), (d2_lo_bc, d2_hi_bc) = \
        bc.values

    # A single d1 tile whose width is not a sublane multiple cannot be
    # written back as a d1-sliced DMA window (Mosaic requires sublane
    # multiples or the whole dim): make the output tile span the full
    # padded d1 instead, writing its (BC-constant) d1 ghost rows along.
    from stencil_tpu.ops.layout import sublane_for_dtype as _sld
    full_d1 = (nt1 == 1 and t1 % _sld(dtype) != 0)

    def fill_d2_ghosts(ref, shape01):
        # zero-width guards: synth mode has no lo ghosts (and possibly no
        # slack at all when n2 is a multiple of 128)
        if d2_lo:
            ref[:, :, 0:d2_lo] = jnp.full(shape01 + (d2_lo,), d2_lo_bc,
                                          dtype)
        if P2 - d2_lo - n2:
            ref[:, :, d2_lo + n2:] = jnp.full(
                shape01 + (P2 - d2_lo - n2,), d2_hi_bc, dtype
            )

    has_coeff = plan.has_coeff
    has_cheby = plan.has_cheby

    def kernel(pins_ref, ids_ref, cur_hbm, nxt_hbm, *rest):
        prev_hbm = pscratch = psem = out2_hbm = otile2 = osem2 = None
        src_hbm = sscratch = ssem = None
        coeff_hbm = cscratch = cwsem = fwbuf = None
        if plan.two_level:
            (prev_hbm, _nxt2, out_hbm, out2_hbm, scratch, cbuf, otile,
             isem, osem, cbuf2, csem, pscratch, psem, otile2,
             osem2) = rest
        else:
            i = 0
            if plan.has_source:
                src_hbm = rest[i]
                i += 1
            if has_coeff:
                coeff_hbm = rest[i]
                i += 1
            if plan.cheby_dual:
                # one more aliased destination + the output pair
                _nxt2, out_hbm, out2_hbm = rest[i:i + 3]
                i += 3
                (scratch, cbuf, otile, isem, osem, cbuf2,
                 csem) = rest[i:i + 7]
                i += 7
            else:
                (out_hbm, scratch, cbuf, otile, isem, osem, cbuf2,
                 csem) = rest[i:i + 8]
                i += 8
            if plan.has_source:
                sscratch, ssem = rest[i:i + 2]
                i += 2
            if has_coeff:
                cscratch, cwsem, fwbuf = rest[i:i + 3]
                i += 3
            if plan.cheby_dual:
                otile2, osem2 = rest[i:i + 2]
        sublane = sublane_for_dtype(dtype)

        def tile_coords(i):
            """Window-start interior coords (r0, c1) of tile i, with the
            last tile per dim clamped (r0 exact, c1 = the sublane-aligned
            C1 so the DMA offset stays aligned). Identity for divisible
            dims: i0*s0 <= C0 and i1*t1 <= C1 for all non-last tiles."""
            i0, i1 = i // nt1, i % nt1
            r0 = lax.min(i0 * s0, C0) if nt0 > 1 else 0
            c1 = lax.min(i1 * t1, C1) if nt1 > 1 else 0
            return r0, c1

        def in_copy(i, sl, partial=False):
            r0, c1 = tile_coords(i)
            if partial:
                # sliding mode, non-first tile of a d0 row: fetch only
                # the t1 NEW rows; rows [0, 2*p1) arrive via ov_copy from
                # the previous tile's slot
                c1 = pl.multiple_of(c1 + 2 * p1, sublane)
                return pltpu.make_async_copy(
                    cur_hbm.at[pl.ds(r0, w0), pl.ds(c1, t1)],
                    scratch.at[sl].at[:, pl.ds(2 * p1, t1)],
                    isem.at[sl],
                )
            c1 = pl.multiple_of(c1, sublane)
            return pltpu.make_async_copy(
                cur_hbm.at[pl.ds(r0, w0), pl.ds(c1, w1)],
                scratch.at[sl],
                isem.at[sl],
            )

        def src_copy(i, sl):
            # source-window twin of in_copy (full windows only: slide's
            # partial fetch is plan-gated off with a source)
            r0, c1 = tile_coords(i)
            c1 = pl.multiple_of(c1, sublane)
            return pltpu.make_async_copy(
                src_hbm.at[pl.ds(r0, w0), pl.ds(c1, w1)],
                sscratch.at[sl],
                ssem.at[sl],
            )

        def cf_copy(i, sl):
            # coefficient-window twin of in_copy (coeff tap mode)
            r0, c1 = tile_coords(i)
            c1 = pl.multiple_of(c1, sublane)
            return pltpu.make_async_copy(
                coeff_hbm.at[pl.ds(r0, w0), pl.ds(c1, w1)],
                cscratch.at[sl],
                cwsem.at[sl],
            )

        def prep_weights(sl):
            """Synthesize the per-tile face-weight windows from the
            coefficient window — ONCE per tile, amortized over the k
            virtual sweeps (the fused-source stream pattern, extended
            from 'read one more operand' to 'read one more operand and
            derive 5 weight fields from it in-register').

            fwbuf[0..2]: w_lo_d = nb * harm(a(p), a(p-e_d)) for d=0,1,2;
            fwbuf[3]: the d2 HI face (the lane boundary needs its own
            ghost substitution, so it cannot be recovered as a shift);
            fwbuf[4]: the center weight c0 + cs * sum(6 face means).
            Window edge rows (d0 row 0 / last, the d1 roll's wrapped
            row) hold duplicated/wrapped values — positive, never read
            by used outputs (reads stay >= 1 inside the window), and
            physical-ghost band cells are re-pinned after every sweep.
            Coefficient ghosts are edge-replicated (pad_coeff), so
            harm(a, a_ghost) = a at every wall — the golden model's
            edge-replication rule (models/diffusion.py)."""
            aw = cscratch.at[sl][...]
            lanes = lax.broadcasted_iota(jnp.int32, (1, 1, P2), 2)

            def harm(x, y):
                return 2.0 * x * y / (x + y)

            hm0 = harm(aw, jnp.concatenate([aw[:1], aw[:-1]], axis=0))
            hm1 = harm(aw, pltpu.roll(aw, 1, 1))
            hm2 = harm(aw, jnp.where(lanes < 1, aw,
                                     lane_roll(aw, 1, 2)))
            hm2h = harm(aw, jnp.where(lanes >= n2 - 1, aw,
                                      lane_roll(aw, P2 - 1, 2)))
            # hi faces of d0/d1 are shifts of the lo-face means:
            # hm_d(p+e_d) is the hi-face mean at p
            sum6 = (hm0 + jnp.concatenate([hm0[1:], hm0[-1:]], axis=0)
                    + hm1 + pltpu.roll(hm1, w1 - 1, 1)
                    + hm2 + hm2h)
            nb = jnp.asarray(plan.coeff_nb, dtype)
            fwbuf[0] = nb * hm0
            fwbuf[1] = nb * hm1
            fwbuf[2] = nb * hm2
            fwbuf[3] = nb * hm2h
            fwbuf[4] = (jnp.asarray(plan.coeff_c0, dtype)
                        + jnp.asarray(plan.coeff_cs, dtype) * sum6)

        def pv_copy(i, sl):
            # prev-level window twin of in_copy (two-level recursion)
            r0, c1 = tile_coords(i)
            c1 = pl.multiple_of(c1, sublane)
            return pltpu.make_async_copy(
                prev_hbm.at[pl.ds(r0, w0), pl.ds(c1, w1)],
                pscratch.at[sl],
                psem.at[sl],
            )

        def out2_copy(i, sl):
            r0, c1 = tile_coords(i)
            if full_d1:
                dst = out2_hbm.at[pl.ds(kr + r0, s0)]
            else:
                c1 = pl.multiple_of(p1 + c1, sublane)
                dst = out2_hbm.at[pl.ds(kr + r0, s0), pl.ds(c1, t1)]
            return pltpu.make_async_copy(otile2.at[sl], dst, osem2.at[sl])

        def ov_copy(sl_src, sl_dst):
            # the 2*p1 overlap rows of the next window are the tail of
            # the previous tile's NEW rows (t1 >= 2*p1, plan-validated):
            # local VMEM->VMEM async copy, hidden behind compute
            return pltpu.make_async_copy(
                scratch.at[sl_src].at[:, pl.ds(t1, 2 * p1)],
                scratch.at[sl_dst].at[:, pl.ds(0, 2 * p1)],
                csem.at[0],
            )

        def out_copy(i, sl):
            r0, c1 = tile_coords(i)
            if full_d1:
                dst = out_hbm.at[pl.ds(kr + r0, s0)]
            else:
                c1 = pl.multiple_of(p1 + c1, sublane)
                dst = out_hbm.at[pl.ds(kr + r0, s0), pl.ds(c1, t1)]
            return pltpu.make_async_copy(otile.at[sl], dst, osem.at[sl])

        def taps_slice(src_val, a0, m0, a1, m1):
            uw = spec.uniform_weight
            acc = None
            for wgt, offs in spec.weight_groups():
                gacc = None
                for off in offs:
                    st = (a0 + off[0], a1 + off[1], d2_lo + off[2])
                    li = (st[0] + m0, st[1] + m1, st[2] + n2)
                    tap = lax.slice(src_val, st, li)
                    gacc = tap if gacc is None else gacc + tap
                term = gacc if uw is not None else gacc * jnp.asarray(wgt,
                                                                      dtype)
                acc = term if acc is None else acc + term
            if uw is not None:
                acc = acc * jnp.asarray(uw, dtype)
            return acc

        def taps_roll(src_val, a0, m0, a1, m1):
            """Same result via full-window rotates for the minor dims.

            ``pltpu.roll(x, s, axis)`` wraps, but every used output cell
            reads >= |off| elements inside the window, so wrapped values
            never reach it. d0 taps stay slices (untiled dim — free)."""
            uw = spec.uniform_weight
            acc = None
            for off, wgt in zip(spec.offsets, spec.weights):
                tap = src_val
                if off[1]:
                    # pltpu.roll wants non-negative shifts; -off mod size
                    tap = pltpu.roll(tap, (-off[1]) % w1, 1)
                if off[2]:
                    tap = pltpu.roll(tap, (-off[2]) % P2, 2)
                tap = lax.slice(
                    tap, (a0 + off[0], a1, d2_lo),
                    (a0 + off[0] + m0, a1 + m1, d2_lo + n2),
                )
                term = tap if uw is not None else tap * jnp.asarray(wgt, dtype)
                acc = term if acc is None else acc + term
            if uw is not None:
                acc = acc * jnp.asarray(uw, dtype)
            return acc

        def taps_synth(src_val, a0, m0, a1, m1):
            """d2 taps with in-register boundary synthesis: the HBM layout
            carries NO d2 ghost columns (lane dim = exactly round_up(n2,
            128)), so shifted d2 taps lane-rotate the window and the
            wrapped boundary lane(s) are overwritten with the Dirichlet
            face constant — the reference's generate_boundary idea applied
            to the lane dim. Rolls are hoisted: ONE full-window (aligned)
            rotate per distinct lane offset, shared by all taps with that
            offset, then sliced per tap. Rolling an already-sliced
            (sublane-misaligned) operand crashes the Mosaic compiler for
            diagonal taps; full-window rolls do not, and box stencils get
            2r rolls instead of one per tap."""
            uw = spec.uniform_weight
            rolled = {0: src_val}
            lanes = None

            def get_rolled(o2):
                nonlocal lanes
                if o2 not in rolled:
                    t = lane_roll(src_val, (-o2) % P2, 2)
                    if lanes is None:
                        # (1, 1, P2) broadcasts in the select — a
                        # full-window iota costs a window pass for what
                        # is a per-lane predicate
                        lanes = lax.broadcasted_iota(
                            jnp.int32, (1, 1, P2), 2
                        )
                    if o2 > 0:
                        t = jnp.where(lanes >= n2 - o2,
                                      jnp.asarray(d2_hi_bc, dtype), t)
                    else:
                        t = jnp.where(lanes < -o2,
                                      jnp.asarray(d2_lo_bc, dtype), t)
                    rolled[o2] = t
                return rolled[o2]

            ubmc = spec.uniform_box_minus_center
            if ubmc is not None:
                # SEPARABLE evaluation of a full uniform box minus center:
                # w * (S2(S1(S0(x))) - x), ndim*(2r+1) shifted adds instead
                # of (2r+1)^ndim - 1 taps. The d2 pass rolls the partial
                # sum; its lane-ghost substitution constant is the face
                # value times (2r+1)^2 because the whole ghost lane is the
                # constant d2 face value (later-dims-win corners), so
                # S0*S1 of it is that constant times the pass counts.
                side = 2 * r + 1
                # pass 0 (d0): region extended by r in d1 for pass 1
                u = None
                for o in range(-r, r + 1):
                    t = lax.slice(src_val, (a0 + o, a1 - r, 0),
                                  (a0 + o + m0, a1 + m1 + r, P2))
                    u = t if u is None else u + t
                # pass 1 (d1): collapse to the exact d1 region
                v = None
                for o in range(-r, r + 1):
                    t = lax.slice(u, (0, r + o, 0), (m0, r + o + m1, P2))
                    v = t if v is None else v + t
                # pass 2 (d2): full-width rolls of the partial sum with
                # ghost lanes pinned to side^2 * face value
                wsum = None
                lanes2 = lax.broadcasted_iota(jnp.int32, (1, 1, P2), 2)
                for o in range(-r, r + 1):
                    if o == 0:
                        t = v
                    else:
                        t = lane_roll(v, (-o) % P2, 2)
                        if o > 0:
                            t = jnp.where(
                                lanes2 >= n2 - o,
                                jnp.asarray(d2_hi_bc * side * side, dtype),
                                t,
                            )
                        else:
                            t = jnp.where(
                                lanes2 < -o,
                                jnp.asarray(d2_lo_bc * side * side, dtype),
                                t,
                            )
                    wsum = t if wsum is None else wsum + t
                center = lax.slice(src_val, (a0, a1, 0),
                                   (a0 + m0, a1 + m1, P2))
                out = (wsum - center) * jnp.asarray(ubmc, dtype)
                return lax.slice(out, (0, 0, d2_lo), (m0, m1, d2_lo + n2))

            # group taps by weight: one multiply per distinct weight
            acc = None
            for wgt, offs in spec.weight_groups():
                gacc = None
                for off in offs:
                    base = get_rolled(off[2])
                    st = (a0 + off[0], a1 + off[1], d2_lo)
                    tap = lax.slice(base, st, (st[0] + m0, st[1] + m1,
                                               d2_lo + n2))
                    gacc = tap if gacc is None else gacc + tap
                term = gacc if uw is not None else gacc * jnp.asarray(wgt,
                                                                      dtype)
                acc = term if acc is None else acc + term
            if uw is not None:
                acc = acc * jnp.asarray(uw, dtype)
            return acc

        def taps_rotacc(src_val, a0, m0, a1, m1):
            """Full-minor-extent rotate-accumulate evaluation (32-bit).

            synth mode pays one misaligned 3D-slice relayout per d0/d1
            tap (the d1 window phase ``a1`` is not a sublane multiple).
            Removing those relayouts measures as a WASH on star stencils
            (they were not the bottleneck — see docs/performance.md) but
            ~1.2-2x on separable boxes, whose round-1 evaluator built
            misaligned intermediates per pass; rotacc is the fp32
            default on that evidence. Every tap keeps
            the FULL (d1, d2) extents: a d0 offset is a major-dim slice
            (layout-preserving — only the page index changes), a d1/d2
            offset is a single full-window sublane/lane rotate cached
            per distinct (o1, o2), and the one misaligned slice happens
            ONCE on the accumulated result. Wrapped rotate values never
            reach used output cells (every used read stays >= r inside
            the window in d0/d1), and d2 boundary lanes are synthesized
            in-register exactly as in synth mode. Sublane rotates of
            16-bit dtypes have no Mosaic-safe lowering for odd shifts
            (the int32 bitcast pairs sublanes), so this mode is gated
            to 4-byte dtypes in make_tiled_plan.
            """
            uw = spec.uniform_weight
            lanes = lax.broadcasted_iota(jnp.int32, (1, 1, P2), 2)

            rolled = {(0, 0): src_val}

            def get_rot(o1, o2):
                if (o1, o2) not in rolled:
                    t = src_val
                    if o1:
                        t = pltpu.roll(t, (-o1) % w1, 1)
                    if o2:
                        t = lane_roll(t, (-o2) % P2, 2)
                        if o2 > 0:
                            t = jnp.where(lanes >= n2 - o2 + d2_lo,
                                          jnp.asarray(d2_hi_bc, dtype), t)
                        else:
                            t = jnp.where(lanes < d2_lo - o2,
                                          jnp.asarray(d2_lo_bc, dtype), t)
                    rolled[(o1, o2)] = t
                return rolled[(o1, o2)]

            def d0slice(x, o0):
                return lax.slice(x, (a0 + o0, 0, 0),
                                 (a0 + o0 + m0, w1, P2))

            ubmc = spec.uniform_box_minus_center
            if ubmc is not None:
                # separable box in rotacc form: per-dim (2r+1)-tap passes
                # where d0 taps are major slices and d1/d2 taps rotates
                # of the partial sums; the d2 pass's ghost lanes read
                # side^2 * face (constant d2 columns through both prior
                # passes), exactly as in taps_synth.
                side = 2 * r + 1
                u = None
                for o in range(-r, r + 1):
                    t = d0slice(src_val, o)
                    u = t if u is None else u + t
                v = None
                for o in range(-r, r + 1):
                    t = u if o == 0 else pltpu.roll(u, (-o) % w1, 1)
                    v = t if v is None else v + t
                lanes2 = lax.broadcasted_iota(jnp.int32, (1, 1, P2), 2)
                wsum = None
                for o in range(-r, r + 1):
                    if o == 0:
                        t = v
                    else:
                        t = lane_roll(v, (-o) % P2, 2)
                        if o > 0:
                            t = jnp.where(
                                lanes2 >= n2 - o + d2_lo,
                                jnp.asarray(d2_hi_bc * side * side, dtype),
                                t,
                            )
                        else:
                            t = jnp.where(
                                lanes2 < d2_lo - o,
                                jnp.asarray(d2_lo_bc * side * side, dtype),
                                t,
                            )
                    wsum = t if wsum is None else wsum + t
                out = (wsum - d0slice(src_val, 0)) * jnp.asarray(ubmc, dtype)
                return lax.slice(out, (0, a1, d2_lo),
                                 (m0, a1 + m1, d2_lo + n2))

            acc = None
            for wgt, offs in spec.weight_groups():
                gacc = None
                for off in offs:
                    tap = d0slice(get_rot(off[1], off[2]), off[0])
                    gacc = tap if gacc is None else gacc + tap
                term = gacc if uw is not None else gacc * jnp.asarray(wgt,
                                                                      dtype)
                acc = term if acc is None else acc + term
            if uw is not None:
                acc = acc * jnp.asarray(uw, dtype)
            return lax.slice(acc, (0, a1, d2_lo), (m0, a1 + m1, d2_lo + n2))

        def taps_coeff(src_val, a0, m0, a1, m1):
            """Variable-coefficient face-weight taps (fp32, radius 1).

            rotacc structure: full-minor-extent terms accumulated at
            (m0, w1, P2), ONE misaligned slice on the result. Per dim:
            the lo term is w_lo_d ⊙ shift_-d(u); the hi term needs NO
            stored hi window because w_hi_d(p) u(p+e_d) =
            shift_+d(w_lo_d ⊙ u) — the weight and the operand shift
            together. d2 shifts are lane rotates with in-register
            boundary synthesis exactly as in taps_synth (u's lane
            ghosts get the Dirichlet face value; the d2-hi weight is
            the stored fwbuf[3], whose lane-boundary substitution
            happened at prep time). d0 shifts are major-dim slices.
            Wrapped d1-rotate rows never reach used outputs (reads
            stay >= 1 inside the window, same argument as rotacc)."""
            u = src_val
            lanes = lax.broadcasted_iota(jnp.int32, (1, 1, P2), 2)
            ulo1 = pltpu.roll(u, 1, 1)
            ghi1 = pltpu.roll(fwbuf[1] * u, w1 - 1, 1)
            ulo2 = jnp.where(lanes < 1, jnp.asarray(d2_lo_bc, dtype),
                             lane_roll(u, 1, 2))
            uhi2 = jnp.where(lanes >= n2 - 1,
                             jnp.asarray(d2_hi_bc, dtype),
                             lane_roll(u, P2 - 1, 2))
            acc = (fwbuf[4] * u + fwbuf[1] * ulo1 + ghi1
                   + fwbuf[2] * ulo2 + fwbuf[3] * uhi2)

            def d0s(x, o0):
                return lax.slice(x, (a0 + o0, 0, 0),
                                 (a0 + o0 + m0, w1, P2))

            out = (d0s(acc, 0) + d0s(fwbuf[0], 0) * d0s(u, -1)
                   + d0s(fwbuf[0] * u, 1))
            return lax.slice(out, (0, a1, d2_lo),
                             (m0, a1 + m1, d2_lo + n2))

        taps_into = {"slice": taps_slice, "roll": taps_roll,
                     "synth": taps_synth, "rotacc": taps_rotacc,
                     "coeff": taps_coeff}[plan.tap_mode]

        def pin(dst, i, need):
            """Re-pin physical ghosts of the compute buffer after an
            intermediate sweep.

            Bands are static-size (kr rows per d0 side, p1 / p1+extra1 per
            d1 side) with a dynamic per-tile threshold: any tile whose
            window crosses a physical face re-pins exactly the rows
            at/beyond that face, keeping interior band rows as computed
            (read-modify-write select against a row iota). That covers not
            just the edge tiles but (a) MID tiles whose per-sweep
            recompute extension (k-t)*r exceeds the tile pitch — the
            round-2 kernel pinned edge tiles only and computed stencil
            values into the physical ghost zone at e.g. k=8 r=2 tiles 8x8
            (measured 8e-5 vs golden on a DIVISIBLE 16x24x20 grid) — and
            (b) the clamped last tiles of ragged grids, whose c1 = C1
            start puts up to extra1 ghost rows inside the output band.
            Every computed ghost row lands in a band: the recompute
            extension is bounded by need <= kr <= p1 per side, and the
            ragged d1 overhang by extra1.

            Writes cover d2-INTERIOR columns only: the d2 ghost columns of
            the (shared, persistent) compute buffers hold the d2 face
            values from the one-time fill, and they must survive — a
            full-width band write here would clobber them with the d0/d1
            face value, which both breaks the later-dims-win corner rule
            (box stencils) and poisons later tiles' ghost-recompute rows
            that read d2 ghosts at these band rows (all stencils). Band
            rows beyond this tile's computed region keep stale cross-tile
            values through the select; no later sweep reads them (sweep
            t+1 reads exactly the region sweep t computed).
            """
            r0, c1 = tile_coords(i)
            d2i = pl.ds(d2_lo, n2)
            rows0 = lax.broadcasted_iota(jnp.int32, (kr, 1, 1), 0)

            @pl.when((pins_ref[0] != 0) & (r0 < kr))
            def _():
                dst[0:kr, :, d2i] = jnp.where(
                    rows0 < kr - r0, jnp.asarray(d0_lo_bc, dtype),
                    dst[0:kr, :, d2i])

            # hi band widened by the embed overhang (b0 = kr when extra0
            # = 0 — the historical clamp band, bit-exact). Threshold
            # algebra: band row i pins window row w = w0 - b0 + i, and
            # i >= C0 - r0 reduces to w >= n0 + kr - r0 — exactly the
            # physical-ghost condition — for EVERY b0.
            b0 = kr + extra0
            rows0hi = (rows0 if not extra0
                       else lax.broadcasted_iota(jnp.int32, (b0, 1, 1), 0))

            @pl.when((pins_ref[1] != 0) & (r0 > C0 - b0))
            def _():
                dst[w0 - b0:, :, d2i] = jnp.where(
                    rows0hi >= C0 - r0, jnp.asarray(d0_hi_bc, dtype),
                    dst[w0 - b0:, :, d2i])

            b1 = p1 + extra1
            rows1lo = lax.broadcasted_iota(jnp.int32, (1, p1, 1), 1)
            rows1hi = lax.broadcasted_iota(jnp.int32, (1, b1, 1), 1)

            @pl.when((pins_ref[2] != 0) & (c1 < p1))
            def _():
                dst[:, 0:p1, d2i] = jnp.where(
                    rows1lo < p1 - c1, jnp.asarray(d1_lo_bc, dtype),
                    dst[:, 0:p1, d2i])

            @pl.when((pins_ref[3] != 0) & (c1 > C1 - b1))
            def _():
                dst[:, w1 - b1:, d2i] = jnp.where(
                    rows1hi >= C1 - c1, jnp.asarray(d1_hi_bc, dtype),
                    dst[:, w1 - b1:, d2i])

        def compute(sl, osl, i):
            # Buffer ping-pong: sweep t reads wbuf(t-1) (t=1: the DMA
            # window), writes wbuf(t). Non-slide: even sweeps overwrite
            # the (dead) DMA window in place — its unwritten rim is never
            # read again, because sweep t+1 reads exactly the region
            # sweep t wrote. Slide: the window must stay pristine (the
            # next tile's overlap rows are copied out of it), so sweeps
            # ping-pong between two dedicated buffers instead.
            def wbuf(t):
                if plan.slide and k > 1:
                    return (cbuf, cbuf2)[(t - 1) % 2]
                return (cbuf, scratch.at[sl])[(t - 1) % 2]

            for t in range(1, k + 1):
                need = (k - t) * r
                a0, m0 = kr - need, s0 + 2 * need
                a1, m1 = p1 - need, t1 + 2 * need
                src = scratch.at[sl] if t == 1 else wbuf(t - 1)
                y = taps_into(src[...], a0, m0, a1, m1)
                if plan.has_source:
                    # affine update u' = S(u) + src: the source window
                    # holds pre-scaled values with the SAME layout, its
                    # dynamic ghosts carrying wrapped/mirrored images
                    # (static — refreshed once at pad time), so extended
                    # band cells add the f of the interior point they
                    # represent; physical-ghost band rows are re-pinned
                    # right after, so their src values never matter
                    y = y + sscratch.at[sl][a0:a0 + m0, a1:a1 + m1,
                                            d2_lo:d2_lo + n2]
                if t < k:
                    dst = wbuf(t)
                    dst[pl.ds(a0, m0), pl.ds(a1, m1),
                        pl.ds(d2_lo, n2)] = y
                    pin(dst, i, need)
                else:
                    d1_idx = (pl.ds(p1, t1) if full_d1
                              else slice(None))
                    otile[(osl, slice(None), d1_idx,
                           pl.ds(d2_lo, n2))] = y
                    if extra0:
                        # embed d0: the last d0 tile's output band covers
                        # the extra0 thick-ghost rows — write the d0-hi
                        # face value (before the d1 overhang write below:
                        # later dims win in corners)
                        r0_, _ = tile_coords(i)

                        @pl.when((pins_ref[1] != 0) & (r0_ >= C0))
                        def _():
                            otile[(osl, pl.ds(s0 - extra0, extra0),
                                   d1_idx, pl.ds(d2_lo, n2))] = jnp.full(
                                (extra0, t1, n2), d0_hi_bc, dtype)
                    if extra1:
                        # ragged d1: the clamped last tile's output band
                        # overhangs the interior by extra1 rows — those
                        # are the first rows of the array's d1-hi ghost
                        # zone and must carry the face value (d2-interior
                        # columns only: the otile's d2 ghost columns hold
                        # the d2 faces from the one-time fill)
                        _, c1 = tile_coords(i)

                        @pl.when((pins_ref[3] != 0) & (c1 >= C1))
                        def _():
                            otile[(osl, slice(None),
                                   pl.ds(t1 - extra1, extra1),
                                   pl.ds(d2_lo, n2))] = jnp.full(
                                (s0, extra1, n2), d1_hi_bc, dtype)

        def compute2(sl, osl, i):
            """Two-level (leapfrog) recursion:
            ``L_{n+t} = S(L_{n+t-1}) - L_{n+t-2}`` over the shrinking
            trapezoid. The subtrahend at sweep t is the buffer written
            at t-2, whose extent strictly contains sweep t's (seeds:
            the cur window at t=2 and the prev window at t=1). Writes
            the final level into ``otile`` and the PENULTIMATE level —
            the next call's prev input — into ``otile2`` (sliced from
            the PINNED t=k-1 buffer, so clamp-overhang rows already
            carry the face value)."""
            d1_idx = pl.ds(p1, t1) if full_d1 else slice(None)
            d2i = pl.ds(d2_lo, n2)

            def tgt(t):
                return (cbuf, cbuf2)[(t - 1) % 2]

            for t in range(1, k + 1):
                need = (k - t) * r
                a0, m0 = kr - need, s0 + 2 * need
                a1, m1 = p1 - need, t1 + 2 * need
                s_in = scratch.at[sl] if t == 1 else tgt(t - 1)
                if t == 1:
                    sub = pscratch.at[sl]
                elif t == 2:
                    sub = scratch.at[sl]
                else:
                    # same buffer we are about to overwrite (tgt(t) ==
                    # tgt(t-2)): y is materialized as a value before the
                    # region store, so the read-before-write is safe
                    sub = tgt(t - 2)
                y = taps_into(s_in[...], a0, m0, a1, m1) \
                    - sub[a0:a0 + m0, a1:a1 + m1, d2_lo:d2_lo + n2]
                if t < k:
                    dst = tgt(t)
                    dst[pl.ds(a0, m0), pl.ds(a1, m1), d2i] = y
                    pin(dst, i, need)
                    if t == k - 1:
                        otile2[(osl, slice(None), d1_idx, d2i)] = \
                            dst[kr:kr + s0, p1:p1 + t1,
                                d2_lo:d2_lo + n2]
                else:
                    otile[(osl, slice(None), d1_idx, d2i)] = y
                    if k == 1:
                        # L_{n+k-1} = L_n: copy the input core through
                        otile2[(osl, slice(None), d1_idx, d2i)] = \
                            scratch.at[sl][kr:kr + s0, p1:p1 + t1,
                                           d2_lo:d2_lo + n2]
                    if extra1:
                        # ragged d1 clamp overhang of the FINAL level
                        # (otile2's came pinned from the t=k-1 buffer)
                        _, c1 = tile_coords(i)

                        @pl.when((pins_ref[3] != 0) & (c1 >= C1))
                        def _():
                            otile[(osl, slice(None),
                                   pl.ds(t1 - extra1, extra1),
                                   pl.ds(d2_lo, n2))] = jnp.full(
                                (s0, extra1, n2), d1_hi_bc, dtype)

        def compute_cheby(sl, osl, i):
            """Chebyshev-recurrence sweeps (the multigrid smoother,
            ``multigrid._cheby_sweep_coeffs``) with per-virtual-sweep
            TRACE-TIME scalars:

              u_t = n_t nbsum(u_{t-1}) + c_t u_{t-1} + pv_t u_{t-2}
                    + s_t f

            over the shrinking trapezoid. taps_into evaluates the
            center-less neighbor-sum star (plan.spec); the per-sweep
            Chebyshev weights multiply in-register. pv_1 = 0 (each
            smoother application restarts the recurrence), so no prev
            window crosses the call: u_{t-2} at t=2 is the pristine DMA
            window and at t>2 the SAME ping-pong buffer about to be
            overwritten (y is materialized as a value before the region
            store — the compute2 read-before-write argument). The
            source window holds the RAW f (source_scale=1.0 at pad
            time); s_t applies here."""
            d1_idx = pl.ds(p1, t1) if full_d1 else slice(None)
            d2i = pl.ds(d2_lo, n2)

            def tgt(t):
                return (cbuf, cbuf2)[(t - 1) % 2]

            for t in range(1, k + 1):
                cc, nn, pv, ss = plan.cheby_coeffs[t - 1]
                need = (k - t) * r
                a0, m0 = kr - need, s0 + 2 * need
                a1, m1 = p1 - need, t1 + 2 * need
                s_in = scratch.at[sl] if t == 1 else tgt(t - 1)
                reg = (slice(a0, a0 + m0), slice(a1, a1 + m1),
                       slice(d2_lo, d2_lo + n2))
                y = (jnp.asarray(nn, dtype)
                     * taps_into(s_in[...], a0, m0, a1, m1)
                     + jnp.asarray(cc, dtype) * s_in[reg]
                     + jnp.asarray(ss, dtype) * sscratch.at[sl][reg])
                if t >= 2:
                    prev = scratch.at[sl] if t == 2 else tgt(t - 2)
                    y = y + jnp.asarray(pv, dtype) * prev[reg]
                if t < k:
                    dst = tgt(t)
                    dst[pl.ds(a0, m0), pl.ds(a1, m1), d2i] = y
                    pin(dst, i, need)
                    if plan.cheby_dual and t == k - 1:
                        # dual mode: the penultimate sweep IS the
                        # smoothed iterate — ship it as the second
                        # output (sliced from the PINNED buffer, the
                        # compute2 contract)
                        otile2[(osl, slice(None), d1_idx, d2i)] = \
                            dst[kr:kr + s0, p1:p1 + t1,
                                d2_lo:d2_lo + n2]
                else:
                    otile[(osl, slice(None), d1_idx, d2i)] = y
                    if extra1:
                        # ragged d1 clamp overhang of the final sweep
                        _, c1 = tile_coords(i)

                        @pl.when((pins_ref[3] != 0) & (c1 >= C1))
                        def _():
                            otile[(osl, slice(None),
                                   pl.ds(t1 - extra1, extra1),
                                   pl.ds(d2_lo, n2))] = jnp.full(
                                (s0, extra1, n2), d1_hi_bc, dtype)

        # one-time d2 ghost fills: the compute buffer and output tiles
        # carry constant BC columns that compute never writes (the DMA
        # window slots get theirs from HBM, where padded arrays maintain
        # them end to end)
        if k > 1:
            fill_d2_ghosts(cbuf, (w0, w1))
            if plan.slide or plan.two_level or has_cheby:
                fill_d2_ghosts(cbuf2, (w0, w1))
        ot_d1 = P1 if full_d1 else t1
        if full_d1:
            # the full-d1 output tile carries the padded array's d1 ghost
            # rows: fill them with the d1 face values once (d2 ghost fill
            # comes after — later dims win in corners)
            for slot in (0, 1):
                otile.at[slot][:, 0:p1, :] = jnp.full((s0, p1, P2),
                                                      d1_lo_bc, dtype)
                otile.at[slot][:, p1 + t1:, :] = jnp.full(
                    (s0, P1 - p1 - t1, P2), d1_hi_bc, dtype)
                if plan.two_level or plan.cheby_dual:
                    otile2.at[slot][:, 0:p1, :] = jnp.full(
                        (s0, p1, P2), d1_lo_bc, dtype)
                    otile2.at[slot][:, p1 + t1:, :] = jnp.full(
                        (s0, P1 - p1 - t1, P2), d1_hi_bc, dtype)
        fill_d2_ghosts(otile.at[0], (s0, ot_d1))
        fill_d2_ghosts(otile.at[1], (s0, ot_d1))
        if plan.two_level or plan.cheby_dual:
            fill_d2_ghosts(otile2.at[0], (s0, ot_d1))
            fill_d2_ghosts(otile2.at[1], (s0, ot_d1))

        # Position range of THIS kernel invocation. cores == 1: the whole
        # run list, statically (bit-identical to the gridless round-3
        # code). cores > 1: the kernel body is one step of a
        # 'parallel'-semantics Pallas grid — each step walks a contiguous
        # chunk of positions and primes/drains its OWN DMA pipeline, so
        # chunks stay hazard-free executed sequentially on one core or
        # concurrently on several (per-core scratch).
        if plan.cores == 1:
            c_lo, c_hi = 0, nt_run
        else:
            chunk = -(-nt_run // plan.cores)
            c_lo = pl.program_id(0) * chunk
            c_hi = jnp.minimum(c_lo + chunk, nt_run)

        if not plan.pipeline:
            # serialized-DMA reference mode (measurement baseline for the
            # double-buffered pipeline below — the analog of running the
            # reference without its async iget/iput overlap): every DMA is
            # waited before compute touches the tile and the writeback is
            # drained before the next tile starts
            def body_serial(pos, _):
                tid = ids_ref[pos]
                sl = lax.rem(pos, S)
                osl = lax.rem(pos, 2)
                in_copy(tid, sl).start()
                in_copy(tid, sl).wait()
                if plan.has_source:
                    src_copy(tid, sl).start()
                    src_copy(tid, sl).wait()
                if has_coeff:
                    cf_copy(tid, sl).start()
                    cf_copy(tid, sl).wait()
                    prep_weights(sl)
                if plan.two_level:
                    pv_copy(tid, sl).start()
                    pv_copy(tid, sl).wait()
                    compute2(sl, osl, tid)
                    out_copy(tid, osl).start()
                    out2_copy(tid, osl).start()
                    out_copy(tid, osl).wait()
                    out2_copy(tid, osl).wait()
                else:
                    if has_cheby:
                        compute_cheby(sl, osl, tid)
                    else:
                        compute(sl, osl, tid)
                    out_copy(tid, osl).start()
                    if plan.cheby_dual:
                        out2_copy(tid, osl).start()
                        out2_copy(tid, osl).wait()
                    out_copy(tid, osl).wait()
                return 0

            lax.fori_loop(c_lo, c_hi, body_serial, 0)
            return

        # fill the input pipeline S deep (S=2 is the classic double
        # buffer; deeper S prefetches further ahead of compute). In slide
        # mode only the first tile of each d0 row fetches its full window;
        # later tiles fetch their t1 NEW rows (the overlap arrives via
        # ov_copy, chained tile-to-tile behind compute).
        slide = plan.slide

        def is_row_start(j):
            return j % nt1 == 0

        # positions j walk the (possibly subset) run list; the tile id
        # comes from SMEM. Slide requires subset=None (validated), where
        # position == tile id, so its row-start arithmetic stays on ids.
        if plan.cores == 1:
            in_copy(ids_ref[0], 0).start()
            if plan.has_source:
                src_copy(ids_ref[0], 0).start()
            if has_coeff:
                cf_copy(ids_ref[0], 0).start()
            if plan.two_level:
                pv_copy(ids_ref[0], 0).start()
            for j in range(1, min(S, nt_run)):
                in_copy(ids_ref[j], j,
                        partial=slide and not is_row_start(j)).start()
                if plan.has_source:
                    src_copy(ids_ref[j], j).start()
                if has_coeff:
                    cf_copy(ids_ref[j], j).start()
                if plan.two_level:
                    pv_copy(ids_ref[j], j).start()
        else:
            # dynamic chunk bounds (slide impossible here, validated):
            # prime slots for the first S positions of THIS chunk
            for j in range(S):
                @pl.when(c_lo + j < c_hi)
                def _(j=j):
                    in_copy(ids_ref[c_lo + j],
                            lax.rem(c_lo + j, S)).start()
                    if plan.has_source:
                        src_copy(ids_ref[c_lo + j],
                                 lax.rem(c_lo + j, S)).start()
                    if has_coeff:
                        cf_copy(ids_ref[c_lo + j],
                                lax.rem(c_lo + j, S)).start()

        def body(pos, _):
            tid = ids_ref[pos]
            sl = lax.rem(pos, S)
            osl = lax.rem(pos, 2)
            if slide:
                part = lax.rem(tid, nt1) != 0

                # mirrored wait: the descriptor must match the start
                @pl.when(part)
                def _():
                    in_copy(tid, sl, partial=True).wait()

                @pl.when(jnp.logical_not(part))
                def _():
                    in_copy(tid, sl).wait()
            else:
                in_copy(tid, sl).wait()
                if plan.has_source:
                    src_copy(tid, sl).wait()
                if has_coeff:
                    cf_copy(tid, sl).wait()
                    prep_weights(sl)
                if plan.two_level:
                    pv_copy(tid, sl).wait()

            @pl.when(pos >= c_lo + 2)
            def _():
                out_copy(ids_ref[pos - 2], osl).wait()
                if plan.two_level or plan.cheby_dual:
                    out2_copy(ids_ref[pos - 2], osl).wait()

            if slide:
                # stage tile tid+1's overlap rows out of THIS slot while
                # we compute; waited below, before this slot's rows can
                # be overwritten by the pos+S prefetch (the
                # single-threaded kernel order also sequences it before
                # body(pos+1)'s reads)
                nxt_part = (tid + 1 < nt) & (lax.rem(tid + 1, nt1) != 0)

                @pl.when(nxt_part)
                def _():
                    ov_copy(sl, lax.rem(tid + 1, S)).start()

            if plan.two_level:
                compute2(sl, osl, tid)
            elif has_cheby:
                compute_cheby(sl, osl, tid)
            else:
                compute(sl, osl, tid)

            if slide:
                @pl.when(nxt_part)
                def _():
                    ov_copy(sl, lax.rem(tid + 1, S)).wait()

                @pl.when(pos + S < c_hi)
                def _():
                    nsp = lax.rem(tid + S, nt1) != 0

                    @pl.when(nsp)
                    def _():
                        in_copy(tid + S, sl, partial=True).start()

                    @pl.when(jnp.logical_not(nsp))
                    def _():
                        in_copy(tid + S, sl).start()
            else:
                @pl.when(pos + S < c_hi)
                def _():
                    in_copy(ids_ref[pos + S], sl).start()
                    if plan.has_source:
                        src_copy(ids_ref[pos + S], sl).start()
                    if has_coeff:
                        cf_copy(ids_ref[pos + S], sl).start()
                    if plan.two_level:
                        pv_copy(ids_ref[pos + S], sl).start()

            out_copy(tid, osl).start()
            if plan.two_level or plan.cheby_dual:
                out2_copy(tid, osl).start()
            return 0

        lax.fori_loop(c_lo, c_hi, body, 0)
        # drain this chunk's last two output copies (every earlier one was
        # waited by body(pos+2)); with cores == 1 the bounds are static
        # and this is exactly the round-3 epilogue
        if plan.cores == 1:
            out_copy(ids_ref[nt_run - 1], lax.rem(nt_run - 1, 2)).wait()
            if plan.two_level or plan.cheby_dual:
                out2_copy(ids_ref[nt_run - 1],
                          lax.rem(nt_run - 1, 2)).wait()

            if nt_run > 1:
                out_copy(ids_ref[nt_run - 2], lax.rem(nt_run - 2, 2)).wait()
                if plan.two_level or plan.cheby_dual:
                    out2_copy(ids_ref[nt_run - 2],
                              lax.rem(nt_run - 2, 2)).wait()
        else:
            @pl.when(c_hi > c_lo)
            def _():
                out_copy(ids_ref[c_hi - 1], lax.rem(c_hi - 1, 2)).wait()

            @pl.when(c_hi - 1 > c_lo)
            def _():
                out_copy(ids_ref[c_hi - 2], lax.rem(c_hi - 2, 2)).wait()

    win_shape = plan.window_shape
    otile_shape = (s0, (P1 if full_d1 else t1), P2)

    ids_arr = np.asarray(ids, np.int32)

    # cores > 1: the kernel body becomes one step of a 'parallel' grid
    # dimension — Mosaic partitions parallel grid steps across the
    # chip's TensorCores (megacore); on a single-core chip the steps run
    # sequentially (measured neutral on v5e, docs/performance.md). The
    # gridless cores == 1 call stays byte-identical to round 3.
    grid_kwargs = {}
    cparams = dict(
        has_side_effects=True,
        vmem_limit_bytes=plan.vmem_limit or _tiled_limit_floor(),
    )
    if plan.cores > 1:
        grid_kwargs["grid"] = (plan.cores,)
        cparams["dimension_semantics"] = ("parallel",)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    scratch_shapes = [
        pltpu.VMEM((S,) + win_shape, dtype),
        pltpu.VMEM(win_shape if k > 1 else (1, 1, 1), dtype),
        pltpu.VMEM((2,) + otile_shape, dtype),
        pltpu.SemaphoreType.DMA((S,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.VMEM(win_shape
                   if (k > 1 and (plan.slide or plan.two_level
                                  or plan.has_cheby))
                   else (1, 1, 1), dtype),
        pltpu.SemaphoreType.DMA((1,)),
    ]
    out_specs = pl.BlockSpec(memory_space=pl.ANY)
    out_shape = jax.ShapeDtypeStruct((P0, P1, P2), dtype)
    aliases = {3: 0}
    if plan.has_source:
        # the source streams through its own S window slots + semaphores
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch_shapes += [
            pltpu.VMEM((S,) + win_shape, dtype),
            pltpu.SemaphoreType.DMA((S,)),
        ]
    if has_coeff:
        # the coefficient streams through its own S window slots; the 5
        # derived face-weight windows live in one stacked scratch
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch_shapes += [
            pltpu.VMEM((S,) + win_shape, dtype),
            pltpu.SemaphoreType.DMA((S,)),
            pltpu.VMEM((5,) + win_shape, dtype),
        ]
    if plan.two_level:
        # prev-level input stream + a second (aliased) output level
        in_specs += [pl.BlockSpec(memory_space=pl.ANY),
                     pl.BlockSpec(memory_space=pl.ANY)]
        out_specs = (pl.BlockSpec(memory_space=pl.ANY),
                     pl.BlockSpec(memory_space=pl.ANY))
        out_shape = (jax.ShapeDtypeStruct((P0, P1, P2), dtype),
                     jax.ShapeDtypeStruct((P0, P1, P2), dtype))
        aliases = {3: 0, 5: 1}
        scratch_shapes += [
            pltpu.VMEM((S,) + win_shape, dtype),
            pltpu.SemaphoreType.DMA((S,)),
            pltpu.VMEM((2,) + otile_shape, dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    if plan.cheby_dual:
        # second aliased destination for the penultimate sweep (the
        # smoothed iterate; the final output is the residual) — the
        # two_level output machinery on the cheby input schedule.
        # Inputs are (pins, ids, cur, nxt, src, nxt2) -> nxt2 is 5.
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_specs = (pl.BlockSpec(memory_space=pl.ANY),
                     pl.BlockSpec(memory_space=pl.ANY))
        out_shape = (jax.ShapeDtypeStruct((P0, P1, P2), dtype),
                     jax.ShapeDtypeStruct((P0, P1, P2), dtype))
        aliases = {3: 0, 5: 1}
        scratch_shapes += [
            pltpu.VMEM((2,) + otile_shape, dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]

    def _call(pins, *arrays):
        return pl.pallas_call(
            kernel,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            input_output_aliases=aliases,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(**cparams),
            **grid_kwargs,
        )(pins, jnp.asarray(ids_arr), *arrays)

    if plan.two_level:
        @jax.jit
        def sweep(cur, prev, nxt, nxt2, pins=None):
            """One outer step of the leapfrog recursion: returns
            ``(L_{n+k}, L_{n+k-1})`` — the next call's (cur, prev).
            ``nxt``/``nxt2`` are the aliased destination buffers."""
            if pins is None:
                pins = jnp.ones((4,), jnp.int32)
            return _call(pins, cur, nxt, prev, nxt2)
    elif plan.cheby_dual:
        @jax.jit
        def sweep(cur, nxt, nxt2, src, pins=None):
            """Fused smooth+residual: returns ``(r, u_smoothed)`` —
            the final sweep's output (the residual) and the
            penultimate sweep's (the smoothed iterate)."""
            if pins is None:
                pins = jnp.ones((4,), jnp.int32)
            return _call(pins, cur, nxt, src, nxt2)
    elif plan.has_source and has_coeff:
        @jax.jit
        def sweep(cur, nxt, src, coeffp, pins=None):
            if pins is None:
                pins = jnp.ones((4,), jnp.int32)
            return _call(pins, cur, nxt, src, coeffp)
    elif has_coeff:
        @jax.jit
        def sweep(cur, nxt, coeffp, pins=None):
            if pins is None:
                pins = jnp.ones((4,), jnp.int32)
            return _call(pins, cur, nxt, coeffp)
    elif plan.has_source:
        @jax.jit
        def sweep(cur, nxt, src, pins=None):
            if pins is None:
                pins = jnp.ones((4,), jnp.int32)
            return _call(pins, cur, nxt, src)
    else:
        @jax.jit
        def sweep(cur, nxt, pins=None):
            if pins is None:
                pins = jnp.ones((4,), jnp.int32)
            return _call(pins, cur, nxt)

    return sweep


def partition_tiles(plan: TiledPlan):
    """(interior_ids, edge_ids): interior tiles' windows never touch the
    ``k*r``-deep d0/d1 ghost bands a mesh halo exchange refreshes, so
    their compute has NO data dependency on the exchange and can overlap
    it (the phase split of the overlapped sharded path). Conservative
    and device-independent: tiles touching bands that happen to be
    physical faces on a given device are still 'edge' — merely a
    scheduling choice, never a correctness one."""
    n0, n1, _ = plan.interior_shape
    s0, t1 = plan.s0, plan.t1
    kr = plan.halo
    p1 = plan.p1
    nt0, nt1 = -(-n0 // s0), -(-n1 // t1)
    extra0 = plan.layout.pads[0][1] - plan.layout.pads[0][0]
    C0 = n0 + extra0 - s0
    extra1 = plan.layout.pads[1][1] - p1
    C1 = n1 + extra1 - t1
    interior, edge = [], []
    for tid in range(nt0 * nt1):
        i0, i1 = tid // nt1, tid % nt1
        r0 = min(i0 * s0, C0)
        c1 = min(i1 * t1, C1)
        touches = (
            r0 < kr                      # window over the d0-lo band
            or r0 > C0 - kr - extra0     # d0-hi band ([w0-b0, w0) rows)
            or c1 < p1                   # d1-lo band
            or c1 > n1 - t1 - p1         # d1-hi band
        )
        (edge if touches else interior).append(tid)
    return tuple(interior), tuple(edge)


@functools.lru_cache(maxsize=64)
def _cached_tiled_sweep(plan: TiledPlan, bc: DirichletBC, interpret: bool,
                        subset=None):
    return build_tiled_sweep(plan, bc, interpret, subset)


@functools.lru_cache(maxsize=64)
def _cached_tiled_runner(plan: TiledPlan, bc: DirichletBC, interpret: bool):
    # cached for the same reason as ops.pallas._cached_runner: a fresh
    # jax.jit closure per iterate() re-traces the pallas call every call
    sweep = _cached_tiled_sweep(plan, bc, interpret)

    @jax.jit
    def run(cur, nxt, n_outer):
        def body(_, carry):
            c, n = carry
            return (sweep(c, n), c)

        return lax.fori_loop(0, n_outer, body, (cur, nxt))

    return run


def _dynamic_pins(bc: DirichletBC, ndim: int = 3):
    """The kernel ``pins`` vector for a BC: 0 on dynamic (periodic or
    Neumann) d0/d1 faces.

    The pins mechanism exists for faces whose deep ghosts hold VALID
    remote data (the sharded paths' mesh-internal faces) — a dynamic
    face is exactly that, with "remote" = the grid's own opposite face
    (periodic wrap) or the face-adjacent interior reflected (Neumann
    mirror): the deep refresh between kernel calls seeds ``k*r`` ghost
    layers, and the kernel's shrinking-window recompute then treats the
    face like a mesh-internal one (no Dirichlet re-pinning)."""
    dyn = bc.dynamic_mask(ndim)
    p0 = 0 if dyn[0] else 1
    p1 = 0 if (ndim > 2 and dyn[1]) else 1
    return np.asarray([p0, p0, p1, p1], np.int32)


@functools.lru_cache(maxsize=64)
def _cached_tiled_iterate(plan: TiledPlan, bc: DirichletBC, interpret: bool,
                          grid_halo: int):
    """End-to-end jitted iterate (single dispatch per call) — see
    ops.pallas._cached_iterate for why the pad/unpad must live inside.

    Dynamic dims (``bc.periodic``/``bc.neumann``): their ghost layers
    must hold data derived from the CURRENT iterate (wrapped rows /
    mirrored rows), so the loop body refreshes the padded buffer to the
    full temporal depth ``k*r`` after every kernel call, and the kernel
    runs with Dirichlet pinning disabled on the dynamic d0/d1 faces
    (``_dynamic_pins``) — the same treatment the sharded paths give
    mesh-internal faces. A dynamic LANE dim is the one case that needs
    ``k=1`` + a ghost-reading tap mode (the in-VMEM virtual sweeps
    cannot see the lane face mid-call); Neumann dims additionally need
    the spec mirror-symmetric in that dim at ``k>1`` — both gated in
    ``TiledPallasStencil.iterate``."""
    from stencil_tpu.core.grid import fill_halo
    from stencil_tpu.ops.layout import refresh_dynamic_layout

    sweep = _cached_tiled_sweep(plan, bc, interpret)
    depth = plan.layout.halo  # k*r: seed the full temporal ghost depth
    pins = _dynamic_pins(bc) if bc.any_dynamic else None

    @jax.jit
    def run(data, n_outer):
        h = grid_halo
        idx = tuple(slice(h, s - h) for s in data.shape)
        cur = plan.layout.pad(data[idx], bc)
        if bc.any_dynamic:
            cur = refresh_dynamic_layout(cur, plan.layout, bc, depth)
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


def pad_source(plan, source, source_scale, bc: DirichletBC):
    """Build the padded source operand of a ``has_source`` plan
    (rank-general: TiledPlan or the slab kernel's SlabPlan).

    Interior = ``source_scale * source``; Dirichlet ghost zones hold 0
    (they are only ever read into band cells that the kernel re-pins, so
    the value never survives); dynamic (periodic/Neumann) ghost zones
    hold the wrapped/mirrored images of the interior source at full
    temporal depth — static, because the source does not evolve, so ONE
    refresh at pad time replaces the per-call refresh the iterate does
    for ``u``."""
    from stencil_tpu.ops.layout import refresh_dynamic_layout

    dt = jnp.dtype(plan.dtype)
    ndim = len(plan.interior_shape)
    src_bc = DirichletBC(values=tuple([(0.0, 0.0)] * ndim),
                         periodic=bc.periodic, neumann=bc.neumann)
    scaled = jnp.asarray(source, dt) * jnp.asarray(source_scale, dt)
    if scaled.shape != plan.interior_shape:
        raise ValueError(
            f"source shape {scaled.shape} != interior "
            f"{plan.interior_shape}")
    p = plan.layout.pad(scaled, src_bc)
    if src_bc.any_dynamic:
        p = refresh_dynamic_layout(p, plan.layout, src_bc,
                                   plan.layout.halo)
    return p


@functools.lru_cache(maxsize=64)
def _cached_tiled_source_iterate(plan: TiledPlan, bc: DirichletBC,
                                 interpret: bool, grid_halo: int):
    """Source-term twin of ``_cached_tiled_iterate``: the jitted runner
    additionally threads the (static, pre-padded) source operand into
    every kernel call."""
    from stencil_tpu.core.grid import fill_halo
    from stencil_tpu.ops.layout import refresh_dynamic_layout

    sweep = _cached_tiled_sweep(plan, bc, interpret)
    depth = plan.layout.halo
    pins = _dynamic_pins(bc) if bc.any_dynamic else None

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


@functools.lru_cache(maxsize=64)
def _cached_cheby_dual_fn(plan: TiledPlan, bc: DirichletBC,
                          interpret: bool):
    """Fused smooth+residual runner (``cheby_dual`` plans): ONE kernel
    call returns ``(u_smoothed_padded_h1, r_interior)`` — the
    multigrid fine level's pre-smooth AND residual in a single HBM
    round trip (the standalone residual kernel's full window movement
    and one layout round trip per V-cycle are gone; measured pieces in
    results/_diag_r5c.jsonl)."""
    from stencil_tpu.core.grid import fill_halo

    sweep = _cached_tiled_sweep(plan, bc, interpret)
    if bc.any_dynamic:
        raise ValueError(
            "the fused smooth+residual path runs on static Dirichlet "
            "walls (multigrid refuses dynamic BCs upstream)")

    @jax.jit
    def run(data, src_padded):
        h = 1
        idx = tuple(slice(h, s - h) for s in data.shape)
        cur = plan.layout.pad(data[idx], bc)
        nxt = jnp.copy(cur)
        nxt2 = jnp.copy(cur)
        r_pad, u_pad = sweep(cur, nxt, nxt2, src_padded)
        u = jnp.pad(plan.layout.unpad(u_pad), h)
        return fill_halo(u, h, bc), plan.layout.unpad(r_pad)

    return run


def pad_coeff(plan: TiledPlan, a, bc: DirichletBC):
    """Build the padded coefficient operand of a ``coeff`` plan.

    Ghost cells are EDGE-REPLICATED (nearest interior value): the
    harmonic face mean then reduces to edge replication at physical
    walls — exactly ``models.diffusion.face_harmonic_means``'s rule —
    and every pad cell stays positive (the in-kernel ``harm`` divides
    by ``a + a_nb``). Dynamic (periodic/Neumann) dims get wrapped /
    mirrored images at full temporal depth — static, because the
    coefficient does not evolve, so ONE refresh at pad time suffices
    (same contract as ``pad_source``)."""
    from stencil_tpu.ops.layout import refresh_dynamic_layout

    dt = jnp.dtype(plan.dtype)
    arr = jnp.asarray(a, dt)
    if arr.shape != plan.interior_shape:
        raise ValueError(
            f"coefficient shape {arr.shape} != interior "
            f"{plan.interior_shape}")
    p = jnp.pad(arr, plan.layout.pads, mode="edge")
    if bc.any_dynamic:
        p = refresh_dynamic_layout(p, plan.layout, bc,
                                   plan.layout.halo)
    return p


@functools.lru_cache(maxsize=64)
def _cached_tiled_coeff_iterate(plan: TiledPlan, bc: DirichletBC,
                                interpret: bool, grid_halo: int):
    """Coefficient twin of ``_cached_tiled_source_iterate``: the jitted
    runner threads the (static, pre-padded) coefficient operand into
    every kernel call (variable-coefficient FTCS diffusion at tiled-
    kernel speed — vs the fused-XLA ``ops.xla.iterate_fields_dynamic``,
    measured 8.2 GLUPS at 256^3 on v5e)."""
    from stencil_tpu.core.grid import fill_halo
    from stencil_tpu.ops.layout import refresh_dynamic_layout

    sweep = _cached_tiled_sweep(plan, bc, interpret)
    depth = plan.layout.halo
    pins = _dynamic_pins(bc) if bc.any_dynamic else None

    @jax.jit
    def run(data, n_outer, coeff_padded):
        h = grid_halo
        idx = tuple(slice(h, s - h) for s in data.shape)
        cur = plan.layout.pad(data[idx], bc)
        if bc.any_dynamic:
            cur = refresh_dynamic_layout(cur, plan.layout, bc, depth)
        nxt = jnp.copy(cur)

        def body(_, carry):
            c, n = carry
            if bc.any_dynamic:
                out = sweep(c, n, coeff_padded, jnp.asarray(pins))
                out = refresh_dynamic_layout(out, plan.layout, bc, depth)
            else:
                out = sweep(c, n, coeff_padded)
            return (out, c)

        cur, nxt = lax.fori_loop(0, n_outer, body, (cur, nxt))
        out = jnp.pad(plan.layout.unpad(cur), h)
        return fill_halo(out, h, bc)

    return run


@functools.lru_cache(maxsize=32)
def _cached_coeff_apply(plan: TiledPlan, interpret: bool):
    """Jitted single application ``(padded_h1, coeff_padded) ->
    interior`` of the variable-coefficient operator — the Pallas fast
    path behind ``HeterogeneousPoissonProblem.operator_apply`` (the
    matrix-free matvec inside every Krylov iteration).

    The operator must honor the ghost ring of the INPUT array (the
    Krylov solvers call it on ``jnp.pad(e, 1)`` for the zero-wall
    correction operator and once per solve on the true-wall iterate),
    so the halo-1 array's d0/d1 ghost faces are seated into the kernel
    layout after the pad — at ``sweeps_per_call=1`` only the
    face-adjacent ghost layer is ever read, and the radius-1 star
    never reads ghost corners. The coeff layout carries NO d2 ghost
    columns (the kernel synthesizes the lane boundary as zero here),
    so the d2 ghost contribution is added EXACTLY outside the kernel:
    at a wall the harmonic mean edge-replicates (harm(a, a) = a), so
    the face weight on the boundary column is just ``coeff_nb * a``."""
    if plan.sweeps_per_call != 1:
        raise ValueError("operator apply wants a sweeps_per_call=1 plan")
    bc0 = DirichletBC.zero(3)
    sweep = _cached_tiled_sweep(plan, bc0, interpret)
    layout = plan.layout
    (l0, _), (l1, _), (l2, _) = layout.pads
    n0, n1, n2 = layout.interior_shape
    nb = float(plan.coeff_nb)

    @jax.jit
    def apply(padded_h1, coeff_padded):
        cur = layout.pad(padded_h1[1:-1, 1:-1, 1:-1], bc0)
        cur = cur.at[l0 - 1, l1:l1 + n1, l2:l2 + n2].set(
            padded_h1[0, 1:-1, 1:-1])
        cur = cur.at[l0 + n0, l1:l1 + n1, l2:l2 + n2].set(
            padded_h1[-1, 1:-1, 1:-1])
        cur = cur.at[l0:l0 + n0, l1 - 1, l2:l2 + n2].set(
            padded_h1[1:-1, 0, 1:-1])
        cur = cur.at[l0:l0 + n0, l1 + n1, l2:l2 + n2].set(
            padded_h1[1:-1, -1, 1:-1])
        out = sweep(cur, jnp.copy(cur), coeff_padded)
        out = layout.unpad(out)
        a_lo = coeff_padded[l0:l0 + n0, l1:l1 + n1, l2]
        a_hi = coeff_padded[l0:l0 + n0, l1:l1 + n1, l2 + n2 - 1]
        out = out.at[:, :, 0].add(
            nb * a_lo * padded_h1[1:-1, 1:-1, 0])
        out = out.at[:, :, n2 - 1].add(
            nb * a_hi * padded_h1[1:-1, 1:-1, -1])
        return out

    return apply


@functools.lru_cache(maxsize=64)
def _cached_wave_iterate(plan: TiledPlan, bc: DirichletBC,
                         interpret: bool, grid_halo: int):
    """Jitted leapfrog runner over a ``two_level`` plan:
    ``(cur, prev) -> (L_{n+k*n_outer}, L_{n+k*n_outer-1})`` with both
    levels kept in the kernel's padded layout across outer steps (the
    two outputs alias the previous step's freed buffers)."""
    from stencil_tpu.core.grid import fill_halo
    from stencil_tpu.ops.layout import refresh_dynamic_layout

    sweep = _cached_tiled_sweep(plan, bc, interpret)
    depth = plan.layout.halo
    pins = _dynamic_pins(bc) if bc.any_dynamic else None

    @jax.jit
    def run(cur_data, prev_data, n_outer):
        h = grid_halo
        idx = tuple(slice(h, s - h) for s in cur_data.shape)
        cur = plan.layout.pad(cur_data[idx], bc)
        prev = plan.layout.pad(prev_data[idx], bc)
        if bc.any_dynamic:
            cur = refresh_dynamic_layout(cur, plan.layout, bc, depth)
            prev = refresh_dynamic_layout(prev, plan.layout, bc, depth)
        nxt = jnp.copy(cur)
        nxt2 = jnp.copy(prev)

        def body(_, carry):
            c, p, b1, b2 = carry
            if bc.any_dynamic:
                o1, o2 = sweep(c, p, b1, b2, jnp.asarray(pins))
                o1 = refresh_dynamic_layout(o1, plan.layout, bc, depth)
                o2 = refresh_dynamic_layout(o2, plan.layout, bc, depth)
            else:
                o1, o2 = sweep(c, p, b1, b2)
            # the just-read (c, p) become the next step's free buffers
            return (o1, o2, c, p)

        cur, prev, _, _ = lax.fori_loop(0, n_outer, body,
                                        (cur, prev, nxt, nxt2))

        def out(x):
            o = jnp.pad(plan.layout.unpad(x), h)
            return fill_halo(o, h, bc)

        return out(cur), out(prev)

    return run


class TiledPallasStencil:
    """User-facing handle mirroring ``ops.pallas.PallasStencil`` for the
    3D 2D-tiled kernel. ``source`` (interior-shaped, static) makes every
    virtual sweep the affine update ``u' = S(u) + source_scale*source``
    (Jacobi-Poisson relaxation at full kernel speed)."""

    def __init__(self, spec, interior_shape, dtype="float32",
                 sweeps_per_call=1, tiles=None, interpret=False,
                 vmem_budget=None, vmem_limit=None,
                 tap_mode=None, pipeline=True, slots=2, slide=False,
                 cores=1, embed=False, source=None, source_scale=1.0,
                 coeff=None, coeff_scales=None, cheby_coeffs=None,
                 cheby_dual=False):
        if coeff is not None:
            if tap_mode not in (None, "coeff"):
                raise ValueError(
                    f"a coefficient field implies tap_mode='coeff', "
                    f"got {tap_mode!r}")
            tap_mode = "coeff"
            if coeff_scales is None:
                raise ValueError(
                    "coeff needs coeff_scales=(nb, c0, cs)")
            if source is not None:
                raise ValueError(
                    "source + coeff iterate runner not wired yet "
                    "(the kernel supports both; extend "
                    "_cached_tiled_coeff_iterate when a workload "
                    "needs the combination)")
        self.plan = make_tiled_plan(spec, tuple(interior_shape), dtype,
                                    sweeps_per_call, tiles, vmem_budget,
                                    vmem_limit, tap_mode, pipeline, slots,
                                    slide, cores, embed,
                                    has_source=source is not None,
                                    coeff_scales=coeff_scales,
                                    cheby_coeffs=cheby_coeffs,
                                    cheby_dual=cheby_dual)
        self.spec = spec
        self.interpret = interpret
        self.vmem_budget = vmem_budget
        if source is not None \
                and tuple(np.shape(source)) != self.plan.interior_shape:
            raise ValueError(
                f"source shape {tuple(np.shape(source))} != interior "
                f"{self.plan.interior_shape}")
        self.source = source
        self.source_scale = source_scale
        self._src_padded = {}  # bc -> padded source for self.plan
        self.coeff = coeff
        self._coeff_padded = {}  # (plan, bc) -> padded coefficient

    def _padded_source(self, plan: TiledPlan, bc: DirichletBC):
        key = (plan, bc)
        if key not in self._src_padded:
            self._src_padded[key] = pad_source(plan, self.source,
                                               self.source_scale, bc)
        return self._src_padded[key]

    def _padded_coeff(self, plan: TiledPlan, bc: DirichletBC):
        key = (plan, bc)
        if key not in self._coeff_padded:
            self._coeff_padded[key] = pad_coeff(plan, self.coeff, bc)
        return self._coeff_padded[key]

    def prepare(self, grid: HaloGrid):
        padded = self.plan.layout.pad_grid(grid)
        return padded, jnp.array(padded, copy=True)

    def extract(self, padded, grid: HaloGrid) -> HaloGrid:
        interior = self.plan.layout.unpad(padded)
        return HaloGrid.from_interior(interior, halo=grid.halo, bc=grid.bc)

    def _runner(self, bc: DirichletBC):
        return _cached_tiled_runner(self.plan, bc, self.interpret)

    def iterate(self, grid: HaloGrid, iterations: int) -> HaloGrid:
        if jnp.dtype(grid.data.dtype) != jnp.dtype(self.plan.dtype):
            raise ValueError(
                f"grid dtype {grid.data.dtype} != plan dtype "
                f"{self.plan.dtype}; pass dtype= when constructing "
                "TiledPallasStencil")
        sublane = sublane_for_dtype(self.plan.dtype)
        if not self.interpret and self.plan.t1 % sublane:
            # Mosaic hard-crashes (HTTP-500, no diagnostic) on the
            # non-sublane-multiple working window a whole-dim unaligned
            # t1 produces ("slice shape along dimension 2 must be
            # aligned to tiling", round-4 silicon) — only reachable via
            # an explicit tiles= or a d1 extent below the sublane size
            # (AUTO otherwise offers aligned candidates); interpret mode
            # has no such constraint and keeps tiny-grid tests runnable
            raise ValueError(
                f"t1={self.plan.t1} is not a multiple of the sublane "
                f"size {sublane}: Mosaic rejects the unaligned working "
                "window on hardware (pad the grid's d1 to a sublane "
                "multiple, or pick an aligned t1)")
        if grid.bc.any_dynamic:
            # dynamic (periodic/Neumann) d0/d1 run at ANY temporal depth
            # and tap mode: the deep refresh between kernel calls seeds
            # k*r ghost layers and _dynamic_pins disables Dirichlet
            # re-pinning on those faces (synth/rotacc only synthesize
            # the d2 LANE boundary, so they stay legal). A dynamic LANE
            # dim is the one case needing k=1 + a ghost-reading tap
            # mode: the in-VMEM virtual sweeps cannot see the lane face
            # mid-call, and synth modes carry no lane ghosts at all.
            # Neumann leading dims additionally need the spec
            # mirror-symmetric in that dim at k>1: only then does the
            # sweep preserve the mirror extension the deep ghosts seed.
            dyn = grid.bc.dynamic_mask(3)
            neu = grid.bc.neumann_mask(3)
            problems = []
            if dyn[2] and self.plan.sweeps_per_call != 1:
                problems.append(
                    "a periodic/Neumann lane (last) dim needs "
                    "sweeps_per_call=1 (use -k 1)")
            if dyn[2] and self.plan.tap_mode not in ("slice", "roll"):
                problems.append(
                    f"a periodic/Neumann lane (last) dim needs a "
                    f"ghost-reading tap mode, not {self.plan.tap_mode!r} "
                    "(use slice or roll)")
            if self.plan.sweeps_per_call > 1:
                for d in (0, 1):
                    if neu[d] and not self.spec.symmetric_in(d):
                        problems.append(
                            f"a Neumann dim {d} at sweeps_per_call>1 "
                            f"needs the stencil mirror-symmetric in dim "
                            f"{d} (use -k 1 for asymmetric taps)")
            if self.plan.embed:
                problems.append("embed-and-pin is Dirichlet-only")
            if self.plan.slide:
                problems.append(
                    "slide is not supported with periodic/Neumann")
            if problems:
                raise ValueError(
                    "periodic/Neumann BCs on the tiled Pallas kernel: "
                    + "; ".join(problems)
                )
        k = self.plan.sweeps_per_call
        n_outer, rem = divmod(iterations, k)
        data = grid.data
        has_src = self.plan.has_source
        has_cf = self.plan.has_coeff
        if n_outer:
            if has_src:
                run = _cached_tiled_source_iterate(
                    self.plan, grid.bc, self.interpret, grid.halo)
                data = run(data, n_outer,
                           self._padded_source(self.plan, grid.bc))
            elif has_cf:
                run = _cached_tiled_coeff_iterate(
                    self.plan, grid.bc, self.interpret, grid.halo)
                data = run(data, n_outer,
                           self._padded_coeff(self.plan, grid.bc))
            else:
                run = _cached_tiled_iterate(self.plan, grid.bc,
                                            self.interpret, grid.halo)
                data = run(data, n_outer)
        if rem:
            rem_method = TiledPallasStencil(
                self.spec, self.plan.interior_shape, self.plan.dtype,
                sweeps_per_call=rem, interpret=self.interpret,
                tiles=(self.plan.s0, self.plan.t1),
                vmem_budget=self.vmem_budget,
                vmem_limit=self.plan.vmem_limit,
                tap_mode=self.plan.tap_mode,
                pipeline=self.plan.pipeline,
                slots=self.plan.slots,
                slide=self.plan.slide,
                cores=self.plan.cores,
                embed=self.plan.embed,
                source=self.source,
                source_scale=self.source_scale,
                coeff=self.coeff,
                coeff_scales=((self.plan.coeff_nb, self.plan.coeff_c0,
                               self.plan.coeff_cs) if has_cf else None),
                # remainder-length Chebyshev: the recurrence
                # coefficients depend only on the sweep index, so the
                # first `rem` sweeps ARE the degree-rem smoother
                cheby_coeffs=(self.plan.cheby_coeffs[:rem]
                              if self.plan.has_cheby else None),
            )
            if has_src:
                run = _cached_tiled_source_iterate(
                    rem_method.plan, grid.bc, self.interpret, grid.halo)
                data = run(data, 1,
                           self._padded_source(rem_method.plan, grid.bc))
            elif has_cf:
                run = _cached_tiled_coeff_iterate(
                    rem_method.plan, grid.bc, self.interpret, grid.halo)
                data = run(data, 1,
                           self._padded_coeff(rem_method.plan, grid.bc))
            else:
                run = _cached_tiled_iterate(rem_method.plan, grid.bc,
                                            self.interpret, grid.halo)
                data = run(data, 1)
        return HaloGrid(data=data, halo=grid.halo, bc=grid.bc)
