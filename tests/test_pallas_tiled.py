"""Differential tests for the 3D 2D-tiled temporal Pallas kernel
(``ops.pallas_tiled``) in interpreter mode, vs the float64 golden model.

Regression anchors:
  - out_copy must target the aliased OUTPUT ref (writes to the input ref
    vanish in interpret mode and alias-write the input on hardware);
  - pin() must not clobber d2 ghost columns of the shared compute buffer
    (poisons later tiles' ghost-recompute rows — caught only with
    multiple tiles and k >= 3).
"""

import numpy as np
import pytest

from stencil_tpu.core.grid import HaloGrid
from stencil_tpu.core.spec import get_spec, star
from stencil_tpu.ops import golden
from stencil_tpu.ops.pallas_tiled import (
    TiledPallasStencil, choose_tiles, make_tiled_plan,
)


def _check(spec, shape, k, tiles, iters, dtype="float32", atol=5e-6):
    grid = HaloGrid.create(shape, halo=spec.radius, dtype=dtype)
    m = TiledPallasStencil(spec, shape, dtype=dtype, sweeps_per_call=k,
                           tiles=tiles, interpret=True)
    out = m.iterate(grid, iters)
    ref = golden.golden_iterate(
        np.zeros(shape, dtype=np.float64), spec, iters, bc=grid.bc
    )
    np.testing.assert_allclose(
        np.asarray(out.interior(), np.float64), ref, atol=atol, rtol=atol
    )


@pytest.mark.parametrize("k", [1, 2, 4])
def test_star_multi_tile(k):
    _check(get_spec("jacobi7"), (16, 16, 20), k, (8, 8), iters=4)


def test_star_deep_temporal_many_tiles():
    # k=3 with 6 tiles: catches the cross-tile compute-buffer poisoning
    _check(get_spec("jacobi7"), (24, 16, 20), 3, (8, 8), iters=6)


@pytest.mark.parametrize("k", [2, 3])
def test_box_multi_tile(k):
    # box stencils read halo corners: catches later-dims-win violations
    _check(get_spec("jacobi27"), (16, 16, 20), k, (8, 8), iters=4)


def test_radius2(k=2):
    _check(star(3, 2), (16, 16, 20), k, (8, 8), iters=4)


def test_remainder_iterations():
    _check(get_spec("jacobi7"), (12, 24, 20), 3, (4, 8), iters=7)


def test_plan_validation():
    spec = get_spec("jacobi7")
    with pytest.raises(ValueError, match="3D-only"):
        make_tiled_plan(get_spec("jacobi5"), (16, 16))
    with pytest.raises(ValueError, match="exceed"):
        make_tiled_plan(spec, (15, 16, 20), tiles=(16, 8))
    with pytest.raises(ValueError, match="sublane"):
        make_tiled_plan(spec, (16, 12, 20), tiles=(8, 4))


def test_choose_tiles_respects_budget():
    spec = get_spec("jacobi7")
    tiles = choose_tiles(spec, (256, 256, 256), sweeps_per_call=8)
    assert tiles is not None
    s0, t1 = tiles
    assert 256 % s0 == 0 and 256 % t1 == 0 and t1 % 8 == 0
    from stencil_tpu.ops.pallas_tiled import _vmem_bytes, _resolve_budget
    assert _vmem_bytes(spec, (256, 256, 256), "float32", 8, s0, t1) \
        <= _resolve_budget(None)


def test_matches_slab_kernel():
    """Cross-method consistency with the slab kernel."""
    from stencil_tpu.ops.pallas import PallasStencil

    spec = get_spec("jacobi7")
    shape = (16, 16, 20)
    grid = HaloGrid.create(shape, halo=1, dtype="float32")
    a = TiledPallasStencil(spec, shape, sweeps_per_call=2, tiles=(8, 8),
                           interpret=True).iterate(grid, 6)
    b = PallasStencil(spec, shape, sweeps_per_call=2,
                      interpret=True).iterate(grid, 6)
    np.testing.assert_allclose(
        np.asarray(a.interior()), np.asarray(b.interior()),
        atol=2e-6, rtol=2e-6,
    )


@pytest.mark.parametrize("mode", ["roll", "synth", "rotacc"])
def test_tap_modes_match_golden(mode):
    """Alternative tap evaluation strategies are numerically identical to
    the default shifted-slice taps."""
    _check(get_spec("jacobi7"), (16, 16, 20), 3, (8, 8), iters=6)
    grid = HaloGrid.create((16, 16, 20), halo=1, dtype="float32")
    m = TiledPallasStencil(get_spec("jacobi7"), (16, 16, 20),
                           sweeps_per_call=3, tiles=(8, 8), interpret=True,
                           tap_mode=mode)
    out = m.iterate(grid, 6)
    ref = golden.golden_iterate(
        np.zeros((16, 16, 20), np.float64), get_spec("jacobi7"), 6,
        bc=grid.bc,
    )
    np.testing.assert_allclose(
        np.asarray(out.interior(), np.float64), ref, atol=5e-6, rtol=5e-6
    )


def test_synth_box_corners():
    # box stencil diagonal taps exercise the synthesized boundary columns
    grid = HaloGrid.create((16, 16, 20), halo=1, dtype="float32")
    m = TiledPallasStencil(get_spec("jacobi27"), (16, 16, 20),
                           sweeps_per_call=2, tiles=(8, 8), interpret=True,
                           tap_mode="synth")
    out = m.iterate(grid, 4)
    ref = golden.golden_iterate(
        np.zeros((16, 16, 20), np.float64), get_spec("jacobi27"), 4,
        bc=grid.bc,
    )
    np.testing.assert_allclose(
        np.asarray(out.interior(), np.float64), ref, atol=5e-6, rtol=5e-6
    )


def test_synth_layout_has_no_d2_ghosts():
    from stencil_tpu.ops.pallas_tiled import make_tiled_plan

    plan = make_tiled_plan(get_spec("jacobi7"), (16, 16, 128), tiles=(8, 8),
                           tap_mode="synth")
    assert plan.layout.pads[2] == (0, 0)
    assert plan.layout.padded_shape[2] == 128


def test_serialized_dma_matches_golden():
    # pipeline=False = serialized-DMA measurement baseline (overlap.md);
    # must be numerically identical to the double-buffered pipeline
    grid = HaloGrid.create((16, 16, 24), halo=1, dtype="float32")
    m = TiledPallasStencil(get_spec("jacobi7"), (16, 16, 24),
                           sweeps_per_call=2, interpret=True,
                           pipeline=False)
    out = m.iterate(grid, 6)
    ref = golden.golden_iterate(
        np.zeros((16, 16, 24), np.float64), get_spec("jacobi7"), 6,
        bc=grid.bc,
    )
    np.testing.assert_allclose(
        np.asarray(out.interior(), np.float64), ref, atol=5e-6, rtol=5e-6
    )


def test_bf16_defaults_to_synth_and_matches_golden():
    # 16-bit lane rolls lower through ops.rolls.lane_roll (int32 bitcast);
    # bf16 therefore gets synth-mode taps (round 1 fell back to slice)
    grid = HaloGrid.create((16, 16, 24), halo=1, dtype="bfloat16")
    m = TiledPallasStencil(get_spec("jacobi7"), (16, 16, 24), "bfloat16",
                           sweeps_per_call=2, interpret=True)
    assert m.plan.tap_mode == "synth"
    out = m.iterate(grid, 4)
    ref = golden.golden_iterate(
        np.zeros((16, 16, 24), np.float64), get_spec("jacobi7"), 4,
        bc=grid.bc,
    )
    np.testing.assert_allclose(
        np.asarray(out.interior(), np.float64), ref, atol=3e-2, rtol=3e-2
    )


def test_bf16_box_separable_synth():
    grid = HaloGrid.create((16, 16, 24), halo=1, dtype="bfloat16")
    m = TiledPallasStencil(get_spec("jacobi27"), (16, 16, 24), "bfloat16",
                           sweeps_per_call=2, tiles=(8, 16), interpret=True)
    assert m.plan.tap_mode == "synth"
    out = m.iterate(grid, 4)
    ref = golden.golden_iterate(
        np.zeros((16, 16, 24), np.float64), get_spec("jacobi27"), 4,
        bc=grid.bc,
    )
    np.testing.assert_allclose(
        np.asarray(out.interior(), np.float64), ref, atol=3e-2, rtol=3e-2
    )


@pytest.mark.parametrize("specname,tiles", [
    ("laplace3d_ho", (8, 8)),   # radius-2 star: the rotacc target config
    ("jacobi27", (8, 16)),      # uniform box: separable rotacc path
    ("star3d_r2", None),
])
def test_rotacc_specs_match_golden(specname, tiles):
    # full-extent rotate-accumulate: ONE misaligned slice per sweep
    # instead of one per d0/d1 tap (see taps_rotacc docstring)
    spec = get_spec(specname)
    shape = (16, 16, 24)
    grid = HaloGrid.create(shape, halo=spec.radius, dtype="float32")
    m = TiledPallasStencil(spec, shape, sweeps_per_call=2, tiles=tiles,
                           interpret=True, tap_mode="rotacc")
    out = m.iterate(grid, 4)
    ref = golden.golden_iterate(
        np.zeros(shape, np.float64), spec, 4, bc=grid.bc,
    )
    np.testing.assert_allclose(
        np.asarray(out.interior(), np.float64), ref, atol=5e-6, rtol=5e-6
    )


def test_rotacc_rejects_16bit():
    with pytest.raises(ValueError, match="rotacc"):
        TiledPallasStencil(get_spec("jacobi7"), (16, 16, 24), "bfloat16",
                           sweeps_per_call=2, tap_mode="rotacc")


def test_rotacc_layout_has_no_d2_ghosts():
    m = TiledPallasStencil(get_spec("laplace3d_ho"), (16, 16, 24),
                           sweeps_per_call=2, tiles=(8, 8), interpret=True,
                           tap_mode="rotacc")
    assert m.plan.layout.pads[2] == (0, 104)


def test_radius3_star_matches_golden():
    # the framework is general-radius (reference: only DMA's general
    # path supports r>1, stencil_dma.cpp:632-649); radius 3 exercises
    # deeper halos and wider rotate distances than any BASELINE config
    spec = star(3, 3)
    shape = (16, 16, 24)
    grid = HaloGrid.create(shape, halo=3, dtype="float32")
    m = TiledPallasStencil(spec, shape, sweeps_per_call=1, tiles=(8, 8),
                           interpret=True)
    out = m.iterate(grid, 3)
    ref = golden.golden_iterate(np.zeros(shape, np.float64), spec, 3,
                                bc=grid.bc)
    np.testing.assert_allclose(
        np.asarray(out.interior(), np.float64), ref, atol=5e-6, rtol=5e-6
    )


def test_random_specs_all_tap_modes_agree():
    # property-style: random sparse 3D specs (incl. diagonal taps) must
    # produce identical results under every tap evaluation strategy
    from stencil_tpu.core.spec import weighted

    rng = np.random.default_rng(7)
    shape = (16, 16, 24)
    for trial in range(3):
        n_taps = int(rng.integers(3, 9))
        offs = set()
        while len(offs) < n_taps:
            offs.add(tuple(int(o) for o in rng.integers(-1, 2, size=3)))
        taps = [(o, float(rng.uniform(-0.3, 0.3))) for o in offs]
        sp = weighted(3, taps, name=f"rand{trial}")
        grid = HaloGrid.create(shape, halo=sp.radius, dtype="float32")
        outs = {}
        for mode in ("slice", "roll", "synth", "rotacc"):
            m = TiledPallasStencil(sp, shape, sweeps_per_call=2,
                                   tiles=(8, 8), interpret=True,
                                   tap_mode=mode)
            outs[mode] = np.asarray(m.iterate(grid, 4).interior())
        for mode in ("roll", "synth", "rotacc"):
            np.testing.assert_allclose(
                outs[mode], outs["slice"], atol=2e-6, rtol=2e-6,
                err_msg=f"{mode} disagrees with slice on trial {trial}",
            )


def test_default_plans_match_measured_winners():
    """The defaults encode measured v5e winners (baseline_configs.md);
    changing choose_tiles/tap-mode heuristics must be deliberate."""
    p = make_tiled_plan(get_spec("jacobi7"), (256, 256, 256), "float32",
                        sweeps_per_call=8)
    assert (p.s0, p.t1, p.tap_mode) == (64, 64, "rotacc")
    p = make_tiled_plan(get_spec("jacobi7"), (256, 256, 256), "bfloat16",
                        sweeps_per_call=8)
    assert (p.s0, p.t1, p.tap_mode) == (64, 128, "synth")
    p = make_tiled_plan(get_spec("laplace3d_ho"), (384, 384, 384),
                        "float32", sweeps_per_call=4)
    assert (p.s0, p.t1, p.tap_mode) == (64, 64, "rotacc")
    # rotacc plans carry the rolled-temporary headroom in the limit
    assert p.vmem_limit >= 80 * 2**20


def test_full_d1_default_avoids_rotacc_sublane_rolls():
    # whole-dim d1 tiles with a non-sublane-multiple extent give a
    # misaligned sublane dim; the DEFAULT avoids rotacc's sublane
    # rotates there (untested-on-hardware Mosaic pattern), explicit
    # rotacc is honored
    p = make_tiled_plan(get_spec("jacobi7"), (16, 20, 24), tiles=(8, 20))
    assert p.tap_mode == "synth"
    p = make_tiled_plan(get_spec("jacobi7"), (16, 20, 24), tiles=(8, 20),
                        tap_mode="rotacc")
    assert p.tap_mode == "rotacc"


def test_remainder_keeps_pinned_tiles():
    m = TiledPallasStencil(get_spec("jacobi7"), (16, 16, 24),
                           sweeps_per_call=3, tiles=(8, 8), interpret=True)
    grid = HaloGrid.create((16, 16, 24), halo=1, dtype="float32")
    out = m.iterate(grid, 7)  # 2 outer steps + remainder 1
    ref = golden.golden_iterate(np.zeros((16, 16, 24), np.float64),
                                get_spec("jacobi7"), 7, bc=grid.bc)
    np.testing.assert_allclose(np.asarray(out.interior(), np.float64), ref,
                               atol=5e-6, rtol=5e-6)


@pytest.mark.parametrize("mode", ["slice", "synth", "rotacc"])
def test_3d_custom_bc_all_tap_modes(mode):
    """Per-face Dirichlet values flow through every tap strategy's
    boundary synthesis (the in-register lane masks carry the d2 face
    values; pins carry d0/d1) — a box spec reads every halo corner."""
    from stencil_tpu.core.grid import DirichletBC

    bc = DirichletBC(values=((2.0, -1.0), (0.5, 3.0), (-2.5, 4.0)))
    shape = (16, 16, 20)
    grid = HaloGrid.create(shape, halo=1, dtype="float32", bc=bc)
    m = TiledPallasStencil(get_spec("jacobi27"), shape, sweeps_per_call=2,
                           tiles=(8, 8), interpret=True, tap_mode=mode)
    out = m.iterate(grid, 4)
    ref = golden.golden_iterate(np.zeros(shape, np.float64),
                                get_spec("jacobi27"), 4, bc=bc)
    np.testing.assert_allclose(
        np.asarray(out.interior(), np.float64), ref, atol=5e-6, rtol=5e-6
    )


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("mode", ["slice", "roll", "synth", "rotacc"])
def test_every_tap_mode_dtype_combo_is_safe(mode, dtype):
    """Every tap_mode x dtype combination either matches golden or raises
    a clean ValueError at plan time — no combination may reach Mosaic
    with a member of the bisected-crasher family (raw ``pltpu.roll`` on
    sub-32-bit dtypes: roll and rotacc both sublane-rotate, so both are
    gated to 4-byte dtypes; synth lane-rotates through the int32 bitcast
    of ``ops.rolls.lane_roll`` and is the supported 16-bit fast path)."""
    spec = get_spec("jacobi7")
    shape = (16, 16, 24)
    grid = HaloGrid.create(shape, halo=1, dtype=dtype)
    tiles = (8, 8) if dtype == "float32" else (8, 16)  # t1 % sublane == 0
    gated = mode in ("roll", "rotacc") and dtype == "bfloat16"
    if gated:
        with pytest.raises(ValueError, match=mode):
            TiledPallasStencil(spec, shape, dtype, sweeps_per_call=2,
                               tiles=tiles, interpret=True, tap_mode=mode)
        return
    m = TiledPallasStencil(spec, shape, dtype, sweeps_per_call=2,
                           tiles=tiles, interpret=True, tap_mode=mode)
    out = m.iterate(grid, 4)
    ref = golden.golden_iterate(np.zeros(shape, np.float64), spec, 4,
                                bc=grid.bc)
    tol = 3e-2 if dtype == "bfloat16" else 5e-6
    np.testing.assert_allclose(
        np.asarray(out.interior(), np.float64), ref, atol=tol, rtol=tol
    )


@pytest.mark.parametrize("shape,k,tiles", [
    ((15, 17, 20), 2, (8, 8)),    # ragged d0 + d1 (unaligned clamp, extra1>0)
    ((13, 23, 19), 3, (8, 8)),    # ragged everything incl. n2
    ((16, 20, 20), 2, (8, 8)),    # ragged d1 only
    ((20, 16, 20), 2, (8, 8)),    # ragged d0 only
    ((17, 17, 17), 1, (8, 8)),    # prime-ish dims, k=1
])
def test_ragged_grids_match_golden(shape, k, tiles):
    """Non-divisible grids run on the fast tiled path via clamped
    overlapping last tiles (the capability the reference documents but
    never implemented: /root/reference/include/stencil/
    program_options.hpp:11-14 'multiple rounds'; its DMA kernels silently
    SKIP out-of-range tiles, boundary_matrix.hpp:199-207)."""
    _check(get_spec("jacobi7"), shape, k, tiles, iters=2 * k)


@pytest.mark.parametrize("mode", ["slice", "synth", "rotacc"])
def test_ragged_box_all_tap_modes(mode):
    # box stencils read halo corners; ragged clamps must preserve the
    # later-dims-win corner rule in the re-pinned overhang rows
    spec = get_spec("jacobi27")
    shape = (15, 21, 19)
    grid = HaloGrid.create(shape, halo=1, dtype="float32")
    m = TiledPallasStencil(spec, shape, sweeps_per_call=2, tiles=(8, 8),
                           interpret=True, tap_mode=mode)
    out = m.iterate(grid, 4)
    ref = golden.golden_iterate(np.zeros(shape, np.float64), spec, 4,
                                bc=grid.bc)
    np.testing.assert_allclose(
        np.asarray(out.interior(), np.float64), ref, atol=5e-6, rtol=5e-6
    )


def test_mid_tile_deep_temporal_overhang_regression():
    """k=8 r=2 with 8x8 tiles on a DIVISIBLE grid: the per-sweep recompute
    extension (k-t)*r = up to 14 rows exceeds the 8-row tile pitch, so MID
    tiles compute into the physical ghost zone between sweeps. The round-2
    kernel pinned edge tiles only and silently read those stencil-updated
    ghost rows back (measured 8e-5 vs golden); the dynamic-threshold pin
    bands fix it."""
    _check(star(3, 2), (16, 24, 20), 8, (8, 8), iters=8)


def test_ragged_choose_tiles_feasible():
    # choose_tiles must return a feasible tiling for prime-ish dims
    # (round 2 returned None and the CLI fell to the 10x slower XLA path)
    spec = get_spec("jacobi7")
    tiles = choose_tiles(spec, (257, 257, 257), sweeps_per_call=8)
    assert tiles is not None
    s0, t1 = tiles
    assert s0 <= 257 and t1 <= 257 and t1 % 8 == 0


@pytest.mark.parametrize("slots", [3, 4])
def test_deeper_dma_pipeline_matches_golden(slots):
    # slots>2: deeper input prefetch (i+S lookahead) must be numerically
    # identical; 6 tiles exercise slot-index wraparound at S != 2
    grid = HaloGrid.create((24, 16, 20), halo=1, dtype="float32")
    m = TiledPallasStencil(get_spec("jacobi7"), (24, 16, 20),
                           sweeps_per_call=2, tiles=(8, 8), interpret=True,
                           slots=slots)
    out = m.iterate(grid, 4)
    ref = golden.golden_iterate(np.zeros((24, 16, 20), np.float64),
                                get_spec("jacobi7"), 4, bc=grid.bc)
    np.testing.assert_allclose(
        np.asarray(out.interior(), np.float64), ref, atol=5e-6, rtol=5e-6
    )


@pytest.mark.parametrize("k,spec_name", [
    (1, "jacobi7"), (3, "jacobi7"), (2, "jacobi27"),
])
def test_sliding_window_reuse_matches_golden(k, spec_name):
    """slide=True: only the first tile per d0 row fetches a full window;
    later tiles VMEM-copy the 2*p1 overlap rows from the previous slot
    and fetch t1 new rows. Numerically identical to the full-fetch
    schedule; 3 d1 tiles x 2 d0 rows exercise the row-start reset and
    the overlap chain."""
    spec = get_spec(spec_name)
    shape = (16, 48, 20)
    grid = HaloGrid.create(shape, halo=spec.radius, dtype="float32")
    m = TiledPallasStencil(spec, shape, sweeps_per_call=k, tiles=(8, 16),
                           interpret=True, slide=True)
    assert m.plan.slide
    out = m.iterate(grid, 2 * k)
    ref = golden.golden_iterate(np.zeros(shape, np.float64), spec, 2 * k,
                                bc=grid.bc)
    np.testing.assert_allclose(
        np.asarray(out.interior(), np.float64), ref, atol=5e-6, rtol=5e-6
    )


def test_slide_bitwise_matches_full_fetch():
    spec = get_spec("jacobi7")
    shape = (16, 48, 20)
    grid = HaloGrid.create(shape, halo=1, dtype="float32")
    a = TiledPallasStencil(spec, shape, sweeps_per_call=2, tiles=(8, 16),
                           interpret=True, slide=True).iterate(grid, 4)
    b = TiledPallasStencil(spec, shape, sweeps_per_call=2, tiles=(8, 16),
                           interpret=True).iterate(grid, 4)
    np.testing.assert_array_equal(np.asarray(a.interior()),
                                  np.asarray(b.interior()))


def test_slide_validation():
    spec = get_spec("jacobi7")
    with pytest.raises(ValueError, match="d1-divisible"):
        make_tiled_plan(spec, (16, 20, 20), tiles=(8, 8), slide=True,
                        sweeps_per_call=2)
    with pytest.raises(ValueError, match="t1 >= 2\\*p1"):
        make_tiled_plan(spec, (16, 16, 20), tiles=(8, 8), slide=True,
                        sweeps_per_call=2)
    with pytest.raises(ValueError, match="pipelined"):
        make_tiled_plan(spec, (16, 48, 20), tiles=(8, 16), slide=True,
                        sweeps_per_call=2, pipeline=False)


def test_vmem_limit_stays_on_fast_side_of_the_cliff():
    """The scoped-VMEM limit VALUE changes Mosaic's schedule: the
    headline plan (jacobi7 k=8 64x64 rotacc) measured 111 GLUPS at a
    56.36MB limit and ~93 at >=58.8MB on v5e (A/B, identical plans).
    Keep the known-fast classes bit-exact and give the measured-OOM
    classes (non-rotacc radius>=2, slide) their needed margin."""
    from stencil_tpu.core.spec import get_spec as gs

    p = make_tiled_plan(gs("jacobi7"), (256, 256, 256), sweeps_per_call=8,
                        tiles=(64, 64))
    assert p.vmem_limit == 56360960  # the round-2 measured-fast value
    p2 = make_tiled_plan(gs("laplace3d_ho"), (384, 384, 384),
                         sweeps_per_call=4, tiles=(64, 64),
                         tap_mode="synth")
    assert p2.vmem_limit >= 67_300_000   # measured need 64.28M + reserve
    p3 = make_tiled_plan(gs("jacobi7"), (256, 256, 256), sweeps_per_call=8,
                         tiles=(64, 128), dtype="bfloat16")
    assert p3.vmem_limit == 48 * 1024 * 1024
    p4 = make_tiled_plan(gs("laplace3d_ho"), (384, 384, 384),
                         sweeps_per_call=4, tiles=(64, 96),
                         tap_mode="synth", slide=True)
    assert p4.vmem_limit <= 125_000_000  # under the 128MB chip
    # bf16 radius>=2 synth is its own class (round-4 silicon): Mosaic
    # wanted 86.85M for the default (64,128) plan and 49.23M for
    # (64,64) — the fp32-fitted margins compile-OOM'd. Keep both above
    # measured need + Mosaic's ~3MB reserve.
    p5 = make_tiled_plan(gs("laplace3d_ho"), (384, 384, 384),
                         sweeps_per_call=4, tiles=(64, 128),
                         dtype="bfloat16", tap_mode="synth")
    assert p5.vmem_limit >= 90_000_000
    p6 = make_tiled_plan(gs("laplace3d_ho"), (384, 384, 384),
                         sweeps_per_call=4, tiles=(64, 64),
                         dtype="bfloat16", tap_mode="synth")
    assert p6.vmem_limit >= 52_500_000
    # many-tap box stencils in the ghost-reading modes are their own
    # class (round-4 silicon bisect: jacobi27 slice 128^3 k=1 default
    # tiles compile at 88M, OOM at 84M, against a 43.8M estimate —
    # the old 54.8M limit hard-failed); star specs keep round-2 values
    for tm in ("slice", "roll"):
        p7 = make_tiled_plan(gs("jacobi27"), (128, 128, 128),
                             tiles=(64, 128), tap_mode=tm)
        assert p7.vmem_limit >= 88 * 2**20, (tm, p7.vmem_limit)
    p8 = make_tiled_plan(gs("jacobi7"), (128, 128, 128),
                         tiles=(64, 128), tap_mode="slice")
    assert p8.vmem_limit == 57_466_880  # round-2 value, untouched


def test_auto_tiles_never_pick_unaligned_whole_dim_t1():
    """Mosaic rejects a non-sublane-multiple window extent on hardware
    (round-4 silicon: the 125x130x135 auto plan picked t1=130 and its
    146-row working window crashed the compile) — AUTO must offer the
    whole dim only when aligned or when nothing else fits."""
    spec = get_spec("jacobi7")
    s0, t1 = choose_tiles(spec, (125, 130, 135), sweeps_per_call=4)
    assert t1 % 8 == 0, (s0, t1)
    p = make_tiled_plan(spec, (125, 130, 135), sweeps_per_call=4)
    assert p.t1 % 8 == 0
    # tiny dims below the sublane size still get the whole-dim fallback
    p_tiny = make_tiled_plan(spec, (6, 6, 6))
    assert p_tiny.t1 == 6
    # aligned whole dims keep their candidate
    assert choose_tiles(spec, (16, 24, 20), sweeps_per_call=1)[1] in (8, 16, 24)


def test_ragged_ceil_candidates_improve_fetch_ratio():
    """Properly ragged dims get ceil-division tile candidates (e.g. 257
    rows as 3 tiles of 88 instead of 5 of 64), cutting the clamp
    overlap; divisible dims are untouched so the measured-pinned
    defaults cannot shift."""
    spec = get_spec("jacobi7")
    assert choose_tiles(spec, (256, 256, 256), sweeps_per_call=8) == (64, 64)
    s0, t1 = choose_tiles(spec, (257, 257, 257), sweeps_per_call=8)
    # the ceil candidates must beat the power-of-two-only ratio 2.42
    from fractions import Fraction
    kr, p1 = 8, 8
    nt0, nt1 = -(-257 // s0), -(-257 // t1)
    ratio = Fraction(nt0 * nt1 * (s0 + 2 * kr) * (t1 + 2 * p1), 257 * 257)
    assert float(ratio) < 2.2


def test_ragged_auto_tiles_match_golden():
    # end-to-end through the chooser (not explicit tiles): the new
    # ceil-division candidates must be correct, not just well-ranked
    _check(get_spec("jacobi7"), (33, 29, 20), 2, None, iters=4)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_random_ragged_shapes(seed):
    """Seeded fuzz over arbitrary (mostly ragged) 3D shapes x spec x k
    through the auto tile chooser — the clamp/pin/ceil-candidate
    machinery must hold for shapes nobody hand-picked."""
    rng = np.random.default_rng(seed + 100)
    spec = [get_spec("jacobi7"), star(3, 2), get_spec("jacobi27")][seed % 3]
    shape = tuple(int(rng.integers(9, 28)) for _ in range(3))
    k = int(rng.integers(1, 4))
    _check(spec, shape, k, None, iters=2 * k)


def test_tile_subset_phases_compose_bitwise():
    """partition_tiles + subset sweeps: running the interior-tile kernel
    then the edge-tile kernel (output aliasing threading the untouched
    tiles through) must be bitwise identical to the fused sweep — the
    correctness half of the overlapped sharded path."""
    from stencil_tpu.core.grid import DirichletBC
    from stencil_tpu.ops.pallas_tiled import (
        build_tiled_sweep, make_tiled_plan, partition_tiles,
    )

    spec = get_spec("jacobi7")
    plan = make_tiled_plan(spec, (24, 24, 20), sweeps_per_call=2,
                           tiles=(8, 8))
    interior, edge = partition_tiles(plan)
    assert interior and edge and len(interior) + len(edge) == 9
    bc = DirichletBC.reference_default(3)
    grid = HaloGrid.create((24, 24, 20), halo=1, dtype="float32")
    cur = plan.layout.pad(grid.interior(), bc)
    nxt = np.array(cur, copy=True)

    import jax.numpy as jnp

    full = build_tiled_sweep(plan, bc, interpret=True)
    s_int = build_tiled_sweep(plan, bc, interpret=True, subset=interior)
    s_edge = build_tiled_sweep(plan, bc, interpret=True, subset=edge)

    ref = full(jnp.asarray(cur), jnp.asarray(nxt))
    part = s_int(jnp.asarray(cur), jnp.asarray(nxt))
    out = s_edge(jnp.asarray(cur), part)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_tile_subset_phases_compose_bitwise_ragged():
    """Phase split over a RAGGED grid: partition_tiles must classify the
    clamped last tiles correctly (their r0/c1 are the clamp values, not
    i*tile), and the composed phases must stay bitwise."""
    from stencil_tpu.core.grid import DirichletBC
    from stencil_tpu.ops.pallas_tiled import (
        build_tiled_sweep, make_tiled_plan, partition_tiles,
    )
    import jax.numpy as jnp

    spec = get_spec("jacobi7")
    plan = make_tiled_plan(spec, (27, 29, 20), sweeps_per_call=2,
                           tiles=(8, 8))
    interior, edge = partition_tiles(plan)
    assert interior and edge
    bc = DirichletBC.reference_default(3)
    grid = HaloGrid.create((27, 29, 20), halo=1, dtype="float32")
    cur = jnp.asarray(plan.layout.pad(grid.interior(), bc))
    nxt = jnp.array(cur, copy=True)

    full = build_tiled_sweep(plan, bc, interpret=True)
    s_int = build_tiled_sweep(plan, bc, interpret=True, subset=interior)
    s_edge = build_tiled_sweep(plan, bc, interpret=True, subset=edge)

    ref = full(cur, nxt)
    out = s_edge(cur, s_int(cur, nxt))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


# ---- multi-core parallel-grid schedule (round-3 verdict item 6) ----------


@pytest.mark.parametrize("cores", [2, 3])
def test_cores_bitwise_matches_single_core(cores):
    """cores > 1 walks the same tiles in per-chunk pipelined order —
    the result must be BITWISE identical to the gridless schedule (same
    tap order per tile, disjoint outputs)."""
    spec = get_spec("jacobi7")
    shape = (16, 32, 20)
    grid = HaloGrid.create(shape, halo=1, dtype="float32")
    a = TiledPallasStencil(spec, shape, sweeps_per_call=2, tiles=(8, 8),
                           interpret=True, cores=cores).iterate(grid, 4)
    b = TiledPallasStencil(spec, shape, sweeps_per_call=2, tiles=(8, 8),
                           interpret=True).iterate(grid, 4)
    np.testing.assert_array_equal(np.asarray(a.interior()),
                                  np.asarray(b.interior()))


def test_cores_ragged_and_box_matches_golden():
    """Chunked walks over clamped (ragged) tiles and a box stencil."""
    spec = get_spec("jacobi27")
    shape = (13, 22, 18)
    grid = HaloGrid.create(shape, halo=1, dtype="float32")
    m = TiledPallasStencil(spec, shape, sweeps_per_call=2, tiles=(8, 8),
                           interpret=True, cores=2)
    out = m.iterate(grid, 4)
    ref = golden.golden_iterate(np.zeros(shape, np.float64), spec, 4,
                                bc=grid.bc)
    np.testing.assert_allclose(np.asarray(out.interior(), np.float64),
                               ref, atol=5e-6, rtol=5e-6)


def test_cores_more_than_tiles():
    """cores exceeding the tile count leaves the surplus grid steps as
    empty chunks (lo >= hi) — still correct."""
    spec = get_spec("jacobi7")
    shape = (16, 16, 20)  # 2x2 tiles at (8, 8)
    grid = HaloGrid.create(shape, halo=1, dtype="float32")
    a = TiledPallasStencil(spec, shape, sweeps_per_call=2, tiles=(8, 8),
                           interpret=True, cores=6).iterate(grid, 4)
    b = TiledPallasStencil(spec, shape, sweeps_per_call=2, tiles=(8, 8),
                           interpret=True).iterate(grid, 4)
    np.testing.assert_array_equal(np.asarray(a.interior()),
                                  np.asarray(b.interior()))


def test_cores_serialized_schedule():
    spec = get_spec("jacobi7")
    shape = (16, 32, 20)
    grid = HaloGrid.create(shape, halo=1, dtype="float32")
    a = TiledPallasStencil(spec, shape, sweeps_per_call=2, tiles=(8, 8),
                           interpret=True, cores=2,
                           pipeline=False).iterate(grid, 4)
    b = TiledPallasStencil(spec, shape, sweeps_per_call=2, tiles=(8, 8),
                           interpret=True).iterate(grid, 4)
    np.testing.assert_array_equal(np.asarray(a.interior()),
                                  np.asarray(b.interior()))


def test_cores_validation():
    spec = get_spec("jacobi7")
    with pytest.raises(ValueError, match="cores"):
        make_tiled_plan(spec, (16, 48, 20), tiles=(8, 16), cores=0)
    with pytest.raises(ValueError, match="slide"):
        make_tiled_plan(spec, (16, 48, 20), tiles=(8, 16), cores=2,
                        slide=True, sweeps_per_call=2)


# ---- embed-and-pin ragged strategy (round-3 verdict item 8) --------------


@pytest.mark.parametrize("shape,k,tiles", [
    ((13, 22, 18), 1, (8, 8)),     # ragged d0+d1, box-friendly smalls
    ((13, 22, 18), 2, (8, 8)),     # + temporal (pin bands live)
    ((17, 17, 20), 4, (8, 8)),     # deep k: recompute crosses overhang
    ((23, 16, 20), 2, (6, 8)),     # ragged d0 only, non-pow2 s0
    ((16, 21, 20), 2, (8, 8)),     # ragged d1 only
])
def test_embed_matches_golden(shape, k, tiles):
    spec = get_spec("jacobi7")
    grid = HaloGrid.create(shape, halo=spec.radius, dtype="float32")
    m = TiledPallasStencil(spec, shape, sweeps_per_call=k, tiles=tiles,
                           interpret=True, embed=True)
    assert m.plan.embed
    out = m.iterate(grid, 2 * k)
    ref = golden.golden_iterate(np.zeros(shape, np.float64), spec, 2 * k,
                                bc=grid.bc)
    np.testing.assert_allclose(np.asarray(out.interior(), np.float64),
                               ref, atol=5e-6, rtol=5e-6)


def test_embed_box_and_custom_bc():
    """Box stencil reads corners of the thick ghosts — later-dims-win
    values must hold there; distinct per-face values make a wrong corner
    visible."""
    from stencil_tpu.core.grid import DirichletBC

    spec = get_spec("jacobi27")
    shape = (13, 21, 18)
    bc = DirichletBC(values=((0.25, -1.0), (2.0, 0.5), (-0.75, 1.5)))
    grid = HaloGrid.create(shape, halo=spec.radius, dtype="float32", bc=bc)
    m = TiledPallasStencil(spec, shape, sweeps_per_call=2, tiles=(8, 8),
                           interpret=True, embed=True)
    out = m.iterate(grid, 4)
    ref = golden.golden_iterate(np.zeros(shape, np.float64), spec, 4,
                                bc=bc)
    np.testing.assert_allclose(np.asarray(out.interior(), np.float64),
                               ref, atol=5e-6, rtol=5e-6)


def test_embed_bitwise_matches_clamp():
    """Same tiles, same tap order per point: embed and clamp must agree
    BITWISE on the interior (the overlap rows clamp computes twice carry
    identical values; embed's ghost rows are outside the interior)."""
    spec = get_spec("jacobi7")
    shape = (13, 22, 20)
    grid = HaloGrid.create(shape, halo=1, dtype="float32")
    a = TiledPallasStencil(spec, shape, sweeps_per_call=2, tiles=(8, 8),
                           interpret=True, embed=True).iterate(grid, 4)
    b = TiledPallasStencil(spec, shape, sweeps_per_call=2, tiles=(8, 8),
                           interpret=True).iterate(grid, 4)
    np.testing.assert_array_equal(np.asarray(a.interior()),
                                  np.asarray(b.interior()))


def test_embed_enables_slide_on_ragged_d1():
    """Ragged d1 is slide-illegal under clamp but legal under embed —
    and matches golden."""
    spec = get_spec("jacobi7")
    shape = (16, 43, 20)
    with pytest.raises(ValueError, match="embed"):
        make_tiled_plan(spec, shape, tiles=(8, 16), slide=True,
                        sweeps_per_call=2)
    grid = HaloGrid.create(shape, halo=1, dtype="float32")
    m = TiledPallasStencil(spec, shape, sweeps_per_call=2, tiles=(8, 16),
                           interpret=True, embed=True, slide=True)
    out = m.iterate(grid, 4)
    ref = golden.golden_iterate(np.zeros(shape, np.float64), spec, 4,
                                bc=grid.bc)
    np.testing.assert_allclose(np.asarray(out.interior(), np.float64),
                               ref, atol=5e-6, rtol=5e-6)


def test_embed_divisible_grid_is_identity():
    spec = get_spec("jacobi7")
    p = make_tiled_plan(spec, (16, 16, 20), tiles=(8, 8),
                        sweeps_per_call=2, embed=True)
    q = make_tiled_plan(spec, (16, 16, 20), tiles=(8, 8),
                        sweeps_per_call=2)
    assert p.layout == q.layout


def test_embed_with_cores_matches_golden():
    spec = get_spec("jacobi7")
    shape = (13, 22, 18)
    grid = HaloGrid.create(shape, halo=1, dtype="float32")
    a = TiledPallasStencil(spec, shape, sweeps_per_call=2, tiles=(8, 8),
                           interpret=True, embed=True,
                           cores=2).iterate(grid, 4)
    b = TiledPallasStencil(spec, shape, sweeps_per_call=2, tiles=(8, 8),
                           interpret=True, embed=True).iterate(grid, 4)
    np.testing.assert_array_equal(np.asarray(a.interior()),
                                  np.asarray(b.interior()))


def test_fat_lane_default_budget_widens():
    """Round-4 silicon: at P2 >= 512 the window-byte estimate scales
    with the lane dim and the default budget pruned the measured
    winners (512^3 (64,64) = 95.8 GLUPS vs 89-91 for every 52MB tile;
    256x256x1024 (64,32) = 84.5 vs 78.8). The defaulted budget widens
    for fp32 synth/rotacc at fat lanes; explicit budgets and every
    P2 <= 384 pinned winner stay untouched."""
    spec = get_spec("jacobi7")
    assert choose_tiles(spec, (512, 512, 512), sweeps_per_call=8,
                        tap_mode="rotacc") == (64, 64)
    assert choose_tiles(spec, (256, 256, 256), sweeps_per_call=8,
                        tap_mode="rotacc") == (64, 64)
    # explicit budget: no widening
    assert choose_tiles(spec, (512, 512, 512), sweeps_per_call=8,
                        tap_mode="rotacc",
                        vmem_budget=52 * 2**20) != (64, 64)
    # bf16 keeps the conservative budget (large bf16 windows are the
    # bisected Mosaic-crasher family)
    t_bf16 = choose_tiles(spec, (512, 512, 512), dtype="bfloat16",
                          sweeps_per_call=8, tap_mode="synth")
    from stencil_tpu.ops.pallas_tiled import _vmem_bytes, _resolve_budget
    assert _vmem_bytes(spec, (512, 512, 512), "bfloat16", 8, *t_bf16,
                       "synth") <= _resolve_budget(None)


def test_doubled_stream_default_budget_and_winners():
    """Round-5 silicon refit (results/ROUND5.md sec 3): the doubled-
    input-stream classes (fused source, two-level wave, coeff) widen
    the default budget to 118/128 of device VMEM, after which the
    fetch-ratio model picks the measured winners — with the one pinned
    ratio exception (source 256^3 (32,64), 102.9 vs 91.7 measured
    twice; 512^3 flips back to the ratio winner (64,64))."""
    spec = get_spec("jacobi7")
    assert choose_tiles(spec, (256, 256, 256), sweeps_per_call=8,
                        has_source=True) == (32, 64)
    assert choose_tiles(spec, (512, 512, 512), sweeps_per_call=8,
                        has_source=True) == (64, 64)
    assert choose_tiles(spec, (256, 256, 256), sweeps_per_call=8,
                        two_level=True) == (64, 128)
    assert choose_tiles(spec, (256, 256, 256), sweeps_per_call=8,
                        tap_mode="coeff") == (64, 64)
    # homogeneous classes bit-untouched by the widening
    assert choose_tiles(spec, (256, 256, 256),
                        sweeps_per_call=8) == (64, 64)
    assert choose_tiles(spec, (512, 512, 512),
                        sweeps_per_call=8) == (64, 64)
    # the on-chip-infeasible coeff (64,128) (163M scoped compile OOM)
    # stays excluded: est 158M > the widened budget
    from stencil_tpu.ops.pallas_tiled import rank_tiles
    ranked = rank_tiles(spec, (256, 256, 256), sweeps_per_call=8,
                        tap_mode="coeff")
    assert (64, 128) not in ranked
