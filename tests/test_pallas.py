"""Pallas slab-kernel correctness vs the float64 golden model.

Runs in interpreter mode on CPU (SURVEY §4: the reference can only test on
real hardware; we do better). The same kernels compile for TPU unchanged.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from stencil_tpu.core.grid import DirichletBC, HaloGrid
from stencil_tpu.core import spec as S
from stencil_tpu.ops import golden
from stencil_tpu.ops.layout import PaddedLayout
from stencil_tpu.ops.pallas import PallasStencil, choose_slab, make_plan


def run_case(spec, shape, iters, k, slab=None, bc=None, dtype="float32",
             tol=1e-4):
    rng = np.random.default_rng(42)
    x0 = rng.random(shape).astype(dtype)
    g = HaloGrid.from_interior(jnp.asarray(x0), halo=spec.radius, bc=bc)
    method = PallasStencil(
        spec, shape, dtype, sweeps_per_call=k, slab=slab, interpret=True
    )
    out = method.iterate(g, iters)
    ref = golden.golden_iterate(x0, spec, iters, bc=g.bc)
    chk = golden.check_against_golden(
        np.asarray(out.interior()), ref, tolerance=tol
    )
    assert chk.ok, chk.message()


# ---- layout ------------------------------------------------------------------


def test_layout_pads_2d():
    lay = PaddedLayout.for_halo((64, 100), 1)
    assert lay.pads == ((8, 8), (1, 27))  # 100+2 -> 128
    assert lay.padded_shape == (80, 128)


def test_layout_pads_3d():
    lay = PaddedLayout.for_halo((16, 24, 100), 2)
    assert lay.pads[0] == (2, 2)
    assert lay.pads[1] == (8, 8)
    assert lay.pads[2][0] == 2
    assert lay.padded_shape[2] % 128 == 0


def test_layout_roundtrip(rng):
    lay = PaddedLayout.for_halo((16, 40), 1)
    x = jnp.asarray(rng.random((16, 40)).astype(np.float32))
    bc = DirichletBC.reference_default(2)
    p = lay.pad(x, bc)
    np.testing.assert_array_equal(np.asarray(lay.unpad(p)), np.asarray(x))
    pn = np.asarray(p)
    # lane ghosts (incl. alignment slack) hold the face values
    np.testing.assert_array_equal(pn[:, 0], 1.0)
    np.testing.assert_array_equal(pn[:, 41:], 1.0)
    np.testing.assert_array_equal(pn[0, 1:41], 0.0)


def test_choose_slab_respects_budget():
    sp = S.jacobi5()
    s = choose_slab(sp, (4096, 4096), "float32", 1,
                    vmem_budget=10 * 1024 * 1024)
    assert s is not None and s % 8 == 0
    plan = make_plan(sp, (4096, 4096), "float32", 1, slab=s)
    assert plan.num_slab_pairs >= 1
    # odd row count -> no pallas 2D path
    assert choose_slab(sp, (401, 400)) is None


# ---- 2D correctness ----------------------------------------------------------


def test_2d_k1_single_slab():
    run_case(S.jacobi5(), (16, 48), iters=3, k=1, slab=16)


def test_2d_k1_multi_slab():
    run_case(S.jacobi5(), (64, 48), iters=3, k=1, slab=16)


def test_2d_temporal_k3():
    run_case(S.jacobi5(), (64, 48), iters=6, k=3, slab=16)


def test_2d_temporal_remainder():
    # 7 = 2 outer calls of k=3 + remainder 1
    run_case(S.jacobi5(), (64, 48), iters=7, k=3, slab=16)


def test_2d_ragged_last_slab():
    # 40 rows, slab 16 -> slabs at rows 0, 16, 24(clamped): overlap benign
    run_case(S.jacobi5(), (40, 48), iters=3, k=1, slab=16)


def test_2d_box_stencil():
    run_case(S.jacobi9(), (32, 40), iters=3, k=2, slab=16)


def test_2d_radius2():
    run_case(S.star(2, 2), (32, 40), iters=4, k=2, slab=16)


def test_2d_nonuniform_weights():
    run_case(S.laplacian_high_order(2), (32, 40), iters=3, k=2, slab=16)


def test_2d_custom_bc():
    bc = DirichletBC(values=((2.0, -1.0), (0.5, 3.0)))
    run_case(S.jacobi5(), (32, 40), iters=4, k=2, slab=16, bc=bc)


def test_2d_lane_slack_is_masked():
    # W=100 -> padded 128, 27 slack lanes; results must be unaffected
    run_case(S.jacobi5(), (24, 100), iters=5, k=2, slab=8)


# ---- 3D correctness ----------------------------------------------------------


def test_3d_7pt_k1():
    run_case(S.jacobi7_3d(), (8, 16, 40), iters=3, k=1, slab=4)


def test_3d_7pt_temporal():
    run_case(S.jacobi7_3d(), (12, 16, 40), iters=4, k=2, slab=3)


def test_3d_27pt():
    run_case(S.jacobi27_3d(), (8, 16, 40), iters=2, k=2, slab=4)


def test_3d_radius2_high_order():
    run_case(S.laplacian_high_order(3), (10, 16, 40), iters=2, k=1, slab=5)


def test_3d_odd_slab_sizes():
    # leading dim is untiled: slab 3 over depth 10 with clamping
    run_case(S.jacobi7_3d(), (10, 16, 40), iters=2, k=1, slab=3)


# ---- plan validation ---------------------------------------------------------


def test_plan_rejects_bad_shapes():
    with pytest.raises(ValueError):
        make_plan(S.jacobi5(), (16, 16, 16))  # rank mismatch
    with pytest.raises(ValueError):
        make_plan(S.jacobi5(), (20, 48), slab=20)  # rows % 8
    with pytest.raises(ValueError):
        make_plan(S.star(1, 1) if False else S.jacobi5(), (16,))  # 1D


def test_2d_bf16_synth_matches_golden():
    # bf16 lane rolls lower via ops.rolls.lane_roll's int32 bitcast
    grid = HaloGrid.create((32, 40), halo=1, dtype="bfloat16")
    m = PallasStencil(S.get_spec("jacobi5"), (32, 40), "bfloat16",
                      sweeps_per_call=2, interpret=True)
    assert m.plan.tap_mode == "synth"
    out = m.iterate(grid, 4)
    ref = golden.golden_iterate(
        np.zeros((32, 40), np.float64), S.get_spec("jacobi5"), 4, bc=grid.bc
    )
    np.testing.assert_allclose(
        np.asarray(out.interior(), np.float64), ref, atol=3e-2, rtol=3e-2
    )


@pytest.mark.parametrize("specname", ["jacobi5", "jacobi9", "laplace2d_ho"])
def test_2d_rotacc_matches_golden(specname):
    # lead taps as sublane rotates, one misaligned slice per sweep
    spec = S.get_spec(specname)
    shape = (32, 40)
    grid = HaloGrid.create(shape, halo=spec.radius, dtype="float32")
    m = PallasStencil(spec, shape, sweeps_per_call=2, interpret=True,
                      tap_mode="rotacc")
    out = m.iterate(grid, 4)
    ref = golden.golden_iterate(np.zeros(shape, np.float64), spec, 4,
                                bc=grid.bc)
    np.testing.assert_allclose(
        np.asarray(out.interior(), np.float64), ref, atol=5e-6, rtol=5e-6
    )


def test_2d_rotacc_rejects_16bit():
    with pytest.raises(ValueError, match="rotacc"):
        PallasStencil(S.get_spec("jacobi5"), (32, 40), "bfloat16",
                      sweeps_per_call=2, tap_mode="rotacc")


def test_2d_default_tap_mode_is_spec_aware():
    # fp32 2D: rotacc only for separable boxes (measured ~2x there,
    # ~3% behind synth on deep-k stars); synth for stars; bf16 synth
    assert make_plan(S.jacobi9(), (64, 64)).tap_mode == "rotacc"
    assert make_plan(S.jacobi5(), (64, 64)).tap_mode == "synth"
    assert make_plan(S.jacobi5(), (64, 64),
                     "bfloat16").tap_mode == "synth"


def test_mid_slab_deep_temporal_overhang_regression():
    """k=8 r=2 with 8-row slabs: the per-sweep recompute extension
    (k-t)*r = up to 14 rows exceeds the slab pitch, so MID slabs compute
    into the physical ghost zone between sweeps. The round-2 kernel
    pinned edge slabs only and read those stencil-updated ghost rows
    back (measured 2.3e-4 vs golden); the dynamic-threshold pin bands
    fix it — the same bug class fixed in the tiled kernel this round."""
    from stencil_tpu.core.spec import star

    spec = star(2, 2)
    grid = HaloGrid.create((32, 40), halo=2, dtype="float32")
    m = PallasStencil(spec, (32, 40), sweeps_per_call=8, slab=8,
                      interpret=True)
    out = m.iterate(grid, 8)
    ref = golden.golden_iterate(np.zeros((32, 40), np.float64), spec, 8,
                                bc=grid.bc)
    np.testing.assert_allclose(
        np.asarray(out.interior(), np.float64), ref, atol=5e-6, rtol=5e-6
    )
