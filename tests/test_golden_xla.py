"""Golden model sanity + XLA method vs golden differential tests.

Models the reference's only correctness mechanism (SURVEY §4): an
independent naive implementation compared element-wise at abs tol 1e-4
(``stencil.cpp:75-151``), plus analytic sanity cases it lacks.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from stencil_tpu.core.grid import DirichletBC, HaloGrid
from stencil_tpu.core import spec as S
from stencil_tpu.ops import golden, xla


def test_golden_single_sweep_analytic():
    # 1-interior-cell grid, reference BCs: value = (1 + 1 + 0 + 0) / 4
    out = golden.golden_iterate(np.zeros((1, 1)), S.jacobi5(), 1)
    assert out[0, 0] == pytest.approx(0.5)


def test_golden_fixed_point():
    # all-ones with all-ones BC is a fixed point of the star average
    bc = DirichletBC(values=((1.0, 1.0), (1.0, 1.0)))
    out = golden.golden_iterate(np.ones((5, 5)), S.jacobi5(), 10, bc=bc)
    np.testing.assert_allclose(out, 1.0, atol=1e-12)


def test_golden_converges_to_laplace_solution():
    # long relaxation converges to the harmonic function with these BCs;
    # column next to the left/right (=1.0) walls should approach high values
    out = golden.golden_iterate(np.zeros((9, 9)), S.jacobi5(), 5000)
    mid = out[4, 4]
    assert 0.0 < mid < 1.0
    # symmetry: left-right and top-bottom mirror symmetry of the solution
    np.testing.assert_allclose(out, out[:, ::-1], atol=1e-10)
    np.testing.assert_allclose(out, out[::-1, :], atol=1e-10)


@pytest.mark.parametrize("spec_name", ["jacobi5", "jacobi9", "star2d_r2"])
@pytest.mark.parametrize("iters", [1, 7])
def test_xla_matches_golden_2d(rng, spec_name, iters):
    sp = S.get_spec(spec_name)
    x0 = rng.random((24, 40)).astype(np.float32)
    g = HaloGrid.from_interior(jnp.asarray(x0), halo=sp.radius)
    out = xla.iterate(g, sp, iters)
    ref = golden.golden_iterate(x0, sp, iters)
    chk = golden.check_against_golden(np.asarray(out.interior()), ref)
    assert chk.ok, chk.message()


@pytest.mark.parametrize("spec_name", ["jacobi7", "jacobi27", "laplace3d_ho"])
def test_xla_matches_golden_3d(rng, spec_name):
    sp = S.get_spec(spec_name)
    x0 = rng.random((10, 12, 14)).astype(np.float32)
    g = HaloGrid.from_interior(jnp.asarray(x0), halo=sp.radius)
    out = xla.iterate(g, sp, 5)
    ref = golden.golden_iterate(x0, sp, 5)
    chk = golden.check_against_golden(np.asarray(out.interior()), ref)
    assert chk.ok, chk.message()


def test_xla_dynamic_iterations_matches_static(rng):
    sp = S.jacobi5()
    x0 = rng.random((16, 16)).astype(np.float32)
    g = HaloGrid.from_interior(jnp.asarray(x0), halo=1)
    a = xla.iterate(g, sp, 9)
    b = xla.iterate_dynamic(g, sp, jnp.int32(9))
    np.testing.assert_array_equal(
        np.asarray(a.interior()), np.asarray(b.interior())
    )


def test_checker_reports_first_mismatch():
    a = np.zeros((3, 3))
    b = np.zeros((3, 3))
    b[1, 2] = 1.0
    chk = golden.check_against_golden(a, b)
    assert not chk.ok
    assert chk.first_mismatch[0] == (1, 2)
    assert "MISMATCH" in chk.message()
    assert chk.max_abs_err == pytest.approx(1.0)


def test_checker_tolerance_boundary():
    a = np.zeros((2, 2))
    b = np.full((2, 2), 0.5e-4)
    assert golden.check_against_golden(a, b, tolerance=1e-4).ok
    assert not golden.check_against_golden(a, b, tolerance=1e-5).ok


def test_nonuniform_weights_path(rng):
    sp = S.get_spec("laplace2d_ho")
    assert sp.uniform_weight is None
    x0 = rng.random((12, 12)).astype(np.float32)
    g = HaloGrid.from_interior(jnp.asarray(x0), halo=sp.radius)
    out = xla.iterate(g, sp, 3)
    ref = golden.golden_iterate(x0, sp, 3)
    chk = golden.check_against_golden(np.asarray(out.interior()), ref)
    assert chk.ok, chk.message()
