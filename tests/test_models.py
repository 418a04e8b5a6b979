"""Model families: Poisson (fused source term) and wave (leapfrog).

The source-term capability (``u' = S(u) + c*f``) and the two-level
recursion are differential-tested against independent float64 NumPy
references, and validated against analytic solutions (manufactured
Poisson solution, discrete standing-wave eigenmode) — a stronger bar
than the reference's golden-vs-kernel check (the analytic tests also
catch a wrong DISCRETIZATION, not just a wrong kernel).
"""

import numpy as np
import pytest

from stencil_tpu.core.grid import DirichletBC, HaloGrid
from stencil_tpu.core.spec import get_spec
from stencil_tpu.models.poisson import PoissonProblem, manufactured_sine
from stencil_tpu.models.wave import WaveEquation, golden_wave
from stencil_tpu.ops import golden, xla


# ---------------------------------------------------------------- source term

@pytest.mark.parametrize("shape", [(16, 20), (8, 10, 12)])
def test_source_sweeps_match_golden(shape):
    rng = np.random.default_rng(7)
    spec = get_spec("jacobi5" if len(shape) == 2 else "jacobi7")
    u0 = rng.normal(size=shape).astype(np.float32)
    f = rng.normal(size=shape).astype(np.float32)
    scale = -0.03125
    want = golden.golden_iterate(u0, spec, 9, source=f, source_scale=scale)

    import jax.numpy as jnp
    g = HaloGrid.from_interior(jnp.asarray(u0), halo=1)
    got = xla.iterate_source_dynamic(g, spec, jnp.int32(9),
                                     jnp.asarray(f) * scale)
    np.testing.assert_allclose(np.asarray(got.interior()), want,
                               atol=2e-5, rtol=0)


def test_source_zero_is_homogeneous():
    rng = np.random.default_rng(3)
    spec = get_spec("jacobi7")
    u0 = rng.normal(size=(6, 7, 8)).astype(np.float32)
    a = golden.golden_iterate(u0, spec, 5)
    b = golden.golden_iterate(u0, spec, 5, source=np.zeros_like(u0),
                              source_scale=1.0)
    np.testing.assert_array_equal(a, b)


def test_source_shape_mismatch_raises():
    spec = get_spec("jacobi5")
    with pytest.raises(ValueError, match="source shape"):
        golden.golden_iterate(np.zeros((8, 8)), spec, 1,
                              source=np.zeros((4, 4)))
    with pytest.raises(ValueError, match="source shape"):
        PoissonProblem(shape=(8, 8)).runner(np.zeros((4, 4)))


# -------------------------------------------------------------------- poisson

@pytest.mark.parametrize("shape", [(24, 24), (12, 12, 12)])
def test_poisson_manufactured_solution(shape):
    """The relaxed solve converges to the analytic u* = prod sin(pi x_d)
    up to the O(h^2) discretization error."""
    prob = PoissonProblem(shape=shape)
    f, u_exact = manufactured_sine(shape)
    res = prob.solve(f, tolerance=5e-7, max_iterations=60_000,
                     check_every=500)
    assert res.converged, res.summary()
    u = np.asarray(res.grid.interior(), np.float64)
    # discretization error bound: |u_h - u*| <= C h^2, C ~ pi^2/12 * ndim
    h2 = prob.h ** 2
    assert np.max(np.abs(u - u_exact)) < 5.0 * h2, (
        np.max(np.abs(u - u_exact)), h2)


def test_poisson_residual_and_flags():
    prob = PoissonProblem(shape=(10, 10))
    f, _ = manufactured_sine((10, 10))
    res = prob.solve(f, tolerance=1e30)  # converges immediately
    assert res.converged and res.iterations <= 200
    res2 = prob.solve(f, tolerance=0.0, max_iterations=100)
    assert not res2.converged and res2.iterations == 100


def test_poisson_matches_source_golden():
    """The Poisson runner IS the golden affine iteration (differential)."""
    shape = (14, 18)
    prob = PoissonProblem(shape=shape)
    rng = np.random.default_rng(11)
    f = rng.normal(size=shape)
    want = golden.golden_iterate(
        np.zeros(shape, np.float32), prob.spec, 25, bc=prob.bc,
        source=f, source_scale=prob.source_scale)
    got = prob.runner(f).iterate(prob.initial_grid(), 25)
    np.testing.assert_allclose(np.asarray(got.interior()), want,
                               atol=2e-6, rtol=0)


def test_poisson_periodic_mean_preserving():
    """On an all-periodic domain the star average preserves the mean and
    a zero-mean source keeps the iterate zero-mean (compatibility
    condition of the periodic Poisson problem)."""
    shape = (12, 16)
    bc = DirichletBC.periodic_all(2)
    prob = PoissonProblem(shape=shape, h=1.0 / 12, bc=bc)
    rng = np.random.default_rng(5)
    f = rng.normal(size=shape)
    f -= f.mean()
    out = prob.runner(f).iterate(prob.initial_grid(), 40)
    assert abs(float(np.asarray(out.interior()).mean())) < 1e-5


# ----------------------------------------------------------------------- wave

@pytest.mark.parametrize("shape,bc_dims", [
    ((24, 28), ()),                 # Dirichlet-0 box
    ((24, 28), (0, 1)),             # fully periodic
    ((16, 18, 20), ()),             # 3D Dirichlet
])
def test_wave_matches_golden(shape, bc_dims):
    ndim = len(shape)
    bc = DirichletBC.zero(ndim)
    if bc_dims:
        bc = bc.with_periodic(bc_dims)
    w = WaveEquation(shape=shape, bc=bc)
    rng = np.random.default_rng(13)
    u0 = rng.normal(size=shape)
    v0 = rng.normal(size=shape)
    want = golden_wave(u0, w.spec, 30, bc, v0=v0,
                       dt=w.courant * w.h / w.c)
    got = w.simulate_interior(u0, 30, v0=v0)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=0)


def test_wave_neumann_matches_golden():
    bc = DirichletBC.zero(2).with_neumann((0,))
    w = WaveEquation(shape=(20, 24), bc=bc)
    rng = np.random.default_rng(17)
    u0 = rng.normal(size=(20, 24))
    want = golden_wave(u0, w.spec, 20, bc, dt=w.courant * w.h / w.c)
    got = w.simulate_interior(u0, 20)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=0)


def test_wave_standing_mode_analytic():
    """The fundamental Dirichlet eigenmode evolves EXACTLY as
    cos(n*theta) * u0 with cos(theta) = lambda/2, where lambda is the
    mode's eigenvalue under S — a closed-form check of the whole
    leapfrog discretization (catches wrong dt handling, wrong Taylor
    start, wrong center weight)."""
    n = 31
    w = WaveEquation(shape=(n, n), dt=0.3, h=1.0, c=1.0)
    x = np.arange(1, n + 1) / (n + 1)
    mode = np.multiply.outer(np.sin(np.pi * x), np.sin(np.pi * x))
    s2 = w.courant ** 2
    lam = 2 - 4 * s2 + 4 * s2 * np.cos(np.pi / (n + 1))
    theta = np.arccos(lam / 2.0)
    for steps in (1, 7, 40):
        got = w.simulate_interior(mode, steps)
        want = np.cos(steps * theta) * mode
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=0)


def test_wave_energy_bounded():
    """Leapfrog at a stable Courant number neither blows up nor decays
    to zero over many steps (time-reversible scheme)."""
    w = WaveEquation(shape=(32, 32))
    rng = np.random.default_rng(23)
    u0 = 0.1 * rng.normal(size=(32, 32))
    a0 = float(np.abs(u0).max())
    out = w.simulate_interior(u0, 400)
    a1 = float(np.abs(out).max())
    assert 0.01 * a0 < a1 < 20 * a0, (a0, a1)


def test_wave_cfl_gate():
    with pytest.raises(ValueError, match="unstable"):
        WaveEquation(shape=(8, 8), dt=0.9, c=1.0, h=1.0).spec
    # the largest stable step is accepted
    WaveEquation(shape=(8, 8), dt=1.0 / np.sqrt(2), c=1.0, h=1.0).spec


def test_wave_zero_velocity_symmetric_in_time():
    """With v0=0 the solution is even in t: running the eigenmode
    forward n steps equals cos(n*theta)*u0 which is symmetric — checked
    indirectly by simulate(prev,cur) agreeing with golden at step
    granularity 0/1."""
    w = WaveEquation(shape=(12, 12))
    rng = np.random.default_rng(29)
    u0 = rng.normal(size=(12, 12))
    np.testing.assert_allclose(w.simulate_interior(u0, 0), u0, atol=1e-6)
    want1 = golden_wave(u0, w.spec, 1, w.bc)
    np.testing.assert_allclose(w.simulate_interior(u0, 1), want1,
                               atol=1e-5)
