"""BiCGStab (stencil_tpu/krylov.py) on nonsymmetric stencil operators:
agreement with dense float64 solves, recovery of a manufactured discrete
solution through nonzero Dirichlet walls, the symmetric-case cross-check
against CG, advection-dominated robustness of the upwind operator, the
distributed (1D-mesh) path, and the well-posedness gates of
``models/advection_diffusion.py``.
"""

import numpy as np
import pytest

from stencil_tpu.core.grid import DirichletBC
from stencil_tpu.krylov import BiCGStab, ConjugateGradient
from stencil_tpu.models.advection_diffusion import (
    AdvectionDiffusionProblem,
)
from stencil_tpu.models.poisson import PoissonProblem


def dense_operator(prob) -> np.ndarray:
    """The zero-wall operator as a dense float64 matrix (row p holds
    ``(A u)_p = sum_t w_t u_{p + off_t}``) — the brute-force twin the
    matrix-free path is checked against."""
    shape = tuple(prob.shape)
    n = int(np.prod(shape))
    ids = np.arange(n).reshape(shape)
    A = np.zeros((n, n), np.float64)
    spec = prob.operator_spec
    for off, w in zip(spec.offsets, spec.weights):
        dst = tuple(slice(max(0, -o), min(s, s - o))
                    for o, s in zip(off, shape))
        src = tuple(slice(max(0, o), min(s, s + o))
                    for o, s in zip(off, shape))
        A[ids[dst].ravel(), ids[src].ravel()] += float(w)
    return A


@pytest.mark.parametrize("scheme", ["upwind", "central"])
def test_matches_dense_solve_3d(scheme):
    shape = (5, 6, 7)
    prob = AdvectionDiffusionProblem(
        shape=shape, velocity=(1.0, -0.5, 0.25), nu=1.0, scheme=scheme)
    rng = np.random.default_rng(3)
    f = rng.normal(size=shape)
    u_dense = np.linalg.solve(dense_operator(prob),
                              f.ravel()).reshape(shape)
    res = BiCGStab(prob).solve(f.astype(np.float32), tolerance=1e-6,
                               max_iterations=500)
    assert res.converged, res.summary()
    u = np.asarray(res.grid.interior(), np.float64)
    scale = np.max(np.abs(u_dense))
    assert np.max(np.abs(u - u_dense)) < 2e-4 * scale


def test_dense_solve_2d_high_velocity_upwind():
    shape = (9, 8)
    prob = AdvectionDiffusionProblem(
        shape=shape, velocity=(4.0, -3.0), nu=0.5, scheme="upwind")
    rng = np.random.default_rng(4)
    f = rng.normal(size=shape)
    u_dense = np.linalg.solve(dense_operator(prob),
                              f.ravel()).reshape(shape)
    res = BiCGStab(prob).solve(f.astype(np.float32), tolerance=1e-6,
                               max_iterations=500)
    assert res.converged, res.summary()
    u = np.asarray(res.grid.interior(), np.float64)
    assert np.max(np.abs(u - u_dense)) < 2e-4 * np.max(np.abs(u_dense))


def test_recovers_manufactured_solution_through_walls():
    """f is built by applying the float64 operator (with the problem's
    TRUE nonzero walls) to a known u*; the solve must hand u* back —
    this exercises the correction form end to end."""
    shape = (10, 11, 12)
    prob = AdvectionDiffusionProblem(
        shape=shape, velocity=(0.8, -0.6, 0.4), nu=1.0,
        bc=DirichletBC.reference_default(3))
    rng = np.random.default_rng(5)
    u_star = rng.normal(size=shape)
    f = prob.apply_f64(u_star)
    res = BiCGStab(prob).solve(f.astype(np.float32), tolerance=1e-6,
                               max_iterations=500)
    assert res.converged, res.summary()
    u = np.asarray(res.grid.interior(), np.float64)
    assert np.max(np.abs(u - u_star)) < 1e-3
    # the float64 certificate agrees with the device-side one
    assert prob.residual_f64(res.grid, f) < 1e-2 * np.max(np.abs(f))


def test_symmetric_case_matches_cg():
    """With velocity 0 the operator is the SPD negated Laplacian;
    BiCGStab and CG must land on the same discrete solution (and the
    Poisson problem's own operator_spec drives BiCGStab)."""
    shape = (15, 15, 15)
    prob = PoissonProblem(shape=shape)
    rng = np.random.default_rng(6)
    f = rng.normal(size=shape).astype(np.float32)
    cg = ConjugateGradient(prob).solve(f, tolerance=1e-5,
                                       max_iterations=2000)
    bi = BiCGStab(prob).solve(f, tolerance=1e-5, max_iterations=2000)
    assert cg.converged and bi.converged, (cg.summary(), bi.summary())
    d = np.max(np.abs(np.asarray(cg.grid.interior(), np.float64)
                      - np.asarray(bi.grid.interior(), np.float64)))
    scale = np.max(np.abs(np.asarray(cg.grid.interior(), np.float64)))
    assert d < 1e-3 * scale, (d, scale)


def test_advection_dominated_upwind():
    """Mesh Peclet ~ 1.6: the central scheme refuses, the upwind
    operator solves (M-matrix at any Peclet)."""
    shape = (31, 31)
    prob = AdvectionDiffusionProblem(shape=shape, velocity=(1.0, 1.0),
                                     nu=0.01, scheme="upwind")
    assert prob.mesh_peclet > 1.0
    with pytest.raises(ValueError, match="Peclet"):
        AdvectionDiffusionProblem(shape=shape, velocity=(1.0, 1.0),
                                  nu=0.01, scheme="central")
    rng = np.random.default_rng(7)
    f = rng.normal(size=shape).astype(np.float32)
    res = prob.solve(f, tolerance=1e-5, max_iterations=2000)
    assert res.converged, res.summary()
    assert prob.residual_f64(res.grid, f) < 1e-2 * np.max(np.abs(f))


def test_distributed_matches_single_device():
    from stencil_tpu.parallel.halo import make_mesh

    shape = (24, 9, 10)
    prob = AdvectionDiffusionProblem(
        shape=shape, velocity=(0.5, -0.25, 1.0), nu=1.0,
        bc=DirichletBC.reference_default(3))
    rng = np.random.default_rng(8)
    f = rng.normal(size=shape).astype(np.float32)
    single = BiCGStab(prob).solve(f, tolerance=1e-5, max_iterations=500)
    dist = BiCGStab(prob).solve(f, tolerance=1e-5, max_iterations=500,
                                mesh=make_mesh((4,), ("x",)), dim=0)
    assert single.converged and dist.converged
    d = np.max(np.abs(np.asarray(single.grid.interior(), np.float64)
                      - np.asarray(dist.grid.interior(), np.float64)))
    assert d < 1e-4, d


def test_iteration_cap_reports_not_converged():
    shape = (15, 15)
    prob = AdvectionDiffusionProblem(shape=shape, velocity=(1.0, 0.0))
    f = np.ones(shape, np.float32)
    res = BiCGStab(prob).solve(f, tolerance=1e-10, max_iterations=2)
    assert not res.converged
    assert res.iterations == 2
    assert res.residual_rel > 1e-10


def test_gates():
    with pytest.raises(ValueError, match="nu must be positive"):
        AdvectionDiffusionProblem(shape=(8, 8), velocity=(1.0, 0.0),
                                  nu=0.0)
    with pytest.raises(ValueError, match="velocity rank"):
        AdvectionDiffusionProblem(shape=(8, 8), velocity=(1.0,))
    with pytest.raises(ValueError, match="Dirichlet walls"):
        AdvectionDiffusionProblem(
            shape=(8, 8), velocity=(1.0, 0.0),
            bc=DirichletBC.zero(2).with_periodic((0,)))
    with pytest.raises(ValueError, match="unknown scheme"):
        AdvectionDiffusionProblem(shape=(8, 8), velocity=(1.0, 0.0),
                                  scheme="quick")
    with pytest.raises(ValueError, match="singular"):
        BiCGStab(PoissonProblem(
            shape=(8, 8), bc=DirichletBC.zero(2).with_neumann((1,))))
    with pytest.raises(ValueError, match="1D or 2D"):
        from stencil_tpu.parallel.halo import make_mesh

        prob = AdvectionDiffusionProblem(shape=(8, 8, 8),
                                         velocity=(1.0, 0.0, 0.0))
        BiCGStab(prob).solve(np.ones((8, 8, 8), np.float32),
                             mesh=make_mesh((2, 2, 2), ("x", "y", "z")))


def test_operator_spec_taps_upwind():
    """The upwind taps: center 2d nu/h^2 + sum |v|/h, upstream faces
    carry the transport weight, downstream faces only diffusion."""
    prob = AdvectionDiffusionProblem(shape=(7, 7), velocity=(2.0, -1.0),
                                     nu=1.0, h=0.5, scheme="upwind")
    taps = dict(zip(prob.operator_spec.offsets,
                    prob.operator_spec.weights))
    inv_h2 = 1.0 / 0.25
    assert taps[(0, 0)] == pytest.approx(4 * inv_h2 + (2.0 + 1.0) / 0.5)
    assert taps[(-1, 0)] == pytest.approx(-inv_h2 - 2.0 / 0.5)  # upstream
    assert taps[(1, 0)] == pytest.approx(-inv_h2)               # downstream
    assert taps[(0, 1)] == pytest.approx(-inv_h2 - 1.0 / 0.5)   # v<0: +1 up
    assert taps[(0, -1)] == pytest.approx(-inv_h2)


def test_restarts_recover_certificate_drift():
    """At tolerances near the fp32 recurrence floor, a single pass
    exits with the recurrence below tolerance but the true residual
    above it; the restart (recomputing b = f - A u from the solution)
    must close the gap. Measured here: restarts=0 stalls at ~5e-7,
    restarts>0 certifies 1e-7."""
    prob = AdvectionDiffusionProblem(
        shape=(12, 13, 14), velocity=(1.0, -0.5, 0.25), nu=0.5)
    rng = np.random.default_rng(9)
    f = rng.normal(size=prob.shape).astype(np.float32)
    r0 = BiCGStab(prob).solve(f, tolerance=1e-7, max_iterations=400,
                              restarts=0)
    r8 = BiCGStab(prob).solve(f, tolerance=1e-7, max_iterations=400,
                              restarts=8)
    assert not r0.converged and r8.converged, \
        (r0.summary(), r8.summary())
    assert r8.residual_rel < r0.residual_rel
    # the budget is TOTAL across restarts, not per restart
    assert r8.iterations <= 400


# ---------------- MG-preconditioned BiCGStab ----------------

def test_mg_preconditioned_bicgstab_collapses_iterations():
    """The rediscretized-operator cycle as a right preconditioner must
    cut the iteration count by ~an order of magnitude in BOTH regimes
    and land on the same discrete solution."""
    from stencil_tpu.multigrid import OperatorMultigrid

    for nu in (1.0, 0.01):
        prob = AdvectionDiffusionProblem(
            shape=(31, 31, 31), velocity=(1.0, -0.5, 0.25), nu=nu)
        rng = np.random.default_rng(31)
        f = rng.normal(size=prob.shape).astype(np.float32)
        plain = BiCGStab(prob).solve(f, tolerance=1e-5,
                                     max_iterations=2000)
        pre = BiCGStab(prob, preconditioner=OperatorMultigrid(prob)) \
            .solve(f, tolerance=1e-5, max_iterations=200)
        assert plain.converged and pre.converged, \
            (plain.summary(), pre.summary())
        assert pre.iterations * 5 <= plain.iterations, \
            (nu, pre.iterations, plain.iterations)
        assert pre.iterations <= 15, (nu, pre.iterations)
        d = np.max(np.abs(
            np.asarray(plain.grid.interior(), np.float64)
            - np.asarray(pre.grid.interior(), np.float64)))
        scale = np.max(np.abs(
            np.asarray(plain.grid.interior(), np.float64)))
        assert d < 1e-3 * scale + 1e-6, (nu, d)


def test_operator_mg_central_falls_back_to_upwind_on_coarse_levels():
    """A central fine discretization keeps its order at the fine h but
    coarser levels whose mesh Peclet exceeds 1 switch to the
    stabilized upwind operator."""
    from stencil_tpu.multigrid import OperatorMultigrid

    prob = AdvectionDiffusionProblem(
        shape=(31, 31, 31), velocity=(1.0, 0.0, 0.0), nu=0.05,
        scheme="central")
    assert prob.mesh_peclet <= 1.0
    mg = OperatorMultigrid(prob)
    names = [p.operator_spec.name for p in mg._probs]
    assert "central" in names[0]
    assert any("upwind" in n for n in names[1:]), names
    # and the preconditioned solve still works on the central problem
    rng = np.random.default_rng(32)
    f = rng.normal(size=prob.shape).astype(np.float32)
    res = BiCGStab(prob, preconditioner=mg).solve(
        f, tolerance=1e-5, max_iterations=100)
    assert res.converged and res.iterations <= 20, res.summary()


def test_operator_mg_gates():
    from stencil_tpu.multigrid import OperatorMultigrid

    prob = AdvectionDiffusionProblem(shape=(15, 15, 15),
                                     velocity=(1.0, 0.0, 0.0))
    other = AdvectionDiffusionProblem(shape=(13, 13, 13),
                                      velocity=(1.0, 0.0, 0.0))
    with pytest.raises(ValueError, match="different problem"):
        BiCGStab(prob, preconditioner=OperatorMultigrid(other))
    with pytest.raises(ValueError, match="gamma"):
        OperatorMultigrid(prob, gamma=3)


def test_distributed_preconditioned_bicgstab_matches_single():
    """Distributed MG-preconditioned BiCGStab: Krylov vectors on the
    fine sharding, the rediscretized cycle on its per-level ladder
    (replicated coarse tail) — same math, same iterate."""
    from stencil_tpu.multigrid import OperatorMultigrid
    from stencil_tpu.parallel.halo import make_mesh

    prob = AdvectionDiffusionProblem(
        shape=(31, 15, 15), velocity=(1.0, -0.5, 0.25), nu=0.1)
    rng = np.random.default_rng(34)
    f = rng.normal(size=prob.shape).astype(np.float32)
    s = BiCGStab(prob, preconditioner=OperatorMultigrid(prob))
    single = s.solve(f, tolerance=1e-5, max_iterations=100)
    dist = s.solve(f, tolerance=1e-5, max_iterations=100,
                   mesh=make_mesh((4,), ("x",)), replicate_below=16)
    assert single.converged and dist.converged, \
        (single.summary(), dist.summary())
    assert abs(single.iterations - dist.iterations) <= 2
    d = np.max(np.abs(np.asarray(single.grid.interior(), np.float64)
                      - np.asarray(dist.grid.interior(), np.float64)))
    scale = np.max(np.abs(
        np.asarray(single.grid.interior(), np.float64)))
    assert d < 1e-3 * scale + 1e-6, d


def test_operator_mg_on_poisson_matches_pcg_solution():
    """OperatorMultigrid on the symmetric Poisson operator: the
    preconditioned BiCGStab solve agrees with MG-PCG."""
    from stencil_tpu.multigrid import Multigrid, OperatorMultigrid

    prob = PoissonProblem(shape=(31, 31, 31))
    rng = np.random.default_rng(33)
    f = rng.normal(size=prob.shape).astype(np.float32)
    bi = BiCGStab(prob, preconditioner=OperatorMultigrid(prob)).solve(
        f, tolerance=1e-5, max_iterations=100)
    pcg = ConjugateGradient(prob, preconditioner=Multigrid(prob)) \
        .solve(f, tolerance=1e-5, max_iterations=100)
    assert bi.converged and pcg.converged
    assert bi.iterations <= pcg.iterations + 3
    d = np.max(np.abs(np.asarray(bi.grid.interior(), np.float64)
                      - np.asarray(pcg.grid.interior(), np.float64)))
    scale = np.max(np.abs(np.asarray(pcg.grid.interior(), np.float64)))
    assert d < 1e-3 * scale + 1e-6, d
