"""GMRES(m) (stencil_tpu/krylov.py) on nonsymmetric and field stencil
operators: agreement with dense float64 solves and with BiCGStab/CG,
restart-cycle behavior under a small subspace, OperatorMultigrid right
preconditioning (constant-tap AND field operators), warm starts, the
distributed (1D-mesh) path, and the construction gates.
"""

import numpy as np
import pytest

from stencil_tpu.core.grid import DirichletBC
from stencil_tpu.krylov import GMRES, BiCGStab, ConjugateGradient
from stencil_tpu.models.advection_diffusion import (
    AdvectionDiffusionProblem,
)
from stencil_tpu.models.poisson import PoissonProblem

from test_bicgstab import dense_operator


@pytest.mark.parametrize("scheme", ["upwind", "central"])
def test_matches_dense_solve_3d(scheme):
    shape = (5, 6, 7)
    prob = AdvectionDiffusionProblem(
        shape=shape, velocity=(1.0, -0.5, 0.25), nu=1.0, scheme=scheme)
    rng = np.random.default_rng(3)
    f = rng.normal(size=shape)
    u_dense = np.linalg.solve(dense_operator(prob),
                              f.ravel()).reshape(shape)
    res = GMRES(prob).solve(f.astype(np.float32), tolerance=1e-6,
                            max_iterations=500)
    assert res.converged, res.summary()
    u = np.asarray(res.grid.interior(), np.float64)
    scale = np.max(np.abs(u_dense))
    assert np.max(np.abs(u - u_dense)) < 2e-4 * scale


def test_restart_cycles_converge_where_one_subspace_cannot():
    """m smaller than the iteration count the operator needs: the
    solve must cross restart boundaries (iterations > m) and still
    certify — exercising the anchored-||b|| restart contract."""
    shape = (9, 8)
    prob = AdvectionDiffusionProblem(
        shape=shape, velocity=(4.0, -3.0), nu=0.5, scheme="upwind")
    rng = np.random.default_rng(4)
    f = rng.normal(size=shape)
    u_dense = np.linalg.solve(dense_operator(prob),
                              f.ravel()).reshape(shape)
    res = GMRES(prob, restart=5).solve(
        f.astype(np.float32), tolerance=1e-6, max_iterations=500)
    assert res.converged, res.summary()
    assert res.iterations > 5, res.summary()
    u = np.asarray(res.grid.interior(), np.float64)
    assert np.max(np.abs(u - u_dense)) < 2e-4 * np.max(np.abs(u_dense))


def test_recovers_manufactured_solution_through_walls():
    shape = (10, 11, 12)
    prob = AdvectionDiffusionProblem(
        shape=shape, velocity=(0.8, -0.6, 0.4), nu=1.0,
        bc=DirichletBC.reference_default(3))
    rng = np.random.default_rng(5)
    u_star = rng.normal(size=shape)
    f = prob.apply_f64(u_star)
    res = GMRES(prob).solve(f.astype(np.float32), tolerance=1e-6,
                            max_iterations=500)
    assert res.converged, res.summary()
    u = np.asarray(res.grid.interior(), np.float64)
    assert np.max(np.abs(u - u_star)) < 1e-3
    assert prob.residual_f64(res.grid, f) < 1e-2 * np.max(np.abs(f))


def test_symmetric_case_matches_cg():
    shape = (15, 15, 15)
    prob = PoissonProblem(shape=shape)
    rng = np.random.default_rng(6)
    f = rng.normal(size=shape).astype(np.float32)
    cg = ConjugateGradient(prob).solve(f, tolerance=1e-5,
                                       max_iterations=2000)
    gm = GMRES(prob, restart=32).solve(f, tolerance=1e-5,
                                       max_iterations=2000)
    assert cg.converged and gm.converged, (cg.summary(), gm.summary())
    d = np.max(np.abs(np.asarray(cg.grid.interior(), np.float64)
                      - np.asarray(gm.grid.interior(), np.float64)))
    scale = np.max(np.abs(np.asarray(cg.grid.interior(), np.float64)))
    assert d < 1e-3 * scale, (d, scale)


def test_operator_mg_preconditioning_collapses_iterations():
    """The rediscretized-cycle right preconditioner must collapse the
    Arnoldi-step count by ~an order of magnitude, same as it does for
    BiCGStab — and land on the same discrete solution."""
    from stencil_tpu.multigrid import OperatorMultigrid

    shape = (31, 31, 31)
    prob = AdvectionDiffusionProblem(
        shape=shape, velocity=(1.0, -0.5, 0.25), nu=0.05,
        scheme="upwind")
    rng = np.random.default_rng(8)
    f = rng.normal(size=shape).astype(np.float32)
    plain = GMRES(prob, restart=64).solve(f, tolerance=1e-5,
                                          max_iterations=2000)
    pre = GMRES(prob, preconditioner=OperatorMultigrid(prob)).solve(
        f, tolerance=1e-5, max_iterations=2000)
    assert plain.converged and pre.converged, (plain.summary(),
                                               pre.summary())
    assert pre.iterations * 4 <= plain.iterations, (
        pre.iterations, plain.iterations)
    d = np.max(np.abs(np.asarray(plain.grid.interior(), np.float64)
                      - np.asarray(pre.grid.interior(), np.float64)))
    scale = np.max(np.abs(np.asarray(plain.grid.interior(),
                                     np.float64)))
    assert d < 1e-3 * scale, (d, scale)


def test_field_operator_heterogeneous_poisson():
    """GMRES over the FIELD operator protocol (stacked per-point
    weights threaded as runtime data): the heterogeneous Poisson solve
    must agree with its dense float64 twin, with and without the
    coefficient-coarsened OperatorMultigrid preconditioner."""
    from test_hetero_poisson import dense_operator as dense_field_op

    from stencil_tpu.models.diffusion import (
        HeterogeneousPoissonProblem,
    )
    from stencil_tpu.multigrid import OperatorMultigrid

    shape = (9, 9, 9)
    rng = np.random.default_rng(9)
    a = np.where(rng.uniform(size=shape) > 0.5, 10.0, 0.1)
    prob = HeterogeneousPoissonProblem(shape=shape, a=a)
    f = rng.normal(size=shape)
    u_dense = np.linalg.solve(dense_field_op(prob),
                              f.ravel()).reshape(shape)
    scale = np.max(np.abs(u_dense))
    for solver in (GMRES(prob, restart=64),
                   GMRES(prob,
                         preconditioner=OperatorMultigrid(prob))):
        res = solver.solve(f.astype(np.float32), tolerance=1e-6,
                           max_iterations=2000)
        assert res.converged, res.summary()
        u = np.asarray(res.grid.interior(), np.float64)
        assert np.max(np.abs(u - u_dense)) < 5e-4 * scale


def test_warm_start():
    """Warm-start composition with r0-relative semantics (same
    contract as CG/BiCGStab): a coarse solve continued at a tighter
    tolerance must contract the coarse iterate's residual by that
    factor."""
    shape = (12, 13)
    prob = AdvectionDiffusionProblem(
        shape=shape, velocity=(0.5, -0.25), nu=1.0)
    rng = np.random.default_rng(10)
    f = rng.normal(size=shape).astype(np.float32)
    s = GMRES(prob)
    cold = s.solve(f, tolerance=1e-2, max_iterations=300)
    warm = s.solve(f, tolerance=1e-3, max_iterations=300,
                   initial=cold.grid)
    assert warm.converged
    assert warm.residual <= 1.1e-3 * cold.residual


def test_distributed_matches_single_device():
    import jax
    from jax.sharding import Mesh

    shape = (17, 16)
    prob = AdvectionDiffusionProblem(
        shape=shape, velocity=(1.0, -0.5), nu=1.0, scheme="upwind")
    rng = np.random.default_rng(11)
    f = rng.normal(size=shape).astype(np.float32)
    single = GMRES(prob).solve(f, tolerance=1e-6, max_iterations=500)
    mesh = Mesh(np.array(jax.devices()[:4]), ("x",))
    dist = GMRES(prob).solve(f, tolerance=1e-6, max_iterations=500,
                             mesh=mesh)
    assert single.converged and dist.converged
    d = np.max(np.abs(np.asarray(single.grid.interior(), np.float64)
                      - np.asarray(dist.grid.interior(), np.float64)))
    scale = np.max(np.abs(np.asarray(single.grid.interior(),
                                     np.float64)))
    assert d < 1e-4 * scale, (d, scale)


def test_gates():
    prob = AdvectionDiffusionProblem(
        shape=(8, 8), velocity=(0.5, 0.5), nu=1.0)
    with pytest.raises(ValueError, match="restart"):
        GMRES(prob, restart=0)
    with pytest.raises(ValueError, match="Dirichlet"):
        GMRES(AdvectionDiffusionProblem(
            shape=(8, 8), velocity=(0.5, 0.5), nu=1.0,
            bc=DirichletBC.zero(2).with_periodic((0,))))
    other = AdvectionDiffusionProblem(
        shape=(9, 9), velocity=(0.5, 0.5), nu=1.0)
    from stencil_tpu.multigrid import OperatorMultigrid

    with pytest.raises(ValueError, match="different problem"):
        GMRES(prob, preconditioner=OperatorMultigrid(other))
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8]).reshape(2, 2, 2)
    with pytest.raises(ValueError, match="1D or 2D"):
        GMRES(prob).solve(np.zeros((8, 8), np.float32),
                          mesh=Mesh(devs, ("x", "y", "z")))


def test_eigenvector_rhs_resolves_in_one_step():
    """The manufactured sine RHS is a single eigenvector of the
    discrete Laplacian: GMRES must resolve it within the first Arnoldi
    steps — exercising the near-breakdown exit (the residual estimate
    collapses while the basis is almost degenerate) and the masked
    back substitution at tiny jfin."""
    from stencil_tpu.models.poisson import manufactured_sine

    shape = (63, 63, 63)
    prob = PoissonProblem(shape=shape)
    f, u = manufactured_sine(shape)
    # tolerance 1e-4, not CG's 1e-5: GMRES certifies on the TRUE
    # residual of the solution, which floors at ~6e-5 relative for
    # this stiff operator (CG's certificate is the recurrence
    # residual); the stall guard must also exit a 1e-5 request
    # quickly instead of grinding the budget at the floor
    res = GMRES(prob).solve(f, tolerance=1e-4, max_iterations=1000)
    assert res.converged and res.iterations <= 8, res.summary()
    floor = GMRES(prob).solve(f, tolerance=1e-6, max_iterations=1000)
    assert not floor.converged and floor.iterations <= 64, \
        floor.summary()
    err = np.max(np.abs(np.asarray(res.grid.interior(), np.float64)
                        - u))
    assert err < 1.2 * (1.0 / 64) ** 2, err


def test_budget_zero_returns_honest_certificate():
    """max_iterations <= 0 runs zero Arnoldi steps but still evaluates
    the TRUE residual of the initial iterate — same budget-0 contract
    as BiCGStab — and a warm start already below tolerance reports
    converged=True."""
    shape = (9, 10)
    prob = AdvectionDiffusionProblem(
        shape=shape, velocity=(0.5, -0.25), nu=1.0)
    rng = np.random.default_rng(11)
    f = rng.normal(size=shape).astype(np.float32)
    s = GMRES(prob)
    cold = s.solve(f, tolerance=1e-5, max_iterations=0)
    assert cold.iterations == 0 and not cold.converged
    assert np.isfinite(cold.residual) and cold.residual > 0
    assert abs(cold.residual - float(np.linalg.norm(f))) \
        <= 1e-4 * cold.residual
    # warm budget-0: the ABSOLUTE certificate is the warm iterate's
    # true residual (rrel is 1.0 by the r0-relative contract — the
    # baseline is the warm start's own residual)
    solved = s.solve(f, tolerance=1e-4, max_iterations=500)
    assert solved.converged
    warm = s.solve(f, tolerance=1e-2, max_iterations=0,
                   initial=solved.grid)
    assert warm.iterations == 0, warm.summary()
    assert warm.residual <= 1.01 * solved.residual


def test_stall_ratio_none_spends_budget():
    """stall_ratio=None disables the stall guard: a floored solve
    keeps restarting until the step budget is gone (the legitimate
    slow-contraction regime must not be force-aborted)."""
    shape = (15, 15)
    prob = PoissonProblem(shape=shape)
    rng = np.random.default_rng(12)
    f = rng.normal(size=shape).astype(np.float32)
    s = GMRES(prob, restart=4)
    # fp32 floor: an unreachable tolerance stalls the certificate. A
    # STRICT guard (demand 2x contraction per cycle) must abort early;
    # stall_ratio=None must grind the whole budget.
    guarded = s.solve(f, tolerance=1e-12, max_iterations=64,
                      stall_ratio=0.5)
    free = s.solve(f, tolerance=1e-12, max_iterations=64,
                   stall_ratio=None)
    assert not guarded.converged and not free.converged
    assert guarded.iterations < 64
    assert free.iterations == 64
    # and the honest certificates agree within the floor band
    assert free.residual_rel <= guarded.residual_rel * 1.5


def test_oversized_restart_fails_eagerly(monkeypatch):
    """An Arnoldi basis that cannot fit in half of device memory must
    refuse BEFORE allocation, with sizing guidance."""
    monkeypatch.setenv("STENCIL_TPU_HBM_MB", "1")  # 1 MiB device
    prob = PoissonProblem(shape=(63, 63, 63))  # ~1 MB per basis vector
    f = np.zeros((63, 63, 63), np.float32)
    with pytest.raises(ValueError, match="Reduce restart"):
        GMRES(prob, restart=16).solve(f)
