"""Steady heterogeneous diffusion (-div(a grad u) = f,
models/diffusion.py:HeterogeneousPoissonProblem) through the
field-operator Krylov path: dense float64 differential, the uniform-a
Poisson limit, the FTCS steady-state cross-check, coefficient-coarsened
multigrid preconditioning, the distributed solve, and the gates.
"""

import numpy as np
import pytest

from stencil_tpu.core.grid import DirichletBC
from stencil_tpu.krylov import BiCGStab
from stencil_tpu.models.diffusion import (
    HeterogeneousDiffusion,
    HeterogeneousPoissonProblem,
)
from stencil_tpu.multigrid import OperatorMultigrid


def two_material(shape, lo=0.1, hi=1.0, seed=0):
    rng = np.random.default_rng(seed)
    return np.where(rng.random(shape) > 0.5, hi, lo)


def dense_operator(prob) -> np.ndarray:
    """Dense float64 zero-wall operator from the weight FIELDS (row p:
    ``(A u)_p = sum_t w_t[p] u_{p + off_t}``)."""
    shape = tuple(prob.shape)
    n = int(np.prod(shape))
    ids = np.arange(n).reshape(shape)
    A = np.zeros((n, n), np.float64)
    offsets, fields = prob.operator_fields()
    for off, w in zip(offsets, fields):
        dst = tuple(slice(max(0, -o), min(s, s - o))
                    for o, s in zip(off, shape))
        src = tuple(slice(max(0, o), min(s, s + o))
                    for o, s in zip(off, shape))
        A[ids[dst].ravel(), ids[src].ravel()] += w[dst].ravel()
    return A


def test_matches_dense_solve():
    shape = (5, 6, 7)
    prob = HeterogeneousPoissonProblem(shape=shape,
                                       a=two_material(shape))
    rng = np.random.default_rng(1)
    f = rng.normal(size=shape)
    u_dense = np.linalg.solve(dense_operator(prob),
                              f.ravel()).reshape(shape)
    res = BiCGStab(prob).solve(f.astype(np.float32), tolerance=1e-6,
                               max_iterations=1000)
    assert res.converged, res.summary()
    u = np.asarray(res.grid.interior(), np.float64)
    assert np.max(np.abs(u - u_dense)) < 5e-4 * np.max(np.abs(u_dense))


def test_uniform_a_reduces_to_poisson():
    """a = const c: the operator is c * (-laplacian), so the solution
    of A u = f equals the Poisson solution of laplacian(u) = -f/c."""
    from stencil_tpu.krylov import ConjugateGradient
    from stencil_tpu.models.poisson import PoissonProblem

    shape = (15, 15, 15)
    c = 2.0
    prob = HeterogeneousPoissonProblem(shape=shape,
                                       a=np.full(shape, c))
    rng = np.random.default_rng(2)
    f = rng.normal(size=shape).astype(np.float32)
    het = BiCGStab(prob).solve(f, tolerance=1e-6, max_iterations=1000)
    pois = ConjugateGradient(PoissonProblem(shape=shape)).solve(
        -f / c, tolerance=1e-6, max_iterations=1000)
    assert het.converged and pois.converged
    d = np.max(np.abs(np.asarray(het.grid.interior(), np.float64)
                      - np.asarray(pois.grid.interior(), np.float64)))
    scale = np.max(np.abs(np.asarray(pois.grid.interior(), np.float64)))
    assert d < 1e-3 * scale + 1e-7, d


def test_steady_state_matches_ftcs_marching():
    """f = 0 with hot/cold walls: the BiCGStab solve of the steady
    operator must land on the state the FTCS time-marcher relaxes to
    (same face coefficients by construction — this pins the two
    discretizations against each other)."""
    from stencil_tpu import solver

    shape = (31, 31)
    a = two_material(shape, lo=0.2, hi=1.0, seed=3)
    bc = DirichletBC.reference_default(2)
    steady = HeterogeneousPoissonProblem(shape=shape, a=a, h=1.0, bc=bc)
    res = BiCGStab(steady,
                   preconditioner=OperatorMultigrid(steady)).solve(
        np.zeros(shape, np.float32), tolerance=1e-6,
        max_iterations=500)
    assert res.converged, res.summary()

    march = HeterogeneousDiffusion(shape=shape, a=a, h=1.0, bc=bc)
    marched = solver.solve(march.runner(), march.initial_grid(),
                           tolerance=2e-7, max_iterations=200_000,
                           check_every=500)
    d = np.max(np.abs(np.asarray(res.grid.interior(), np.float64)
                      - np.asarray(marched.grid.interior(), np.float64)))
    assert d < 5e-3, d


def test_mg_preconditioning_collapses_iterations():
    shape = (31, 31, 31)
    prob = HeterogeneousPoissonProblem(
        shape=shape, a=two_material(shape, lo=0.05, hi=1.0, seed=4))
    rng = np.random.default_rng(5)
    f = rng.normal(size=shape).astype(np.float32)
    plain = BiCGStab(prob).solve(f, tolerance=1e-5,
                                 max_iterations=3000)
    pre = BiCGStab(prob, preconditioner=OperatorMultigrid(prob)).solve(
        f, tolerance=1e-5, max_iterations=300)
    assert plain.converged and pre.converged, \
        (plain.summary(), pre.summary())
    assert pre.iterations * 3 <= plain.iterations, \
        (pre.iterations, plain.iterations)
    d = np.max(np.abs(np.asarray(plain.grid.interior(), np.float64)
                      - np.asarray(pre.grid.interior(), np.float64)))
    scale = np.max(np.abs(
        np.asarray(plain.grid.interior(), np.float64)))
    assert d < 1e-3 * scale + 1e-6, d


def test_coefficient_coarsening_chain():
    shape = (15, 15)
    prob = HeterogeneousPoissonProblem(shape=shape,
                                       a=two_material(shape, seed=6))
    coarse = prob.with_discretization((7, 7), prob.h * 2)
    assert coarse.a.shape == (7, 7)
    assert np.all(coarse.a > 0)
    # two levels in one jump (the hook is called fine -> level l)
    coarser = prob.with_discretization((3, 3), prob.h * 4)
    assert coarser.a.shape == (3, 3)
    mg = OperatorMultigrid(prob)
    assert mg.levels == 3
    assert mg._probs[1].a.shape == (7, 7)


def test_distributed_preconditioned_matches_single():
    from stencil_tpu.parallel.halo import make_mesh

    shape = (31, 15, 15)
    prob = HeterogeneousPoissonProblem(
        shape=shape, a=two_material(shape, seed=7),
        bc=DirichletBC.reference_default(3))
    rng = np.random.default_rng(8)
    f = rng.normal(size=shape).astype(np.float32)
    s = BiCGStab(prob, preconditioner=OperatorMultigrid(prob))
    single = s.solve(f, tolerance=1e-5, max_iterations=300)
    dist = s.solve(f, tolerance=1e-5, max_iterations=300,
                   mesh=make_mesh((4,), ("x",)), replicate_below=16)
    assert single.converged and dist.converged
    d = np.max(np.abs(np.asarray(single.grid.interior(), np.float64)
                      - np.asarray(dist.grid.interior(), np.float64)))
    scale = np.max(np.abs(
        np.asarray(single.grid.interior(), np.float64)))
    assert d < 1e-3 * scale + 1e-6, d


def test_gates():
    with pytest.raises(ValueError, match="positive"):
        HeterogeneousPoissonProblem(shape=(8, 8),
                                    a=np.zeros((8, 8)))
    with pytest.raises(ValueError, match="Dirichlet"):
        HeterogeneousPoissonProblem(
            shape=(8, 8), a=np.ones((8, 8)),
            bc=DirichletBC.zero(2).with_periodic((0,)))
    prob = HeterogeneousPoissonProblem(shape=(8, 8), a=np.ones((8, 8)))
    with pytest.raises(ValueError, match="cannot coarsen"):
        prob.with_discretization((3, 3), 0.1)
