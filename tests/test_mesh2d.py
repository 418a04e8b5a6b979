"""2D-mesh distributed solvers (round-5 verdict item 4): the Krylov
and multigrid stacks over a (2, 4) device mesh — the virtual-CPU twin
of the v5e-16 4x4 torus (the analog of the reference's natively-2D
8x8 CPE mesh, /root/reference/src/stencil/slave/stencil_rma.cpp:194).

Every solver must (a) accept a 2D mesh, (b) land on the single-device
iterate bit-for-fp32-rounding, and (c) keep the collective profile
clean (dots = all-reduces, halos = collective-permutes, nothing else).
"""

import numpy as np
import pytest

from stencil_tpu.models.advection_diffusion import AdvectionDiffusionProblem
from stencil_tpu.models.poisson import PoissonProblem, manufactured_sine
from stencil_tpu.multigrid import Multigrid, OperatorMultigrid
from stencil_tpu.krylov import BiCGStab, ConjugateGradient, GMRES
from stencil_tpu.parallel.halo import make_mesh


# wide enough for per-axis replicate_below, ODD widths for a deep
# vertex-centered ladder: (127,39,15) -> (63,19,7) -> (31,9,3), whose
# last level keeps d0 sharded after d1 collapsed (the per-axis case)
SHAPE = (127, 39, 15)


def _mesh2d():
    return make_mesh((2, 4), ("x", "y"))


def _poisson():
    prob = PoissonProblem(SHAPE)
    f, u_ex = manufactured_sine(SHAPE, h=prob.h)
    return prob, f.astype(np.float32), u_ex


def test_pcg_2d_mesh_matches_single_device():
    prob, f, u_ex = _poisson()
    single = ConjugateGradient(prob, preconditioner=Multigrid(prob))
    dist = ConjugateGradient(prob, preconditioner=Multigrid(prob))
    r1 = single.solve(f, tolerance=1e-5, max_iterations=50)
    r2 = dist.solve(f, tolerance=1e-5, max_iterations=50,
                    mesh=_mesh2d())
    assert r2.converged and r2.iterations == r1.iterations
    np.testing.assert_allclose(
        np.asarray(r2.grid.interior()), np.asarray(r1.grid.interior()),
        atol=5e-5)
    err = np.max(np.abs(np.asarray(r2.grid.interior(), np.float64)
                        - u_ex))
    # sanity bar only (the bit-match above is the real check): the
    # short-extent dims raise the discretization constant well above
    # the isotropic h^2/12
    assert err < 100 * float(prob.h) ** 2


def test_plain_cg_2d_mesh_converges():
    prob, f, _ = _poisson()
    r = ConjugateGradient(prob).solve(f, tolerance=1e-5,
                                      max_iterations=2000,
                                      mesh=_mesh2d())
    assert r.converged


@pytest.mark.parametrize("cls,kw", [(BiCGStab, {}), (GMRES,
                                                     {"restart": 8})])
def test_nonsymmetric_2d_mesh_preconditioned(cls, kw):
    prob = AdvectionDiffusionProblem(SHAPE, velocity=(2.0, 1.0, 0.0),
                                     nu=0.1)
    rng = np.random.default_rng(0)
    f = rng.normal(size=SHAPE).astype(np.float32)
    pre = OperatorMultigrid(prob)
    r1 = cls(prob, preconditioner=pre, **kw).solve(
        f, tolerance=1e-5, max_iterations=200)
    r2 = cls(prob, preconditioner=pre, **kw).solve(
        f, tolerance=1e-5, max_iterations=200, mesh=_mesh2d())
    assert r2.converged
    # same preconditioned trajectory: identical iteration counts and
    # fp32-rounding-level iterates
    assert r2.iterations == r1.iterations
    np.testing.assert_allclose(
        np.asarray(r2.grid.interior()), np.asarray(r1.grid.interior()),
        atol=1e-4)


def test_unpreconditioned_2d_mesh_gmres():
    prob = AdvectionDiffusionProblem((18, 18, 15), velocity=(1.0, 0, 0),
                                     nu=0.5)
    rng = np.random.default_rng(1)
    f = rng.normal(size=prob.shape).astype(np.float32)
    mesh = make_mesh((2, 2), ("x", "y"))
    r1 = GMRES(prob, restart=20).solve(f, tolerance=1e-5,
                                       max_iterations=200)
    r2 = GMRES(prob, restart=20).solve(f, tolerance=1e-5,
                                       max_iterations=200, mesh=mesh)
    assert r2.converged and r2.iterations == r1.iterations


def test_sharded_mg_runner_2d_mesh():
    prob, f, _ = _poisson()
    mg = Multigrid(prob)
    runner = mg.sharded_runner(f, _mesh2d())
    info = runner.plan_info
    assert info["mesh"] == [2, 4]
    assert info["replicate_below"] == [17, 17]
    g = runner.iterate(prob.initial_grid(), 8)
    ref = mg.runner(f).iterate(prob.initial_grid(), 8)
    np.testing.assert_allclose(np.asarray(g.interior()),
                               np.asarray(ref.interior()), atol=5e-5)
    # per-axis replicate decisions: the last level still shards on d0
    # after d1's width collapsed (31 >= 17 > 9)
    sh, flags, rb = mg._level_shardings(_mesh2d())
    specs = [tuple(s.spec) for s in sh]
    assert specs[0][:2] == ("x", "y")
    assert any(s[0] == "x" and s[1] is None for s in specs), specs


def test_2d_mesh_gates():
    prob, f, _ = _poisson()
    cg = ConjugateGradient(prob)
    mesh3 = make_mesh((2, 2, 2), ("x", "y", "z"))
    with pytest.raises(ValueError, match="1D or 2D"):
        cg.solve(f, max_iterations=2, mesh=mesh3)
    with pytest.raises(ValueError, match="out of range"):
        cg.solve(f, max_iterations=2, mesh=_mesh2d(), dim=2)
    # fine level too narrow along one axis -> refused with guidance
    small = PoissonProblem((34, 15, 15))
    fs = np.ones(small.shape, np.float32)
    with pytest.raises(ValueError, match="too narrow"):
        ConjugateGradient(small, preconditioner=Multigrid(small)).solve(
            fs, max_iterations=2, mesh=_mesh2d())


def test_pcg_2d_reductions_are_exactly_the_krylov_dots():
    """The 2D-mesh PCG compiled-HLO profile matches the 1D one: the
    only all-reduces are the algorithm's 4 dot products per iteration
    (now over BOTH mesh axes), no all-to-all / reduce-scatter."""
    import jax

    from stencil_tpu.parallel.comm_audit import audit_gspmd

    prob = PoissonProblem((63, 35, 15))
    cg = ConjugateGradient(prob, preconditioner=Multigrid(prob))
    fn = cg._solve_fn(1e-5, 100, make_mesh((2, 2), ("x", "y")), 0, 16)
    pad = jax.ShapeDtypeStruct(tuple(s + 2 for s in prob.shape),
                               np.float32)
    fs = jax.ShapeDtypeStruct(tuple(prob.shape), np.float32)
    c = audit_gspmd(fn, pad, fs)
    # the 4 logical Krylov dots; GSPMD may lower each 2-axis reduction
    # as one op per mesh axis (8) or one op over both (4)
    assert c["all-reduce"] in (4, 8), c
    assert c["all-to-all"] == 0 and c["reduce-scatter"] == 0, c
    assert c["collective-permute"] > 0, c
