"""Solver CLI surface (--solve/--solver): dispatch, certificates,
checkpoint/resume invariance, warm starts, distributed solves, and the
solver sweep harness — the round-5 wiring of the solver stack into the
same name->method UX the reference's CLI has for kernels
(/root/reference/src/main.cpp:46-50)."""

import json
import os

import numpy as np
import pytest

from stencil_tpu.cli import run_all
from stencil_tpu.config import RunConfig, parse_args


def _run(tmp_path=None, **kw):
    out = open(os.devnull, "w")
    cfg = RunConfig(**kw)
    return run_all(cfg, out=out)


def test_parse_solver_flags():
    cfg = parse_args([
        "--solve", "advdiff", "--solver", "gmres", "--tol", "1e-4",
        "--restart", "8", "--precond", "opmg", "--velocity", "2", "1",
        "--nu", "0.25", "--scheme", "central", "-s", "15", "15",
        "-i", "300",
    ])
    assert cfg.solve == "advdiff" and cfg.solver == "gmres"
    assert cfg.tolerance == 1e-4 and cfg.restart == 8
    assert cfg.precond == "opmg" and cfg.velocity == (2.0, 1.0)
    assert cfg.nu == 0.25 and cfg.scheme == "central"


def test_poisson_pcg_end_to_end():
    (rec,) = _run(solve="poisson", size=(15, 15, 15), iterations=100,
                  tolerance=1e-5, check=True)
    assert rec["solver"] == "pcg" and rec["converged"]
    assert rec["residual_rel"] <= 1e-5
    # float64 re-certification OUTSIDE the solve
    assert rec["check"]["residual_f64_rel"] < 1e-3
    # manufactured sine: the solution error is at discretization level
    h2 = (1.0 / 16) ** 2
    assert rec["check"]["error_vs_exact"] < 3 * h2


def test_manufactured_sine_non_cubic():
    """Regression: the manufactured problem must be exact on NON-cubic
    grids too (per-dim extents — the pre-fix version silently posed
    wrong walls for shape[d] != shape[0])."""
    (rec,) = _run(solve="poisson", size=(24, 15, 11), iterations=100,
                  tolerance=1e-5, check=True)
    assert rec["converged"]
    h2 = (1.0 / 25) ** 2
    assert rec["check"]["error_vs_exact"] < 5 * h2


@pytest.mark.parametrize("solver,family", [
    ("bicgstab", "advdiff"), ("gmres", "advdiff"),
    ("bicgstab", "hetero"),
])
def test_nonsymmetric_solvers_converge(solver, family):
    kw = dict(solve=family, solver=solver, size=(15, 15, 15),
              iterations=400, tolerance=1e-5, check=True)
    if family == "hetero":
        kw["contrast"] = 25.0
    (rec,) = _run(**kw)
    assert rec["converged"], rec
    assert rec["check"]["residual_f64_rel"] < 1e-4


def test_mg_fmg_relax_poisson():
    (mg,) = _run(solve="poisson", solver="mg", size=(15, 15, 15),
                 iterations=30, tolerance=1e-6, check=True)
    assert mg["converged"] and mg["check"]["error_vs_exact"] < 1e-2
    (fmg,) = _run(solve="poisson", solver="fmg", size=(15, 15, 15),
                  check=True)
    assert fmg["iterations"] == 1
    h2 = (1.0 / 16) ** 2
    assert fmg["check"]["error_vs_exact"] < 3 * h2
    (rx,) = _run(solve="poisson", solver="relax", size=(15, 15),
                 iterations=3000, tolerance=1e-7)
    assert rx["converged"]


def test_dispatch_errors_are_records_not_tracebacks():
    (rec,) = _run(solve="advdiff", solver="pcg", size=(15, 15),
                  iterations=10)
    assert "error" in rec and "Poisson" in rec["error"]
    (rec,) = _run(solve="poisson", solver="cg", precond="opmg",
                  size=(15, 15), iterations=10)
    assert "error" in rec
    (rec,) = _run(solve="hetero", solver="bicgstab", contrast=0.5,
                  size=(15, 15), iterations=10)
    assert "error" in rec and "contrast" in rec["error"]


def test_checkpoint_resume_is_invariant(tmp_path):
    """A solve interrupted at a checkpoint and resumed must land on the
    same iterate/count as the uninterrupted chunked solve (the ||b||
    re-anchoring keeps chunk tolerances solve-invariant)."""
    kw = dict(solve="advdiff", solver="bicgstab", precond="none",
              size=(15, 15, 15), iterations=300, tolerance=1e-5,
              checkpoint_dir=str(tmp_path / "ck"), checkpoint_every=25)
    (fresh,) = _run(**kw)
    assert fresh["converged"] and fresh["checkpointed"]
    # drop the last checkpoint -> resume re-runs only the final chunk
    cks = sorted((tmp_path / "ck").glob("step_*.npz"))
    assert len(cks) >= 2
    cks[-1].unlink()
    (resumed,) = _run(**kw)
    assert resumed["converged"]
    assert resumed["iterations"] == fresh["iterations"]
    np.testing.assert_allclose(resumed["residual"], fresh["residual"],
                               rtol=1e-6)


def test_checkpoint_refuses_foreign_run(tmp_path):
    kw = dict(solve="poisson", solver="cg", size=(15, 15, 15),
              iterations=60, tolerance=1e-4,
              checkpoint_dir=str(tmp_path / "ck"), checkpoint_every=50)
    _run(**kw)
    kw["solver"] = "pcg"
    with pytest.raises(ValueError, match="refusing to resume"):
        _run(**kw)


def test_fmg_warm_start_polishes():
    (rec,) = _run(solve="poisson", solver="gmres", warm_start="fmg",
                  size=(15, 15, 15), iterations=60, tolerance=1e-4,
                  check=True)
    assert rec["plan"]["warm_start"] == "fmg"
    assert rec["converged"]
    # the warm start means few Krylov iterations do the polishing
    assert rec["iterations"] <= 10


def test_distributed_solve_on_mesh():
    # fine level must be wide enough to shard (replicate_below >= 17)
    (rec,) = _run(solve="poisson", size=(18, 15, 15), mesh=(2,),
                  iterations=100, tolerance=1e-5, check=True)
    assert rec["converged"] and rec["plan"]["mesh"] == [2]
    h2 = (1.0 / 19) ** 2
    assert rec["check"]["error_vs_exact"] < 3 * h2


def test_json_out_schema(tmp_path):
    path = tmp_path / "solve.jsonl"
    _run(solve="poisson", size=(15, 15, 15), iterations=100,
         tolerance=1e-4, check=True, json_out=str(path), repeat=2)
    rec = json.loads(path.read_text())
    for key in ("solve", "solver", "iterations", "residual",
                "residual_rel", "converged", "plan", "check",
                "wall_seconds"):
        assert key in rec, key
    assert len(rec["wall_seconds"]) == 2


def test_solver_sweep_configs_cross_product():
    from stencil_tpu.sweep import solver_sweep_configs

    cfgs = solver_sweep_configs(
        families=("poisson",), solvers=("pcg", "gmres"), sizes=(15,),
        restarts=(8, 16), ndim=3, iterations=50)
    # restart only varies gmres rows: pcg x1 + gmres x2
    assert len(cfgs) == 3
    assert all(c.solve == "poisson" for c in cfgs)
    gm = [c for c in cfgs if c.solver == "gmres"]
    assert sorted(c.restart for c in gm) == [8, 16]


def test_main_exit_codes(tmp_path):
    from stencil_tpu import cli

    assert cli.main(["--platform", "cpu", "--solve", "poisson", "-s",
                     "15", "15", "-i", "100", "--tol", "1e-4"]) == 0
    # an unconverged solve is a nonzero exit (same contract as a
    # failed -c on the iterate path)
    assert cli.main(["--platform", "cpu", "--solve", "poisson", "-s",
                     "15", "15", "-i", "2", "--tol", "1e-12",
                     "--solver", "cg"]) == 1
