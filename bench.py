#!/usr/bin/env python
"""Headline + per-config benchmark (one process, one JSON line).

The primary metric stays the BASELINE north-star config — single-chip 3D
7-point Jacobi GLUPS on the best available method, with ``vs_baseline``
the fraction of the HBM-bandwidth roofline (>= 0.8 target; temporal
blocking can exceed 1.0). Round 2's miss: only the headline was
driver-visible, so a regression in any other BASELINE config would hide
between rounds. The JSON line therefore now carries a ``configs`` map
with every BASELINE configuration (cfg1 2D 5-pt 512^2, cfg2 2D 9-pt
box 4096^2 @k4, cfg3 bf16 256^3, cfg4 radius-2 384^3, rma k=2),
measured in the SAME process to amortize the one-time fetch warmup.

Wall-clock structure on the tunneled TPU backend: the FIRST device->host
fetch of a process costs 3-9 minutes (see stencil_tpu.utils.timing.force),
and a fetch is the only reliable execution fence there. We pay that cost on
a background thread while all kernels compile in the foreground, then join
and measure (everything after the join fetches in ~30 ms).
"""

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax

    from stencil_tpu.config import RunConfig
    from stencil_tpu.core.spec import get_spec
    from stencil_tpu.core.grid import HaloGrid
    from stencil_tpu import registry
    from stencil_tpu.utils import roofline
    from stencil_tpu.utils.timing import measure_marginal, warmup_fetch_async

    t_start = time.perf_counter()

    # If the TPU backend fails to initialize (the axon tunnel goes down
    # between rounds), fall back to CPU so the driver still records a
    # JSON line (flagged) instead of a backend traceback.
    tpu_init_error = None
    try:
        devices = jax.devices()
    except RuntimeError as e:
        tpu_init_error = str(e).splitlines()[0][:160]
        print(f"# TPU backend unavailable ({tpu_init_error}); "
              "falling back to CPU", file=sys.stderr, flush=True)
        jax.config.update("jax_platforms", "cpu")
        devices = jax.devices()

    warm = warmup_fetch_async()  # overlap the one-time D2H cost

    on_tpu = devices[0].platform == "tpu"
    shape = (256, 256, 256) if on_tpu else (32, 32, 32)
    spec = get_spec("jacobi7")
    dtype = "float32"

    # headline candidates (method, temporal depth); best GLUPS wins.
    # pallas_temporal routes 3D grids to the 2D-tiled manual-DMA kernel
    # (ops.pallas_tiled); measured on v5e: k=8 -> 111+ GLUPS vs 11.5 xla.
    candidates = [("pallas_temporal", 8), ("pallas_temporal", 4),
                  ("xla", 1)]
    if not on_tpu:
        candidates = [("xla", 1)]

    # full BASELINE config vector (results/baseline_configs.md rows),
    # one entry per driver-visible regression surface. Trailing dict =
    # extra RunConfig fields (autotune routes through the committed
    # results/autotune_v5e.json cache — a hit applies instantly, so the
    # autotuned-vs-pinned cfg4 pair costs no tuner time here).
    config_rows = []
    if on_tpu:
        config_rows = [
            ("cfg1_2d5pt_512_k16", "jacobi5", (512, 512), "float32",
             "pallas_temporal", 16, None, {}),
            ("cfg2_2d9pt_4096_k4", "jacobi9", (4096, 4096), "float32",
             "pallas_temporal", 4, 256, {}),
            ("cfg3_3d7pt_256_bf16_k8", "jacobi7", (256, 256, 256),
             "bfloat16", "pallas_temporal", 8, None, {}),
            ("cfg4_3dr2_384_k4", "laplace3d_ho", (384, 384, 384),
             "float32", "pallas_temporal", 4, None, {}),
            ("cfg4_3dr2_384_k4_autotuned", "laplace3d_ho",
             (384, 384, 384), "float32", "pallas_temporal", 4, None,
             {"autotune": "on"}),
            # the committed cfg4 OPERATING POINT (round-4: bf16 56.9 is
            # the fastest cfg4 and the docs' recommendation; tracked
            # here so a regression of the number that matters is
            # visible — round-4 verdict weak item 4)
            ("cfg4_3dr2_384_k4_bf16", "laplace3d_ho", (384, 384, 384),
             "bfloat16", "pallas_temporal", 4, None, {}),
            # ragged grid on the fast tiled path (ceil-division clamped
            # tiles; round-3 capability, previously driver-invisible)
            ("cfg6_ragged_257_k8", "jacobi7", (257, 257, 257),
             "float32", "pallas_temporal", 8, None, {}),
            # the REAL config-5 per-device block (weak-scaling compute
            # term, measured 86.6 GLUPS round 4 — the driver artifact
            # should catch a regression of the fat-lane tile widening)
            ("cfg5_local_256x256x1024_k8", "jacobi7", (256, 256, 1024),
             "float32", "pallas_temporal", 8, None, {}),
            # rma keeps the whole block VMEM-resident: 64x64x128 fp32 is
            # the validated k=2 on-silicon geometry (128.2 GLUPS round
            # 2); 128^3 k=2 correctly refuses (3 buffers exceed the
            # residency budget)
            ("rma_64x64x128_k2", "jacobi7", (64, 64, 128), "float32",
             "rma", 2, None, {}),
        ]

    grid = HaloGrid.create(shape, halo=spec.radius, dtype=dtype)
    points = int(np.prod(shape))

    # Phase 1 (foreground, overlapped with the warmup fetch): build runners
    # and compile+dispatch each candidate once. Compilation is the dominant
    # foreground cost and needs no D2H.
    runners = []
    for name, k in candidates:
        cfg = RunConfig(size=shape, spec="jacobi7", temporal=k,
                        methods=(name,))
        try:
            runner = registry.get_runner(name, cfg, spec, grid)
            g = max(1, runner.granularity)
            runner.iterate(grid, 2 * g)  # compile (async dispatch, no fetch)
            runners.append((f"{name}(k={k})", runner))
        except Exception as e:
            print(f"# {name}(k={k}) setup failed: {e}", file=sys.stderr)

    cfg_runners = []
    for key, spec_name, cshape, cdtype, method, k, block, extra \
            in config_rows:
        try:
            cspec = get_spec(spec_name)
            cgrid = HaloGrid.create(cshape, halo=cspec.radius, dtype=cdtype)
            ccfg = RunConfig(size=cshape, spec=spec_name, dtype=cdtype,
                             temporal=k, block=block, methods=(method,),
                             **extra)
            runner = registry.get_runner(method, ccfg, cspec, cgrid)
            g = max(1, runner.granularity)
            runner.iterate(cgrid, 2 * g)  # compile
            cfg_runners.append((key, cgrid, runner,
                                int(np.prod(cshape)), cdtype))
        except Exception as e:
            print(f"# {key} setup failed: {e}", file=sys.stderr)

    # round-4 capability row: Jacobi-Poisson relaxation (fused source
    # term) on the tiled kernel with the source-tuned cached plan —
    # measured 102.2 GLUPS on v5e ((32,64) rotacc; the homogeneous
    # (64,64) default runs 91.4 with a source). x_roofline is reported
    # against the homogeneous 8 B/point roofline like every other row
    # (the affine update reads 4 more B/point, so its ideal ceiling is
    # lower — the fraction understates it).
    if on_tpu:
        try:
            from stencil_tpu.models.poisson import PoissonProblem

            pshape = (256, 256, 256)
            prob = PoissonProblem(shape=pshape)
            rng = np.random.default_rng(0)
            f = rng.normal(size=pshape).astype(np.float32)
            runner = prob.runner(f, method="pallas_tiled",
                                 sweeps_per_call=8, autotune=True)
            pgrid = prob.initial_grid()
            runner.iterate(pgrid, 16)  # compile
            cfg_runners.append(("cfg8_poisson_256_k8_src", pgrid, runner,
                                int(np.prod(pshape)), "float32"))
        except Exception as e:
            print(f"# cfg8_poisson setup failed: {e}", file=sys.stderr)

    # round-4 capability row: leapfrog wave on the two-level temporal
    # kernel (two window streams -> ~2x homogeneous traffic; measured
    # 61.9 GLUPS at the (64,128) plan on v5e, results/ROUND4.md sec 15).
    # GLUPS counts leapfrog steps; x_roofline is vs the homogeneous
    # 8 B/point roofline like every row, so it understates ~2x by design.
    if on_tpu:
        try:
            from stencil_tpu.models.wave import WaveEquation
            from stencil_tpu.registry import Runner as _Runner

            wshape = (256, 256, 256)
            w = WaveEquation(shape=wshape)
            rng = np.random.default_rng(1)
            wprev, wcur = w.initial_pair(
                (rng.normal(size=wshape) * 0.01).astype(np.float32))

            def _wave_iter(g, n, _w=w, _p=wprev):
                _, c = _w.simulate(_p, g, int(n), method="pallas_tiled",
                                   sweeps_per_call=8, tiles=(64, 128))
                return c

            wrunner = _Runner(name="wave_two_level_k8",
                              iterate=_wave_iter, granularity=8)
            wrunner.iterate(wcur, 16)  # compile
            cfg_runners.append(("cfg9_wave_256_k8_two_level", wcur,
                                wrunner, int(np.prod(wshape)), "float32"))
        except Exception as e:
            print(f"# cfg9_wave setup failed: {e}", file=sys.stderr)

    # round-4 capability row: geometric multigrid — V(4,4)-cycles at
    # 255^3 with the Pallas fine level (the best measured ms/decade
    # variant, results/ROUND4.md). "glups" here = interior points per
    # cycle-second (each point is fully multigrid-cycled once per
    # iteration); a cycle moves ~5 fine sweeps' traffic plus the coarse
    # tail, so the naive-sweep roofline fraction is meaningless and the
    # row reports x_roofline: null.
    pcg_item = None
    if on_tpu:
        try:
            from stencil_tpu.models.poisson import PoissonProblem as _PP
            from stencil_tpu.multigrid import Multigrid

            mshape = (255, 255, 255)
            mprob = _PP(shape=mshape)
            rngm = np.random.default_rng(2)
            mf = rngm.normal(size=mshape).astype(np.float32)
            mrunner = Multigrid(mprob, nu1=4, nu2=4,
                                fine_method="pallas_tiled").runner(mf)
            mgrid = mprob.initial_grid()
            mrunner.iterate(mgrid, 1)  # compile
            cfg_runners.append(("cfg10_mg_vcycle_255_nu4", mgrid,
                                mrunner, int(np.prod(mshape)),
                                "float32"))
            # the best measured ms-per-decade cycle (round 4 late:
            # Chebyshev band smoothing, 15.4 ms/decade vs wjacobi's
            # 22.4 — results/ROUND4.md sec 20); same glups-per-
            # cycle-second semantics as cfg10
            mrunner_c = Multigrid(
                mprob, smoother="chebyshev").runner(mf)
            mrunner_c.iterate(mgrid, 1)  # compile
            cfg_runners.append(("cfg11_mg_vcycle_255_cheby", mgrid,
                                mrunner_c, int(np.prod(mshape)),
                                "float32"))
            # round-5: BOTH best levers combined — Chebyshev smoothing
            # AT full temporal blocking on the Pallas fine level
            # (pallas_tiled cheby_coeffs). nu=4 pairs with cfg10's
            # wjacobi nu=4 (same per-cycle work, ~3x the contraction:
            # rho 0.10 vs 0.31) and is the measured-best ms/decade
            # operating point (15.48 — results/ROUND5.md sec 2).
            mrunner_cp = Multigrid(
                mprob, nu1=4, nu2=4, smoother="chebyshev",
                fine_method="pallas_tiled").runner(mf)
            mrunner_cp.iterate(mgrid, 1)  # compile
            cfg_runners.append(("cfg17_mg_vcycle_255_cheby_pallas_nu4",
                                mgrid, mrunner_cp,
                                int(np.prod(mshape)), "float32"))
            # flagship time-to-solution row: chebyshev-preconditioned
            # CG, random RHS, tol 1e-4 (DEVICE-resident rhs — a host
            # rhs re-uploads 66 MB per solve through the tunnel).
            # Compiled and measured in phase 2: its solve() fetches,
            # which must not serialize with the background warmup.
            import jax.numpy as jnp
            from stencil_tpu.krylov import ConjugateGradient

            # preconditioning cycle on the FUSED smooth+residual pallas
            # fine level (round-5: 9.2 vs 11.9 ms/cycle at nu2)
            pcg_item = (
                ConjugateGradient(
                    mprob,
                    preconditioner=Multigrid(
                        mprob, smoother="chebyshev",
                        fine_method="pallas_tiled")),
                jnp.asarray(mf))
        except Exception as e:
            print(f"# cfg10_mg setup failed: {e}", file=sys.stderr)

    # round-4 capability row: upwind advection (asymmetric taps) on the
    # tiled kernel — tap-bound at k=8: measured 136 GLUPS, ABOVE the
    # 7-point headline's 111 (results/ROUND4.md sec 19)
    if on_tpu:
        try:
            from stencil_tpu.core.grid import DirichletBC
            from stencil_tpu.models.advection import Advection
            from stencil_tpu.ops.pallas_tiled import TiledPallasStencil
            from stencil_tpu.registry import Runner as _Runner2

            ashape = (256, 256, 256)
            advm = Advection(shape=ashape,
                             velocity=(0.5, -0.25, 0.125),
                             bc=DirichletBC.reference_default(3))
            am = TiledPallasStencil(advm.spec, ashape, "float32",
                                    sweeps_per_call=8)
            agrid = HaloGrid.create(ashape, halo=1, dtype="float32")
            arunner = _Runner2(name="advection_upwind_k8",
                               iterate=am.iterate, granularity=8)
            arunner.iterate(agrid, 16)  # compile
            cfg_runners.append(("cfg12_advection_upwind_256_k8", agrid,
                                arunner, int(np.prod(ashape)),
                                "float32"))
        except Exception as e:
            print(f"# cfg12_advection setup failed: {e}",
                  file=sys.stderr)

    # round-5 capability rows: the variable-coefficient (heterogeneous
    # diffusion) family — the Pallas coeff kernel (streamed a(x),
    # in-register harmonic face weights) and its XLA fallback, so the
    # family the round-4 verdict called "the one shipped capability
    # that is plainly slow" is regression-tracked on both engines
    if on_tpu:
        try:
            from stencil_tpu.models.diffusion import (
                HeterogeneousDiffusion, two_material,
            )

            vshape = (256, 256, 256)
            va = two_material(vshape, lo=0.01, hi=1.0, seed=0)
            vdiff = HeterogeneousDiffusion(shape=vshape, a=va)
            vgrid = HaloGrid.create(vshape, halo=1, dtype="float32")
            vrun = vdiff.runner(method="pallas_tiled",
                                sweeps_per_call=8, interpret=False)
            vrun.iterate(vgrid, 8)  # compile
            cfg_runners.append(("cfg16_varcoeff_256_k8", vgrid, vrun,
                                int(np.prod(vshape)), "float32"))
            vrun_x = vdiff.runner(method="xla")
            vrun_x.iterate(vgrid, 1)  # compile
            cfg_runners.append(("cfg16b_varcoeff_256_xla", vgrid,
                                vrun_x, int(np.prod(vshape)),
                                "float32"))
        except Exception as e:
            print(f"# cfg16_varcoeff setup failed: {e}",
                  file=sys.stderr)

    try:
        hbm_thunk = roofline.prepare_hbm_measurement()
    except Exception:
        hbm_thunk = None

    warm.join(timeout=600)
    print(f"# warmup+compile phase: {time.perf_counter() - t_start:.1f}s",
          file=sys.stderr)

    # Phase 2: measure (fetch-fenced, fast now)
    try:
        hbm = hbm_thunk() if hbm_thunk else roofline.measure_hbm_bandwidth()
    except Exception:
        hbm = None

    # >=3 marginal repeats per config: the JSON carries the min/median/
    # max GLUPS band so a cross-round delta is distinguishable from
    # within-process noise (round-3 verdict item 5; day-to-day v5e bands
    # are ~3%, results/baseline_configs.md)
    REPEATS = 3

    def measure(runner, g, igrid):
        def run_n(n):
            return runner.iterate(igrid, n).data

        return measure_marginal(run_n, warmup_iters=g, granularity=g,
                                repeats=REPEATS)

    def band(m, npoints):
        gl = sorted(npoints / s / 1e9 for s in m.marginals)
        return round(gl[0], 2), round(gl[-1], 2)

    best = None
    for label, runner in runners:
        g = max(1, runner.granularity)
        try:
            m = measure(runner, g, grid)
            glups = points / m.seconds_per_iteration / 1e9
            lo, hi = band(m, points)
            print(f"# {label}: {glups:.1f} GLUPS [{lo}, {hi}]",
                  file=sys.stderr)
            if best is None or glups > best[1]:
                best = (label, glups, lo, hi)
        except Exception as e:
            print(f"# {label} measure failed: {e}", file=sys.stderr)

    configs_out = {}
    for key, cgrid, runner, cpoints, cdtype in cfg_runners:
        g = max(1, runner.granularity)
        try:
            m = measure(runner, g, cgrid)
            glups = cpoints / m.seconds_per_iteration / 1e9
            lo, hi = band(m, cpoints)
            roof_c = (hbm / roofline.ideal_bytes_per_point(cdtype)
                      if hbm else None)
            if "_mg_" in key:
                roof_c = None  # a V-cycle is not a naive sweep
            configs_out[key] = {
                "glups": round(glups, 2),
                "glups_min": lo, "glups_max": hi, "repeats": REPEATS,
                "x_roofline": round(glups / roof_c, 3) if roof_c else None,
            }
            print(f"# {key}: {glups:.1f} GLUPS [{lo}, {hi}]",
                  file=sys.stderr)
        except Exception as e:
            print(f"# {key} measure failed: {e}", file=sys.stderr)
            configs_out[key] = {"glups": 0.0, "x_roofline": None}

    # time-to-solution rows (solve protocol, not runner protocol):
    # compile + warm on the first solve, then REPEATS timed solves
    solve_items = []
    if pcg_item is not None:
        pcg, pf = pcg_item
        solve_items.append((
            "cfg13_pcg_cheby_255",
            lambda: pcg.solve(pf, tolerance=1e-4, max_iterations=50)))
        # nonsymmetric flagship: steady advection-diffusion
        # (advection-dominated) by MG-preconditioned BiCGStab —
        # measured 186.9 ms / 3 iterations on v5e vs 818.6 / 304
        # unpreconditioned (results/ROUND4.md sec 22)
        try:
            import jax.numpy as _jnp

            from stencil_tpu.krylov import BiCGStab
            from stencil_tpu.models.advection_diffusion import (
                AdvectionDiffusionProblem,
            )
            from stencil_tpu.multigrid import OperatorMultigrid

            adp = AdvectionDiffusionProblem(
                shape=(255, 255, 255), velocity=(1.0, -0.5, 0.25),
                nu=0.05)
            fad = _jnp.asarray(
                np.random.default_rng(3).normal(
                    size=adp.shape).astype(np.float32))
            opmg = OperatorMultigrid(adp)
            bstab = BiCGStab(adp, preconditioner=opmg)
            solve_items.append((
                "cfg14_bicgstab_mg_advdiff_255",
                lambda: bstab.solve(fad, tolerance=1e-4,
                                    max_iterations=3000)))
            # same problem by MG-preconditioned restarted GMRES — the
            # long-recurrence alternative (monotone residual);
            # restart=8 is the measured operating point (CGS2 cost
            # scales with m; results/ROUND4.md sec 23)
            from stencil_tpu.krylov import GMRES

            gmres = GMRES(adp, preconditioner=opmg, restart=8)
            solve_items.append((
                "cfg15_gmres_mg_advdiff_255",
                lambda: gmres.solve(fad, tolerance=1e-4,
                                    max_iterations=3000)))
        except Exception as e:
            print(f"# cfg14 setup failed: {e}", file=sys.stderr)
        # round-5: heterogeneous (variable-coefficient) Poisson solve
        # riding the Pallas coeff matvec inside every Krylov iteration
        try:
            import jax.numpy as _jnp2

            from stencil_tpu.krylov import BiCGStab as _BStab
            from stencil_tpu.models.diffusion import (
                HeterogeneousPoissonProblem, two_material as _tm,
            )
            from stencil_tpu.multigrid import (
                OperatorMultigrid as _OpMG,
            )

            hshape = (255, 255, 255)
            # kernel='auto' resolves to the XLA matvec — measured
            # FASTER for k=1 Krylov applies than the pallas wrapper
            # (278 vs 488 ms at 255^3; the kernel's 7.6x win belongs
            # to the k>=4 marching runner, cfg16)
            hprob = HeterogeneousPoissonProblem(
                shape=hshape, a=_tm(hshape, lo=0.01, hi=1.0, seed=0))
            fhet = _jnp2.asarray(np.random.default_rng(7).normal(
                size=hshape).astype(np.float32))
            hsolver = _BStab(hprob, preconditioner=_OpMG(hprob))
            solve_items.append((
                "cfg18_bicgstab_hetero_255",
                lambda: hsolver.solve(fhet, tolerance=1e-4,
                                      max_iterations=1000)))
        except Exception as e:
            print(f"# cfg18 setup failed: {e}", file=sys.stderr)
    for key, run_solve in solve_items:
        try:
            res = run_solve()  # compile + warm
            times = []
            for _ in range(REPEATS):
                t = time.perf_counter()
                res = run_solve()
                times.append(1e3 * (time.perf_counter() - t))
            ts = sorted(times)
            configs_out[key] = {
                "solve_ms": round(ts[len(ts) // 2], 1),
                "solve_ms_min": round(ts[0], 1),
                "solve_ms_max": round(ts[-1], 1),
                "iterations": res.iterations,
                "converged": res.converged,
                "repeats": REPEATS,
            }
            print(f"# {key}: {ts[len(ts)//2]:.1f} ms "
                  f"[{ts[0]:.1f}, {ts[-1]:.1f}] iters={res.iterations}",
                  file=sys.stderr)
        except Exception as e:
            print(f"# {key} measure failed: {e}", file=sys.stderr)

    if best is None:
        print(json.dumps({"metric": "3d7pt_jacobi_glups", "value": 0.0,
                          "unit": "GLUPS", "vs_baseline": 0.0}))
        return 1

    roof = (hbm / roofline.ideal_bytes_per_point(dtype)) if hbm else None
    vs = (best[1] / roof) if roof else 0.0
    out = {
        "metric": f"3d7pt_jacobi_{shape[0]}^3_fp32_glups[{best[0]}]",
        "value": round(best[1], 2),
        "unit": "GLUPS",
        "vs_baseline": round(vs, 3),
        "value_min": best[2], "value_max": best[3], "repeats": REPEATS,
    }
    # The driver records only the LAST ~2000 chars of stdout; round 4's
    # single line (headline + full per-config map) outgrew that window
    # and BENCH_r04.json recorded "parsed": null. Contract now: the full
    # detail goes on an EARLIER stdout line (and into results/ for the
    # repo record), and the FINAL line stays compact — headline fields
    # plus config names only — so it always parses.
    full = dict(out)
    if configs_out:
        full["configs"] = configs_out
    if tpu_init_error is not None:
        full["tpu_unavailable"] = tpu_init_error
        out["tpu_unavailable"] = tpu_init_error
    print(json.dumps(full))
    try:
        import pathlib

        pathlib.Path("results").mkdir(exist_ok=True)
        pathlib.Path("results/bench_last.json").write_text(
            json.dumps(full, indent=1) + "\n")
    except OSError as e:
        print(f"# results/bench_last.json not written: {e}",
              file=sys.stderr)
    if configs_out:
        out["config_names"] = sorted(configs_out)
    line = json.dumps(out)
    if len(line) > 1900:  # keep headroom under the 2000-char capture
        out.pop("config_names", None)
        line = json.dumps(out)
    print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
