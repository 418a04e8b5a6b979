#!/usr/bin/env python
"""Headline benchmark: single-chip 3D 7-point Jacobi (BASELINE.json
north-star config) on the best available method.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

``value`` is GLUPS (1e9 grid-point updates/s). ``vs_baseline`` is the
fraction of the HBM-bandwidth roofline (measured device bandwidth divided
by the compulsory 8 bytes/point/sweep for fp32) — the north-star target is
>= 0.8; temporal blocking can push it past 1.0.

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
    warm = warmup_fetch_async()  # overlap the one-time D2H cost

    on_tpu = jax.devices()[0].platform == "tpu"
    shape = (256, 256, 256) if on_tpu else (32, 32, 32)
    spec = get_spec("jacobi7")
    dtype = "float32"

    # candidate configs (method, temporal depth); best GLUPS wins.
    # pallas_temporal routes 3D grids to the 2D-tiled manual-DMA kernel
    # (ops.pallas_tiled); measured on v5e: k=8 -> 56 GLUPS vs 11.5 for xla.
    candidates = [("pallas_temporal", 8), ("pallas_temporal", 4),
                  ("xla", 1)]
    if not on_tpu:
        candidates = [("xla", 1)]

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

    best = None
    for label, runner in runners:
        def run_n(n):
            return runner.iterate(grid, n).data

        g = max(1, runner.granularity)
        try:
            m = measure_marginal(run_n, warmup_iters=g, granularity=g)
            glups = points / m.seconds_per_iteration / 1e9
            print(f"# {label}: {glups:.1f} GLUPS", file=sys.stderr)
            if best is None or glups > best[1]:
                best = (label, glups)
        except Exception as e:
            print(f"# {label} measure failed: {e}", file=sys.stderr)

    if best is None:
        print(json.dumps({"metric": "3d7pt_jacobi_glups", "value": 0.0,
                          "unit": "GLUPS", "vs_baseline": 0.0}))
        return 1

    roof = (hbm / roofline.ideal_bytes_per_point(dtype)) if hbm else None
    vs = (best[1] / roof) if roof else 0.0
    print(json.dumps({
        "metric": f"3d7pt_jacobi_{shape[0]}^3_fp32_glups[{best[0]}]",
        "value": round(best[1], 2),
        "unit": "GLUPS",
        "vs_baseline": round(vs, 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
