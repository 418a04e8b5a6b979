#!/usr/bin/env python
"""Headline benchmark: single-chip 3D 7-point Jacobi (BASELINE.json
north-star config) on the best available method.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

``value`` is GLUPS (1e9 grid-point updates/s). ``vs_baseline`` is the
fraction of the HBM-bandwidth roofline (measured device bandwidth divided
by the compulsory 8 bytes/point/sweep for fp32) — the north-star target is
>= 0.8; temporal blocking can push it past 1.0.
"""

import json
import sys

import numpy as np


def main() -> int:
    import jax

    from stencil_tpu.config import RunConfig
    from stencil_tpu.core.spec import get_spec
    from stencil_tpu.core.grid import HaloGrid
    from stencil_tpu import registry
    from stencil_tpu.utils import roofline
    from stencil_tpu.utils.timing import measure_marginal

    on_tpu = jax.devices()[0].platform == "tpu"
    shape = (256, 256, 256) if on_tpu else (32, 32, 32)
    spec = get_spec("jacobi7")
    dtype = "float32"

    # candidate configs (method, temporal depth); best GLUPS wins
    candidates = [("pallas_temporal", 8), ("pallas_temporal", 4),
                  ("pallas", 1)]
    if not on_tpu:
        candidates = [("xla", 1)]

    try:
        hbm = roofline.measure_hbm_bandwidth()
    except Exception:
        hbm = None

    grid = HaloGrid.create(shape, halo=spec.radius, dtype=dtype)
    points = int(np.prod(shape))
    best = None
    for name, k in candidates:
        cfg = RunConfig(size=shape, spec="jacobi7", temporal=k,
                        methods=(name,))
        try:
            runner = registry.get_runner(name, cfg, spec, grid)

            def run_n(n):
                return runner.iterate(grid, n).data

            m = measure_marginal(run_n, iters_lo=24, iters_hi=72,
                                 warmup_iters=8)
            glups = points / m.seconds_per_iteration / 1e9
            if best is None or glups > best[1]:
                best = (f"{name}(k={k})", glups)
        except Exception as e:
            print(f"# {name}(k={k}) failed: {e}", file=sys.stderr)

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
