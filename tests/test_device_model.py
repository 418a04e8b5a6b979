"""Device-derived resource model (``stencil_tpu.device_model``) and the
autotuner hardening that rides on it (round-3 verdict items 2 and 7).

The contract under test:
  - at the 128MiB reference VMEM every derived budget reproduces the
    historical bisected v5e literal BIT-EXACTLY and no scoped-limit cap
    applies (the limit VALUE changes Mosaic's schedule);
  - on other capacities budgets scale proportionally and scoped limits
    are capped below physical VMEM;
  - plans built under simulated 16/32/64/128MB capacities (env override
    ``STENCIL_TPU_VMEM_MB``) are feasible and still golden-correct;
  - the autotuner widens its measured candidate head on TPU kinds the
    ranking model was not fitted on, and ``force`` re-measures a cache
    hit and warns on drift.
"""

import numpy as np
import pytest

from stencil_tpu import autotune, device_model
from stencil_tpu.core.grid import HaloGrid
from stencil_tpu.core.spec import get_spec
from stencil_tpu.ops import golden

MIB = 1024 * 1024


def test_reference_capacity_reproduces_v5e_literals():
    b = device_model.budgets(128 * MIB)
    assert b.tiled_budget == 52 * MIB
    assert b.tiled_limit_floor == 48 * MIB
    assert b.slab_budget == 24 * MIB
    assert b.slab_limit_floor == 32 * MIB
    assert b.rma_block_budget == 40 * MIB
    assert b.rma_limit == 48 * MIB
    assert b.slide_budget == 96 * MIB
    assert b.limit_cap is None  # bisected v5e limit values stay untouched


def test_budgets_scale_proportionally_and_cap():
    b = device_model.budgets(64 * MIB)
    assert b.tiled_budget == 26 * MIB
    assert b.rma_block_budget == 20 * MIB
    assert b.slide_budget == 48 * MIB
    assert b.limit_cap == 60 * MIB
    assert device_model.cap_limit(200 * MIB, b) == 60 * MIB
    b16 = device_model.budgets(16 * MIB)
    assert b16.tiled_budget == 6.5 * MIB
    assert b16.limit_cap == 12 * MIB


def test_env_override_drives_vmem(monkeypatch):
    monkeypatch.setenv("STENCIL_TPU_VMEM_MB", "32")
    assert device_model.vmem_bytes() == 32 * MIB
    monkeypatch.delenv("STENCIL_TPU_VMEM_MB")
    # CPU backend falls back to the reference capacity so default plans
    # built in tests match plans built on v5e silicon
    assert device_model.vmem_bytes() == 128 * MIB


def test_kind_table():
    assert device_model._detected_vmem() == 128 * MIB  # cpu fallback
    for sub, cap in device_model.VMEM_BY_KIND:
        assert cap == 16 * MIB and sub in ("v2", "v3")


@pytest.mark.parametrize("mb", [16, 32, 64, 128])
def test_plans_under_simulated_capacity_stay_correct(monkeypatch, mb):
    """Auto-chosen plans under each simulated VMEM capacity must be
    budget-feasible, respect the scoped-limit cap, and match golden."""
    monkeypatch.setenv("STENCIL_TPU_VMEM_MB", str(mb))
    from stencil_tpu.ops.pallas_tiled import (
        TiledPallasStencil, _vmem_bytes,
    )

    spec = get_spec("jacobi7")
    shape = (16, 24, 20)
    m = TiledPallasStencil(spec, shape, sweeps_per_call=2, interpret=True)
    p = m.plan
    b = device_model.budgets()
    assert _vmem_bytes(spec, shape, "float32", 2, p.s0, p.t1,
                       p.tap_mode) <= b.tiled_budget
    if b.limit_cap is not None:
        assert p.vmem_limit <= b.limit_cap
    grid = HaloGrid.create(shape, halo=spec.radius)
    out = m.iterate(grid, 4)
    ref = golden.golden_iterate(np.zeros(shape, np.float64), spec, 4,
                                bc=grid.bc)
    np.testing.assert_allclose(np.asarray(out.interior(), np.float64),
                               ref, atol=5e-6, rtol=5e-6)


def test_slab_plan_under_simulated_capacity(monkeypatch):
    monkeypatch.setenv("STENCIL_TPU_VMEM_MB", "16")
    from stencil_tpu.ops.pallas import PallasStencil

    spec = get_spec("jacobi5")
    shape = (32, 40)
    m = PallasStencil(spec, shape, sweeps_per_call=2, interpret=True)
    grid = HaloGrid.create(shape, halo=spec.radius)
    out = m.iterate(grid, 4)
    ref = golden.golden_iterate(np.zeros(shape, np.float64), spec, 4,
                                bc=grid.bc)
    np.testing.assert_allclose(np.asarray(out.interior(), np.float64),
                               ref, atol=5e-6, rtol=5e-6)


def test_rma_budget_scales(monkeypatch):
    """A block that fits the v5e residency budget must refuse cleanly
    under a simulated 16MB part."""
    from stencil_tpu.parallel import rma

    spec = get_spec("jacobi7")
    monkeypatch.setenv("STENCIL_TPU_VMEM_MB", "128")
    rma.make_rma_plan(spec, (64, 64, 128), "float32", (2,), 2)
    monkeypatch.setenv("STENCIL_TPU_VMEM_MB", "16")
    with pytest.raises(ValueError, match="VMEM-resident budget"):
        rma.make_rma_plan(spec, (64, 64, 128), "float32", (2,), 2)


# ---- autotuner hardening -------------------------------------------------


def test_candidate_limit_widens_off_fitted_kind():
    assert autotune._default_limit("tpu:TPU v5 lite") == 4
    assert autotune._default_limit("tpu:TPU v4") == 8
    assert autotune._default_limit("tpu:TPU v6 lite") == 8
    assert autotune._default_limit("cpu:cpu") == 4  # not a tune target


def test_candidates_widened_head(monkeypatch):
    spec = get_spec("jacobi7")
    narrow = autotune.candidates(spec, (256, 256, 256), "float32", 8,
                                 limit=4)
    wide = autotune.candidates(spec, (256, 256, 256), "float32", 8,
                               limit=8)
    assert len(wide) >= 8 > len(narrow)
    # the widened set is a superset: ranked heads extend, never reshuffle
    assert set(map(tuple, (c[0] for c in narrow))) <= \
        set(map(tuple, (c[0] for c in wide)))


def test_autotune_force_warns_on_drift(tmp_path, capsys):
    spec = get_spec("jacobi7")
    path = str(tmp_path / "cache.json")
    shape, dtype, k = (32, 32, 32), "float32", 2

    # seed the cache with a measured winner
    autotune.autotune(spec, shape, dtype, k, cache_path=path,
                      measure_fn=lambda t, m, s: 100.0)
    first = autotune.lookup(spec, shape, dtype, k, cache_path=path)
    assert first is not None and first["glups"] == 100.0

    # plain lookup trusts the cache (no re-measure)
    hit = autotune.autotune(spec, shape, dtype, k, cache_path=path,
                            measure_fn=lambda t, m, s: 1 / 0)
    assert hit == first
    capsys.readouterr()

    # force re-measures; a >5% move warns and updates the cache
    out = autotune.autotune(spec, shape, dtype, k, cache_path=path,
                            measure_fn=lambda t, m, s: 50.0, force=True)
    assert out["glups"] == 50.0
    assert "CACHE DRIFT" in capsys.readouterr().err
    assert autotune.lookup(spec, shape, dtype, k,
                           cache_path=path)["glups"] == 50.0


def test_cli_autotune_flag_parsing():
    from stencil_tpu.config import parse_args

    assert parse_args(["-s", "32", "-i", "1"]).autotune is False
    assert parse_args(["-s", "32", "-i", "1", "--autotune"]).autotune == "on"
    assert parse_args(
        ["-s", "32", "-i", "1", "--autotune", "force"]
    ).autotune == "force"


def test_cli_records_applied_plan(tmp_path):
    """The CLI JSON must say WHAT plan a tiled run used (tiles, tap
    mode, source) so an autotuned run is distinguishable from pinned
    defaults."""
    from stencil_tpu.cli import run_all
    from stencil_tpu.config import RunConfig

    cfg = RunConfig(size=(16, 16, 20), spec="jacobi7", iterations=4,
                    temporal=2, methods=("pallas_temporal",))
    results = run_all(cfg)
    plan = results[0]["plan"]
    assert plan["kernel"] == "pallas_tiled"
    assert plan["source"] == "pinned"
    assert len(plan["tiles"]) == 2 and plan["k"] == 2
    assert plan["tap_mode"] in ("slice", "roll", "synth", "rotacc")
