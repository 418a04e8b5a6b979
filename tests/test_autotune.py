"""Autotuner tests (CPU: measurement injected; the on-device pass runs
via --autotune on real hardware and commits results/autotune_v5e.json)."""

import json

import numpy as np
import pytest

from stencil_tpu import autotune
from stencil_tpu.core.spec import get_spec
from stencil_tpu.ops.pallas_tiled import _vmem_bytes, _resolve_budget


def test_candidates_are_feasible_and_ranked():
    spec = get_spec("jacobi7")
    cands = autotune.candidates(spec, (256, 256, 256), "float32", 8)
    assert cands, "headline config must have candidates"
    modes = {m for _, m, _ in cands}
    assert modes == {"rotacc", "synth"}
    for (s0, t1), mode, slide in cands:
        assert _vmem_bytes(spec, (256, 256, 256), "float32", 8, s0, t1,
                           mode) <= _resolve_budget(None)
        assert not slide  # radius-1: slide measured negative, not offered
    # the model's best (the pinned default 64x64) leads its mode group
    first_rotacc = next(t for t, m, _ in cands if m == "rotacc")
    assert first_rotacc == (64, 64)


def test_radius2_candidates_include_slide():
    from stencil_tpu.core.spec import get_spec as gs

    cands = autotune.candidates(gs("laplace3d_ho"), (384, 384, 384),
                                "float32", 4)
    slides = [(t, m) for t, m, s in cands if s]
    assert slides, "radius-2 configs must offer a slide candidate"
    for (s0, t1), _ in slides:
        assert 384 % t1 == 0 and t1 >= 16  # slide-legal


def test_bf16_candidates_synth_only():
    cands = autotune.candidates(get_spec("jacobi7"), (256, 256, 256),
                                "bfloat16", 8)
    assert cands and all(m == "synth" for _, m, _ in cands)


def test_autotune_measures_caches_and_reuses(tmp_path):
    spec = get_spec("jacobi7")
    cache = str(tmp_path / "tune.json")
    calls = []

    def fake_measure(tiles, mode, slide):
        calls.append((tuple(tiles), mode))
        # make a non-default candidate win so we know measurement decides
        return 100.0 if (tuple(tiles), mode) == calls[0] else 50.0

    win = autotune.autotune(spec, (64, 64, 64), "float32", 4,
                            cache_path=cache, measure_fn=fake_measure)
    assert win is not None and win["glups"] == 100.0
    assert (tuple(win["tiles"]), win["tap_mode"]) == calls[0]
    # cache file written, keyed by device kind + config
    stored = json.load(open(cache))
    assert len(stored) == 1
    key = next(iter(stored))
    assert "jacobi7" in key and "64x64x64" in key and "k4" in key
    # second call: served from cache, measure_fn NOT invoked
    n_calls = len(calls)
    win2 = autotune.autotune(spec, (64, 64, 64), "float32", 4,
                             cache_path=cache, measure_fn=fake_measure)
    assert win2 == win and len(calls) == n_calls


def test_autotune_survives_failing_candidates(tmp_path):
    spec = get_spec("jacobi7")

    def flaky(tiles, mode, slide):
        if mode == "rotacc":
            raise RuntimeError("compiler crash")
        return 42.0

    win = autotune.autotune(spec, (64, 64, 64), "float32", 4,
                            cache_path=str(tmp_path / "t.json"),
                            measure_fn=flaky)
    assert win is not None and win["tap_mode"] == "synth"


def test_autotune_all_fail_returns_none(tmp_path):
    def broken(tiles, mode, slide):
        raise RuntimeError("no")

    win = autotune.autotune(get_spec("jacobi7"), (64, 64, 64), "float32",
                            4, cache_path=str(tmp_path / "t.json"),
                            measure_fn=broken)
    assert win is None


def test_cli_flag_parses():
    from stencil_tpu.config import parse_args

    cfg = parse_args(["-s", "64", "64", "64", "--autotune"])
    assert cfg.autotune == "on"
    assert parse_args(["-s", "64", "64"]).autotune is False


def test_registry_applies_autotuned_winner(monkeypatch, tmp_path):
    """--autotune plumbing: the registry must apply the cached winner's
    tiles, tap_mode AND slide bit to the plan it builds."""
    from stencil_tpu import registry
    from stencil_tpu.config import RunConfig
    from stencil_tpu.core.grid import HaloGrid

    win = {"tiles": [8, 16], "tap_mode": "synth", "slide": True,
           "glups": 1.0}
    monkeypatch.setattr(registry, "_on_tpu", lambda: True)
    monkeypatch.setattr(autotune, "autotune",
                        lambda *a, **k: dict(win))
    # interpret=True comes from _on_tpu() being faked; force it back on
    # by building the method directly through the factory and checking
    # the plan only (no execution)
    cfg = RunConfig(size=(16, 48, 20), spec="jacobi7", temporal=2,
                    autotune=True, methods=("pallas_temporal",))
    spec = cfg.resolved_spec()
    grid = HaloGrid.create((16, 48, 20), halo=1)
    runner = registry.get_runner("pallas_temporal", cfg, spec, grid)
    assert "8x16" in runner.name


def test_source_cache_key_distinct():
    from stencil_tpu import autotune as at
    from stencil_tpu.core.spec import get_spec

    spec = get_spec("jacobi7")
    a = at.cache_key(spec, (64, 64, 64), "float32", 8, "tpu:X")
    b = at.cache_key(spec, (64, 64, 64), "float32", 8, "tpu:X",
                     has_source=True)
    assert a != b and b.endswith("|src") and not a.endswith("|src")


def test_source_candidates_skip_slide_and_charge_budget():
    from stencil_tpu import autotune as at
    from stencil_tpu.core.spec import get_spec

    spec = get_spec("laplace3d_ho")  # radius 2: slide offered w/o source
    plain = at.candidates(spec, (64, 64, 64), "float32", 2)
    src = at.candidates(spec, (64, 64, 64), "float32", 2,
                        has_source=True)
    assert any(slide for _, _, slide in plain)
    assert not any(slide for _, _, slide in src)


def test_source_autotune_caches_under_src_key(tmp_path):
    from stencil_tpu import autotune as at
    from stencil_tpu.core.spec import get_spec

    spec = get_spec("jacobi7")
    path = str(tmp_path / "cache.json")
    calls = []

    def fake_measure(tiles, tap_mode, slide=False):
        calls.append((tuple(tiles), tap_mode, slide))
        return 100.0 - tiles[0]  # smaller s0 wins

    won = at.autotune(spec, (64, 64, 64), "float32", 4, cache_path=path,
                      measure_fn=fake_measure, has_source=True)
    assert won is not None and not won["slide"]
    cache = at.load_cache(path)
    assert len(cache) == 1 and list(cache)[0].endswith("|src")
    # homogeneous tuning of the same config gets its own entry
    won2 = at.autotune(spec, (64, 64, 64), "float32", 4, cache_path=path,
                       measure_fn=fake_measure)
    assert won2 is not None and len(at.load_cache(path)) == 2


def test_poisson_runner_autotune_cache_hit(tmp_path, monkeypatch):
    """A cached source winner is applied to the Poisson tiled runner."""
    import numpy as np

    from stencil_tpu import autotune as at
    from stencil_tpu.core.spec import get_spec
    from stencil_tpu.models.poisson import PoissonProblem

    spec = get_spec("jacobi7")
    path = str(tmp_path / "cache.json")
    key = at.cache_key(spec, (16, 16, 16), "float32", 2,
                       at._device_kind(), has_source=True)
    at.save_cache(path, {key: {"tiles": [8, 8], "tap_mode": "synth",
                               "slide": False, "glups": 1.0}})
    monkeypatch.setattr(at, "DEFAULT_CACHE", path)
    prob = PoissonProblem(shape=(16, 16, 16))
    # interpret=False would hit the real TPU path in CI; emulate the
    # non-interpret branch by calling autotune() directly
    won = at.autotune(spec, (16, 16, 16), "float32", 2, cache_path=path,
                      has_source=True)
    assert won["tiles"] == [8, 8]
    r = prob.runner(np.zeros((16, 16, 16), np.float32),
                    method="pallas_tiled", sweeps_per_call=2,
                    interpret=True, tiles=tuple(won["tiles"]),
                    tap_mode=won["tap_mode"])
    assert r.plan_info["tiles"] == (8, 8)
