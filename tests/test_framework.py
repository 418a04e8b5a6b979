"""Framework-layer tests: config parsing, CLI driver, sweep harness,
image output, timing, models."""

import json
import os

import numpy as np
import pytest

from stencil_tpu.config import RunConfig, parse_args
from stencil_tpu.core.grid import HaloGrid
from stencil_tpu.core import spec as S
from stencil_tpu.models.heat import HeatDiffusion, LaplaceRelaxation
from stencil_tpu.ops import golden
from stencil_tpu.utils.image import colorize, dump_heatmap, write_bmp
from stencil_tpu.utils.timing import TinyTimer


# ---- config ------------------------------------------------------------------


def test_parse_defaults():
    cfg = parse_args([])
    assert cfg.size == (512, 512)
    assert cfg.iterations == 1000
    assert cfg.methods == ("xla",)
    assert not cfg.check


def test_parse_reference_style_flags():
    # mirrors the reference CLI surface (program_options.cpp:13-37)
    cfg = parse_args(["-s", "400", "400", "-i", "1000", "-b", "50",
                      "-R", "3", "-m", "xla", "pallas", "-c", "-r", "2"])
    assert cfg.size == (400, 400)
    assert cfg.block == 50
    assert cfg.repeat == 3
    assert cfg.methods == ("xla", "pallas")
    assert cfg.check
    sp = cfg.resolved_spec()
    assert sp.radius == 2 and sp.num_taps == 8


def test_parse_3d():
    cfg = parse_args(["-s", "64", "64", "64", "--spec", "jacobi7"])
    assert cfg.resolved_spec().ndim == 3


def test_spec_rank_mismatch():
    cfg = parse_args(["-s", "64", "64", "--spec", "jacobi7"])
    with pytest.raises(ValueError):
        cfg.resolved_spec()


# ---- CLI driver ----------------------------------------------------------------


def test_cli_run_xla_with_check(tmp_path, capsys):
    from stencil_tpu.cli import run_all

    cfg = RunConfig(size=(24, 32), iterations=8, methods=("xla",),
                    check=True, json_out=str(tmp_path / "out.jsonl"))
    results = run_all(cfg)
    assert len(results) == 1
    assert results[0]["check"]["ok"]
    assert results[0]["glups"] > 0
    lines = (tmp_path / "out.jsonl").read_text().strip().split("\n")
    assert json.loads(lines[0])["method"] == "xla"


def test_cli_unknown_method(capsys):
    from stencil_tpu.cli import run_all

    cfg = RunConfig(size=(16, 16), iterations=2, methods=("nope",))
    results = run_all(cfg)
    assert "error" in results[0]


def test_cli_dump_image(tmp_path):
    from stencil_tpu.cli import run_all

    img = tmp_path / "heat.bmp"
    cfg = RunConfig(size=(16, 16), iterations=4, methods=("xla",),
                    dump_image=str(img))
    run_all(cfg)
    data = img.read_bytes()
    assert data[:2] == b"BM"


def test_sweep_configs_consistent_with_cli():
    from stencil_tpu.sweep import sweep_configs

    cfgs = sweep_configs(sizes=[32], iterations=[4], methods=["xla"])
    assert all(isinstance(c, RunConfig) for c in cfgs)
    assert cfgs[0].size == (32, 32)


def test_sweep_runs_end_to_end(tmp_path):
    from stencil_tpu.sweep import run_sweep, sweep_configs

    cfgs = sweep_configs(sizes=[16], iterations=[2], methods=["xla"])
    rows = run_sweep(cfgs, csv_path=tmp_path / "s.csv",
                     json_path=tmp_path / "s.jsonl",
                     progress=lambda *_: None)
    assert rows and rows[0]["glups"] > 0
    assert (tmp_path / "s.csv").exists()


# ---- image ---------------------------------------------------------------------


def test_colorize_ramp():
    rgb = colorize(np.array([[0.0, 0.5, 1.0]]))
    assert tuple(rgb[0, 0]) == (0, 0, 255)      # cold = blue
    assert tuple(rgb[0, 2]) == (255, 0, 0)      # hot = red
    assert rgb[0, 1][1] > 200                    # mid = green-ish


def test_write_bmp_format(tmp_path):
    p = tmp_path / "x.bmp"
    rgb = np.zeros((3, 5, 3), np.uint8)
    rgb[0, 0] = (255, 0, 0)
    write_bmp(p, rgb)
    data = p.read_bytes()
    assert data[:2] == b"BM"
    # 24-bit, 40-byte info header
    assert data[14] == 40
    import struct
    w, h = struct.unpack("<ii", data[18:26])
    assert (w, h) == (5, 3)
    bpp = struct.unpack("<H", data[28:30])[0]
    assert bpp == 24
    # bottom-up rows, BGR: our (0,0) red pixel is at start of the LAST row
    row_bytes = (5 * 3 + 3) // 4 * 4
    off = 54 + 2 * row_bytes
    assert data[off:off + 3] == bytes([0, 0, 255])  # BGR of red


def test_dump_heatmap_3d_takes_middle_slice(tmp_path):
    p = tmp_path / "h.bmp"
    vol = np.zeros((4, 6, 8))
    dump_heatmap(p, vol)
    assert p.read_bytes()[:2] == b"BM"


# ---- timing --------------------------------------------------------------------


def test_tiny_timer_accumulates():
    t = TinyTimer().start()
    t.pause()
    s1 = t.seconds
    t.start()
    t.pause()
    assert t.seconds >= s1
    t.restart()
    assert t.seconds < 1.0
    assert "s" in t.pretty()


# ---- models --------------------------------------------------------------------


def test_laplace_relaxation_is_reference_spec():
    m = LaplaceRelaxation(shape=(32, 32))
    assert m.spec.uniform_weight == pytest.approx(0.25)
    g = m.initial_grid()
    assert g.interior_shape == (32, 32)


def test_heat_diffusion_stability():
    m = HeatDiffusion(shape=(16, 16), alpha=1.0, h=1.0, dt=0.25)
    assert m.fourier == pytest.approx(0.25)
    sp = m.spec  # center weight vanishes at the stability limit
    assert (0, 0) not in sp.offsets
    with pytest.raises(ValueError):
        HeatDiffusion(shape=(16, 16), dt=0.3).fourier


def test_heat_diffusion_conserves_mean_with_insulated_analogue(rng):
    # with all-BC = initial uniform value, diffusion keeps the field constant
    from stencil_tpu.core.grid import DirichletBC
    from stencil_tpu.ops import xla

    bc = DirichletBC(values=((3.0, 3.0), (3.0, 3.0)))
    m = HeatDiffusion(shape=(12, 12), dt=0.1, bc=bc)
    g = m.initial_grid(interior=np.full((12, 12), 3.0, np.float32))
    out = xla.iterate(g, m.spec, 20)
    np.testing.assert_allclose(np.asarray(out.interior()), 3.0, atol=1e-5)


def test_heat_matches_golden(rng):
    from stencil_tpu.ops import xla

    m = HeatDiffusion(shape=(16, 20), dt=0.2)
    x0 = rng.random((16, 20)).astype(np.float32)
    g = m.initial_grid(interior=x0)
    out = xla.iterate(g, m.spec, 6)
    ref = golden.golden_iterate(x0, m.spec, 6, bc=g.bc)
    chk = golden.check_against_golden(np.asarray(out.interior()), ref)
    assert chk.ok, chk.message()
