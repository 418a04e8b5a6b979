"""Two-level (leapfrog) temporal blocking on the tiled 3D kernel.

``two_level`` plans advance ``u_{t+1} = S(u_t) - u_{t-1}`` k steps per
HBM round trip: two input window streams (levels n, n-1), the two most
recent levels carried through the in-VMEM trapezoid recursion, two
outputs (levels n+k, n+k-1). Differential-tested against the XLA
leapfrog (itself golden-tested in test_models.py) and the float64
golden loop.
"""

import numpy as np
import pytest

from stencil_tpu.core.grid import DirichletBC
from stencil_tpu.core.spec import get_spec
from stencil_tpu.models.wave import WaveEquation, golden_wave
from stencil_tpu.ops.pallas_tiled import make_tiled_plan


def _run(shape, k, steps, bc=None, tap_mode=None, tiles=None, atol=5e-6,
         seed=0, dt=None):
    rng = np.random.default_rng(seed)
    if bc is None:
        bc = DirichletBC.zero(3)
    w = WaveEquation(shape=shape, bc=bc, dt=dt)
    u0 = rng.normal(size=shape)
    v0 = rng.normal(size=shape)
    want = w.simulate_interior(u0, steps, v0=v0)
    kw = {}
    if tap_mode is not None:
        kw["tap_mode"] = tap_mode
    if tiles is not None:
        kw["tiles"] = tiles
    got = w.simulate_interior(u0, steps, v0=v0, method="pallas_tiled",
                              sweeps_per_call=k, interpret=True, **kw)
    err = float(np.max(np.abs(got.astype(np.float64) - want)))
    assert err < atol, err


@pytest.mark.parametrize("k,steps", [(1, 3), (2, 4), (4, 8), (8, 16)])
def test_two_level_depths_match_xla(k, steps):
    _run((16, 24, 20), k, steps)


def test_two_level_remainder_steps():
    _run((16, 24, 20), 4, 10)  # 2 outer + rem 2


@pytest.mark.parametrize("tap_mode", ["slice", "roll", "synth", "rotacc"])
def test_two_level_tap_modes(tap_mode):
    _run((16, 16, 24), 3, 6, tap_mode=tap_mode)


def test_two_level_ragged_clamped():
    _run((13, 17, 19), 3, 7)


def test_two_level_small_tiles_mid_pins():
    # tiles smaller than the recompute extension exercise mid-tile pins
    _run((24, 24, 20), 8, 8, tiles=(8, 8))


def test_two_level_dynamic_bcs():
    bc = DirichletBC.zero(3).with_periodic((0,)).with_neumann((1,))
    _run((16, 24, 20), 4, 8, bc=bc, atol=2e-6)


def test_two_level_periodic_both_leading():
    bc = DirichletBC.zero(3).with_periodic((0, 1))
    _run((16, 16, 24), 2, 6, bc=bc, atol=2e-6)


def test_two_level_matches_float64_golden():
    """Directly against the independent float64 loop (not just the XLA
    twin), over enough steps for divergence to show."""
    shape = (12, 16, 20)
    bc = DirichletBC.zero(3)
    w = WaveEquation(shape=shape, bc=bc)
    rng = np.random.default_rng(5)
    u0 = rng.normal(size=shape)
    want = golden_wave(u0, w.spec, 24, bc, dt=w.courant * w.h / w.c)
    got = w.simulate_interior(u0, 24, method="pallas_tiled",
                              sweeps_per_call=4, interpret=True)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=0)


def test_two_level_standing_mode_analytic():
    """The discrete eigenmode check through the tiled kernel: catches a
    wrong subtrahend extent or a pin overwriting live data."""
    n = 16
    w = WaveEquation(shape=(n, n, n), dt=0.25)
    x = np.arange(1, n + 1) / (n + 1)
    m1 = np.sin(np.pi * x)
    mode = np.einsum("i,j,k->ijk", m1, m1, m1)
    s2 = w.courant ** 2
    lam = 2 - 6 * s2 + 6 * s2 * np.cos(np.pi / (n + 1))
    theta = np.arccos(lam / 2.0)
    got = w.simulate_interior(mode, 12, method="pallas_tiled",
                              sweeps_per_call=4, interpret=True)
    np.testing.assert_allclose(got, np.cos(12 * theta) * mode, atol=3e-4,
                               rtol=0)


def test_two_level_plan_gates():
    spec = get_spec("jacobi7")
    with pytest.raises(ValueError, match="two-level"):
        make_tiled_plan(spec, (16, 16, 16), "float32", 2, tiles=(8, 8),
                        two_level=True, slide=True)
    with pytest.raises(ValueError, match="two-level"):
        make_tiled_plan(spec, (16, 16, 16), "float32", 2, tiles=(8, 8),
                        two_level=True, has_source=True)
    with pytest.raises(ValueError, match="two-level"):
        make_tiled_plan(spec, (16, 16, 16), "float32", 2, tiles=(8, 8),
                        two_level=True, cores=2)


def test_two_level_vmem_accounting():
    from stencil_tpu.ops.pallas_tiled import _vmem_bytes

    spec = get_spec("jacobi7")
    a = _vmem_bytes(spec, (64, 64, 64), "float32", 4, 16, 16)
    b = _vmem_bytes(spec, (64, 64, 64), "float32", 4, 16, 16,
                    two_level=True)
    assert b > a


def test_two_level_lane_dynamic_gated():
    bc = DirichletBC.zero(3).with_periodic((2,))
    w = WaveEquation(shape=(16, 16, 24), bc=bc)
    prev, cur = w.initial_pair(np.zeros((16, 16, 24)))
    with pytest.raises(ValueError, match="lane"):
        w.simulate(prev, cur, 4, method="pallas_tiled",
                   sweeps_per_call=2, interpret=True)
