"""Variable-coefficient (heterogeneous) stencils: per-point tap weights.

The constant-weight ``StencilSpec`` cannot express these; the
``apply_fields`` path is differential-tested against its float64 twin,
cross-checked against the constant-coefficient spec path in the uniform
limit, and validated against the analytic two-material steady state
(flux continuity across the interface — the physics the harmonic face
mean exists for).
"""

import numpy as np
import pytest

from stencil_tpu.core.grid import DirichletBC, HaloGrid
from stencil_tpu.models.diffusion import (
    HeterogeneousDiffusion, face_harmonic_means,
)
from stencil_tpu.models.heat import HeatDiffusion
from stencil_tpu.ops import golden, xla
from stencil_tpu import solver


def test_fields_match_golden_random():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    shape = (16, 20)
    offsets = ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1), (1, 1))
    fields = rng.uniform(0.0, 0.2, size=(len(offsets),) + shape)
    u0 = rng.normal(size=shape).astype(np.float32)
    want = golden.golden_iterate_fields(u0, offsets, fields, 7)
    g = HaloGrid.from_interior(jnp.asarray(u0), halo=1)
    got = xla.iterate_fields_dynamic(
        g, offsets, jnp.asarray(fields, jnp.float32), jnp.int32(7),
        halo=1)
    np.testing.assert_allclose(np.asarray(got.interior(), np.float64),
                               want, atol=2e-5, rtol=0)


@pytest.mark.parametrize("shape", [(16, 20), (10, 12, 14)])
def test_uniform_limit_matches_constant_spec(shape):
    """a(x) = const reduces exactly to the constant-coefficient
    HeatDiffusion stencil (harmonic mean of equal values is the value)."""
    bc = DirichletBC.zero(len(shape))
    a0 = 0.7
    het = HeterogeneousDiffusion(shape=shape, a=np.full(shape, a0),
                                 bc=bc, dt=0.08)
    hom = HeatDiffusion(shape=shape, alpha=a0, dt=0.08, bc=bc)
    rng = np.random.default_rng(5)
    u0 = rng.normal(size=shape).astype(np.float32)
    g = het.initial_grid(u0)
    got = np.asarray(het.runner().iterate(g, 9).interior(), np.float64)
    want = golden.golden_iterate(u0, hom.spec, 9, bc=bc)
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=0)


def test_two_material_steady_state_analytic():
    """Steady conduction through a two-material slab: the converged
    profile equals the EXACT discrete steady state — constant flux
    through the chain of face conductances (ghost-cell Dirichlet walls:
    T=0 at ghost -1, T=1 at ghost n; the interface gap carries the
    harmonic mean 2*a1*a2/(a1+a2)). This is THE discriminating test for
    the harmonic face mean — an arithmetic interface coefficient
    (a1+a2)/2 = 2.5 vs harmonic 1.6 shifts the whole profile."""
    n = 32
    shape = (8, n)
    a = np.ones(shape)
    a1, a2 = 1.0, 4.0
    half = n // 2
    a[:, :half] = a1
    a[:, half:] = a2
    # walls: T=0 at x-lo, T=1 at x-hi (last dim); zero-flux side walls
    bc = DirichletBC(values=((0.0, 0.0), (0.0, 1.0))).with_neumann((0,))
    het = HeterogeneousDiffusion(shape=shape, a=a, bc=bc)
    res = solver.solve(het.runner(), het.initial_grid(),
                       tolerance=2e-7, max_iterations=60_000,
                       check_every=500)
    assert res.converged, res.summary()
    prof = np.asarray(res.grid.interior(), np.float64).mean(axis=0)
    # exact discrete steady state: gap conductances g_j between nodes
    # (-1..n), edge-replicated at walls, harmonic at the interface;
    # T_j = (sum of resistances up to j) / (total resistance)
    gaps = []
    cells = [a1] + [a1] * half + [a2] * half + [a2]  # ghost..ghost
    for j in range(n + 1):
        al, ar = cells[j], cells[j + 1]
        gaps.append(2 * al * ar / (al + ar))
    resist = np.cumsum([1.0 / g for g in gaps])
    want = resist[:-1] / resist[-1]
    np.testing.assert_allclose(prof, want, atol=5e-4, rtol=0)
    # and the arithmetic-mean interface would land measurably elsewhere
    gaps[half] = (a1 + a2) / 2.0
    resist_arith = np.cumsum([1.0 / g for g in gaps])
    want_arith = resist_arith[:-1] / resist_arith[-1]
    assert np.max(np.abs(prof - want_arith)) > 5e-3


def test_harmonic_mean_properties():
    a = np.asarray([[1.0, 4.0], [9.0, 1.0]])
    faces = face_harmonic_means(a)
    # lo face of dim 1, cell (0,1): harmonic(4, 1) = 1.6
    assert abs(faces[2][0, 1] - 1.6) < 1e-12
    # edge replicate: lo face of dim 0, cell (0,0) = harmonic(1,1) = 1
    assert abs(faces[0][0, 0] - 1.0) < 1e-12


def test_stability_gate():
    with pytest.raises(ValueError, match="unstable"):
        HeterogeneousDiffusion(shape=(8, 8), a=np.full((8, 8), 2.0),
                               dt=0.2).tap_fields()
    with pytest.raises(ValueError, match="positive"):
        HeterogeneousDiffusion(shape=(8, 8), a=np.zeros((8, 8)))


def test_fields_periodic_bc():
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    shape = (12, 16)
    bc = DirichletBC.zero(2).with_periodic((0, 1))
    het = HeterogeneousDiffusion(
        shape=shape, a=rng.uniform(0.5, 2.0, size=shape), bc=bc)
    offsets, fields = het.tap_fields()
    u0 = rng.normal(size=shape).astype(np.float32)
    want = golden.golden_iterate_fields(u0, offsets, fields, 6, bc=bc)
    g = het.initial_grid(u0)
    got = het.runner().iterate(g, 6)
    np.testing.assert_allclose(np.asarray(got.interior(), np.float64),
                               want, atol=2e-5, rtol=0)


def test_mass_conservation_periodic():
    """div-form diffusion on a fully periodic domain conserves the mean
    exactly (the discrete scheme is conservative) — a wrong
    (non-symmetric) face coefficient breaks this."""
    rng = np.random.default_rng(13)
    shape = (16, 16)
    bc = DirichletBC.zero(2).with_periodic((0, 1))
    het = HeterogeneousDiffusion(
        shape=shape, a=rng.uniform(0.5, 3.0, size=shape), bc=bc)
    u0 = rng.normal(size=shape).astype(np.float32)
    g = het.initial_grid(u0)
    out = het.runner().iterate(g, 50)
    m0 = float(np.asarray(u0, np.float64).mean())
    m1 = float(np.asarray(out.interior(), np.float64).mean())
    assert abs(m1 - m0) < 1e-6, (m0, m1)
