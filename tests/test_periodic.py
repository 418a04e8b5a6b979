"""Periodic (wrap-around) boundary conditions.

A capability extension beyond the reference, which is Dirichlet-only
(``stencil.cpp:190-207``). Stage 1 supports periodic dims on the XLA
method and both golden models (NumPy + native C++); the Pallas/sharded
methods gate with a clean error until their stages land.

Validation strategy mirrors the framework's differential-testing
doctrine with a third, fully independent reference for the all-periodic
case: circular convolution via ``np.roll`` (no shared ghost-fill code at
all).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from stencil_tpu.config import RunConfig
from stencil_tpu.core import spec as S
from stencil_tpu.core.grid import (
    DirichletBC, HaloGrid, fill_halo, refresh_dynamic,
)
from stencil_tpu.ops import golden, xla
from stencil_tpu import registry


# ---- DirichletBC periodic-mask semantics ----------------------------------


def test_with_periodic_marks_dims():
    bc = DirichletBC.reference_default(3).with_periodic((0, 2))
    assert bc.periodic == (True, False, True)
    assert bc.any_periodic
    assert bc.periodic_mask(3) == (True, False, True)


def test_with_periodic_empty_is_identity():
    base = DirichletBC.reference_default(2)
    bc = base.with_periodic(())
    # semantically all-Dirichlet must compare AND hash equal to the
    # default (jit cache keys and checkpoint mismatch checks rely on it)
    assert bc == base
    assert hash(bc) == hash(base)
    assert not bc.any_periodic


def test_with_periodic_negative_and_out_of_range():
    bc = DirichletBC.reference_default(2).with_periodic((-1,))
    assert bc.periodic == (False, True)
    with pytest.raises(ValueError, match="out of range"):
        DirichletBC.reference_default(2).with_periodic((2,))


def test_periodic_all():
    bc = DirichletBC.periodic_all(3)
    assert bc.periodic == (True, True, True)
    assert bc.any_periodic


# ---- halo fill / refresh semantics -----------------------------------------


def test_refresh_periodic_wraps_both_faces():
    # padded 1D-ish (2D) array with distinct interior values
    interior = np.arange(1, 7, dtype=np.float32).reshape(6, 1) * [[1.0]]
    g = HaloGrid.from_interior(
        jnp.asarray(np.tile(interior, (1, 4))), halo=1,
        bc=DirichletBC.reference_default(2).with_periodic((0,)),
    )
    data = np.asarray(g.data)
    # dim-0 ghosts wrap: low ghost row == last interior row, and vice versa
    np.testing.assert_array_equal(data[0, 1:-1], data[6, 1:-1])
    np.testing.assert_array_equal(data[7, 1:-1], data[1, 1:-1])
    # dim-1 stays Dirichlet (last dim faces = 1.0)
    np.testing.assert_array_equal(data[1:-1, 0], 1.0)
    np.testing.assert_array_equal(data[1:-1, -1], 1.0)


def test_periodic_corner_transitivity():
    # all-periodic: the corner ghost must hold the doubly-wrapped value
    x = np.arange(12, dtype=np.float64).reshape(3, 4)
    padded = jnp.pad(jnp.asarray(x), 1)
    padded = fill_halo(padded, 1, DirichletBC.periodic_all(2))
    p = np.asarray(padded)
    assert p[0, 0] == x[-1, -1]
    assert p[-1, -1] == x[0, 0]
    assert p[0, -1] == x[-1, 0]


def test_periodic_depth_check():
    bc = DirichletBC.periodic_all(2)
    with pytest.raises(ValueError, match="interior extent"):
        # interior extent 1 < halo depth 2 along dim 0
        fill_halo(jnp.zeros((5, 10)), 2, bc)


def test_refresh_dynamic_noop_for_dirichlet():
    padded = fill_halo(jnp.zeros((6, 6)), 1, DirichletBC.reference_default(2))
    out = refresh_dynamic(padded, 1, DirichletBC.reference_default(2))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(padded))


# ---- golden model vs independent circular convolution ----------------------


def _circular_reference(x0, sp, iterations):
    """Fully independent all-periodic reference: circular convolution in
    float64 via np.roll (shares NO code with the golden ghost machinery)."""
    x = x0.astype(np.float64)
    for _ in range(iterations):
        acc = np.zeros_like(x)
        for off, w in zip(sp.offsets, sp.weights):
            acc += w * np.roll(x, shift=tuple(-o for o in off),
                               axis=tuple(range(x.ndim)))
        x = acc
    return x


@pytest.mark.parametrize("spec_name,shape", [
    ("jacobi5", (12, 16)),       # 2D star r=1
    ("jacobi9", (12, 16)),       # 2D box r=1 (corners exercised)
    ("star2d_r2", (12, 16)),     # 2D star r=2 (deep ghosts)
    ("jacobi7", (8, 10, 12)),    # 3D star r=1
    ("jacobi27", (8, 10, 12)),   # 3D box r=1 (3D corners exercised)
])
def test_golden_periodic_equals_circular(rng, spec_name, shape):
    sp = S.get_spec(spec_name)
    x0 = rng.random(shape)
    out = golden.golden_iterate(
        x0, sp, 6, bc=DirichletBC.periodic_all(sp.ndim)
    )
    ref = _circular_reference(x0, sp, 6)
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-12)


def test_golden_periodic_fixed_point(rng):
    # uniform star average of a constant field under all-periodic BCs is
    # exactly that constant (no boundary leak anywhere)
    out = golden.golden_iterate(
        np.full((7, 9), 3.25), S.jacobi5(), 20,
        bc=DirichletBC.periodic_all(2),
    )
    np.testing.assert_array_equal(out, 3.25)


def test_golden_periodic_translation_equivariance(rng):
    # all-periodic iteration commutes with circular shifts of the input
    sp = S.jacobi9()
    x0 = rng.random((10, 14))
    bc = DirichletBC.periodic_all(2)
    a = golden.golden_iterate(np.roll(x0, (3, 5), (0, 1)), sp, 4, bc=bc)
    b = np.roll(golden.golden_iterate(x0, sp, 4, bc=bc), (3, 5), (0, 1))
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-13)


# ---- XLA method vs golden (mixed Dirichlet/periodic) ------------------------


@pytest.mark.parametrize("spec_name", ["jacobi5", "jacobi9", "star2d_r2"])
@pytest.mark.parametrize("dims", [(0,), (1,), (0, 1)])
def test_xla_matches_golden_periodic_2d(rng, spec_name, dims):
    sp = S.get_spec(spec_name)
    bc = DirichletBC.reference_default(2).with_periodic(dims)
    x0 = rng.random((20, 24)).astype(np.float32)
    g = HaloGrid.from_interior(jnp.asarray(x0), halo=sp.radius, bc=bc)
    out = xla.iterate(g, sp, 7)
    ref = golden.golden_iterate(x0, sp, 7, bc=bc)
    chk = golden.check_against_golden(np.asarray(out.interior()), ref)
    assert chk.ok, chk.message()


@pytest.mark.parametrize("spec_name", ["jacobi7", "jacobi27", "laplace3d_ho"])
@pytest.mark.parametrize("dims", [(2,), (0, 2), (0, 1, 2)])
def test_xla_matches_golden_periodic_3d(rng, spec_name, dims):
    sp = S.get_spec(spec_name)
    bc = DirichletBC.reference_default(3).with_periodic(dims)
    x0 = rng.random((8, 10, 12)).astype(np.float32)
    g = HaloGrid.from_interior(jnp.asarray(x0), halo=sp.radius, bc=bc)
    out = xla.iterate(g, sp, 5)
    ref = golden.golden_iterate(x0, sp, 5, bc=bc)
    chk = golden.check_against_golden(np.asarray(out.interior()), ref)
    assert chk.ok, chk.message()


def test_xla_dynamic_periodic_matches_static(rng):
    sp = S.jacobi5()
    bc = DirichletBC.reference_default(2).with_periodic((0,))
    x0 = rng.random((16, 16)).astype(np.float32)
    g = HaloGrid.from_interior(jnp.asarray(x0), halo=1, bc=bc)
    a = xla.iterate(g, sp, 9)
    b = xla.iterate_dynamic(g, sp, jnp.int32(9))
    np.testing.assert_array_equal(
        np.asarray(a.interior()), np.asarray(b.interior())
    )


# ---- native C++ golden twin --------------------------------------------------


@pytest.mark.parametrize("spec_name,shape,dims", [
    ("jacobi5", (16, 20), (0,)),
    ("jacobi9", (16, 20), (0, 1)),
    ("star2d_r2", (16, 20), (1,)),
    ("jacobi7", (8, 10, 12), (0, 2)),
    ("jacobi27", (8, 10, 12), (0, 1, 2)),
])
def test_native_golden_periodic_matches_numpy(rng, spec_name, shape, dims):
    from stencil_tpu.native import available, golden_iterate_native

    if not available():
        pytest.skip("no C++ toolchain for the native verifier")
    sp = S.get_spec(spec_name)
    bc = DirichletBC.reference_default(sp.ndim).with_periodic(dims)
    x0 = rng.random(shape)
    a = golden.golden_iterate(x0, sp, 5, bc=bc)
    b = golden_iterate_native(x0, sp, 5, bc=bc)
    assert b is not None
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-13)


# ---- method gating + CLI -----------------------------------------------------


@pytest.mark.parametrize("method", [
    "pallas_temporal", "sharded_pallas", "rma",
])
def test_unsupported_methods_gate_cleanly(method):
    # periodic LANE dim: sharded_pallas/rma refuse any periodic grid;
    # pallas_temporal refuses because the lane dim needs k=1 (its
    # leading-dim periodic support is covered below)
    sp = S.jacobi5()
    bc = DirichletBC.reference_default(2).with_periodic((1,))
    g = HaloGrid.create((16, 16), halo=1, bc=bc)
    cfg = RunConfig(size=(16, 16), iterations=2, methods=(method,))
    with pytest.raises(ValueError, match="periodic|k 1"):
        registry.get_runner(method, cfg, sp, g)


def test_rma_gates_on_lane_periodic():
    # the in-kernel RMA path supports periodic on any LEADING dim
    # (sharded: circular ring push topology; unsharded: local wrap
    # refresh at iteration start — tests/test_rma.py); only the LANE dim
    # must be refused eagerly with guidance
    sp = S.get_spec("jacobi7")
    bc = DirichletBC.reference_default(3).with_periodic((2,))
    g = HaloGrid.create((16, 16, 16), halo=1, bc=bc)
    cfg = RunConfig(size=(16, 16, 16), spec="jacobi7", iterations=2,
                    methods=("rma",), mesh=(2,))
    with pytest.raises(ValueError, match="LANE"):
        registry.get_runner("rma", cfg, sp, g)


def test_rma_gates_eagerly_on_shallow_unsharded_dynamic_dim():
    # an unsharded dynamic dim shallower than the k*r temporal ghost
    # depth must be refused at runner construction (CLI 'unavailable'),
    # not as a mid-run traceback
    sp = S.get_spec("jacobi7")
    bc = DirichletBC.reference_default(3).with_periodic((1,))
    g = HaloGrid.create((16, 3, 16), halo=1, bc=bc)
    cfg = RunConfig(size=(16, 3, 16), spec="jacobi7", iterations=8,
                    temporal=4, methods=("rma",), mesh=(2,))
    with pytest.raises(ValueError, match="shallower"):
        registry.get_runner("rma", cfg, sp, g)


def test_direct_iterate_gates_too():
    # defense for direct API use (bypassing the registry): the default
    # tap mode (synth) synthesizes the LANE boundary as Dirichlet and
    # must refuse a lane-periodic grid
    from stencil_tpu.ops.pallas_tiled import TiledPallasStencil

    sp = S.get_spec("jacobi7")
    bc = DirichletBC.reference_default(3).with_periodic((2,))
    g = HaloGrid.create((8, 8, 8), halo=1, bc=bc)
    m = TiledPallasStencil(sp, (8, 8, 8), interpret=True)
    with pytest.raises(ValueError, match="periodic"):
        m.iterate(g, 1)


def test_periodic_lane_temporal_blocking_gates():
    # a periodic LANE dim at k>1 would need the in-VMEM virtual sweeps
    # to see the opposite lane face mid-call — the registry must refuse
    # with guidance rather than compute wrong halos
    sp = S.get_spec("jacobi7")
    bc = DirichletBC.reference_default(3).with_periodic((2,))
    g = HaloGrid.create((16, 16, 16), halo=1, bc=bc)
    cfg = RunConfig(size=(16, 16, 16), spec="jacobi7", temporal=4,
                    methods=("pallas_tiled",))
    with pytest.raises(ValueError, match="k 1"):
        registry.get_runner("pallas_tiled", cfg, sp, g)


def test_periodic_synth_tap_mode_gates():
    sp = S.get_spec("jacobi7")
    bc = DirichletBC.reference_default(3).with_periodic((2,))
    g = HaloGrid.create((16, 16, 16), halo=1, bc=bc)
    cfg = RunConfig(size=(16, 16, 16), spec="jacobi7",
                    methods=("pallas_tiled",), tap_mode="synth")
    with pytest.raises(ValueError, match="ghost-reading"):
        registry.get_runner("pallas_tiled", cfg, sp, g)


def test_periodic_embed_slide_gate():
    sp = S.get_spec("jacobi7")
    bc = DirichletBC.reference_default(3).with_periodic((0,))
    g = HaloGrid.create((16, 16, 16), halo=1, bc=bc)
    cfg = RunConfig(size=(16, 16, 16), spec="jacobi7",
                    methods=("pallas_tiled",), embed=True)
    with pytest.raises(ValueError, match="embed"):
        registry.get_runner("pallas_tiled", cfg, sp, g)


# ---- Pallas kernels (interpret mode) vs golden -------------------------------


@pytest.mark.parametrize("dims", [(0,), (1,), (0, 1)])
@pytest.mark.parametrize("spec_name", ["jacobi5", "jacobi9"])
def test_slab_kernel_matches_golden_periodic_2d(rng, spec_name, dims):
    from stencil_tpu.ops.pallas import PallasStencil

    sp = S.get_spec(spec_name)
    bc = DirichletBC.reference_default(2).with_periodic(dims)
    x0 = rng.random((24, 40)).astype(np.float32)
    g = HaloGrid.from_interior(jnp.asarray(x0), halo=sp.radius, bc=bc)
    m = PallasStencil(sp, (24, 40), interpret=True, tap_mode="slice")
    out = m.iterate(g, 6)
    ref = golden.golden_iterate(x0, sp, 6, bc=bc)
    chk = golden.check_against_golden(np.asarray(out.interior()), ref)
    assert chk.ok, chk.message()


@pytest.mark.parametrize("tap_mode", ["slice", "roll"])
@pytest.mark.parametrize("dims", [(0,), (1,), (2,), (0, 1, 2)])
def test_tiled_kernel_matches_golden_periodic_3d(rng, tap_mode, dims):
    from stencil_tpu.ops.pallas_tiled import TiledPallasStencil

    sp = S.get_spec("jacobi7")
    bc = DirichletBC.reference_default(3).with_periodic(dims)
    x0 = rng.random((12, 16, 20)).astype(np.float32)
    g = HaloGrid.from_interior(jnp.asarray(x0), halo=1, bc=bc)
    m = TiledPallasStencil(sp, (12, 16, 20), interpret=True,
                           tap_mode=tap_mode)
    out = m.iterate(g, 5)
    ref = golden.golden_iterate(x0, sp, 5, bc=bc)
    chk = golden.check_against_golden(np.asarray(out.interior()), ref)
    assert chk.ok, chk.message()


@pytest.mark.parametrize("spec_name", ["jacobi27", "laplace3d_ho"])
def test_tiled_kernel_periodic_box_and_r2(rng, spec_name):
    # box corners and radius-2 ghost rings through the wrap
    from stencil_tpu.ops.pallas_tiled import TiledPallasStencil

    sp = S.get_spec(spec_name)
    bc = DirichletBC.reference_default(3).with_periodic((0, 2))
    x0 = rng.random((12, 16, 20)).astype(np.float32)
    g = HaloGrid.from_interior(jnp.asarray(x0), halo=sp.radius, bc=bc)
    m = TiledPallasStencil(sp, (12, 16, 20), interpret=True,
                           tap_mode="slice")
    out = m.iterate(g, 4)
    ref = golden.golden_iterate(x0, sp, 4, bc=bc)
    chk = golden.check_against_golden(np.asarray(out.interior()), ref)
    assert chk.ok, chk.message()


def test_tiled_kernel_periodic_ragged(rng):
    # clamped overlapping last tiles + periodic wrap (13 and 17 are
    # ragged in every tile set)
    from stencil_tpu.ops.pallas_tiled import TiledPallasStencil

    sp = S.get_spec("jacobi7")
    bc = DirichletBC.periodic_all(3)
    x0 = rng.random((13, 17, 19)).astype(np.float32)
    g = HaloGrid.from_interior(jnp.asarray(x0), halo=1, bc=bc)
    m = TiledPallasStencil(sp, (13, 17, 19), interpret=True,
                           tap_mode="slice")
    out = m.iterate(g, 3)
    ref = golden.golden_iterate(x0, sp, 3, bc=bc)
    chk = golden.check_against_golden(np.asarray(out.interior()), ref)
    assert chk.ok, chk.message()


def test_registry_pallas_periodic_defaults_to_slice(rng):
    # method 'pallas' on a LANE-periodic 3D grid must come back runnable
    # with a ghost-reading tap mode picked automatically; a lead-only
    # periodic grid keeps the fast default tap mode
    sp = S.get_spec("jacobi7")
    bc = DirichletBC.reference_default(3).with_periodic((0, 2))
    g = HaloGrid.create((12, 16, 20), halo=1, bc=bc)
    cfg = RunConfig(size=(12, 16, 20), spec="jacobi7",
                    methods=("pallas",))
    runner = registry.get_runner("pallas", cfg, sp, g)
    assert runner.plan_info["tap_mode"] == "slice"
    out = runner.iterate(g, 3)
    ref = golden.golden_iterate(
        np.zeros((12, 16, 20)), sp, 3, bc=bc
    )
    chk = golden.check_against_golden(np.asarray(out.interior()), ref)
    assert chk.ok, chk.message()

    bc_lead = DirichletBC.reference_default(3).with_periodic((0,))
    g_lead = HaloGrid.create((12, 16, 20), halo=1, bc=bc_lead)
    lead = registry.get_runner("pallas", cfg, sp, g_lead)
    assert lead.plan_info["tap_mode"] in ("synth", "rotacc")
    out = lead.iterate(g_lead, 3)
    ref = golden.golden_iterate(np.zeros((12, 16, 20)), sp, 3, bc=bc_lead)
    chk = golden.check_against_golden(np.asarray(out.interior()), ref)
    assert chk.ok, chk.message()


def test_cli_periodic_xla_checked(tmp_path):
    from stencil_tpu.cli import run_all

    cfg = RunConfig(size=(20, 24), iterations=8, methods=("xla",),
                    check=True, periodic=("0",),
                    json_out=str(tmp_path / "out.jsonl"))
    results = run_all(cfg, out=open("/dev/null", "w"))
    assert results[0]["check"]["ok"]


def test_cli_periodic_all_parses_and_runs():
    from stencil_tpu import cli

    rc = cli.main(["-s", "12", "16", "-i", "4", "-m", "xla", "-c",
                   "--periodic", "all", "--platform", "cpu"])
    assert rc == 0


def test_cli_periodic_unsupported_method_reports_unavailable(capsys):
    from stencil_tpu import cli

    rc = cli.main(["-s", "16", "16", "-i", "2", "-m", "pallas_temporal",
                   "--periodic", "1", "--platform", "cpu"])
    assert rc == 1
    assert "periodic" in capsys.readouterr().out


def test_cli_periodic_pallas_checked(tmp_path):
    # the flagship kernel path end-to-end under --periodic, checked
    from stencil_tpu.cli import run_all

    cfg = RunConfig(size=(12, 16, 20), spec="jacobi7", iterations=6,
                    methods=("pallas",), check=True, periodic=("0", "2"),
                    json_out=str(tmp_path / "out.jsonl"))
    results = run_all(cfg, out=open("/dev/null", "w"))
    assert results[0]["check"]["ok"]
    assert results[0]["plan"]["tap_mode"] == "slice"


def test_periodic_dims_normalization():
    cfg = RunConfig(size=(8, 8, 8), periodic=("all",))
    assert cfg.periodic_dims() == (0, 1, 2)
    cfg = RunConfig(size=(8, 8), periodic=("1",))
    assert cfg.periodic_dims() == (1,)


# ---- temporal blocking (k>1) with periodic leading dims ----------------------
#
# Periodic d0/d1 ride the kernels' pins mechanism (Dirichlet re-pinning
# disabled on those faces, exactly like the sharded paths' mesh-internal
# faces) with a k*r-deep wrap refresh between kernel calls — so the FULL
# temporal-blocked fast path, including the boundary-synthesizing synth/
# rotacc tap modes (which only synthesize the lane boundary), stays
# available.


@pytest.mark.parametrize("dims", [(0,), (1,), (0, 1)])
@pytest.mark.parametrize("k", [4, 8])
def test_tiled_temporal_periodic_leading_dims(rng, dims, k):
    from stencil_tpu.ops.pallas_tiled import TiledPallasStencil

    sp = S.get_spec("jacobi7")
    bc = DirichletBC.reference_default(3).with_periodic(dims)
    x0 = rng.random((16, 24, 20)).astype(np.float32)
    g = HaloGrid.from_interior(jnp.asarray(x0), halo=1, bc=bc)
    m = TiledPallasStencil(sp, (16, 24, 20), sweeps_per_call=k,
                           interpret=True)
    # the fast (lane-boundary-synthesizing) default stays legal
    assert m.plan.tap_mode in ("synth", "rotacc")
    out = m.iterate(g, 2 * k + 3)      # exercises the k'=3 remainder too
    ref = golden.golden_iterate(x0, sp, 2 * k + 3, bc=bc)
    chk = golden.check_against_golden(np.asarray(out.interior()), ref)
    assert chk.ok, chk.message()


def test_tiled_temporal_periodic_rotacc_box(rng):
    # rotacc (separable box evaluator) with periodic d0/d1 at k=4
    from stencil_tpu.ops.pallas_tiled import TiledPallasStencil

    sp = S.get_spec("jacobi27")
    bc = DirichletBC.reference_default(3).with_periodic((0, 1))
    x0 = rng.random((16, 24, 20)).astype(np.float32)
    g = HaloGrid.from_interior(jnp.asarray(x0), halo=1, bc=bc)
    m = TiledPallasStencil(sp, (16, 24, 20), sweeps_per_call=4,
                           interpret=True, tap_mode="rotacc")
    out = m.iterate(g, 8)
    ref = golden.golden_iterate(x0, sp, 8, bc=bc)
    chk = golden.check_against_golden(np.asarray(out.interior()), ref)
    assert chk.ok, chk.message()


def test_tiled_temporal_periodic_radius2(rng):
    from stencil_tpu.ops.pallas_tiled import TiledPallasStencil

    sp = S.get_spec("laplace3d_ho")
    bc = DirichletBC.reference_default(3).with_periodic((0, 1))
    x0 = rng.random((14, 18, 16)).astype(np.float32)
    g = HaloGrid.from_interior(jnp.asarray(x0), halo=2, bc=bc)
    m = TiledPallasStencil(sp, (14, 18, 16), sweeps_per_call=3,
                           interpret=True)
    out = m.iterate(g, 6)
    ref = golden.golden_iterate(x0, sp, 6, bc=bc)
    chk = golden.check_against_golden(np.asarray(out.interior()), ref)
    assert chk.ok, chk.message()


def test_tiled_temporal_periodic_ragged(rng):
    # clamped overlapping last tiles + periodic d0/d1 + temporal depth
    from stencil_tpu.ops.pallas_tiled import TiledPallasStencil

    sp = S.get_spec("jacobi7")
    bc = DirichletBC.reference_default(3).with_periodic((0, 1))
    x0 = rng.random((13, 17, 19)).astype(np.float32)
    g = HaloGrid.from_interior(jnp.asarray(x0), halo=1, bc=bc)
    m = TiledPallasStencil(sp, (13, 17, 19), sweeps_per_call=4,
                           interpret=True)
    out = m.iterate(g, 8)
    ref = golden.golden_iterate(x0, sp, 8, bc=bc)
    chk = golden.check_against_golden(np.asarray(out.interior()), ref)
    assert chk.ok, chk.message()


def test_slab_temporal_periodic_lead(rng):
    # 2D slab kernel, periodic d0 at k=8 with the default (synthesizing)
    # tap mode — legal because synth only synthesizes the LANE boundary
    from stencil_tpu.ops.pallas import PallasStencil

    sp = S.jacobi5()
    bc = DirichletBC.reference_default(2).with_periodic((0,))
    x0 = rng.random((32, 40)).astype(np.float32)
    g = HaloGrid.from_interior(jnp.asarray(x0), halo=1, bc=bc)
    m = PallasStencil(sp, (32, 40), sweeps_per_call=8, interpret=True)
    out = m.iterate(g, 16)
    ref = golden.golden_iterate(x0, sp, 16, bc=bc)
    chk = golden.check_against_golden(np.asarray(out.interior()), ref)
    assert chk.ok, chk.message()


def test_registry_pallas_temporal_periodic_leading(rng):
    # the pallas_temporal method (k=8 default) is available for grids
    # whose periodic dims are all leading
    sp = S.get_spec("jacobi7")
    bc = DirichletBC.reference_default(3).with_periodic((0, 1))
    g = HaloGrid.create((16, 24, 20), halo=1, bc=bc)
    cfg = RunConfig(size=(16, 24, 20), spec="jacobi7",
                    methods=("pallas_temporal",))
    runner = registry.get_runner("pallas_temporal", cfg, sp, g)
    out = runner.iterate(g, 8)
    ref = golden.golden_iterate(np.zeros((16, 24, 20)), sp, 8, bc=bc)
    chk = golden.check_against_golden(np.asarray(out.interior()), ref)
    assert chk.ok, chk.message()


def test_periodic_interior_shallower_than_temporal_halo_raises(rng):
    # k*r wrap depth needs interior extent >= k*r in the periodic dim
    from stencil_tpu.ops.pallas_tiled import TiledPallasStencil

    sp = S.get_spec("jacobi7")
    bc = DirichletBC.reference_default(3).with_periodic((0,))
    g = HaloGrid.create((6, 16, 16), halo=1, bc=bc)
    m = TiledPallasStencil(sp, (6, 16, 16), sweeps_per_call=8,
                           interpret=True)
    with pytest.raises(ValueError, match="interior extent"):
        m.iterate(g, 8)


# ---- sharded (ppermute halo) over the virtual device mesh --------------------


def _run_sharded_periodic(spec, shape, axis_sizes, axis_names, dims,
                          iters, overlap):
    from stencil_tpu.parallel.halo import ShardedStencil, make_mesh

    rng = np.random.default_rng(11)
    bc = DirichletBC.reference_default(len(shape)).with_periodic(dims)
    x0 = rng.random(shape).astype(np.float32)
    g = HaloGrid.from_interior(jnp.asarray(x0), halo=spec.radius, bc=bc)
    mesh = make_mesh(axis_sizes, [n for n in axis_names if n is not None])
    method = ShardedStencil(spec, tuple(axis_names), overlap=overlap)
    out = method.iterate(g, iters, mesh)
    ref = golden.golden_iterate(x0, spec, iters, bc=bc)
    chk = golden.check_against_golden(np.asarray(out.interior()), ref)
    assert chk.ok, chk.message()


@pytest.mark.parametrize("overlap", [False, True])
@pytest.mark.parametrize("dims", [(0,), (1,), (0, 1)])
def test_sharded_periodic_1d_mesh(dims, overlap):
    # periodic along the SHARDED dim = circular ppermute; along the
    # unsharded dim = local wrap strips
    _run_sharded_periodic(S.jacobi5(), (64, 40), (8,), ("x", None),
                          dims, 5, overlap)


@pytest.mark.parametrize("overlap", [False, True])
def test_sharded_periodic_2d_mesh_box(overlap):
    # box corners through doubly-wrapped device boundaries
    _run_sharded_periodic(S.jacobi9(), (32, 48), (4, 2), ("x", "y"),
                          (0, 1), 4, overlap)


def test_sharded_periodic_mixed_2d_mesh():
    # periodic dim 0 over a 4-device ring, Dirichlet dim 1 over 2 devices
    _run_sharded_periodic(S.jacobi9(), (32, 48), (4, 2), ("x", "y"),
                          (0,), 4, True)


def test_sharded_periodic_radius2():
    _run_sharded_periodic(S.star(2, 2), (32, 48), (4, 2), ("x", "y"),
                          (0, 1), 3, True)


def test_sharded_periodic_3d():
    _run_sharded_periodic(S.get_spec("jacobi7"), (16, 12, 40), (8,),
                          ("z", None, None), (0, 2), 3, True)


# ---- checkpoint round trip ---------------------------------------------------


def test_checkpoint_preserves_periodic(tmp_path, rng):
    from stencil_tpu.utils import checkpoint

    bc = DirichletBC.reference_default(2).with_periodic((0,))
    g = HaloGrid.from_interior(
        jnp.asarray(rng.random((10, 12)).astype(np.float32)), halo=1, bc=bc
    )
    p = checkpoint.save(tmp_path / "step_0000000005.npz", g, 5, "jacobi5")
    state = checkpoint.load(p)
    assert state.bc == bc
    assert state.bc.periodic == (True, False)
    # resuming onto a grid with different periodicity must refuse
    g2 = HaloGrid.from_interior(
        jnp.asarray(rng.random((10, 12)).astype(np.float32)), halo=1,
        bc=DirichletBC.reference_default(2),
    )
    run = checkpoint.CheckpointedRun(
        runner=None, directory=tmp_path, spec_name="jacobi5"
    )
    with pytest.raises(ValueError, match="periodic"):
        run.run(g2, 10)


def test_checkpoint_dirichlet_roundtrip_unchanged(tmp_path, rng):
    # pre-periodic semantics: an all-Dirichlet checkpoint loads to a BC
    # that compares equal to the default
    from stencil_tpu.utils import checkpoint

    g = HaloGrid.from_interior(
        jnp.asarray(rng.random((8, 8)).astype(np.float32)), halo=1
    )
    p = checkpoint.save(tmp_path / "step_0000000001.npz", g, 1, "jacobi5")
    state = checkpoint.load(p)
    assert state.bc == DirichletBC.reference_default(2)
    assert not state.bc.any_periodic


# ---- 3D slabs on the 2D slab kernel (direct API; round-4 review fixes) --------


def test_slab_3d_lane_periodic_gates(rng):
    # the lane dim of a 3D slab is dim 2 — the gate must track the RANK
    # (a hardcoded rank-2 mask let this through and produced silently
    # wrong results, round-4 review finding)
    from stencil_tpu.ops.pallas import PallasStencil

    sp = S.get_spec("jacobi7")
    bc = DirichletBC.reference_default(3).with_periodic((2,))
    g = HaloGrid.create((8, 8, 128), halo=1, bc=bc)
    m = PallasStencil(sp, (8, 8, 128), sweeps_per_call=2, interpret=True)
    with pytest.raises(ValueError, match="lane"):
        m.iterate(g, 4)


def test_slab_3d_middle_dim_periodic_gates_at_temporal(rng):
    # the slab kernel's pins cover d0 only: a dynamic MIDDLE dim has no
    # pin-disable hook (measured wrong at k=2) — must gate to k=1
    from stencil_tpu.ops.pallas import PallasStencil

    sp = S.get_spec("jacobi7")
    bc = DirichletBC.reference_default(3).with_periodic((1,))
    g = HaloGrid.create((16, 16, 128), halo=1, bc=bc)
    m = PallasStencil(sp, (16, 16, 128), sweeps_per_call=2, interpret=True)
    with pytest.raises(ValueError, match="middle"):
        m.iterate(g, 4)


@pytest.mark.parametrize("dims", [(1,), (0,), (2,)])
def test_slab_3d_periodic_k1_matches_golden(rng, dims):
    from stencil_tpu.ops.pallas import PallasStencil

    sp = S.get_spec("jacobi7")
    bc = DirichletBC.reference_default(3).with_periodic(dims)
    x0 = rng.random((16, 16, 128)).astype(np.float32)
    g = HaloGrid.from_interior(jnp.asarray(x0), halo=1, bc=bc)
    m = PallasStencil(sp, (16, 16, 128), interpret=True,
                      tap_mode="slice" if dims == (2,) else None)
    out = m.iterate(g, 3)
    ref = golden.golden_iterate(x0, sp, 3, bc=bc)
    chk = golden.check_against_golden(np.asarray(out.interior()), ref)
    assert chk.ok, chk.message()


def test_slab_3d_periodic_d0_temporal_ok(rng):
    # dynamic d0 keeps the full temporal path on 3D slabs (pins cover d0)
    from stencil_tpu.ops.pallas import PallasStencil

    sp = S.get_spec("jacobi7")
    bc = DirichletBC.reference_default(3).with_periodic((0,))
    x0 = rng.random((16, 16, 128)).astype(np.float32)
    g = HaloGrid.from_interior(jnp.asarray(x0), halo=1, bc=bc)
    m = PallasStencil(sp, (16, 16, 128), sweeps_per_call=2, interpret=True)
    out = m.iterate(g, 4)
    ref = golden.golden_iterate(x0, sp, 4, bc=bc)
    chk = golden.check_against_golden(np.asarray(out.interior()), ref)
    assert chk.ok, chk.message()


def test_cli_check_all_dynamic_bcs_is_not_vacuous(tmp_path):
    # --periodic all on the reference's zero interior would compare
    # 0 with 0 (a zero field is a fixed point of wrap + any linear
    # stencil) — make_grid seeds a nonzero interior when EVERY dim is
    # dynamic so -c actually exercises the BC machinery
    from stencil_tpu.cli import make_grid
    from stencil_tpu.config import RunConfig as RC

    cfg = RC(size=(12, 16), iterations=4, methods=("xla",), check=True,
             periodic=("all",))
    sp = S.get_spec("jacobi5")
    g = make_grid(cfg, sp)
    assert float(np.abs(np.asarray(g.interior())).max()) > 0
    # partial-dynamic grids keep the reference's zero interior
    cfg2 = RC(size=(12, 16), iterations=4, methods=("xla",),
              periodic=("0",))
    g2 = make_grid(cfg2, sp)
    assert float(np.abs(np.asarray(g2.interior())).max()) == 0
    # and the checked run passes end-to-end
    from stencil_tpu.cli import run_all

    results = run_all(cfg, out=open("/dev/null", "w"))
    assert results[0]["check"]["ok"]
