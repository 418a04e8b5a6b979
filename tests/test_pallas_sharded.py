"""Differential tests for the sharded-Pallas composition (per-device slab
kernel + ppermute halo exchange) on the 8-virtual-device CPU mesh, kernels
in interpreter mode.

This validates the full BASELINE config-5 machinery: leading-dim sharding,
deep-halo exchange at temporal depth k, boundary pinning disabled on
mesh-interior devices, and the scatter/gather padded-layout plumbing —
against the float64 golden model (reference semantics,
``/root/reference/src/stencil/stencil.cpp:75-151``).
"""

import jax
import numpy as np
import pytest

from stencil_tpu.core.grid import HaloGrid
from stencil_tpu.core.spec import box, get_spec, star
from stencil_tpu.ops import golden
from stencil_tpu.parallel.halo import make_mesh
from stencil_tpu.parallel.pallas_sharded import ShardedPallasStencil


def _run(spec, shape, iters, k, n_dev=4, dtype="float32"):
    mesh = make_mesh((n_dev,), ("x",))
    grid = HaloGrid.create(shape, halo=spec.radius, dtype=dtype)
    method = ShardedPallasStencil(
        spec, shape, axis_name="x", dtype=dtype, sweeps_per_call=k,
        interpret=True,
    )
    out = method.iterate(grid, iters, mesh)
    ref = golden.golden_iterate(
        np.zeros(shape, dtype=np.float64), spec, iters, bc=grid.bc
    )
    np.testing.assert_allclose(
        np.asarray(out.interior(), dtype=np.float64), ref,
        atol=5e-6, rtol=5e-6,
    )


@pytest.mark.parametrize("k", [1, 2, 4])
def test_2d_star_matches_golden(k):
    _run(get_spec("jacobi5"), (64, 40), iters=8, k=k)


@pytest.mark.parametrize("k", [1, 3])
def test_3d_star_matches_golden(k):
    _run(get_spec("jacobi7"), (16, 12, 20), iters=6, k=k)


def test_3d_box_matches_golden():
    _run(get_spec("jacobi27"), (16, 12, 20), iters=4, k=2)


def test_2d_radius2_matches_golden():
    _run(star(2, 2), (64, 40), iters=6, k=2)


def test_remainder_iterations():
    # iterations not a multiple of k exercises the remainder kernel
    _run(get_spec("jacobi5"), (64, 40), iters=7, k=4)


def test_matches_single_device_pallas():
    """Cross-method consistency (the reference's -m A B -c pattern,
    ``main.cpp:46-50``): sharded result == single-device Pallas result."""
    from stencil_tpu.ops.pallas import PallasStencil

    spec = get_spec("jacobi7")
    shape = (16, 12, 20)
    grid = HaloGrid.create(shape, halo=1, dtype="float32")
    mesh = make_mesh((4,), ("x",))
    sharded = ShardedPallasStencil(
        spec, shape, sweeps_per_call=2, interpret=True
    )
    single = PallasStencil(spec, shape, sweeps_per_call=2, interpret=True)
    a = np.asarray(sharded.iterate(grid, 6, mesh).interior())
    b = np.asarray(single.iterate(grid, 6).interior())
    np.testing.assert_allclose(a, b, atol=2e-6, rtol=2e-6)


def test_registry_entry():
    from stencil_tpu import registry
    from stencil_tpu.config import RunConfig

    spec = get_spec("jacobi5")
    cfg = RunConfig(size=(64, 40), spec="jacobi5", temporal=2, mesh=(4,))
    grid = HaloGrid.create((64, 40), halo=1)
    runner = registry.get_runner("sharded_pallas", cfg, spec, grid)
    out = runner.iterate(grid, 4)
    ref = golden.golden_iterate(
        np.zeros((64, 40), dtype=np.float64), spec, 4, bc=grid.bc
    )
    np.testing.assert_allclose(
        np.asarray(out.interior(), np.float64), ref, atol=5e-6
    )


def test_sharded_pallas_tap_mode_plumbs_to_local_plan():
    from stencil_tpu.core.spec import get_spec
    from stencil_tpu.parallel.pallas_sharded import ShardedPallasStencil

    m = ShardedPallasStencil(get_spec("jacobi7"), (32, 16, 24),
                             sweeps_per_call=2, interpret=True,
                             tap_mode="slice")
    assert m.local_plan(2).tap_mode == "slice"
    m = ShardedPallasStencil(get_spec("jacobi7"), (32, 16, 24),
                             sweeps_per_call=2, interpret=True)
    assert m.local_plan(2).tap_mode == "rotacc"


# -- 2D-mesh sharding (both leading dims over the torus axes) -----------------

def _run2d(spec, shape, iters, k, mesh_shape=(2, 4), dtype="float32"):
    mesh = make_mesh(mesh_shape, ("x", "y"))
    grid = HaloGrid.create(shape, halo=spec.radius, dtype=dtype)
    method = ShardedPallasStencil(
        spec, shape, axis_names=("x", "y"), dtype=dtype, sweeps_per_call=k,
        interpret=True,
    )
    out = method.iterate(grid, iters, mesh)
    ref = golden.golden_iterate(
        np.zeros(shape, dtype=np.float64), spec, iters, bc=grid.bc
    )
    np.testing.assert_allclose(
        np.asarray(out.interior(), dtype=np.float64), ref,
        atol=5e-6, rtol=5e-6,
    )
    return out


@pytest.mark.parametrize("k", [1, 2])
def test_2d_mesh_3d_star_matches_golden(k):
    # the reference's core topology: a 2D device mesh over the two
    # leading grid dims (stencil_rma.cpp:194-196 runs an 8x8 CPE mesh)
    _run2d(get_spec("jacobi7"), (16, 16, 20), iters=4, k=k)


def test_2d_mesh_3d_box_matches_golden():
    # box stencils read the exchanged halo corners: validates the
    # phase-ordered transitive corner transit
    _run2d(get_spec("jacobi27"), (16, 16, 20), iters=4, k=2)


def test_2d_mesh_radius2_temporal():
    _run2d(star(3, 2), (16, 16, 20), iters=4, k=2)


def test_2d_mesh_bitwise_matches_1d_mesh():
    """(2,4) 2D-mesh result is bitwise identical to the (2,) 1D-mesh
    result: per-point tap accumulation order is fixed by the spec, so
    mesh topology must not change a single bit."""
    spec = get_spec("jacobi7")
    shape = (16, 16, 20)
    grid = HaloGrid.create(shape, halo=1, dtype="float32")
    m2 = ShardedPallasStencil(spec, shape, axis_names=("x", "y"),
                              sweeps_per_call=2, interpret=True)
    m1 = ShardedPallasStencil(spec, shape, axis_names=("x",),
                              sweeps_per_call=2, interpret=True)
    a = m2.iterate(grid, 4, make_mesh((2, 4), ("x", "y")))
    b = m1.iterate(grid, 4, make_mesh((2,), ("x",)))
    np.testing.assert_array_equal(np.asarray(a.interior()),
                                  np.asarray(b.interior()))


def test_2d_mesh_custom_bc():
    from stencil_tpu.core.grid import DirichletBC

    bc = DirichletBC(values=((2.0, -1.0), (0.5, 3.0), (-2.5, 4.0)))
    spec = get_spec("jacobi27")
    shape = (16, 16, 20)
    grid = HaloGrid.create(shape, halo=1, dtype="float32", bc=bc)
    mesh = make_mesh((2, 4), ("x", "y"))
    method = ShardedPallasStencil(spec, shape, axis_names=("x", "y"),
                                  sweeps_per_call=2, interpret=True)
    out = method.iterate(grid, 4, mesh)
    ref = golden.golden_iterate(np.zeros(shape, np.float64), spec, 4, bc=bc)
    np.testing.assert_allclose(
        np.asarray(out.interior(), np.float64), ref, atol=5e-6, rtol=5e-6
    )


def test_2d_mesh_registry_routing():
    from stencil_tpu import registry
    from stencil_tpu.config import RunConfig

    spec = get_spec("jacobi7")
    cfg = RunConfig(size=(16, 16, 20), spec="jacobi7", temporal=2,
                    mesh=(2, 4))
    grid = HaloGrid.create((16, 16, 20), halo=1)
    runner = registry.get_runner("sharded_pallas", cfg, spec, grid)
    assert "mesh=2x4" in runner.name
    out = runner.iterate(grid, 4)
    ref = golden.golden_iterate(
        np.zeros((16, 16, 20), dtype=np.float64), spec, 4, bc=grid.bc
    )
    np.testing.assert_allclose(
        np.asarray(out.interior(), np.float64), ref, atol=5e-6
    )


def test_2d_mesh_rejects_2d_grid():
    with pytest.raises(ValueError, match="3D grid"):
        ShardedPallasStencil(
            get_spec("jacobi5"), (64, 40), axis_names=("x", "y"),
            interpret=True,
        ).local_plan((2, 4))


def test_ragged_local_blocks():
    """Global dims divide the mesh, but the per-device block need not
    divide the tile sizes: the clamped-tile machinery must compose with
    disabled pins on mesh-internal faces (overlapping windows into
    neighbor-halo data)."""
    spec = get_spec("jacobi7")
    shape = (30, 20, 24)           # local (15, 20, 24) on 2 devices
    mesh = make_mesh((2,), ("x",))
    grid = HaloGrid.create(shape, halo=1, dtype="float32")
    method = ShardedPallasStencil(spec, shape, sweeps_per_call=2,
                                  interpret=True)
    plan = method.local_plan(2)
    assert plan.interior_shape == (15, 20, 24)
    out = method.iterate(grid, 4, mesh)
    ref = golden.golden_iterate(np.zeros(shape, np.float64), spec, 4,
                                bc=grid.bc)
    np.testing.assert_allclose(
        np.asarray(out.interior(), np.float64), ref, atol=5e-6, rtol=5e-6
    )


# -- interior-first comm/compute overlap --------------------------------------

def test_overlap_bitwise_matches_fused():
    """overlap=True (interior/edge phase split) must be bitwise identical
    to the fused step on 1D and 2D meshes. The small vmem budget forces
    8x8 local tiles so the split actually engages (partition_tiles finds
    interior tiles; without it small CPU blocks fit a single window and
    the path falls back to fused)."""
    from stencil_tpu.ops.pallas_tiled import partition_tiles

    spec = get_spec("jacobi27")
    shape = (48, 48, 32)
    grid = HaloGrid.create(shape, halo=1, dtype="float32")
    for mesh_shape, axes in [((2,), ("x",)), ((2, 2), ("x", "y"))]:
        mesh = make_mesh(mesh_shape, axes)
        m_over = ShardedPallasStencil(spec, shape, axis_names=axes,
                                      sweeps_per_call=2, interpret=True,
                                      overlap=True, vmem_budget=700_000)
        interior, edge = partition_tiles(m_over.local_plan(mesh_shape))
        assert interior and edge  # the split must actually engage
        a = m_over.iterate(grid, 4, mesh)
        b = ShardedPallasStencil(spec, shape, axis_names=axes,
                                 sweeps_per_call=2, interpret=True,
                                 overlap=False,
                                 vmem_budget=700_000).iterate(grid, 4, mesh)
        np.testing.assert_array_equal(np.asarray(a.interior()),
                                      np.asarray(b.interior()))


def test_no_overlap_flag_routes():
    from stencil_tpu import registry
    from stencil_tpu.config import RunConfig

    spec = get_spec("jacobi7")
    grid = HaloGrid.create((16, 16, 20), halo=1)
    cfg = RunConfig(size=(16, 16, 20), spec="jacobi7", temporal=2,
                    mesh=(2,), no_overlap=True,
                    methods=("sharded_pallas",))
    runner = registry.get_runner("sharded_pallas", cfg, spec, grid)
    out = runner.iterate(grid, 4)
    ref = golden.golden_iterate(np.zeros((16, 16, 20), np.float64), spec,
                                4, bc=grid.bc)
    np.testing.assert_allclose(np.asarray(out.interior(), np.float64),
                               ref, atol=5e-6)


def test_2d_mesh_bfloat16():
    # 16-bit path through the full 2D-mesh composition (synth taps,
    # int32-bitcast lane rolls, 4-face pins)
    spec = get_spec("jacobi7")
    shape = (16, 32, 24)
    grid = HaloGrid.create(shape, halo=1, dtype="bfloat16")
    mesh = make_mesh((2, 2), ("x", "y"))
    method = ShardedPallasStencil(spec, shape, axis_names=("x", "y"),
                                  dtype="bfloat16", sweeps_per_call=2,
                                  interpret=True)
    out = method.iterate(grid, 4, mesh)
    ref = golden.golden_iterate(np.zeros(shape, np.float64), spec, 4,
                                bc=grid.bc)
    np.testing.assert_allclose(
        np.asarray(out.interior(), np.float64), ref, atol=3e-2, rtol=3e-2
    )


# ---- dynamic (periodic/Neumann) BCs over the mesh -----------------------------
#
# Dynamic SHARDED dims ride the exchange: periodic closes the ppermute
# chain into the circular permutation, Neumann mesh-edge devices mirror
# their own edge strips. Dynamic UNSHARDED leading dims refresh locally
# at full temporal depth (after the exchange, so corners carry the fresh
# ghosts through the wrap/mirror — the golden models' increasing-dim
# order). Pins are disabled on every dynamic face.


def _run_dynamic(spec, shape, bc, iters, k, mesh_sizes, axes,
                 dtype="float32", seed=31):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    mesh = make_mesh(mesh_sizes, axes)
    x0 = rng.random(shape).astype(np.float32)
    grid = HaloGrid.from_interior(jnp.asarray(x0).astype(dtype),
                                  halo=spec.radius, bc=bc)
    method = ShardedPallasStencil(
        spec, shape, axis_names=tuple(axes), dtype=dtype,
        sweeps_per_call=k, interpret=True,
    )
    out = method.iterate(grid, iters, mesh)
    ref = golden.golden_iterate(x0, spec, iters, bc=bc)
    np.testing.assert_allclose(
        np.asarray(out.interior(), dtype=np.float64), ref,
        atol=5e-6, rtol=5e-6,
    )


@pytest.mark.parametrize("k", [1, 4])
def test_periodic_sharded_dim_1d_mesh(k):
    from stencil_tpu.core.grid import DirichletBC

    bc = DirichletBC.reference_default(3).with_periodic((0,))
    _run_dynamic(get_spec("jacobi7"), (16, 12, 20), bc, 2 * k + 1, k,
                 (4,), ("x",))


@pytest.mark.parametrize("k", [1, 4])
def test_neumann_sharded_dim_1d_mesh(k):
    from stencil_tpu.core.grid import DirichletBC

    bc = DirichletBC.reference_default(3).with_neumann((0,))
    _run_dynamic(get_spec("jacobi7"), (16, 12, 20), bc, 2 * k + 1, k,
                 (4,), ("x",))


def test_periodic_unsharded_d1_1d_mesh():
    # periodic d1 on a 1D mesh: the LOCAL deep refresh path
    from stencil_tpu.core.grid import DirichletBC

    bc = DirichletBC.reference_default(3).with_periodic((1,))
    _run_dynamic(get_spec("jacobi7"), (16, 12, 20), bc, 5, 2,
                 (4,), ("x",))


def test_neumann_unsharded_d1_1d_mesh():
    from stencil_tpu.core.grid import DirichletBC

    bc = DirichletBC.reference_default(3).with_neumann((1,))
    _run_dynamic(get_spec("jacobi7"), (16, 12, 20), bc, 5, 2,
                 (4,), ("x",))


def test_mixed_sharded_periodic_local_neumann():
    # periodic sharded d0 (circular ring) + Neumann unsharded d1 (local
    # mirror) on one grid, box taps through the corner transitivity
    from stencil_tpu.core.grid import DirichletBC

    bc = (DirichletBC.reference_default(3)
          .with_periodic((0,)).with_neumann((1,)))
    _run_dynamic(get_spec("jacobi27"), (16, 12, 20), bc, 4, 2,
                 (4,), ("x",))


def test_periodic_2d_mesh_both_sharded():
    # both sharded dims periodic over a 4x2 mesh: doubly-circular rings
    from stencil_tpu.core.grid import DirichletBC

    bc = DirichletBC.reference_default(3).with_periodic((0, 1))
    _run_dynamic(get_spec("jacobi7"), (16, 12, 20), bc, 5, 2,
                 (4, 2), ("x", "y"))


def test_neumann_2d_mesh_both_sharded_box():
    # box stencil: mesh-edge mirror corners through both phases
    from stencil_tpu.core.grid import DirichletBC

    bc = DirichletBC.reference_default(3).with_neumann((0, 1))
    _run_dynamic(get_spec("jacobi27"), (16, 12, 20), bc, 4, 2,
                 (4, 2), ("x", "y"))


def test_mixed_periodic_neumann_2d_mesh():
    from stencil_tpu.core.grid import DirichletBC

    bc = (DirichletBC.reference_default(3)
          .with_periodic((0,)).with_neumann((1,)))
    _run_dynamic(get_spec("jacobi7"), (16, 12, 20), bc, 5, 2,
                 (4, 2), ("x", "y"))


def test_periodic_2d_grid_sharded_slab():
    # the 2D slab kernel under a periodic sharded d0
    from stencil_tpu.core.grid import DirichletBC

    bc = DirichletBC.reference_default(2).with_periodic((0,))
    _run_dynamic(get_spec("jacobi5"), (64, 40), bc, 6, 2, (4,), ("x",))


def test_neumann_2d_grid_sharded_slab():
    from stencil_tpu.core.grid import DirichletBC

    bc = DirichletBC.reference_default(2).with_neumann((0,))
    _run_dynamic(get_spec("jacobi5"), (64, 40), bc, 6, 2, (4,), ("x",))


def test_dynamic_matches_single_device_tiled():
    # cross-method: sharded periodic result == single-device tiled result
    from stencil_tpu.core.grid import DirichletBC
    from stencil_tpu.ops.pallas_tiled import TiledPallasStencil

    import jax.numpy as jnp

    spec = get_spec("jacobi7")
    shape = (16, 12, 20)
    bc = DirichletBC.reference_default(3).with_periodic((0, 1))
    rng = np.random.default_rng(37)
    x0 = jnp.asarray(rng.random(shape).astype(np.float32))
    grid = HaloGrid.from_interior(x0, halo=1, bc=bc)
    mesh = make_mesh((2, 2), ("x", "y"))
    sharded = ShardedPallasStencil(
        spec, shape, axis_names=("x", "y"), sweeps_per_call=2,
        interpret=True,
    )
    single = TiledPallasStencil(spec, shape, sweeps_per_call=2,
                                interpret=True)
    a = np.asarray(sharded.iterate(grid, 6, mesh).interior())
    b = np.asarray(single.iterate(grid, 6).interior())
    np.testing.assert_allclose(a, b, atol=2e-6, rtol=2e-6)


def test_dynamic_degenerate_mesh1():
    # n=1 mesh axis: the periodic ring closes onto the device itself
    # (self ppermute pair (0,0)) and the fused (no-split) step runs the
    # local mirror refresh — the degenerate case batch H also runs on
    # silicon
    from stencil_tpu.core.grid import DirichletBC

    bc = (DirichletBC.reference_default(3)
          .with_periodic((0,)).with_neumann((1,)))
    _run_dynamic(get_spec("jacobi7"), (16, 12, 20), bc, 4, 2, (1,), ("x",))
