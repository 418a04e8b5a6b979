"""Fused source term on the tiled 3D Pallas kernel.

Every virtual sweep computes the affine update ``u' = S(u) + c*f`` with
the (static, pre-scaled, layout-padded) source streamed per tile window
through its own DMA slots. Differential-tested against the float64
golden model (``ops/golden.py:golden_iterate(source=...)``) across tap
modes, temporal depths, ragged shapes, dynamic BCs, dtypes, and the
schedule variants (serialized DMA, multi-core walk, tile subsets);
the Poisson model rides this path via ``runner(method='pallas_tiled')``.
"""

import numpy as np
import pytest

from stencil_tpu.core.grid import DirichletBC, HaloGrid
from stencil_tpu.core.spec import get_spec
from stencil_tpu.models.poisson import PoissonProblem, manufactured_sine
from stencil_tpu.ops.golden import golden_iterate
from stencil_tpu.ops.pallas_tiled import (
    TiledPallasStencil, make_tiled_plan, pad_source, _cached_tiled_sweep,
)


def _run_case(shape, k, iters, tap_mode=None, bc=None, dtype="float32",
              tiles=None, atol=3e-5, spec_name="jacobi7", scale=-0.04,
              **kw):
    import jax.numpy as jnp

    rng = np.random.default_rng(hash((shape, k, iters, str(tap_mode),
                                      dtype)) % 2**32)
    spec = get_spec(spec_name)
    if bc is None:
        bc = DirichletBC.reference_default(3)
    u0 = rng.normal(size=shape).astype(np.float32)
    f = rng.normal(size=shape).astype(np.float32)
    want = golden_iterate(u0, spec, iters, bc=bc, source=f,
                          source_scale=scale)
    m = TiledPallasStencil(spec, shape, dtype=dtype, sweeps_per_call=k,
                           tap_mode=tap_mode, tiles=tiles, interpret=True,
                           source=f, source_scale=scale, **kw)
    g = HaloGrid.from_interior(jnp.asarray(u0, dtype), halo=spec.radius,
                               bc=bc)
    got = np.asarray(m.iterate(g, iters).interior(), np.float64)
    err = float(np.max(np.abs(got - want)))
    assert err < atol, (err, atol)


@pytest.mark.parametrize("tap_mode", ["slice", "roll", "synth", "rotacc"])
def test_source_matches_golden_all_tap_modes(tap_mode):
    _run_case((16, 24, 20), 4, 8, tap_mode=tap_mode)


@pytest.mark.parametrize("k,iters", [(1, 3), (2, 6), (8, 16)])
def test_source_temporal_depths(k, iters):
    _run_case((16, 16, 24), k, iters)


def test_source_remainder_sweeps():
    _run_case((16, 24, 20), 4, 10)  # 2 outer + rem 2


def test_source_ragged_clamped_tiles():
    _run_case((13, 17, 19), 3, 7, tap_mode="synth")


def test_source_radius2():
    _run_case((18, 20, 22), 2, 4, spec_name="laplace3d_ho", atol=1e-4)


def test_source_box27_separable():
    _run_case((14, 16, 18), 2, 4, spec_name="jacobi27")


def test_source_dynamic_bcs():
    bc = DirichletBC.reference_default(3).with_periodic((0,)) \
        .with_neumann((1,))
    _run_case((16, 24, 20), 4, 8, bc=bc)


def test_source_periodic_all_leading():
    bc = DirichletBC.reference_default(3).with_periodic((0, 1))
    _run_case((16, 16, 24), 2, 4, bc=bc)


def test_source_bf16():
    # bf16 eps ~ 8e-3; errors accumulate over sweeps
    _run_case((16, 16, 128), 2, 4, dtype="bfloat16", atol=0.15)


def test_source_serialized_dma():
    _run_case((16, 24, 20), 4, 8, pipeline=False)


def test_source_cores2():
    _run_case((16, 24, 20), 4, 8, cores=2)


def test_source_subset_phase_split():
    """Interior/edge subsets with a source compose to the full sweep
    (the overlapped sharded path's phase split stays source-legal)."""
    import jax.numpy as jnp

    from stencil_tpu.ops.pallas_tiled import partition_tiles

    shape = (16, 24, 20)
    spec = get_spec("jacobi7")
    bc = DirichletBC.reference_default(3)
    plan = make_tiled_plan(spec, shape, "float32", 2, tiles=(8, 8),
                           has_source=True)
    rng = np.random.default_rng(3)
    u0 = rng.normal(size=shape).astype(np.float32)
    f = rng.normal(size=shape).astype(np.float32)
    src = pad_source(plan, f, -0.05, bc)
    cur = plan.layout.pad(jnp.asarray(u0), bc)
    nxt = jnp.copy(cur)

    full = _cached_tiled_sweep(plan, bc, True)(cur, nxt, src)
    interior, edge = partition_tiles(plan)
    out = jnp.copy(cur)
    if interior:
        out = _cached_tiled_sweep(plan, bc, True, tuple(interior))(
            cur, out, src)
    out = _cached_tiled_sweep(plan, bc, True, tuple(edge))(cur, out, src)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(out))


def test_source_slide_gated():
    spec = get_spec("jacobi7")
    with pytest.raises(ValueError, match="slide"):
        make_tiled_plan(spec, (32, 32, 32), "float32", 2, tiles=(16, 16),
                        slide=True, has_source=True)


def test_source_shape_mismatch():
    spec = get_spec("jacobi7")
    with pytest.raises(ValueError, match="source shape"):
        TiledPallasStencil(spec, (16, 16, 16), sweeps_per_call=2,
                           interpret=True,
                           source=np.zeros((8, 8, 8), np.float32))


def test_source_plan_vmem_accounting():
    """A source plan charges the extra window slots: its estimate must
    strictly exceed the sourceless twin's."""
    from stencil_tpu.ops.pallas_tiled import _vmem_bytes

    spec = get_spec("jacobi7")
    a = _vmem_bytes(spec, (64, 64, 64), "float32", 4, 16, 16)
    b = _vmem_bytes(spec, (64, 64, 64), "float32", 4, 16, 16,
                    has_source=True)
    assert b > a


def test_poisson_tiled_runner_matches_xla():
    """The 3D Poisson solve through the tiled source kernel equals the
    XLA source path (same affine recursion, same BC handling)."""
    shape = (12, 16, 20)
    prob = PoissonProblem(shape=shape)
    rng = np.random.default_rng(7)
    f = rng.normal(size=shape)
    r_xla = prob.runner(f, method="xla")
    r_til = prob.runner(f, method="pallas_tiled", sweeps_per_call=4,
                        interpret=True)
    g = prob.initial_grid()
    a = np.asarray(r_xla.iterate(g, 12).interior(), np.float64)
    b = np.asarray(r_til.iterate(g, 12).interior(), np.float64)
    assert float(np.max(np.abs(a - b))) < 2e-6


def test_poisson_tiled_manufactured_solution():
    """Full 3D Poisson solve on the tiled path converges to the analytic
    manufactured solution within discretization error."""
    shape = (12, 12, 12)
    prob = PoissonProblem(shape=shape)
    f, u_exact = manufactured_sine(shape)
    res = prob.solve(f, tolerance=5e-7, max_iterations=20_000,
                     check_every=500, method="pallas_tiled",
                     sweeps_per_call=4, interpret=True)
    assert res.converged, res.summary()
    u = np.asarray(res.grid.interior(), np.float64)
    assert np.max(np.abs(u - u_exact)) < 5.0 * prob.h ** 2


# ------------------------------------------------------- multi-chip source

def _run_sharded_source(shape, k, iters, mesh_shape, bc=None,
                        overlap=True, atol=5e-6):
    import jax.numpy as jnp

    from stencil_tpu.core.grid import HaloGrid
    from stencil_tpu.parallel.halo import make_mesh
    from stencil_tpu.parallel.pallas_sharded import ShardedPallasStencil

    axes = ("x", "y")[: len(mesh_shape)]
    mesh = make_mesh(mesh_shape, axes)
    spec = get_spec("jacobi7")
    if bc is None:
        bc = DirichletBC.reference_default(3)
    rng = np.random.default_rng(sum(shape) + k)
    u0 = rng.normal(size=shape).astype(np.float32)
    f = rng.normal(size=shape).astype(np.float32)
    scale = -0.05
    method = ShardedPallasStencil(
        spec, shape, axis_names=axes, sweeps_per_call=k, interpret=True,
        overlap=overlap, has_source=True,
    )
    grid = HaloGrid.from_interior(jnp.asarray(u0), halo=spec.radius, bc=bc)
    out = method.iterate(grid, iters, mesh, source=f, source_scale=scale)
    want = golden_iterate(u0, spec, iters, bc=bc, source=f,
                          source_scale=scale)
    err = float(np.max(np.abs(
        np.asarray(out.interior(), np.float64) - want)))
    assert err < atol, err


def test_sharded_source_1d_mesh():
    _run_sharded_source((16, 12, 20), 2, 6, (4,))


def test_sharded_source_2d_mesh():
    _run_sharded_source((16, 16, 20), 2, 4, (2, 4))


def test_sharded_source_periodic_sharded_dim():
    bc = DirichletBC.reference_default(3).with_periodic((0,))
    _run_sharded_source((16, 12, 20), 2, 4, (4,), bc=bc)


def test_sharded_source_neumann_unsharded_dim():
    bc = DirichletBC.reference_default(3).with_neumann((1,))
    _run_sharded_source((16, 12, 20), 2, 4, (2,), bc=bc)


def test_sharded_source_overlap_split_bitwise():
    """The interior/edge phase split with a source is bitwise-identical
    to the fused step."""
    import jax.numpy as jnp

    from stencil_tpu.core.grid import HaloGrid
    from stencil_tpu.parallel.halo import make_mesh
    from stencil_tpu.parallel.pallas_sharded import ShardedPallasStencil

    shape = (16, 12, 20)
    spec = get_spec("jacobi7")
    mesh = make_mesh((4,), ("x",))
    bc = DirichletBC.reference_default(3)
    rng = np.random.default_rng(2)
    u0 = rng.normal(size=shape).astype(np.float32)
    f = rng.normal(size=shape).astype(np.float32)
    grid = HaloGrid.from_interior(jnp.asarray(u0), halo=1, bc=bc)
    outs = []
    for overlap in (True, False):
        m = ShardedPallasStencil(spec, shape, axis_names=("x",),
                                 sweeps_per_call=2, interpret=True,
                                 overlap=overlap, has_source=True)
        outs.append(np.asarray(
            m.iterate(grid, 4, mesh, source=f,
                      source_scale=-0.03).interior()))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_sharded_source_arg_validation():
    from stencil_tpu.parallel.halo import make_mesh
    from stencil_tpu.parallel.pallas_sharded import ShardedPallasStencil
    from stencil_tpu.core.grid import HaloGrid

    spec = get_spec("jacobi7")
    mesh = make_mesh((2,), ("x",))
    g = HaloGrid.create((8, 8, 8), halo=1)
    m = ShardedPallasStencil(spec, (8, 8, 8), sweeps_per_call=1,
                             interpret=True, has_source=True)
    with pytest.raises(ValueError, match="source"):
        m.iterate(g, 2, mesh)  # has_source without source=
    m2 = ShardedPallasStencil(spec, (8, 8, 8), sweeps_per_call=1,
                              interpret=True)
    with pytest.raises(ValueError, match="source"):
        m2.iterate(g, 2, mesh, source=np.zeros((8, 8, 8), np.float32))


def test_poisson_sharded_runner_matches_xla():
    import jax.numpy as jnp

    from stencil_tpu.parallel.halo import make_mesh

    shape = (16, 12, 20)
    prob = PoissonProblem(shape=shape)
    rng = np.random.default_rng(11)
    f = rng.normal(size=shape)
    mesh = make_mesh((4,), ("x",))
    r_sh = prob.sharded_runner(f, mesh, sweeps_per_call=2,
                               interpret=True)
    r_xla = prob.runner(f, method="xla")
    g = prob.initial_grid()
    a = np.asarray(r_sh.iterate(g, 8).interior(), np.float64)
    b = np.asarray(r_xla.iterate(g, 8).interior(), np.float64)
    assert float(np.max(np.abs(a - b))) < 5e-6


# ---------------------------------------------------------- 2D slab source

def _run_slab_source(shape, k, iters, tap_mode=None, bc=None,
                     spec_name="jacobi5", atol=3e-5, slab=None):
    import jax.numpy as jnp

    from stencil_tpu.ops.pallas import PallasStencil

    rng = np.random.default_rng(sum(shape) * k + iters)
    spec = get_spec(spec_name)
    if bc is None:
        bc = DirichletBC.reference_default(2)
    u0 = rng.normal(size=shape).astype(np.float32)
    f = rng.normal(size=shape).astype(np.float32)
    scale = -0.03
    want = golden_iterate(u0, spec, iters, bc=bc, source=f,
                          source_scale=scale)
    m = PallasStencil(spec, shape, sweeps_per_call=k, tap_mode=tap_mode,
                      slab=slab, interpret=True, source=f,
                      source_scale=scale)
    g = HaloGrid.from_interior(jnp.asarray(u0), halo=spec.radius, bc=bc)
    got = np.asarray(m.iterate(g, iters).interior(), np.float64)
    err = float(np.max(np.abs(got - want)))
    assert err < atol, err


@pytest.mark.parametrize("tap_mode", ["slice", "synth", "rotacc"])
def test_slab_source_tap_modes(tap_mode):
    _run_slab_source((32, 40), 4, 8, tap_mode=tap_mode)


@pytest.mark.parametrize("k,iters", [(1, 3), (8, 16), (4, 10)])
def test_slab_source_temporal_and_remainder(k, iters):
    _run_slab_source((32, 40), k, iters)


def test_slab_source_box9():
    _run_slab_source((32, 40), 4, 8, spec_name="jacobi9")


def test_slab_source_dynamic_lead():
    bc = DirichletBC.reference_default(2).with_periodic((0,))
    _run_slab_source((32, 40), 4, 8, bc=bc)


def test_slab_source_small_slab_midpins():
    # slab smaller than the recompute extension exercises mid-slab pins
    _run_slab_source((32, 40), 8, 8, slab=8)


def test_poisson_slab_runner_matches_xla():
    shape = (24, 32)
    prob = PoissonProblem(shape=shape)
    rng = np.random.default_rng(13)
    f = rng.normal(size=shape)
    r_xla = prob.runner(f, method="xla")
    r_slab = prob.runner(f, method="pallas_slab", sweeps_per_call=4,
                         interpret=True)
    g = prob.initial_grid()
    a = np.asarray(r_xla.iterate(g, 12).interior(), np.float64)
    b = np.asarray(r_slab.iterate(g, 12).interior(), np.float64)
    assert float(np.max(np.abs(a - b))) < 2e-6
