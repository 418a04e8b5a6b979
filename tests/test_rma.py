"""Differential tests for the in-kernel RMA method (``parallel.rma``):
VMEM-resident blocks, remote-DMA halo pushes, double-buffered semaphores,
1D/2D device meshes, temporal blocking.

Runs under Pallas TPU-interpret mode (``pltpu.InterpretParams``), which
simulates VMEM/HBM, remote DMAs, semaphores and barriers on the CPU mesh —
including an optional vector-clock data race detector, which we turn on for
the subtlest pipelines (the reference has no race detection at all; its
DMA/RMA safety is by construction, SURVEY §5).
"""

import jax
import numpy as np
import pytest

from stencil_tpu.core.grid import HaloGrid
from stencil_tpu.core.spec import box, get_spec, star
from stencil_tpu.ops import golden
from stencil_tpu.parallel.halo import make_mesh
from stencil_tpu.parallel.rma import RmaStencil, make_rma_plan


def _run(spec, shape, iters, mesh_sizes=(4,), k=1, dtype="float32",
         detect_races=False):
    axes = ("x", "y")[: len(mesh_sizes)]
    mesh = make_mesh(mesh_sizes, axes)
    grid = HaloGrid.create(shape, halo=spec.radius, dtype=dtype)
    m = RmaStencil(spec, shape, dtype=dtype, sweeps_per_call=k,
                   interpret=True, detect_races=detect_races)
    out = m.iterate(grid, iters, mesh)
    ref = golden.golden_iterate(
        np.zeros(shape, dtype=np.float64), spec, iters, bc=grid.bc
    )
    np.testing.assert_allclose(
        np.asarray(out.interior(), np.float64), ref, atol=5e-6, rtol=5e-6
    )


# ---- 1D mesh -----------------------------------------------------------


def test_2d_star():
    _run(get_spec("jacobi5"), (64, 40), iters=8)


def test_2d_star_odd_iters():
    # odd count exercises the final-slot selection (blocks[n % 2])
    _run(get_spec("jacobi5"), (64, 40), iters=7)


def test_2d_radius2():
    _run(star(2, 2), (64, 40), iters=6)


def test_2d_box():
    _run(box(2, 1), (64, 40), iters=6)


def test_3d_star():
    _run(get_spec("jacobi7"), (16, 12, 20), iters=6)


def test_single_device():
    _run(get_spec("jacobi5"), (32, 40), iters=5, mesh_sizes=(1,))


def test_two_devices():
    _run(get_spec("jacobi5"), (32, 40), iters=5, mesh_sizes=(2,))


# ---- temporal blocking (k sweeps per exchange) --------------------------


def test_temporal_k2():
    _run(get_spec("jacobi5"), (64, 40), iters=8, k=2)


def test_temporal_k4():
    _run(get_spec("jacobi5"), (64, 40), iters=12, k=4)


def test_temporal_k4_remainder():
    # 10 = 2 full exchanges at k=4 + one remainder exchange at k=2
    _run(get_spec("jacobi5"), (64, 40), iters=10, k=4)


def test_temporal_box():
    # temporal box: the k-sweep dependency cone needs halo corners
    _run(box(2, 1), (64, 40), iters=8, k=2)


def test_temporal_3d():
    _run(get_spec("jacobi7"), (16, 16, 20), iters=8, k=2)


# ---- 2D mesh (the reference's 8x8 CPE topology, stencil_rma.cpp:194) ----


def test_2d_mesh_3d_star():
    _run(get_spec("jacobi7"), (16, 32, 20), iters=6, mesh_sizes=(2, 4))


def test_2d_mesh_3d_box_corners():
    # box stencil reads halo corners: the phase-ordered strips must carry
    # diagonal-neighbor data transitively
    _run(box(3, 1), (16, 32, 20), iters=6, mesh_sizes=(2, 4))


def test_2d_mesh_temporal():
    _run(get_spec("jacobi7"), (16, 32, 20), iters=8, mesh_sizes=(2, 4), k=2)


def test_2d_mesh_radius2():
    _run(star(3, 2), (32, 32, 20), iters=6, mesh_sizes=(2, 2))


def test_2d_mesh_2d_grid_lane_sharding():
    # 2D grid on a 2D mesh shards the LANE dim: 128-aligned push windows
    _run(get_spec("jacobi5"), (32, 256), iters=6, mesh_sizes=(2, 2))


def test_2d_mesh_2d_grid_temporal():
    _run(get_spec("jacobi5"), (32, 256), iters=8, mesh_sizes=(2, 2), k=2)


# ---- race detector -------------------------------------------------------


def test_race_detector_clean_1d():
    """The interpret-mode vector-clock race detector must find no races in
    the double-buffered pipeline."""
    _run(get_spec("jacobi5"), (32, 24), iters=6, mesh_sizes=(2,),
         detect_races=True)


def test_race_detector_clean_2d_mesh():
    """Race-free on the (2, 4) mesh: two phase-ordered pushes per axis per
    iteration, corners riding the second phase."""
    _run(get_spec("jacobi7"), (16, 32, 20), iters=6, mesh_sizes=(2, 4),
         detect_races=True)


def test_race_detector_clean_temporal():
    """Race-free with the 4-buffer temporal pipeline (k sweeps per
    exchange, compute buffers disjoint from remote-DMA targets)."""
    _run(get_spec("jacobi7"), (16, 32, 20), iters=8, mesh_sizes=(2, 4),
         k=2, detect_races=True)


# ---- plan validation -----------------------------------------------------


def test_vmem_residency_guard():
    spec = get_spec("jacobi7")
    with pytest.raises(ValueError, match="VMEM-resident budget"):
        make_rma_plan(spec, (512, 512, 512))


def test_alignment_guard():
    # sharded sublane dim must be a multiple of the DMA granule
    spec = get_spec("jacobi7")
    with pytest.raises(ValueError, match="DMA granule"):
        make_rma_plan(spec, (8, 4, 20), mesh_shape=(2, 2))


def test_min_size_guard():
    spec = get_spec("jacobi5")
    with pytest.raises(ValueError, match="too small"):
        make_rma_plan(spec, (8, 40), mesh_shape=(2,), sweeps_per_call=8)


def test_registry_entry():
    from stencil_tpu import registry
    from stencil_tpu.config import RunConfig

    spec = get_spec("jacobi5")
    cfg = RunConfig(size=(64, 40), spec="jacobi5", mesh=(4,))
    grid = HaloGrid.create((64, 40), halo=1)
    runner = registry.get_runner("rma", cfg, spec, grid)
    out = runner.iterate(grid, 4)
    ref = golden.golden_iterate(
        np.zeros((64, 40), np.float64), spec, 4, bc=grid.bc
    )
    np.testing.assert_allclose(
        np.asarray(out.interior(), np.float64), ref, atol=5e-6
    )


def test_registry_entry_2d_mesh_temporal():
    from stencil_tpu import registry
    from stencil_tpu.config import RunConfig

    spec = get_spec("jacobi7")
    cfg = RunConfig(size=(16, 32, 20), spec="jacobi7", mesh=(2, 4),
                    temporal=2)
    grid = HaloGrid.create((16, 32, 20), halo=1)
    runner = registry.get_runner("rma", cfg, spec, grid)
    assert runner.granularity == 2
    out = runner.iterate(grid, 4)
    ref = golden.golden_iterate(
        np.zeros((16, 32, 20), np.float64), spec, 4, bc=grid.bc
    )
    np.testing.assert_allclose(
        np.asarray(out.interior(), np.float64), ref, atol=5e-6
    )


def test_custom_bc_2d_mesh_box():
    """Per-face Dirichlet values through the RMA kernel's local BC
    synthesis on a 2D mesh — edge devices pin different faces, and a
    box spec reads the halo corners the phase-ordered strips carry."""
    from stencil_tpu.core.grid import DirichletBC

    spec = get_spec("jacobi27")
    bc = DirichletBC(values=((2.0, -1.0), (0.5, 3.0), (-2.5, 4.0)))
    shape = (32, 32, 24)
    mesh = make_mesh((2, 2), ("x", "y"))
    grid = HaloGrid.create(shape, halo=1, dtype="float32", bc=bc)
    m = RmaStencil(spec, shape, dtype="float32", sweeps_per_call=2,
                   interpret=True)
    out = m.iterate(grid, 4, mesh)
    ref = golden.golden_iterate(np.zeros(shape, np.float64), spec, 4,
                                bc=bc)
    np.testing.assert_allclose(
        np.asarray(out.interior(), np.float64), ref, atol=5e-6, rtol=5e-6
    )


def test_bf16_rma():
    # the RMA kernel's strips/compute are dtype-generic; bf16 blocks
    # halve VMEM residency (the reference is fp32-only)
    spec = get_spec("jacobi5")
    shape = (64, 40)
    mesh = make_mesh((2,), ("x",))
    grid = HaloGrid.create(shape, halo=1, dtype="bfloat16")
    m = RmaStencil(spec, shape, dtype="bfloat16", sweeps_per_call=2,
                   interpret=True)
    out = m.iterate(grid, 4, mesh)
    ref = golden.golden_iterate(np.zeros(shape, np.float64), spec, 4,
                                bc=grid.bc)
    np.testing.assert_allclose(
        np.asarray(out.interior(), np.float64), ref, atol=3e-2, rtol=3e-2
    )


# ---- periodic sharded dims (ring push topology) -------------------------
#
# Periodic SHARDED dims close the remote-DMA push topology into the ring
# the ICI torus physically provides: circular neighbor ids, all-true
# has_lo/has_hi (which also disables the physical-face re-pinning on
# those dims). A dynamic LANE dim gates cleanly.


def _run_periodic(spec, shape, dims, iters, mesh_sizes, k=1,
                  detect_races=False, seed=41):
    import jax.numpy as jnp
    from stencil_tpu.core.grid import DirichletBC

    axes = ("x", "y")[: len(mesh_sizes)]
    mesh = make_mesh(mesh_sizes, axes)
    bc = DirichletBC.reference_default(len(shape)).with_periodic(dims)
    rng = np.random.default_rng(seed)
    x0 = rng.random(shape).astype(np.float32)
    grid = HaloGrid.from_interior(jnp.asarray(x0), halo=spec.radius, bc=bc)
    m = RmaStencil(spec, shape, sweeps_per_call=k,
                   interpret=True, detect_races=detect_races)
    out = m.iterate(grid, iters, mesh)
    ref = golden.golden_iterate(x0, spec, iters, bc=bc)
    np.testing.assert_allclose(
        np.asarray(out.interior(), np.float64), ref, atol=5e-6, rtol=5e-6
    )


@pytest.mark.parametrize("k", [1, 2])
def test_periodic_ring_1d_mesh(k):
    _run_periodic(get_spec("jacobi5"), (64, 40), (0,), 2 * k + 1, (4,), k=k)


def test_periodic_ring_single_device():
    # n=1 ring: both pushes target the device itself (self remote-DMA
    # wrap) — the degenerate ring must still wrap correctly
    _run_periodic(get_spec("jacobi5"), (32, 40), (0,), 5, (1,))


def test_periodic_ring_3d_star():
    _run_periodic(get_spec("jacobi7"), (16, 12, 20), (0,), 5, (4,), k=2)


def test_periodic_2d_mesh_both_rings_box():
    # doubly-circular: box corners ride the phase-ordered wrapped strips
    _run_periodic(get_spec("jacobi27"), (16, 32, 20), (0, 1), 4, (2, 2),
                  k=2)


def test_periodic_mixed_ring_and_dirichlet_2d_mesh():
    _run_periodic(get_spec("jacobi7"), (16, 32, 20), (0,), 5, (2, 2), k=2)


def test_periodic_ring_race_detector():
    # the vector-clock race detector over the circular pipeline: wrapped
    # pushes + i%2 slot parity must stay race-free like the open chain
    _run_periodic(get_spec("jacobi5"), (32, 40), (0,), 4, (4,), k=2,
                  detect_races=True)


def test_periodic_lane_dim_gates():
    from stencil_tpu.core.grid import DirichletBC

    mesh = make_mesh((4,), ("x",))
    bc = DirichletBC.reference_default(3).with_periodic((2,))
    grid = HaloGrid.create((16, 12, 20), halo=1, bc=bc)
    m = RmaStencil(get_spec("jacobi7"), (16, 12, 20), interpret=True)
    with pytest.raises(ValueError, match="LANE"):
        m.iterate(grid, 2, mesh)


# ---- Neumann sharded dims (in-kernel mirror synthesis) -------------------
#
# Neumann SHARDED dims keep the open push chain: mesh-edge devices
# synthesize their own k*r-deep mirror ghosts in-kernel each outer step
# (``mirror_dim``), phase-ordered with the strip footprint so corners
# transit to the later phase exactly like remote strips. At k>1 the
# mirror extension only survives a sweep when the spec is
# mirror-symmetric in the dim (same gate as the single-chip kernels).


def _run_dynamic(spec, shape, iters, mesh_sizes, periodic=(), neumann=(),
                 k=1, detect_races=False, seed=43):
    import jax.numpy as jnp
    from stencil_tpu.core.grid import DirichletBC

    axes = ("x", "y")[: len(mesh_sizes)]
    mesh = make_mesh(mesh_sizes, axes)
    bc = DirichletBC.reference_default(len(shape))
    if periodic:
        bc = bc.with_periodic(periodic)
    if neumann:
        bc = bc.with_neumann(neumann)
    rng = np.random.default_rng(seed)
    x0 = rng.random(shape).astype(np.float32)
    grid = HaloGrid.from_interior(jnp.asarray(x0), halo=spec.radius, bc=bc)
    m = RmaStencil(spec, shape, sweeps_per_call=k,
                   interpret=True, detect_races=detect_races)
    out = m.iterate(grid, iters, mesh)
    ref = golden.golden_iterate(x0, spec, iters, bc=bc)
    np.testing.assert_allclose(
        np.asarray(out.interior(), np.float64), ref, atol=5e-6, rtol=5e-6
    )


@pytest.mark.parametrize("k", [1, 2])
def test_neumann_1d_mesh(k):
    _run_dynamic(get_spec("jacobi5"), (64, 40), 2 * k + 1, (4,),
                 neumann=(0,), k=k)


def test_neumann_single_device_mesh():
    # n=1 mesh: the device is edge on BOTH faces — both mirrors are
    # local (disjoint read/write bands since local size >= 2*k*r)
    _run_dynamic(get_spec("jacobi5"), (32, 40), 5, (1,), neumann=(0,), k=2)


def test_neumann_3d_star_temporal():
    _run_dynamic(get_spec("jacobi7"), (16, 12, 20), 5, (4,),
                 neumann=(0,), k=2)


def test_neumann_2d_mesh_both_dims_box():
    # doubly-mirrored box corners through the phase-ordered mirror +
    # strip footprints
    _run_dynamic(get_spec("jacobi27"), (16, 32, 20), 4, (2, 2),
                 neumann=(0, 1), k=2)


def test_neumann_mixed_with_periodic_and_dirichlet():
    # periodic ring on d0, mirror on d1, Dirichlet lane — all three BC
    # modes in one 2D-mesh kernel
    _run_dynamic(get_spec("jacobi7"), (16, 32, 20), 5, (2, 2),
                 periodic=(0,), neumann=(1,), k=2)


def test_neumann_race_detector_clean():
    # local mirror writes must not race incoming pushes or the i%2
    # pipeline (mirror footprint = strip footprint: interior-only in
    # later sharded dims)
    _run_dynamic(get_spec("jacobi7"), (16, 32, 20), 4, (2, 2),
                 neumann=(0, 1), k=2, detect_races=True)


def test_neumann_asymmetric_spec_gates_at_temporal():
    import jax.numpy as jnp
    from stencil_tpu.core.grid import DirichletBC
    from stencil_tpu.core import spec as S

    sp = S.weighted(2, [((-1, 0), 0.5), ((1, 0), 0.1), ((0, -1), 0.2),
                        ((0, 1), 0.2)], name="asym2d")
    mesh = make_mesh((4,), ("x",))
    bc = DirichletBC.reference_default(2).with_neumann((0,))
    grid = HaloGrid.create((64, 40), halo=1, bc=bc)
    m = RmaStencil(sp, (64, 40), sweeps_per_call=2, interpret=True)
    with pytest.raises(ValueError, match="mirror-symmetric"):
        m.iterate(grid, 4, mesh)
    # k=1 needs no symmetry: the mirror ghosts feed interior-only taps
    m1 = RmaStencil(sp, (64, 40), sweeps_per_call=1, interpret=True)
    rng = np.random.default_rng(7)
    x0 = rng.random((64, 40)).astype(np.float32)
    g1 = HaloGrid.from_interior(jnp.asarray(x0), halo=1, bc=bc)
    out = m1.iterate(g1, 3, mesh)
    ref = golden.golden_iterate(x0, sp, 3, bc=bc)
    np.testing.assert_allclose(
        np.asarray(out.interior(), np.float64), ref, atol=5e-6, rtol=5e-6
    )


def test_neumann_lane_dim_gates():
    from stencil_tpu.core.grid import DirichletBC

    mesh = make_mesh((4,), ("x",))
    bc = DirichletBC.reference_default(3).with_neumann((2,))
    grid = HaloGrid.create((16, 12, 20), halo=1, bc=bc)
    m = RmaStencil(get_spec("jacobi7"), (16, 12, 20), interpret=True)
    with pytest.raises(ValueError, match="LANE"):
        m.iterate(grid, 2, mesh)


# ---- dynamic UNSHARDED leading dims (local in-kernel refresh) -------------
#
# Unsharded dynamic leading dims wrap/mirror-refresh their own k*r-deep
# ghosts at iteration start (``refresh_unsharded``, interior footprint
# on sharded dims — their ghost zones are in-flight DMA targets) and
# join the temporal recompute trapezoid. Corners with sharded-dim ghosts
# arrive transitively: pushes and mirror_dim span the full padded
# unsharded extent, and per-dim refreshes commute.


@pytest.mark.parametrize("k", [1, 2])
def test_periodic_unsharded_middle_dim(k):
    _run_dynamic(get_spec("jacobi7"), (16, 16, 20), 2 * k + 1, (4,),
                 periodic=(1,), k=k)


@pytest.mark.parametrize("k", [1, 2])
def test_neumann_unsharded_middle_dim(k):
    _run_dynamic(get_spec("jacobi7"), (16, 16, 20), 2 * k + 1, (4,),
                 neumann=(1,), k=k)


def test_dynamic_sharded_and_unsharded_mixed():
    # sharded periodic ring (d0) + unsharded Neumann mirror (d1) +
    # Dirichlet lane, through a box spec so every corner class is read
    _run_dynamic(get_spec("jacobi27"), (16, 16, 20), 4, (2,),
                 periodic=(0,), neumann=(1,), k=2)


def test_dynamic_unsharded_both_modes_2d_mesh():
    # 2D mesh ships d0/d1; nothing left unsharded but the lane — so use
    # a 1D mesh with BOTH leading dims dynamic, one sharded one not
    _run_dynamic(get_spec("jacobi7"), (16, 16, 20), 5, (2,),
                 periodic=(0, 1), k=2)


def test_dynamic_unsharded_deep_temporal():
    # k=4 trapezoid: the unsharded dynamic dim's recompute extension
    # reaches 3*r into the refreshed ghosts
    _run_dynamic(get_spec("jacobi7"), (16, 16, 20), 9, (2,),
                 neumann=(1,), k=4, seed=11)


def test_dynamic_unsharded_race_detector_clean():
    # the local refresh writes unsharded ghost zones while pushes fly
    # into sharded ghost zones — footprints must stay disjoint
    _run_dynamic(get_spec("jacobi7"), (16, 16, 20), 4, (2,),
                 periodic=(0,), neumann=(1,), k=2, detect_races=True)


def test_dynamic_unsharded_shallow_dim_gates():
    from stencil_tpu.core.grid import DirichletBC

    mesh = make_mesh((2,), ("x",))
    bc = DirichletBC.reference_default(3).with_periodic((1,))
    grid = HaloGrid.create((16, 3, 20), halo=1, bc=bc)
    m = RmaStencil(get_spec("jacobi7"), (16, 3, 20), sweeps_per_call=4,
                   interpret=True)
    with pytest.raises(ValueError, match="shallower"):
        m.iterate(grid, 4, mesh)


# ---- seeded fuzz: random BC modes on leading dims, random meshes ----------


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_random_bc_modes_rma(seed):
    """Random per-leading-dim BC modes (Dirichlet/periodic/Neumann) x
    random 1D/2D meshes x random temporal depth through the in-kernel
    RMA path — the rma analog of the tiled-kernel BC fuzz. Sharded dims
    exercise rings/mirror_dim, unsharded leading dims the local refresh;
    the lane dim stays Dirichlet (gated)."""
    rng = np.random.default_rng(2000 + seed)
    mesh_sizes = (2, 2) if rng.integers(0, 2) else (int(rng.choice([2, 4])),)
    k = int(rng.choice([1, 2]))
    kr = k * 1
    # per-dim interior: divisible by the mesh, >= 2*k*r per device,
    # unsharded dynamic dims deeper than k*r, and a SHARDED sublane dim
    # needs its local size a multiple of the 8-row DMA granule
    shape = [int(m * max(2 * kr, rng.integers(4, 8))) for m in mesh_sizes]
    if len(mesh_sizes) == 2:
        shape[1] = int(mesh_sizes[1] * 8 * rng.integers(1, 3))
    shape = tuple(shape) + tuple(
        int(rng.integers(max(2 * kr, 8), 24))
        for _ in range(3 - len(mesh_sizes) - 1)) + (20,)
    modes = [int(rng.integers(0, 3)) for _ in range(2)] + [0]
    per = tuple(d for d in range(2) if modes[d] == 1)
    neu = tuple(d for d in range(2) if modes[d] == 2)
    iters = int(rng.integers(1, 3)) * k
    _run_dynamic(get_spec("jacobi7"), shape, iters, mesh_sizes,
                 periodic=per, neumann=neu, k=k, seed=3000 + seed)
