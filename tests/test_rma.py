"""Differential tests for the in-kernel RMA method (``parallel.rma``):
VMEM-resident blocks, remote-DMA halo pushes, double-buffered semaphores.

Runs under Pallas TPU-interpret mode (``pltpu.InterpretParams``), which
simulates VMEM/HBM, remote DMAs, semaphores and barriers on the CPU mesh —
including an optional vector-clock data race detector, which we turn on in
one test (the reference has no race detection at all; its DMA/RMA safety
is by construction, SURVEY §5).
"""

import jax
import numpy as np
import pytest

from stencil_tpu.core.grid import HaloGrid
from stencil_tpu.core.spec import box, get_spec, star
from stencil_tpu.ops import golden
from stencil_tpu.parallel.halo import make_mesh
from stencil_tpu.parallel.rma import RmaStencil, make_rma_plan


def _run(spec, shape, iters, n_dev=4, dtype="float32", detect_races=False):
    mesh = make_mesh((n_dev,), ("x",))
    grid = HaloGrid.create(shape, halo=spec.radius, dtype=dtype)
    m = RmaStencil(spec, shape, dtype=dtype, interpret=True,
                   detect_races=detect_races)
    out = m.iterate(grid, iters, mesh)
    ref = golden.golden_iterate(
        np.zeros(shape, dtype=np.float64), spec, iters, bc=grid.bc
    )
    np.testing.assert_allclose(
        np.asarray(out.interior(), np.float64), ref, atol=5e-6, rtol=5e-6
    )


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
    _run(get_spec("jacobi5"), (32, 40), iters=5, n_dev=1)


def test_two_devices():
    _run(get_spec("jacobi5"), (32, 40), iters=5, n_dev=2)


def test_race_detector_clean():
    """The interpret-mode vector-clock race detector must find no races in
    the double-buffered pipeline."""
    _run(get_spec("jacobi5"), (32, 24), iters=6, n_dev=2,
         detect_races=True)


def test_vmem_residency_guard():
    spec = get_spec("jacobi7")
    with pytest.raises(ValueError, match="VMEM-resident budget"):
        make_rma_plan(spec, (512, 512, 512))


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
