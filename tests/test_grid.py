"""Unit tests for HaloGrid / Dirichlet BC handling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stencil_tpu.core.grid import DirichletBC, HaloGrid, fill_halo_np


def test_reference_default_bc_2d():
    g = HaloGrid.create((4, 6), halo=1)
    d = np.asarray(g.data)
    assert d.shape == (6, 8)
    # reference stencil.cpp:199-204: top/bottom (dim 0) = 0, left/right = 1
    np.testing.assert_array_equal(d[1:-1, 0], 1.0)
    np.testing.assert_array_equal(d[1:-1, -1], 1.0)
    np.testing.assert_array_equal(d[0, 1:-1], 0.0)
    np.testing.assert_array_equal(d[-1, 1:-1], 0.0)
    # corners: last dim wins (=1.0)
    assert d[0, 0] == 1.0 and d[-1, -1] == 1.0
    # interior zero
    np.testing.assert_array_equal(d[1:-1, 1:-1], 0.0)


def test_bc_3d_default():
    g = HaloGrid.create((3, 4, 5), halo=1)
    d = np.asarray(g.data)
    np.testing.assert_array_equal(d[1:-1, 1:-1, 0], 1.0)
    np.testing.assert_array_equal(d[0, 1:-1, 1:-1], 0.0)
    np.testing.assert_array_equal(d[1:-1, 0, 1:-1], 0.0)


def test_interior_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(5, 7)), dtype=jnp.float32)
    g = HaloGrid.from_interior(x, halo=2)
    assert g.data.shape == (9, 11)
    np.testing.assert_array_equal(np.asarray(g.interior()), np.asarray(x))
    assert g.interior_shape == (5, 7)


def test_with_interior_preserves_halo(rng):
    g = HaloGrid.create((4, 4), halo=1)
    before = np.asarray(g.data).copy()
    new = jnp.ones((4, 4), dtype=jnp.float32) * 7.0
    g2 = g.with_interior(new)
    after = np.asarray(g2.data)
    np.testing.assert_array_equal(after[1:-1, 1:-1], 7.0)
    # halo untouched
    np.testing.assert_array_equal(after[0, :], before[0, :])
    np.testing.assert_array_equal(after[:, 0], before[:, 0])


def test_with_halo_deepens_ring(rng):
    x = jnp.asarray(rng.normal(size=(6, 6)), dtype=jnp.float32)
    g = HaloGrid.from_interior(x, halo=1)
    g4 = g.with_halo(4)
    assert g4.data.shape == (14, 14)
    np.testing.assert_array_equal(np.asarray(g4.interior()), np.asarray(x))
    d = np.asarray(g4.data)
    np.testing.assert_array_equal(d[4:-4, :4], 1.0)  # all left rings = 1
    np.testing.assert_array_equal(d[:4, 4:-4], 0.0)


def test_grid_is_pytree():
    g = HaloGrid.create((4, 4), halo=1)
    leaves, treedef = jax.tree_util.tree_flatten(g)
    assert len(leaves) == 1
    g2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert g2.halo == g.halo and g2.bc == g.bc

    # jit through a HaloGrid argument
    @jax.jit
    def f(grid):
        return grid.with_interior(grid.interior() + 1.0)

    out = f(g)
    np.testing.assert_array_equal(np.asarray(out.interior()), 1.0)


def test_fill_halo_np_matches_jax():
    bc = DirichletBC.reference_default(2)
    a = np.full((8, 8), 5.0)
    fill_halo_np(a, 2, bc)
    g = HaloGrid.create((4, 4), halo=2, interior_value=5.0)
    np.testing.assert_array_equal(a, np.asarray(g.data))


def test_custom_bc_values():
    bc = DirichletBC(values=(( -3.0, 4.0), (2.0, 9.0)))
    g = HaloGrid.create((4, 4), halo=1, bc=bc)
    d = np.asarray(g.data)
    assert d[0, 3] == -3.0 and d[-1, 3] == 4.0
    assert d[3, 0] == 2.0 and d[3, -1] == 9.0
