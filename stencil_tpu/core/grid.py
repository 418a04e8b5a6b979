"""Halo'd dense grid: the TPU-native analog of the reference's
``BoundaryMatrix<T>`` / ``BoundaryMatrixView<T>``
(``/root/reference/include/stencil/boundary_matrix.hpp:31-245``).

Where the reference distinguishes an owning matrix from borrowed strided
views crossing the host->device ABI, JAX arrays are already immutable views
onto device buffers — so ``HaloGrid`` is a lightweight pytree wrapping one
padded array plus static halo/BC metadata. ``block_subview``-style tiling
(``boundary_matrix.hpp:190-218``) becomes Pallas BlockSpecs / manual DMA
windows in the kernels, and sharding metadata in the multi-chip path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DirichletBC:
    """Constant boundary values per (dim, side).

    ``values[d] = (low_value, high_value)`` for dimension ``d``. The default
    matches the reference's initial conditions (``stencil.cpp:199-204``):
    left/right (last dim) = 1.0, top/bottom (first dim) = 0.0 — extended to
    rank n as: last dim faces 1.0, all other faces 0.0.

    Corner/edge regions of the halo where two faces meet are filled in
    *increasing dimension order*, so the highest dimension's value wins in
    corners. This is deterministic and only observable through box stencils
    (star stencils never read halo corners).
    """

    values: Tuple[Tuple[float, float], ...]

    @staticmethod
    def reference_default(ndim: int) -> "DirichletBC":
        vals = [(0.0, 0.0)] * (ndim - 1) + [(1.0, 1.0)]
        return DirichletBC(values=tuple(vals))

    @staticmethod
    def zero(ndim: int) -> "DirichletBC":
        return DirichletBC(values=tuple([(0.0, 0.0)] * ndim))

    def __hash__(self):
        return hash(self.values)


def fill_halo(padded: jax.Array, halo: int, bc: DirichletBC) -> jax.Array:
    """Write BC values into the full halo ring of a padded array.

    Analog of ``BoundaryMatrix::fill_boundary``
    (``boundary_matrix.hpp:129-170``) applied to all four (2D) / six (3D)
    faces. Each face slab spans the full extent of the other dims; later
    dims overwrite earlier ones in corner regions.
    """
    ndim = padded.ndim
    for d in range(ndim):
        lo, hi = bc.values[d]
        idx_lo = tuple(
            slice(0, halo) if i == d else slice(None) for i in range(ndim)
        )
        idx_hi = tuple(
            slice(padded.shape[i] - halo, None) if i == d else slice(None)
            for i in range(ndim)
        )
        padded = padded.at[idx_lo].set(lo)
        padded = padded.at[idx_hi].set(hi)
    return padded


def fill_halo_np(padded: np.ndarray, halo: int, bc: DirichletBC) -> np.ndarray:
    """NumPy twin of :func:`fill_halo` for the float64 golden model."""
    ndim = padded.ndim
    for d in range(ndim):
        lo, hi = bc.values[d]
        idx_lo = tuple(
            slice(0, halo) if i == d else slice(None) for i in range(ndim)
        )
        idx_hi = tuple(
            slice(padded.shape[i] - halo, None) if i == d else slice(None)
            for i in range(ndim)
        )
        padded[idx_lo] = lo
        padded[idx_hi] = hi
    return padded


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class HaloGrid:
    """A dense grid with a BC-filled halo ring of width ``halo``.

    ``data`` has shape ``interior_shape + 2 * halo`` per dim. The halo ring
    always holds the Dirichlet BC values (the reference applies its BCs to
    *both* ping-pong buffers up front, ``stencil.cpp:199-207``, so they
    survive the swap; we keep the same invariant functionally: every array
    produced by a sweep carries a valid BC ring).
    """

    data: jax.Array
    halo: int
    bc: DirichletBC

    # -- pytree protocol (halo/bc are static aux data) -------------------------
    def tree_flatten(self):
        return (self.data,), (self.halo, self.bc)

    @classmethod
    def tree_unflatten(cls, aux, children):
        halo, bc = aux
        return cls(data=children[0], halo=halo, bc=bc)

    # -- constructors ----------------------------------------------------------
    @staticmethod
    def create(
        interior_shape: Sequence[int],
        halo: int = 1,
        bc: Optional[DirichletBC] = None,
        dtype=jnp.float32,
        interior_value: float = 0.0,
    ) -> "HaloGrid":
        """Interior = ``interior_value`` (reference inits to 0,
        ``stencil.cpp:195-198``), halo = BC values."""
        ndim = len(interior_shape)
        if bc is None:
            bc = DirichletBC.reference_default(ndim)
        padded_shape = tuple(s + 2 * halo for s in interior_shape)
        padded = jnp.full(padded_shape, interior_value, dtype=dtype)
        padded = fill_halo(padded, halo, bc)
        return HaloGrid(data=padded, halo=halo, bc=bc)

    @staticmethod
    def from_interior(
        interior: jax.Array,
        halo: int = 1,
        bc: Optional[DirichletBC] = None,
    ) -> "HaloGrid":
        ndim = interior.ndim
        if bc is None:
            bc = DirichletBC.reference_default(ndim)
        padded = jnp.pad(interior, halo)
        padded = fill_halo(padded, halo, bc)
        return HaloGrid(data=padded, halo=halo, bc=bc)

    # -- accessors ---------------------------------------------------------
    @property
    def ndim(self) -> int:
        return self.data.ndim

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def interior_shape(self) -> Tuple[int, ...]:
        return tuple(s - 2 * self.halo for s in self.data.shape)

    def interior(self) -> jax.Array:
        """Analog of ``elem_at`` interior addressing
        (``boundary_matrix.hpp:115-118``)."""
        h = self.halo
        idx = tuple(slice(h, s - h) for s in self.data.shape)
        return self.data[idx]

    def with_interior(self, interior: jax.Array) -> "HaloGrid":
        h = self.halo
        idx = tuple(slice(h, s - h) for s in self.data.shape)
        return HaloGrid(
            data=self.data.at[idx].set(interior), halo=h, bc=self.bc
        )

    def with_halo(self, halo: int) -> "HaloGrid":
        """Re-pad to a different halo width (used by temporal blocking, which
        needs ``steps * radius`` ghost layers). All ghost rings carry the BC
        face values; rings beyond the first are re-pinned by the kernels, so
        their initial content only needs to be finite."""
        if halo == self.halo:
            return self
        inner = self.interior()
        padded = jnp.pad(inner, halo)
        padded = fill_halo_deep(padded, halo, self.bc)
        return HaloGrid(data=padded, halo=halo, bc=self.bc)


def fill_halo_deep(padded: jax.Array, halo: int, bc: DirichletBC) -> jax.Array:
    """Fill a halo of arbitrary depth with the per-face BC values (every ring
    gets the face value). Used by temporal blocking, where ghost rings beyond
    the first are masked/re-pinned inside the kernel each virtual sweep."""
    return fill_halo(padded, halo, bc)
