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
    """Per-dimension boundary conditions: Dirichlet (constant faces) or
    periodic (wrap-around) per dim.

    ``values[d] = (low_value, high_value)`` for dimension ``d``. The default
    matches the reference's initial conditions (``stencil.cpp:199-204``):
    left/right (last dim) = 1.0, top/bottom (first dim) = 0.0 — extended to
    rank n as: last dim faces 1.0, all other faces 0.0.

    ``periodic[d] = True`` makes dimension ``d`` wrap-around instead
    (its ``values`` entry is ignored). The reference is Dirichlet-only
    (``stencil.cpp:190-207``); periodic dims are a capability extension,
    and on TPU the lane dimension gets them nearly for free (circular
    ``lane_roll`` taps, ``ops/rolls.py``). An empty ``periodic`` tuple
    (the default) means all-Dirichlet, keeping every existing call site
    and cache key unchanged. The class name is kept for API stability.

    Corner/edge regions of the halo where two faces meet: Dirichlet faces
    are filled in *increasing dimension order*, so the highest Dirichlet
    dimension's value wins in Dirichlet/Dirichlet corners; periodic wraps
    run after (and re-run every sweep), copying the full extent of the
    other dims, so periodic/periodic corners hold the exactly-wrapped
    value and Dirichlet/periodic corners carry the Dirichlet value
    through the wrap. Deterministic, and only observable through box
    stencils (star stencils never read halo corners).
    """

    values: Tuple[Tuple[float, float], ...]
    periodic: Tuple[bool, ...] = ()

    @staticmethod
    def reference_default(ndim: int) -> "DirichletBC":
        vals = [(0.0, 0.0)] * (ndim - 1) + [(1.0, 1.0)]
        return DirichletBC(values=tuple(vals))

    @staticmethod
    def zero(ndim: int) -> "DirichletBC":
        return DirichletBC(values=tuple([(0.0, 0.0)] * ndim))

    @staticmethod
    def periodic_all(ndim: int) -> "DirichletBC":
        return DirichletBC(values=tuple([(0.0, 0.0)] * ndim),
                           periodic=tuple([True] * ndim))

    def with_periodic(self, dims) -> "DirichletBC":
        """This BC with the given dims made periodic."""
        ndim = len(self.values)
        per = list(self.periodic_mask(ndim))
        for d in dims:
            if not -ndim <= d < ndim:
                raise ValueError(f"periodic dim {d} out of range for "
                                 f"rank {ndim}")
            per[d % ndim] = True
        # normalize the all-Dirichlet mask to () so BCs that are
        # semantically equal compare (and hash) equal
        return dataclasses.replace(
            self, periodic=tuple(per) if any(per) else ()
        )

    def periodic_mask(self, ndim: int) -> Tuple[bool, ...]:
        """``periodic`` normalized to length ``ndim``."""
        per = tuple(self.periodic)
        return per + (False,) * (ndim - len(per))

    @property
    def any_periodic(self) -> bool:
        return any(self.periodic)

    def __hash__(self):
        return hash((self.values, self.periodic))


def _face_slices(shape, halo: int, d: int):
    """(lo_ghost, hi_ghost, lo_src, hi_src) index tuples for dim ``d`` of a
    ``halo``-padded array: the two ghost slabs and the two interior bands
    a periodic wrap copies from (hi interior rows -> lo ghosts and vice
    versa). Each slab spans the full extent of the other dims."""
    ndim = len(shape)
    s = shape[d]

    def at(d_slice):
        return tuple(d_slice if i == d else slice(None) for i in range(ndim))

    return (at(slice(0, halo)), at(slice(s - halo, None)),
            at(slice(s - 2 * halo, s - halo)), at(slice(halo, 2 * halo)))


def _check_periodic_depth(shape, halo: int, d: int):
    n = shape[d] - 2 * halo
    if n < halo:
        raise ValueError(
            f"periodic dim {d} needs interior extent >= halo depth "
            f"({n} < {halo}); shrink the temporal depth or grow the grid"
        )


def fill_halo(padded: jax.Array, halo: int, bc: DirichletBC) -> jax.Array:
    """Write BC values into the full halo ring of a padded array.

    Analog of ``BoundaryMatrix::fill_boundary``
    (``boundary_matrix.hpp:129-170``) applied to all four (2D) / six (3D)
    faces. Dirichlet faces are constant slabs spanning the full extent of
    the other dims, later dims overwriting earlier ones in corner regions;
    periodic dims are then wrap-filled (see :func:`refresh_periodic`).
    """
    ndim = padded.ndim
    per = bc.periodic_mask(ndim)
    for d in range(ndim):
        if per[d]:
            continue
        lo, hi = bc.values[d]
        idx_lo, idx_hi, _, _ = _face_slices(padded.shape, halo, d)
        padded = padded.at[idx_lo].set(lo)
        padded = padded.at[idx_hi].set(hi)
    return refresh_periodic(padded, halo, bc)


def refresh_periodic(padded: jax.Array, halo: int,
                     bc: DirichletBC) -> jax.Array:
    """Re-fill the ghost slabs of periodic dims by wrap-around copy.

    Unlike Dirichlet ghosts (constants, re-pinned by the kernels),
    periodic ghosts hold the *current iterate's* opposite-face rows, so
    every sweep must refresh them before its taps read the halo. Dims are
    processed in increasing order, each copying the full extent of the
    other dims — corner regions become exactly the doubly-wrapped values
    (the same transitivity as the sharded phase-ordered halo exchange,
    ``parallel/pallas_sharded.py:exchange``). No-op for all-Dirichlet BCs.
    """
    ndim = padded.ndim
    per = bc.periodic_mask(ndim)
    for d in range(ndim):
        if not per[d]:
            continue
        _check_periodic_depth(padded.shape, halo, d)
        idx_lo, idx_hi, src_lo, src_hi = _face_slices(padded.shape, halo, d)
        padded = padded.at[idx_lo].set(padded[src_lo])
        padded = padded.at[idx_hi].set(padded[src_hi])
    return padded


def fill_halo_np(padded: np.ndarray, halo: int, bc: DirichletBC) -> np.ndarray:
    """NumPy twin of :func:`fill_halo` for the float64 golden model."""
    ndim = padded.ndim
    per = bc.periodic_mask(ndim)
    for d in range(ndim):
        if per[d]:
            continue
        lo, hi = bc.values[d]
        idx_lo, idx_hi, _, _ = _face_slices(padded.shape, halo, d)
        padded[idx_lo] = lo
        padded[idx_hi] = hi
    return refresh_periodic_np(padded, halo, bc)


def refresh_periodic_np(padded: np.ndarray, halo: int,
                        bc: DirichletBC) -> np.ndarray:
    """NumPy twin of :func:`refresh_periodic` (golden model, per sweep)."""
    ndim = padded.ndim
    per = bc.periodic_mask(ndim)
    for d in range(ndim):
        if not per[d]:
            continue
        _check_periodic_depth(padded.shape, halo, d)
        idx_lo, idx_hi, src_lo, src_hi = _face_slices(padded.shape, halo, d)
        padded[idx_lo] = padded[src_lo]
        padded[idx_hi] = padded[src_hi]
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
