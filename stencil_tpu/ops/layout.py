"""Aligned padded layout for the Pallas streaming kernels.

The kernels tile the grid into *slabs* along the leading dimension and
stream them HBM->VMEM->HBM (the analog of the reference's LDM blocking,
``stencil_dma.cpp:22-34`` — but slab-shaped, because TPU DMA and vector
layouts want full rows: windows that span the entire minor dimensions are
contiguous in HBM and need no lane-alignment gymnastics).

Mosaic constrains DMA window slicing of tiled memrefs: the last dim must be
a multiple of 128 (or the whole dim), the second-to-last a multiple of 8.
Hence the padded array carries a *deep halo*:

  - last dim:          lo pad = ``halo``; total width rounded up to 128
                       (hi pad absorbs the alignment slack),
  - second-to-last:    pads = ``round_up(halo, 8)``,
  - leading dims (3D): pads = ``halo`` exactly (untiled, unconstrained).

``halo`` is ``sweeps_per_call * radius`` — temporal blocking just deepens
the halo. Every pad cell holds the BC *face value* of the nearest face
(later dims win in corners, same rule as ``core.grid.fill_halo``); ghost
rings beyond the physical ``radius`` ring are re-pinned inside the kernel
after every virtual sweep, so only ring ``1..radius`` ever feeds real
updates.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from stencil_tpu.core.grid import DirichletBC, HaloGrid


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def sublane_for_dtype(dtype) -> int:
    """Minimum sublane (second-to-last dim) tile multiple per dtype:
    fp32 -> 8, bf16 -> 16, int8/fp8 -> 32 (lane dim is always 128)."""
    import numpy as np

    itemsize = np.dtype(
        dtype if not hasattr(dtype, "dtype") else dtype.dtype
    ).itemsize
    return {4: 8, 2: 16, 1: 32}.get(itemsize, 8)


@dataclasses.dataclass(frozen=True)
class PaddedLayout:
    """Static geometry of a padded array: per-dim (lo, hi) pads."""

    interior_shape: Tuple[int, ...]
    pads: Tuple[Tuple[int, int], ...]
    halo: int  # logical halo depth (sweeps_per_call * radius)

    @property
    def ndim(self) -> int:
        return len(self.interior_shape)

    @property
    def padded_shape(self) -> Tuple[int, ...]:
        return tuple(
            s + lo + hi
            for s, (lo, hi) in zip(self.interior_shape, self.pads)
        )

    @property
    def interior_index(self):
        return tuple(
            slice(lo, lo + s)
            for s, (lo, _) in zip(self.interior_shape, self.pads)
        )

    @staticmethod
    def for_halo(interior_shape: Tuple[int, ...], halo: int,
                 sublane: int = 8) -> "PaddedLayout":
        ndim = len(interior_shape)
        pads = []
        for d in range(ndim):
            if d == ndim - 1:
                lo = halo
                total = round_up(interior_shape[d] + 2 * halo, 128)
                hi = total - interior_shape[d] - lo
            elif d == ndim - 2:
                lo = hi = round_up(halo, sublane)
            else:
                lo = hi = halo
            pads.append((lo, hi))
        return PaddedLayout(
            interior_shape=tuple(interior_shape),
            pads=tuple(pads),
            halo=halo,
        )

    # -- array conversion -------------------------------------------------

    def pad(self, interior: jax.Array, bc: DirichletBC) -> jax.Array:
        """Embed an interior array; fill all pad cells with BC face values
        (increasing-dim fill order: later dims win in corners)."""
        padded = jnp.pad(interior, self.pads)
        for d in range(self.ndim):
            lo_v, hi_v = bc.values[d]
            lo_w, hi_w = self.pads[d]
            n = padded.shape[d]
            idx_lo = tuple(
                slice(0, lo_w) if i == d else slice(None)
                for i in range(self.ndim)
            )
            idx_hi = tuple(
                slice(n - hi_w, None) if i == d else slice(None)
                for i in range(self.ndim)
            )
            padded = padded.at[idx_lo].set(lo_v)
            padded = padded.at[idx_hi].set(hi_v)
        return padded

    def unpad(self, padded: jax.Array) -> jax.Array:
        return padded[self.interior_index]

    def pad_grid(self, grid: HaloGrid) -> jax.Array:
        return self.pad(grid.interior(), grid.bc)


def refresh_dynamic_layout(padded: jax.Array, layout: PaddedLayout,
                           bc: DirichletBC, radius: int) -> jax.Array:
    """Refresh rings ``1..radius`` of the dynamic dims of a
    ``PaddedLayout`` buffer — wrap-around copies for periodic dims,
    mirror (symmetric) copies for Neumann dims (pass ``radius = k*r`` to
    seed the full temporal ghost depth for a ``sweeps_per_call=k``
    kernel call).

    The layout's pads are deeper than ``radius`` wherever alignment
    demands (sublane/lane rounding); the extra rings keep their face
    values — taps never read beyond the refreshed depth. Dims are
    processed in increasing order over the FULL extent of the other dims,
    so corner ghosts become the doubly-wrapped/mirrored values
    transitively and Dirichlet-dim face values are carried through —
    the same corner semantics as
    :func:`stencil_tpu.core.grid.refresh_dynamic` and both golden models.
    """
    ndim = layout.ndim
    per = bc.periodic_mask(ndim)
    neu = bc.neumann_mask(ndim)
    for d in range(ndim):
        if not (per[d] or neu[d]):
            continue
        kind = "periodic" if per[d] else "Neumann"
        n = layout.interior_shape[d]
        if n < radius:
            raise ValueError(
                f"{kind} dim {d} needs interior extent >= radius "
                f"({n} < {radius})"
            )
        lo = layout.pads[d][0]

        def at(sl):
            return tuple(
                sl if i == d else slice(None) for i in range(ndim)
            )

        ghost_lo = at(slice(lo - radius, lo))
        ghost_hi = at(slice(lo + n, lo + n + radius))
        if per[d]:
            src_lo = at(slice(lo + n - radius, lo + n))
            src_hi = at(slice(lo, lo + radius))
            padded = padded.at[ghost_lo].set(padded[src_lo])
            padded = padded.at[ghost_hi].set(padded[src_hi])
        else:
            src_lo = at(slice(lo, lo + radius))
            src_hi = at(slice(lo + n - radius, lo + n))
            padded = padded.at[ghost_lo].set(
                jnp.flip(padded[src_lo], axis=d))
            padded = padded.at[ghost_hi].set(
                jnp.flip(padded[src_hi], axis=d))
    return padded
