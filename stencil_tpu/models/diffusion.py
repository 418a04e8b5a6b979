"""Heterogeneous (variable-coefficient) diffusion:
``u_t = div(a(x) grad u)`` with a spatially varying diffusivity.

The reference's stencil weights are compile-time constants (the hardcoded
``1/(2*(bw+bh))`` average, ``stencil.cpp:85-125``), and this framework's
``StencilSpec`` generalizes them to arbitrary but still CONSTANT weights.
Real heterogeneous media need PER-POINT weights: the standard conservative
FTCS discretization is

    u'_i = u_i + (dt/h^2) * sum_faces a_face * (u_nb - u_i)

with the face diffusivity ``a_face`` the harmonic mean of the two cell
values (flux continuity across material interfaces). As a stencil that is
``T = 2*ndim + 1`` taps whose weights are fields: neighbor tap d+/- gets
``(dt/h^2) * a_face``, the center gets ``1 - sum(neighbor weights)``.
``ops/xla.py:apply_fields`` evaluates it (one fused XLA pass; the Pallas
kernels would need T coefficient window streams per tile — the measured
single-source window already costs ~10% at k=8, so a fused-field Pallas
path is future work, to be justified by a workload).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from stencil_tpu.core.grid import DirichletBC, HaloGrid
from stencil_tpu.registry import Runner


def face_harmonic_means(a: np.ndarray,
                        periodic=None) -> Tuple[np.ndarray, ...]:
    """Per-dim (lo, hi) face diffusivities: harmonic mean of the two
    adjacent cell values. At physical walls the neighbor is
    edge-replicated (the boundary face sees the wall cell's own
    diffusivity); on PERIODIC dims the neighbor wraps — both cells of a
    wrap face must see the SAME coefficient or the scheme stops being
    conservative (a replicate there leaks mass, caught by
    ``test_mass_conservation_periodic``)."""
    ndim = a.ndim
    if periodic is None:
        periodic = (False,) * ndim
    faces = []
    for d in range(ndim):
        def shift(sign, _d=d):
            if periodic[_d]:
                return np.roll(a, -sign, axis=_d)
            pads = [(1, 1) if e == _d else (0, 0) for e in range(ndim)]
            ap = np.pad(a, pads, mode="edge")
            idx = tuple(
                slice(1 + sign, a.shape[e] + 1 + sign) if e == _d
                else slice(None)
                for e in range(ndim)
            )
            return ap[idx]

        for sign in (-1, 1):
            nb = shift(sign)
            faces.append(2.0 * a * nb / (a + nb))
    return tuple(faces)


@dataclasses.dataclass(frozen=True)
class HeterogeneousDiffusion:
    """Explicit FTCS for ``u_t = div(a(x) grad u)``.

    ``a`` is the cell-centered diffusivity field (interior-shaped,
    positive). ``dt=None`` picks the largest stable step
    ``h^2 / (2 * ndim * max(a))``.
    """

    shape: Tuple[int, ...]
    a: np.ndarray
    h: float = 1.0
    dt: Optional[float] = None
    bc: Optional[DirichletBC] = None
    dtype: str = "float32"

    def __post_init__(self):
        a = np.asarray(self.a, np.float64)
        object.__setattr__(self, "a", a)
        if a.shape != tuple(self.shape):
            raise ValueError(f"a shape {a.shape} != interior {self.shape}")
        if not np.all(a > 0):
            raise ValueError("diffusivity a(x) must be positive")
        if self.bc is None:
            object.__setattr__(
                self, "bc", DirichletBC.reference_default(len(self.shape)))

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def stable_dt(self) -> float:
        return self.h ** 2 / (2 * self.ndim * float(self.a.max()))

    def tap_fields(self):
        """(offsets, fields): center + 2*ndim neighbor taps with
        per-point weights. Raises on an unstable ``dt``."""
        dt = self.dt if self.dt is not None else self.stable_dt
        if dt > self.stable_dt * (1 + 1e-12):
            raise ValueError(
                f"unstable: dt={dt:g} > h^2/(2*ndim*max(a)) = "
                f"{self.stable_dt:g}")
        lam = dt / self.h ** 2
        faces = face_harmonic_means(self.a,
                                    self.bc.periodic_mask(self.ndim))
        offsets = [(0,) * self.ndim]
        fields = [np.zeros(self.shape, np.float64)]  # center placeholder
        fi = 0
        for d in range(self.ndim):
            for sign in (-1, 1):
                off = [0] * self.ndim
                off[d] = sign
                offsets.append(tuple(off))
                fields.append(lam * faces[fi])
                fi += 1
        fields[0] = 1.0 - sum(fields[1:])
        return tuple(offsets), np.stack(fields)

    def runner(self) -> Runner:
        """Registry-compatible Runner (XLA variable-coefficient path);
        plugs into ``solver.solve`` for steady states."""
        import jax.numpy as jnp

        from stencil_tpu.ops import xla

        offsets, fields = self.tap_fields()
        fields = jnp.asarray(fields, self.dtype)
        return Runner(
            name=f"hetero_diffusion_xla({self.ndim}d)",
            iterate=lambda g, n: xla.iterate_fields_dynamic(
                g, offsets, fields, jnp.int32(n), halo=1),
            description="variable-coefficient FTCS diffusion "
                        "(per-point tap weights, harmonic face means)",
        )

    def initial_grid(self, interior=None) -> HaloGrid:
        if interior is None:
            return HaloGrid.create(self.shape, halo=1, bc=self.bc,
                                   dtype=self.dtype)
        import jax.numpy as jnp
        return HaloGrid.from_interior(
            jnp.asarray(interior, dtype=self.dtype), halo=1, bc=self.bc)
