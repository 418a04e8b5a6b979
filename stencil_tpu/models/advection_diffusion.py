"""Steady advection-diffusion model family: solve the boundary-value
problem ``-nu laplacian(u) + v . grad(u) = f`` on Dirichlet walls.

The reference's only solve is symmetric Laplace relaxation
(``/root/reference/src/stencil/stencil.cpp:85-125``); its operator class
cannot express transport at all. The time-DEPENDENT transport family
(``models/advection.py``) already exercises one-sided tap sets through
the sweep machinery; this module adds the steady *solver-side* analog:
the discrete operator here is NONSYMMETRIC (upwind or central advection
on top of the central diffusion star), which is exactly the class the
CG solver's SPD precondition rules out — it pairs with
``krylov.BiCGStab``, the nonsymmetric Krylov method.

Discretization (per dim ``d``, spacing ``h``, velocity ``v_d``):

- diffusion: central 2nd-order star, ``-nu (u_{i-1} - 2 u_i + u_{i+1})/h^2``;
- advection ``scheme='upwind'`` (1st order): the one-sided difference on
  the UPSTREAM side, ``v_d (u_i - u_{i-1})/h`` for ``v_d > 0`` — an
  M-matrix for every Peclet number (no wiggles, unconditionally safe);
- advection ``scheme='central'`` (2nd order): ``v_d (u_{i+1} -
  u_{i-1})/(2 h)`` — monotone only while every mesh Peclet number
  ``|v_d| h / (2 nu) <= 1``; construction refuses above that (the
  standard remedy IS the upwind scheme).

The operator is exposed as a plain ``StencilSpec`` (``operator_spec``)
so the matrix-free Krylov path applies it as one fused XLA tap pass,
and the float64 twin (``apply_f64``) serves tests and certificates.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from stencil_tpu.core.grid import DirichletBC, HaloGrid
from stencil_tpu.core.spec import StencilSpec, weighted


@dataclasses.dataclass(frozen=True)
class AdvectionDiffusionProblem:
    """``-nu laplacian(u) + v . grad(u) = f`` on an h-spaced interior
    with Dirichlet walls (the operator with periodic/Neumann walls has
    the constant vector in its null space and is refused).

    ``shape`` is the interior point count per dim; the default
    ``h = 1 / (shape[0] + 1)`` matches ``PoissonProblem``.
    """

    shape: Tuple[int, ...]
    velocity: Tuple[float, ...]
    nu: float = 1.0
    h: Optional[float] = None
    bc: Optional[DirichletBC] = None
    dtype: str = "float32"
    scheme: str = "upwind"

    def __post_init__(self):
        if len(self.velocity) != len(self.shape):
            raise ValueError(
                f"velocity rank {len(self.velocity)} != grid rank "
                f"{len(self.shape)}")
        if not self.nu > 0.0:
            raise ValueError(
                f"nu must be positive (got {self.nu}); the pure-advection "
                "steady operator is hyperbolic, outside this family")
        if self.scheme not in ("upwind", "central"):
            raise ValueError(
                f"unknown scheme {self.scheme!r} (upwind | central)")
        if self.h is None:
            object.__setattr__(self, "h", 1.0 / (self.shape[0] + 1))
        if self.bc is None:
            object.__setattr__(
                self, "bc", DirichletBC.zero(len(self.shape)))
        if self.bc.any_dynamic:
            raise ValueError(
                "steady advection-diffusion needs Dirichlet walls (the "
                "periodic/Neumann operator annihilates constants and "
                "is singular)")
        if self.scheme == "central":
            pe = self.mesh_peclet
            if pe > 1.0 + 1e-12:
                raise ValueError(
                    f"mesh Peclet number {pe:.3f} > 1: the central "
                    "advection discretization is non-monotone here "
                    "(wiggles); use scheme='upwind', refine h, or "
                    "raise nu")

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def mesh_peclet(self) -> float:
        """``max_d |v_d| h / (2 nu)`` — the monotonicity number of the
        central scheme (the upwind scheme is monotone at any value)."""
        return max(abs(v) for v in self.velocity) * self.h / (2 * self.nu)

    @property
    def operator_spec(self) -> StencilSpec:
        """The discrete operator ``A`` itself as taps: ``(A u)_p =
        sum_t w_t u_{p + off_t}`` (matrix-free application =
        ``ops.xla.apply_spec`` on the padded iterate)."""
        nd = self.ndim
        h = float(self.h)
        inv_h2 = float(self.nu) / (h * h)
        taps = {(0,) * nd: 2.0 * nd * inv_h2}
        for d, v in enumerate(self.velocity):
            lo = tuple(-1 if e == d else 0 for e in range(nd))
            hi = tuple(+1 if e == d else 0 for e in range(nd))
            taps[lo] = taps.get(lo, 0.0) - inv_h2
            taps[hi] = taps.get(hi, 0.0) - inv_h2
            if v == 0.0:
                continue
            if self.scheme == "upwind":
                taps[(0,) * nd] += abs(v) / h
                up = lo if v > 0 else hi
                taps[up] -= abs(v) / h
            else:
                taps[hi] += v / (2.0 * h)
                taps[lo] -= v / (2.0 * h)
        tap_list = [(off, w) for off, w in taps.items() if w != 0.0]
        return weighted(nd, tap_list,
                        name=f"advdiff{nd}d_{self.scheme}")

    @property
    def is_symmetric(self) -> bool:
        return all(v == 0.0 for v in self.velocity)

    # -- matrix-free operator protocol (krylov solvers, OperatorMultigrid):
    # constant-tap problems carry no runtime operator data — the taps
    # are trace-time weights.

    def operator_data(self):
        return None

    def operator_apply(self, padded, data=None):
        """``A u`` from the padded iterate (ghost ring = walls)."""
        from stencil_tpu.ops.xla import apply_spec

        return apply_spec(padded, self.operator_spec, halo=1)

    def operator_inv_diagonal(self, data=None) -> float:
        """1 / center tap (trace-time scalar) — the point-Jacobi
        smoothing scale."""
        spec = self.operator_spec
        center = (0,) * self.ndim
        if center not in spec.offsets:
            raise ValueError("operator has no center tap")
        d = float(spec.weights[spec.offsets.index(center)])
        if d == 0.0:
            raise ValueError("operator diagonal is 0")
        return 1.0 / d

    def with_discretization(self,
                            shape: Tuple[int, ...],
                            h: float) -> "AdvectionDiffusionProblem":
        """The SAME continuous problem discretized on another grid —
        the rediscretization hook ``multigrid.OperatorMultigrid`` uses
        to build its per-level operators (coarse levels solve zero-wall
        correction equations, so the walls drop to zero).

        A central-scheme problem falls back to UPWIND on any level
        whose coarser h pushes the mesh Peclet past 1 — the standard
        stabilized-coarse-operator practice (the fine discretization
        keeps its order; coarse levels only precondition)."""
        scheme = self.scheme
        if scheme == "central":
            pe = max(abs(v) for v in self.velocity) * float(h) \
                / (2 * self.nu)
            if pe > 1.0:
                scheme = "upwind"
        return dataclasses.replace(
            self, shape=tuple(shape), h=float(h), scheme=scheme,
            bc=DirichletBC.zero(self.ndim))

    def initial_grid(self, interior=None) -> HaloGrid:
        if interior is None:
            return HaloGrid.create(self.shape, halo=1, bc=self.bc,
                                   dtype=self.dtype)
        import jax.numpy as jnp
        return HaloGrid.from_interior(
            jnp.asarray(interior, dtype=self.dtype), halo=1, bc=self.bc)

    def apply_f64(self, interior) -> np.ndarray:
        """``A u`` in float64 with the problem's true wall values in the
        ghost ring — the golden twin of the device-side operator (used
        by tests and residual certificates; pure NumPy so the
        certificate never rounds through the device dtype)."""
        u = np.asarray(interior, np.float64)
        if u.shape != tuple(self.shape):
            raise ValueError(
                f"interior shape {u.shape} != {self.shape}")
        from stencil_tpu.ops.golden import apply_spec_f64

        return apply_spec_f64(u, self.operator_spec, self.bc)

    def residual_f64(self, grid: HaloGrid, f) -> float:
        """``max |f - A u|`` in float64 — the certificate."""
        r = np.asarray(f, np.float64) - self.apply_f64(
            np.asarray(grid.interior(), np.float64))
        return float(np.max(np.abs(r)))

    def solve(self, f, tolerance: float = 1e-5,
              max_iterations: int = 2000, mesh=None, dim: int = 0):
        """Solve with the nonsymmetric Krylov path (``krylov.BiCGStab``);
        returns its ``CGResult``."""
        from stencil_tpu.krylov import BiCGStab

        return BiCGStab(self).solve(f, tolerance=tolerance,
                                    max_iterations=max_iterations,
                                    mesh=mesh, dim=dim)
