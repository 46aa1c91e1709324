"""Self-consistent Rosenbluth potentials (rz velocity space).

The reference ships the RFP friction/diffusion *operators*
(``pyapes/solver/rfp.py``) but takes the potentials H, G as given — the
companion workflow computes them externally. Here they are solved
in-framework, making the Fokker-Planck evolution fully self-consistent.

Like-species Trubnikov/Rosenbluth potentials:

    H(v) = 2 \\int f(v') / |v - v'| d^3v'    =>  lap H = -8 pi f
    G(v) =     \\int f(v') |v - v'| d^3v'    =>  lap G = H

Both are Poisson problems in (r, z) velocity space on the axisymmetric
mesh; the 1/r metric terms ride in the standard rz Laplacian stencil and
the r = 0 axis uses a symmetry condition. Outer boundaries carry monopole
(far-field) Dirichlet values

    H_b = 2 N / |v_b - v_mean| ,   G_b = N |v_b - v_mean| ,

where N (density) and v_mean (mean parallel velocity) are *collisional
invariants* — like-species collisions conserve density, momentum and
energy — so the boundary values are computed once from the initial
distribution and the two compiled Poisson solves are reused with a new
RHS every refresh (no recompilation inside the evolution loop).
"""
from __future__ import annotations

from math import pi

import jax.numpy as jnp
import numpy as np

from pyapes_tpu.mesh import Mesh
from pyapes_tpu.solver.fdm import FDM
from pyapes_tpu.solver.ops import Solver
from pyapes_tpu.variables import Field
from pyapes_tpu.variables.bcs import CylinderBoundary


class RosenbluthPotentials:
    """Solve H and G for a distribution on an rz velocity mesh.

    Args:
        mesh: Cylinder mesh (r = perpendicular speed, z = parallel).
        f0: initial distribution values ``(*nx)`` — fixes the conserved
            moments (N, z-mean) used for the far-field boundary values.
        config: optional solver-config overrides (tol, precond, ...).
    """

    def __init__(self, mesh: Mesh, f0, config: dict | None = None):
        assert mesh.coord_sys == "rz"
        self.mesh = mesh

        # Conserved moments from f0 (host, once).
        f0 = np.asarray(f0)
        R, Z = np.asarray(mesh._grid_np[0]), np.asarray(mesh._grid_np[1])
        dr, dz = (float(d) for d in mesh.dx_np)
        w = 2.0 * pi * R * dr * dz
        self.N = float((f0 * w).sum())
        self.z_mean = float((f0 * Z * w).sum() / max(self.N, 1e-300))

        N, z_mean = self.N, self.z_mean

        def dist(grid):
            r, z = grid
            return jnp.sqrt(r**2 + (z - z_mean) ** 2 + 1e-30)

        # Callable Dirichlet values (full-grid arrays; the BC extracts the
        # face row). Stored on self so their ids — part of the solver
        # cache key — stay stable across refreshes.
        self._h_bc_val = lambda grid, mask, var, opt: 2.0 * N / dist(grid)
        self._g_bc_val = lambda grid, mask, var, opt: N * dist(grid)

        # r-low face: symmetry axis; the other three faces: monopole.
        def bcs(val):
            return CylinderBoundary(
                rl={"bc_type": "symmetry", "bc_val": None},
                ru={"bc_type": "dirichlet", "bc_val": val},
                zl={"bc_type": "dirichlet", "bc_val": val},
                zu={"bc_type": "dirichlet", "bc_val": val},
            )()

        # The rz Laplacian is nonsymmetric (1/r metric terms) but still
        # SEPARABLE: the default is the fast-diagonalization direct
        # solve (solver/fastdiag.py — one f64 pass lands ~1e-13; the
        # surgered radial tridiagonal is diagonally symmetrizable, r=0
        # axis included). fd_fallback keeps exotic configs on the old
        # path: BiCGSTAB with the rz-aware multigrid preconditioner.
        cfg = {
            "method": "fastdiag",
            "fd_fallback": "bicgstab",
            "tol": 1e-8,
            "max_it": 2000,
            "report": False,
            "criterion": "residual",
            "precond": "mg",
        }
        cfg.update(config or {})
        self._h = Field("H", 1, mesh, {"domain": bcs(self._h_bc_val)})
        self._g = Field("G", 1, mesh, {"domain": bcs(self._g_bc_val)})
        self._solver_h = Solver({"fdm": dict(cfg)})
        self._solver_g = Solver({"fdm": dict(cfg)})
        self._fdm = FDM()

    def solve(self, f) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Return ``(H, G)`` grid arrays for distribution values ``f``
        (``(*nx)`` or ``(1, *nx)``). Reuses the two compiled solves."""
        fv = jnp.asarray(f)
        if fv.ndim == self.mesh.dim:
            fv = fv[None]

        self._h.set_var_tensor(jnp.zeros_like(fv))
        self._solver_h.set_eq(
            self._fdm.laplacian(1.0, self._h) == -8.0 * pi * fv
        )
        self._solver_h.solve()
        H = self._h()[0]

        self._g.set_var_tensor(jnp.zeros_like(fv))
        self._solver_g.set_eq(
            self._fdm.laplacian(1.0, self._g) == H[None]
        )
        self._solver_g.solve()
        return H, self._g()[0]


def maxwellian_H(mesh: Mesh, N: float, vth: float) -> np.ndarray:
    """Analytic H for a centered Maxwellian (validation oracle):
    ``H(v) = 2 N erf(v / (sqrt(2) vth)) / v``."""
    from scipy.special import erf  # pragma: no cover - fallback below

    R, Z = np.asarray(mesh._grid_np[0]), np.asarray(mesh._grid_np[1])
    v = np.sqrt(R**2 + Z**2)
    xi = v / (np.sqrt(2.0) * vth)
    out = np.where(
        v > 1e-12,
        2.0 * N * np.where(v > 1e-12, erf(xi), 0.0) / np.maximum(v, 1e-12),
        2.0 * N * np.sqrt(2.0 / pi) / vth,
    )
    return out
