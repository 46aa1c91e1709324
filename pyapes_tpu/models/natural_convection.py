"""Boussinesq natural convection: buoyancy-coupled NS + heat transport.

Differentially-heated square cavity (de Vahl Davis 1983 benchmark): hot
left wall (T=1), cold right wall (T=0), adiabatic horizontal walls.
Nondimensional Boussinesq form (length L, time L^2/alpha):

    du/dt + (u.grad) u = -grad p + Pr lap u + Ra Pr T e_y
    dT/dt + (u.grad) T = lap T,   div u = 0

The temperature equation is one more implicit transport solve per step
(the reference has an uncoupled advection-diffusion demo only; coupling
through the buoyancy source is new). Validation: the hot-wall Nusselt
number, ``Nu = -dT/dx`` averaged over the wall, vs the benchmark values
(Ra=1e3: 1.118, Ra=1e4: 2.243).
"""
from __future__ import annotations

import jax.numpy as jnp

from pyapes_tpu.mesh import Mesh
from pyapes_tpu.models.navier_stokes import LidDrivenCavity


class NaturalConvection(LidDrivenCavity):
    """Differentially-heated square cavity (Boussinesq).

    Args:
        mesh: Box mesh on [0, 1]^2.
        ra: Rayleigh number.
        pr: Prandtl number (0.71 for air, the benchmark value).
    """

    def __init__(self, mesh: Mesh, ra: float = 1e3, pr: float = 0.71,
                 config=None, implicit_advection: bool = True,
                 rhie_chow: bool = True, incremental: bool = True,
                 mu_fn=None, k_fn=None):
        # no-slip walls, no lid; viscosity = Pr in these units
        super().__init__(
            mesh, nu=pr, lid_velocity=0.0, config=config,
            implicit_advection=implicit_advection,
            rhie_chow=rhie_chow, incremental=incremental,
        )
        self.ra = float(ra)
        self.pr = float(pr)
        # temperature-dependent viscosity mu(T): a callable mapping the
        # temperature array to a per-point viscosity field, re-evaluated
        # every step from T^n and STREAMED into the compiled momentum
        # solver (no recompiles) — implicit conservative div(mu grad u)
        # plus the explicit transpose correction (``LidDrivenCavity``).
        # The constant case mu_fn = lambda T: pr * ones reproduces the
        # scalar path (pinned by tests/test_models.py).
        self.mu_fn = mu_fn
        # temperature-dependent thermal conductivity k(T): the heat
        # equation's diffusion becomes the conservative div(k grad T)
        # (variable-Γ term, streamed per step).
        self.k_fn = k_fn

        from pyapes_tpu.geometry.basis import FDIR
        from pyapes_tpu.variables import Field

        faces = FDIR[: 2 * mesh.dim]
        t_bc = []
        for f in faces:
            if f == "xl":
                t_bc.append({"bc_face": f, "bc_type": "dirichlet",
                             "bc_val": 1.0, "bc_val_opt": None})
            elif f == "xu":
                t_bc.append({"bc_face": f, "bc_type": "dirichlet",
                             "bc_val": 0.0, "bc_val_opt": None})
            else:  # adiabatic
                t_bc.append({"bc_face": f, "bc_type": "neumann",
                             "bc_val": 0.0, "bc_val_opt": None})
        self.T = Field("T", 1, mesh, {"domain": t_bc, "obstacle": None},
                       init_val=0.0)
        # conduction initial state: linear profile (faster spin-up)
        x = mesh.grid[0]
        self.T.set_var_tensor((1.0 - x)[None].astype(self.T().dtype))
        self.T.apply_bcs()

    def step(self, dt: float) -> None:
        if self.mu_fn is not None:
            self.update_viscosity(self.mu_fn(self.T()[0]))
        # buoyancy source on the vertical momentum: Ra Pr T (explicit)
        buo = self.ra * self.pr * self.T()[0]
        self._buoyancy = buo  # consumed by the momentum override below
        super().step(dt)

        # temperature transport: implicit advection + diffusion
        T = self.T
        if T._dt is None:
            T.set_time(dt, self.t - dt)
        T.save_old()
        uvec = jnp.concatenate([v() for v in self.vel], axis=0)
        k_term = (
            self.fdm.laplacian(1.0, T)
            if self.k_fn is None
            else self.fdm.laplacian(
                jnp.asarray(self.k_fn(T()[0])), T
            )
        )
        self.mom_solver.set_eq(
            self.fdm.ddt(T) + self.fdm.conv(uvec, T) - k_term
            == jnp.zeros_like(T())
        )
        self.mom_solver.solve()
        T.apply_bcs()
        T.update_time(dt)

    def state_fields(self):
        return super().state_fields() + [self.T]

    def _extra_momentum_rhs(self, component: int):
        # buoyancy acts on the vertical (last-axis) momentum component
        if component == self.mesh.dim - 1:
            return self._buoyancy
        return 0.0

    def nusselt_avg(self) -> float:
        """Cavity-averaged Nusselt number: the mean over x of the plane
        heat flux ``Nu(x) = ∫ (u T - ∂T/∂x) dy`` — at steady state every
        plane carries the same flux (energy conservation), so the
        average is robust to the wall-gradient truncation that makes
        ``nusselt_hot_wall`` under-read thin boundary layers (measured
        at Ra=1e4/65²: wall formula 2.155 vs plane average 2.257 vs de
        Vahl Davis 2.243). 2-D only."""
        import numpy as np

        assert self.mesh.dim == 2, "nusselt_avg: 2-D cavity diagnostic"
        T = np.asarray(self.T()[0])
        u = np.asarray(self.u()[0])
        dx = float(self.mesh.dx_np[0])
        dy = float(self.mesh.dx_np[1])
        dTdx = np.gradient(T, dx, axis=0, edge_order=2)
        nu_planes = np.trapezoid(u * T - dTdx, dx=dy, axis=1)
        return float(nu_planes.mean())

    def nusselt_hot_wall(self) -> float:
        """Average Nusselt number on the hot (xl) wall: ``-dT/dx``
        integrated over the wall (trapezoidal)."""
        import numpy as np

        T = np.asarray(self.T()[0])
        dx = float(self.mesh.dx_np[0])
        # second-order one-sided derivative at x=0, integrated over the
        # wall (all transverse axes; works in 2-D and 3-D)
        dTdx = (-1.5 * T[0] + 2.0 * T[1] - 0.5 * T[2]) / dx
        for j in range(1, self.mesh.dim):
            dTdx = np.trapezoid(dTdx, dx=float(self.mesh.dx_np[j]), axis=0)
        return float(-dTdx)
