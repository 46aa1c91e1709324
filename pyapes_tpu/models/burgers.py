"""1-D viscous Burgers template (reference ``wip_burger_1d``,
``tests/test_solver.py:393-436`` — disabled there; works here)."""
from __future__ import annotations

from pyapes_tpu.mesh import Mesh
from pyapes_tpu.solver.fdm import FDM
from pyapes_tpu.solver.ops import Solver
from pyapes_tpu.testing.burgers import burger_exact_nd
from pyapes_tpu.variables import Field
from pyapes_tpu.variables.bcs import homogeneous_bcs


class Burgers1D:
    """``ddt(u) + u u_x = nu u_xx`` on a periodic domain, backward Euler +
    Picard-linearized advective-form Div."""

    def __init__(self, mesh: Mesh, nu: float = 0.1, init_val=None, config=None):
        assert mesh.dim == 1
        self.mesh = mesh
        self.nu = nu
        f_bc = homogeneous_bcs(1, None, "periodic")
        if init_val is None:
            init_val = [burger_exact_nd(mesh, nu, 0.0)]
        self.var = Field(
            "U", 1, mesh, {"domain": f_bc, "obstacle": None}, init_val=init_val
        )
        cfg = {
            "method": "bicgstab",
            "tol": 1e-8,
            "max_it": 2000,
            "report": False,
            "picard": 2,
        }
        if mesh.obstacle is None and not any(
            k in (config or {}) for k in ("method", "precond")
        ):
            # frozen diffusion+dt FD preconditioner (the nonlinear
            # advection term is left out; fd_fallback degrades to plain
            # BiCGSTAB if FD setup is impossible)
            cfg.update({"precond": "fd", "fd_fallback": "bicgstab"})
        cfg.update(config or {})
        self.solver = Solver({"fdm": cfg})
        self.fdm = FDM(
            {"div": {"limiter": "none", "edge": False, "form": "advective"}}
        )

    def step(self, dt: float) -> Field:
        if self.var._dt is None:
            self.var.set_time(dt, 0.0)
        self.var.save_old()
        self.solver.set_eq(
            self.fdm.ddt(self.var)
            + self.fdm.div(self.var, self.var)
            - self.fdm.laplacian(self.nu, self.var)
            == 0.0
        )
        self.report = self.solver.solve()
        self.var.update_time(dt)
        return self.var


class BurgersND:
    """N-D viscous Burgers system on a periodic box:

        ``du_i/dt + u_j d(u_i)/dx_j = nu lap u_i``

    The reference cannot express the vector convection (its Div sums
    axis/component diagonal pairs into a scalar, ``fdc.py:93-102``); here
    each component solves implicitly with ``fdm.conv`` (Picard-linearized
    against the previous step's velocity). On TPU 3-D grids the convection
    rides the fused varying-advection Pallas kernels
    (``ops/pallas_advect.py``).

    Args:
        mesh: periodic Box mesh (2-D or 3-D).
        nu: viscosity.
        init_vals: list of ``(1, *nx)`` initial arrays, one per component
            (defaults to zero).
    """

    def __init__(self, mesh: Mesh, nu: float = 0.1, init_vals=None,
                 config=None):
        import jax.numpy as jnp

        assert mesh.dim in (2, 3)
        self.mesh = mesh
        self.nu = nu
        f_bc = homogeneous_bcs(mesh.dim, None, "periodic")
        names = ("u", "v", "w")[: mesh.dim]
        self.vel = [
            Field(nm, 1, mesh, {"domain": f_bc, "obstacle": None},
                  init_val=0.0)
            for nm in names
        ]
        if init_vals is not None:
            for var, iv in zip(self.vel, init_vals):
                var.set_var_tensor(jnp.asarray(iv))
        cfg = {
            "method": "bicgstab",
            "tol": 1e-8,
            "max_it": 2000,
            "report": False,
            "picard": 2,
        }
        if mesh.obstacle is None and not any(
            k in (config or {}) for k in ("method", "precond")
        ):
            # frozen diffusion+dt FD preconditioner (the nonlinear
            # advection term is left out; fd_fallback degrades to plain
            # BiCGSTAB if FD setup is impossible)
            cfg.update({"precond": "fd", "fd_fallback": "bicgstab"})
        cfg.update(config or {})
        self.solver = Solver({"fdm": cfg})
        self.fdm = FDM({"div": {"limiter": "none", "edge": False}})
        self.t = 0.0

    def step(self, dt: float) -> None:
        import jax.numpy as jnp

        for var in self.vel:
            if var._dt is None:
                var.set_time(dt, self.t)
            var.save_old()
        uvec = jnp.concatenate([v() for v in self.vel], axis=0)
        for var in self.vel:
            self.solver.set_eq(
                self.fdm.ddt(var)
                + self.fdm.conv(uvec, var)
                - self.fdm.laplacian(self.nu, var)
                == jnp.zeros_like(var())
            )
            self.report = self.solver.solve()
            var.update_time(dt)
        self.t += dt

    def run(self, dt: float, n_steps: int) -> None:
        for _ in range(n_steps):
            self.step(dt)
