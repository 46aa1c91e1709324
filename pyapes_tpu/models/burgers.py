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
