#!/usr/bin/env python3
"""Demo: axisymmetric (r-z) Poisson with callable Dirichlet BCs and a
Neumann axis condition (cf. reference
``demos/poisson_equations/axisymmetric.ipynb``).

Exact solution: phi = exp(-z) cos(r).
"""
import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), ".."))
)
import sys
from math import cos, exp

import jax.numpy as jnp
import numpy as np

from pyapes_tpu.geometry import Cylinder
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.solver import FDM, Solver
from pyapes_tpu.variables import Field
from pyapes_tpu.variables.bcs import CylinderBoundary


def main() -> None:
    mesh = Mesh(Cylinder[0:1, 0:1], None, [101, 101])

    f_bc = CylinderBoundary(
        rl={"bc_type": "neumann", "bc_val": 0.0},
        ru={"bc_type": "dirichlet",
            "bc_val": lambda grid, m, v, o: jnp.exp(-grid[1]) * cos(1)},
        zl={"bc_type": "dirichlet",
            "bc_val": lambda grid, m, v, o: jnp.cos(grid[0])},
        zu={"bc_type": "dirichlet",
            "bc_val": lambda grid, m, v, o: jnp.cos(grid[0]) * exp(-1)},
    )
    var = Field("U", 1, mesh, {"domain": f_bc(), "obstacle": None}, init_val=0.0)

    rhs = jnp.zeros_like(var())
    rhs_val = -jnp.sin(mesh.X) / (mesh.X * jnp.exp(mesh.Z))
    rhs_val = jnp.where(mesh.X == 0.0, -1.0 / jnp.exp(mesh.Z), rhs_val)
    rhs = rhs.at[0].set(rhs_val)

    solver = Solver({"fdm": {"method": "bicgstab", "tol": 1e-5,
                             "max_it": 1000, "report": True}})
    fdm = FDM()
    solver.set_eq(fdm.laplacian(1.0, var) == rhs)
    solver.solve()

    exact = np.asarray(jnp.exp(-mesh.Z) * jnp.cos(mesh.X))
    err = np.abs(np.asarray(var()[0]) - exact).max()
    print(f"max_err={err:.2e}")

    if "--plot" in sys.argv:
        import matplotlib.pyplot as plt

        plt.contourf(np.asarray(mesh.R), np.asarray(mesh.Z),
                     np.asarray(var()[0]), levels=30)
        plt.xlabel("r"); plt.ylabel("z")
        plt.savefig("poisson_rz.png", dpi=120)
        print("wrote poisson_rz.png")


if __name__ == "__main__":
    main()
