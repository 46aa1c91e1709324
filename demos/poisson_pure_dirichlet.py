#!/usr/bin/env python3
"""Demo: 2-D Poisson with Dirichlet BCs (cf. reference
``demos/poisson_equations/pure_dirichlet.ipynb``).

Run: python demos/poisson_pure_dirichlet.py [--plot]
"""
import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), ".."))
)
import sys

import numpy as np

from pyapes_tpu.geometry import Box
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.models import PoissonSolver
from pyapes_tpu.testing.poisson import (
    poisson_bcs,
    poisson_exact_nd,
    poisson_rhs_nd,
)


def main() -> None:
    mesh = Mesh(Box[0:1, 0:1], None, [129, 129])
    model = PoissonSolver(mesh, poisson_bcs(2), config={"precond": "mg"})
    var = model.solve(poisson_rhs_nd(mesh, model.var))

    sol = np.asarray(var()[0])
    exact = np.asarray(poisson_exact_nd(mesh))
    err = np.abs(sol - exact).max()
    print(f"converged={model.report['converge']} "
          f"itr={model.report['itr']} max_err={err:.2e}")

    if "--plot" in sys.argv:
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(10, 4))
        X, Y = np.asarray(mesh.X), np.asarray(mesh.Y)
        axes[0].contourf(X, Y, sol, levels=30)
        axes[0].set_title("FDM (MG-PCG)")
        axes[1].contourf(X, Y, exact, levels=30)
        axes[1].set_title("Exact")
        plt.savefig("poisson_dirichlet.png", dpi=120)
        print("wrote poisson_dirichlet.png")


if __name__ == "__main__":
    main()
