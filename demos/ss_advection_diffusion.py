#!/usr/bin/env python3
"""Demo: steady 1-D advection-diffusion boundary layer (cf. reference
``demos/advection_diffusion/ss_advection_diffusion.ipynb``)."""
import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), ".."))
)
import sys
from math import exp

import jax.numpy as jnp
import numpy as np

from pyapes_tpu.geometry import Box
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.models import AdvectionDiffusion
from pyapes_tpu.variables.bcs import homogeneous_bcs


def main() -> None:
    mesh = Mesh(Box[0:1], None, [0.01])
    eps = 0.1
    model = AdvectionDiffusion(
        mesh, homogeneous_bcs(1, 0.0, "dirichlet"),
        velocity=1.0, epsilon=eps, limiter="none", init_val=0.5,
    )
    model.solve_steady(rhs=1.0)

    X = mesh.X
    exact = X - (jnp.exp(-(1 - X) / eps) - exp(-1 / eps)) / (1 - exp(-1 / eps))
    err = np.abs(np.asarray(model.var()[0]) - np.asarray(exact)).max()
    print(f"itr={model.report['itr']} max_err={err:.2e}")

    if "--plot" in sys.argv:
        import matplotlib.pyplot as plt

        plt.plot(np.asarray(X), np.asarray(model.var()[0]), label="FDM")
        plt.plot(np.asarray(X), np.asarray(exact), "--", label="exact")
        plt.legend()
        plt.savefig("adv_diff.png", dpi=120)
        print("wrote adv_diff.png")


if __name__ == "__main__":
    main()
