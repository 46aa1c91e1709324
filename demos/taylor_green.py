#!/usr/bin/env python3
"""Demo: decaying Taylor-Green vortex — an EXACT transient Navier-Stokes
solution on the fully periodic box (new in this framework; the reference
has no NS model and no periodic-flow capability).

    u = -cos(2 pi x) sin(2 pi y) exp(-8 pi^2 nu t)
    v =  sin(2 pi x) cos(2 pi y) exp(-8 pi^2 nu t)

The nonlinear term is a pure gradient absorbed by the pressure, so the
velocity decays self-similarly: every digit of disagreement is solver
error (spatial stencils, projection splitting, periodic seam handling).

Run:  python demos/taylor_green.py [--plot]
"""
import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), ".."))
)
import sys
from math import exp, pi

import jax.numpy as jnp
import numpy as np

from pyapes_tpu.geometry import Box
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.models import PeriodicFlow


def main() -> None:
    n, nu = 65, 0.01
    mesh = Mesh(Box[0:1, 0:1], None, [n, n])
    model = PeriodicFlow(mesh, nu=nu)

    k = 2 * pi
    u0 = -jnp.cos(k * mesh.X) * jnp.sin(k * mesh.Y)
    v0 = jnp.sin(k * mesh.X) * jnp.cos(k * mesh.Y)
    model.set_velocity(u0, v0)

    dt, steps, every = 2e-3, 250, 50
    print(f"Taylor-Green {n}x{n}, nu={nu}, dt={dt}")
    print(f"{'t':>6} {'KE (solved)':>12} {'KE (exact)':>12} {'rel err':>9}")
    for i in range(0, steps, every):
        model.run(dt, every)
        ke = float(model.kinetic_energy())
        ke_ex = 0.25 * exp(-4 * k**2 * nu * model.t)
        print(f"{model.t:6.3f} {ke:12.6f} {ke_ex:12.6f} "
              f"{abs(ke / ke_ex - 1):9.2e}")

    decay = exp(-2 * k**2 * nu * model.t)
    u = np.asarray(model.u()[0])
    rel = np.linalg.norm(u - np.asarray(u0) * decay) / (
        np.linalg.norm(np.asarray(u0)) * decay
    )
    print(f"final velocity rel L2 error vs exact: {rel:.2e}")

    if "--plot" in sys.argv:
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(5, 4))
        X, Y = np.asarray(mesh.X), np.asarray(mesh.Y)
        v = np.asarray(model.v()[0])
        ax.streamplot(Y.T, X.T, np.asarray(model.u()[0]).T, v.T, density=1.2)
        ax.set_title(f"Taylor-Green t={model.t:.2f}")
        fig.savefig("taylor_green.png", dpi=120)
        print("wrote taylor_green.png")


if __name__ == "__main__":
    main()
