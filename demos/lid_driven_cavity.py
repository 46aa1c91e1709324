#!/usr/bin/env python3
"""Demo: lid-driven cavity at Re=100 via Chorin projection (new in this
framework; BASELINE.json config 5)."""
import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), ".."))
)
import sys

import numpy as np

from pyapes_tpu.geometry import Box
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.models import LidDrivenCavity


def main() -> None:
    n = 65
    mesh = Mesh(Box[0:1, 0:1], None, [n, n])
    model = LidDrivenCavity(mesh, nu=0.01, lid_velocity=1.0)
    model.run(dt=0.01, n_steps=600)

    u = np.asarray(model.u()[0])
    print(f"t={model.t:.2f}  u centerline min={u[n // 2, :].min():.4f} "
          "(Ghia et al. Re=100 converged: -0.2109)")

    if "--plot" in sys.argv:
        import matplotlib.pyplot as plt

        v = np.asarray(model.v()[0])
        speed = np.sqrt(u**2 + v**2)
        X, Y = np.asarray(mesh.X), np.asarray(mesh.Y)
        plt.streamplot(X.T, Y.T, u.T, v.T, color=speed.T, density=1.5)
        plt.title("Lid-driven cavity, Re=100")
        plt.savefig("cavity.png", dpi=120)
        print("wrote cavity.png")


if __name__ == "__main__":
    main()
