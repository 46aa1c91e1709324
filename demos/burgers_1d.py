#!/usr/bin/env python3
"""Demo: 1-D viscous Burgers vs the travelling-wave exact solution
(the reference's disabled ``wip_burger_1d``; works here)."""
import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), ".."))
)
import sys
from math import pi

import numpy as np

from pyapes_tpu.geometry import Box
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.models import Burgers1D
from pyapes_tpu.testing.burgers import burger_exact_nd


def main() -> None:
    mesh = Mesh(Box[0 : 2 * pi], None, [201])
    model = Burgers1D(mesh, nu=0.1)
    snapshots = [np.asarray(model.var()[0])]
    for _ in range(50):
        model.step(0.002)
    snapshots.append(np.asarray(model.var()[0]))

    ex = np.asarray(burger_exact_nd(mesh, 0.1, model.var.t))
    err = np.linalg.norm(snapshots[-1] - ex) / np.linalg.norm(ex)
    print(f"t={model.var.t:.3f} relative L2 error vs exact: {err:.4f}")

    if "--plot" in sys.argv:
        import matplotlib.pyplot as plt

        x = np.asarray(mesh.X)
        plt.plot(x, snapshots[0], label="t=0")
        plt.plot(x, snapshots[-1], label=f"t={model.var.t:.2f}")
        plt.plot(x, ex, "--", label="exact")
        plt.legend()
        plt.savefig("burgers.png", dpi=120)
        print("wrote burgers.png")


if __name__ == "__main__":
    main()
