"""Lid-driven cavity with an immersed no-slip square body.

Composes the interior-obstacle BCs (velocity: obstacle-Dirichlet 0;
pressure: zero-flux obstacle-Neumann) the reference declares but cannot
apply (``linalg.py:286-292``). Writes a VTK file for ParaView.

    python demos/cavity_obstacle.py
"""
import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), ".."))
)
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np  # noqa: E402

from pyapes_tpu.geometry import Box  # noqa: E402
from pyapes_tpu.mesh import Mesh  # noqa: E402
from pyapes_tpu.models import LidDrivenCavity  # noqa: E402
from pyapes_tpu.utils.io import write_vtk  # noqa: E402


def main() -> None:
    mesh = Mesh(Box[0:1, 0:1], [Box[0.4:0.6, 0.55:0.75]], [65, 65])
    model = LidDrivenCavity(mesh, nu=0.01, lid_velocity=1.0)
    model.run(dt=0.01, n_steps=300)

    u = np.asarray(model.u()[0])
    v = np.asarray(model.v()[0])
    body = mesh.obstacle_body_masks[0]
    print(f"t = {model.t:.2f}")
    print(f"max |u| outside body: {np.abs(u[~body]).max():.4f}")
    print(f"max |u| on body (no-slip): {np.abs(u[body]).max():.2e}")
    path = write_vtk(
        "cavity_obstacle", mesh,
        {"u": u, "v": v, "p": model.p()[0],
         "speed": np.sqrt(u**2 + v**2)},
    )
    print(f"wrote {path} (open in ParaView)")


if __name__ == "__main__":
    main()
