"""Self-consistent Rosenbluth-Fokker-Planck relaxation.

An anisotropic (T_perp != T_par) velocity distribution relaxes toward an
isotropic Maxwellian under like-species collisions; the Rosenbluth
potentials H, G are re-solved from f every ``refresh`` steps
(``models/rosenbluth.py`` — the reference takes H, G as external inputs).

    python demos/rfp_selfconsistent.py
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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pyapes_tpu.geometry import Cylinder  # noqa: E402
from pyapes_tpu.mesh import Mesh  # noqa: E402
from pyapes_tpu.models import RFPEvolution  # noqa: E402
from pyapes_tpu.variables import Field  # noqa: E402


def moments(mesh, f):
    R, Z = np.asarray(mesh._grid_np[0]), np.asarray(mesh._grid_np[1])
    dr, dz = (float(d) for d in mesh.dx_np)
    w = 2.0 * np.pi * R * dr * dz
    f = np.asarray(f)
    N = (f * w).sum()
    return N, (f * R**2 * w).sum() / N / 2.0, (f * Z**2 * w).sum() / N


def main() -> None:
    mesh = Mesh(Cylinder[0:4.5, -4.5:4.5], None, [48, 96])
    R, Z = np.asarray(mesh._grid_np[0]), np.asarray(mesh._grid_np[1])
    t_perp, t_par = 0.36, 1.0
    # normalized to unit density: the collision rate and the explicit
    # stability limit both scale with N
    f0 = np.exp(-(R**2) / (2 * t_perp) - Z**2 / (2 * t_par))
    f0 /= (2 * np.pi * t_perp) * np.sqrt(2 * np.pi * t_par)

    f = Field("pdf", 1, mesh, None)
    f.set_var_tensor(jnp.asarray(f0))
    model = RFPEvolution(mesh)

    N, tp, tz = moments(mesh, f()[0])
    print(f"t=0.00  N={N:.5f}  T_perp={tp:.4f}  T_par={tz:.4f}")
    # explicit stepping: dt is diffusion-limited (~dx_r^2 / 4 max(D));
    # run_selfconsistent warns when dt exceeds the estimate
    dt, chunk = 2e-4, 150
    for k in range(1, 6):
        f = model.run_selfconsistent(f, dt=dt, n_steps=chunk,
                                     refresh_every=20)
        N, tp, tz = moments(mesh, f()[0])
        print(
            f"t={k * chunk * dt:.2f}  N={N:.5f}  T_perp={tp:.4f}  "
            f"T_par={tz:.4f}  anisotropy={abs(tz - tp):.4f}"
        )


if __name__ == "__main__":
    main()
