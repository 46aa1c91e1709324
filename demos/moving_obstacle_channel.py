"""Channel flow past a TRANSLATING square body (moving immersed boundary).

Direct-forcing immersed boundary (Mohd-Yusof / Fadlun style): the body
cells pin the velocity to the body's velocity through a DYNAMIC
obstacle-Dirichlet BC whose mask is a runtime operand of the compiled
momentum solvers — the body translates every step and the whole run still
compiles exactly once per solver structure (round-3 streamed-operand
machinery; a capability far beyond the reference, which cannot apply any
obstacle BC at all, ``linalg.py:286-292``).

    python demos/moving_obstacle_channel.py
"""
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pyapes_tpu.geometry import Box  # noqa: E402
from pyapes_tpu.mesh import Mesh  # noqa: E402
from pyapes_tpu.models import ChannelFlow  # noqa: E402
from pyapes_tpu.solver import linalg  # noqa: E402
from pyapes_tpu.variables.bcs import ObstacleDirichlet  # noqa: E402


def body_mask(mesh, xc, yc, half):
    X = np.asarray(mesh._grid_np[0])
    Y = np.asarray(mesh._grid_np[1])
    return (np.abs(X - xc) <= half) & (np.abs(Y - yc) <= half)


def main() -> None:
    n = 49
    mesh = Mesh(Box[0:3, 0:1], None, [3 * n - 2, n])
    model = ChannelFlow(mesh, nu=0.02, u_in=1.0, rhie_chow=True)

    # dynamic no-slip body (direct forcing: velocity pinned to the body
    # velocity inside the mask; the pressure equation is left unmodified
    # inside the body, Fadlun et al. 2000)
    half = 0.08
    xc, yc, u_body = 0.6, 0.5, 0.25
    m0 = body_mask(mesh, xc, yc, half)
    obs = [
        ObstacleDirichlet(f"body-{v.name}", 0.0, m0, dynamic=True)
        for v in model.vel
    ]
    for v, ob in zip(model.vel, obs):
        v.bcs.append(ob)

    dt, steps = 0.005, 120
    linalg.clear_cache()
    for i in range(steps):
        x_now = xc + u_body * model.t
        m = body_mask(mesh, x_now, yc, half)
        for j, ob in enumerate(obs):
            ob.bc_mask = m
            # the body moves along +x: u inside = u_body, v inside = 0
            ob.bc_val = u_body if j == 0 else 0.0
        model.step(dt)
        if (i + 1) % 30 == 0:
            from pyapes_tpu.models.navier_stokes import staircase_body_force

            div = float(jnp.abs(model.divergence()).mean())
            # hydrodynamic force on the MOVING body (no-slip traction
            # relative to the body velocity)
            drag, lift = staircase_body_force(
                model.p()[0], [v()[0] for v in model.vel], m,
                [float(d) for d in mesh.dx_np], model.nu,
                u_body=[u_body, 0.0],
            )
            print(
                f"step {i+1}: body at x={x_now:.3f}, "
                f"flux_in={model.flux(0):.4f} "
                f"flux_out={model.flux(-1):.4f} mean|div|={div:.2e} "
                f"drag={drag:+.3f} lift={lift:+.3f} "
                f"compiled_solvers={len(linalg._SOLVER_CACHE)}"
            )

    print(f"done: {len(linalg._SOLVER_CACHE)} compiled solver structures "
          f"for {steps} steps of a translating body")


if __name__ == "__main__":
    main()
