"""Vortex shedding behind a circular cylinder — Strouhal number.

Re = U d / nu = 100: the wake behind a cylinder is unstable and sheds a
von Karman vortex street; the lift on the body oscillates at the
shedding frequency f, giving the Strouhal number St = f d / U ~ 0.16-0.17
for a confined/low-blockage channel at this Re (Schaefer & Turek's
benchmark cylinder gives St ~ 0.30 at their blockage; the unconfined
value is ~0.164).

Run (TPU; ~8000 async-enqueued steps):

    python demos/vortex_shedding.py

Smoke mode (CPU, tiny — exercises the machinery, no shedding expected):

    SMOKE=1 python demos/vortex_shedding.py
"""
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np  # noqa: E402

SMOKE = bool(os.environ.get("SMOKE"))
if SMOKE:
    import jax

    jax.config.update("jax_platforms", "cpu")

from pyapes_tpu.backend import enable_compilation_cache  # noqa: E402
from pyapes_tpu.geometry import Box, MaskObstacle  # noqa: E402
from pyapes_tpu.mesh import Mesh  # noqa: E402
from pyapes_tpu.models import ChannelFlow  # noqa: E402
from pyapes_tpu.models.navier_stokes import staircase_body_force  # noqa: E402


def main() -> None:
    enable_compilation_cache()
    # cylinder d=0.2 at (1.0, 1.01): the 0.01 offset breaks the exact
    # symmetry so the wake instability onsets without waiting for
    # round-off to seed it
    d = 0.2
    u_in, nu = 1.0, d / 100.0  # Re = U d / nu = 100
    if SMOKE:
        nx, ny, steps, every = 97, 49, 60, 10
    else:
        nx, ny, steps, every = 385, 193, 8000, 8
    body = MaskObstacle(
        lambda X, Y: (X - 1.0) ** 2 + (Y - 1.01) ** 2 < (d / 2) ** 2
    )
    mesh = Mesh(Box[0:4, 0:2], [body], [nx, ny])
    # sync=False: each step enqueues 3 solves + projection with zero host
    # round-trips; the only per-sample sync is the lift fetch
    model = ChannelFlow(mesh, nu=nu, u_in=u_in, config={"sync": False})
    dt = 0.2 * (4.0 / (nx - 1)) / 1.5  # CFL ~0.2 at u_max ~ 1.5
    # FUSED batched stepping (utils/fuse.py): `every` steps per compiled
    # whole-step batch, one lift fetch per batch (at St~0.3 the shedding
    # period is ~120 steps, so 8-step sampling gives ~15 points/period)
    t_hist, cl_hist = [], []
    n_batches = steps // every
    for i in range(n_batches):
        model.run(dt, every, fused=True)
        F = model.body_force()
        t_hist.append(model.t)
        cl_hist.append(2.0 * F[1] / (u_in**2 * d))  # C_L = 2F/(rho U^2 d)
        if (i + 1) % 50 == 0:
            print(f"step {(i+1)*every}/{steps} t={model.t:.2f} "
                  f"C_L={cl_hist[-1]:+.4f}", flush=True)

    t_arr = np.asarray(t_hist)
    cl = np.asarray(cl_hist)
    # use the developed half of the signal for the spectrum
    half = len(cl) // 2
    sig = cl[half:] - cl[half:].mean()
    if len(sig) > 8 and np.abs(sig).max() > 1e-8:
        dt_s = t_arr[1] - t_arr[0]
        freqs = np.fft.rfftfreq(len(sig), dt_s)
        amp = np.abs(np.fft.rfft(sig))
        f_shed = freqs[1:][np.argmax(amp[1:])]
        st = f_shed * d / u_in
        print(f"lift oscillation amplitude (developed): "
              f"{np.abs(sig).max():.4f}")
        print(f"shedding frequency f={f_shed:.4f}  ->  St = f d / U = "
              f"{st:.4f}  (expected ~0.16-0.30 depending on blockage)")
    else:
        print(f"no developed oscillation detected "
              f"(max |C_L'| = {np.abs(sig).max() if len(sig) else 0:.2e}"
              f"{'; smoke mode' if SMOKE else ''})")


if __name__ == "__main__":
    main()
