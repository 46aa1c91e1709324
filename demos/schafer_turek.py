"""Schaefer-Turek 2D-2 benchmark: unsteady flow past a cylinder, Re=100.

The canonical quantitative anchor for incompressible flow past a body
(Schaefer & Turek 1996, "Benchmark computations of laminar flow around
a cylinder"). Geometry: channel [0, 2.2] x [0, 0.41], cylinder d=0.1
centered at (0.2, 0.2) (0.05 off-center -> the wake instability onsets
deterministically); parabolic inflow with peak Um=1.5 (mean U = 2/3 Um
= 1.0), nu=0.001 -> Re = U d / nu = 100. Published reference intervals
(lower/upper bounds over the contributed solutions):

    St      in [0.2950, 0.3050]
    Cd_max  in [3.2200, 3.2400]
    Cl_max  in [0.9900, 1.0100]
    dP(t0+T/2) in [2.4600, 2.5000]   (front-rear pressure difference)

The cylinder here is a staircase immersed body (``MaskObstacle``) on an
equidistant grid with first-order force quadrature
(``staircase_body_force``), so the force amplitudes carry O(dx)
boundary error; the shedding FREQUENCY is far more robust. The recorded
on-chip result (MEASURE_r4.jsonl, BASELINE.md) asserts St against the
published interval and reports Cd/Cl/dP for honesty.

Run (TPU, fused batched stepping; ~10 min incl. compile):

    python demos/schafer_turek.py

Smoke mode (CPU, tiny; machinery only, no developed shedding):

    SMOKE=1 python demos/schafer_turek.py
"""
import json
import os
import sys
import time

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


def run_benchmark(ny: int = 83, t_end: float = 8.0, every: int = 200,
                  verbose: bool = True, margin: int = 6) -> dict:
    """Run the 2D-2 case; returns the measured functionals.

    Round-5 design (VERDICT items 3+4): the force/probe time series
    accumulate ON DEVICE inside the scanned whole-step batch
    (``model.run_batched`` + traced ``body_force_device`` /
    ``body_force_cv_device`` diagnostics) at PER-STEP resolution, and
    are fetched ONCE at the end — the round-4 version paid 3 host
    fetches (~35 ms RTT each) plus a per-step dispatch RTT per 25-step
    batch, which made the whole run host-latency-bound (946 K
    cell-steps/s for ~ms of per-step compute).
    """
    import jax

    d, um, nu = 0.1, 1.5, 0.001  # U_mean = 2/3 * 1.5 = 1.0, Re = 100
    u_mean = 2.0 / 3.0 * um
    dy = 0.41 / (ny - 1)
    nx = int(round(2.2 / dy)) + 1
    body = MaskObstacle(
        lambda X, Y: (X - 0.2) ** 2 + (Y - 0.2) ** 2 < (d / 2) ** 2
    )
    mesh = Mesh(Box[0:2.2, 0:0.41], [body], [nx, ny])
    model = ChannelFlow(mesh, nu=nu, u_in=um, config={"sync": False})
    # peak speed ~2.3 (blockage acceleration over the cylinder)
    dt = 0.2 * dy / 2.3
    steps = int(t_end / dt)

    # front/rear pressure probes: the 2D-2 dP is defined at the cylinder
    # SURFACE points (0.15, 0.2)/(0.25, 0.2). Record both the node value
    # and a quadratic extrapolation from the 3 clean fluid nodes behind
    # each probe (offsets h, 2h, 3h along the centerline, away from the
    # staircase shell): p_s = 3 p(h) - 3 p(2h) + p(3h) — avoids the
    # first-order boundary-cell contamination at the surface node.
    ia = int(round(0.15 / dy))
    ib = int(round(0.25 / dy))
    jc = int(round(0.20 / dy))

    def diag(m):
        p = m.p()[0]
        dp_node = p[ia, jc] - p[ib, jc]
        p_front = 3.0 * p[ia - 1, jc] - 3.0 * p[ia - 2, jc] + p[ia - 3, jc]
        p_rear = 3.0 * p[ib + 1, jc] - 3.0 * p[ib + 2, jc] + p[ib + 3, jc]
        return (m.body_force_device(),
                m.body_force_cv_device(margin=margin),
                dp_node, p_front - p_rear)

    # history bootstrap (fused one-shot captures since round 5), then
    # uniform one-dispatch scanned batches
    model.run(dt, 2, fused=True)
    n_batches = (steps - 2) // every
    if n_batches < 1:
        raise SystemExit(
            f"t_end gives only {steps} steps at dt={dt:.2e} — need at "
            f"least {every + 2} for one diagnostic batch (lower ST_TEND "
            "was requested below the measurable window; shrink `every` "
            "or raise ST_TEND)"
        )
    t0 = time.perf_counter()
    chunks = []
    for i in range(n_batches):
        chunks.append(model.run_batched(dt, every, diag_fn=diag))
        if verbose and (i + 1) % max(1, n_batches // 8) == 0:
            print(f"batch {i+1}/{n_batches} t={model.t:.2f} "
                  f"(+{time.perf_counter()-t0:.1f}s)", flush=True)
    # ONE host fetch for the whole run's diagnostics
    host = jax.device_get(chunks)
    # force completion of the final state too (wall time honesty)
    float(np.asarray(model.p()[0])[0, 0])
    wall = time.perf_counter() - t0

    F = np.concatenate([np.asarray(c[0]) for c in host])
    Fcv = np.concatenate([np.asarray(c[1]) for c in host])
    dp = np.concatenate([np.asarray(c[2]) for c in host])
    dp_surf = np.concatenate([np.asarray(c[3]) for c in host])
    total = n_batches * every
    t_arr = (np.arange(total) + 3) * dt  # diag starts after 2 eager steps
    scale = 2.0 / (u_mean**2 * d)
    cd, cl = scale * F[:, 0], scale * F[:, 1]
    cd_cv, cl_cv = scale * Fcv[:, 0], scale * Fcv[:, 1]
    out = {
        "nx": nx, "ny": ny, "dt": dt, "steps": total + 2,
        "t_end": float(t_arr[-1]) if total else 0.0,
        "wall_s": round(wall, 2),
        "cell_steps_per_s": round(nx * ny * total / wall, 1),
    }
    # spectrum of the developed half of the lift signal (CV lift — the
    # smoother second-order functional; per-step resolution now)
    half = len(cl) // 2
    sig = cl_cv[half:] - cl_cv[half:].mean()
    if len(sig) > 16 and np.abs(sig).max() > 1e-6:
        dt_s = float(t_arr[1] - t_arr[0])
        freqs = np.fft.rfftfreq(len(sig), dt_s)
        amp = np.abs(np.fft.rfft(sig))
        k = int(np.argmax(amp[1:])) + 1
        # parabolic interpolation of the spectral peak (the window holds
        # only ~12 shedding periods, so the raw bin is ~4% wide)
        if 1 <= k < len(amp) - 1:
            a, b, c = amp[k - 1], amp[k], amp[k + 1]
            delta = 0.5 * (a - c) / (a - 2 * b + c)
        else:
            delta = 0.0
        f_shed = float(freqs[k] + delta * (freqs[1] - freqs[0]))
        out["St"] = round(f_shed * d / u_mean, 4)
        out["Cl_max"] = round(float(cl[half:].max()), 4)
        out["Cd_max"] = round(float(cd[half:].max()), 4)
        out["Cl_amp"] = round(float(np.abs(sig).max()), 4)
        out["Cd_max_cv"] = round(float(cd_cv[half:].max()), 4)
        out["Cl_max_cv"] = round(float(cl_cv[half:].max()), 4)
        # dP at the instant of max lift + half a period (the benchmark's
        # reporting instant t0 + T/2 with t0 the max-Cl time)
        i_max = half + int(np.argmax(cl_cv[half:]))
        t_rep = t_arr[i_max] + 0.5 / f_shed
        i_rep = int(np.argmin(np.abs(t_arr - t_rep)))
        out["dP"] = round(float(dp[i_rep]), 4)
        out["dP_surf"] = round(float(dp_surf[i_rep]), 4)
    return out


def main() -> None:
    enable_compilation_cache()
    if SMOKE:
        res = run_benchmark(ny=21, t_end=0.2, every=5)
    else:
        ny = int(os.environ.get("ST_NY", "83"))
        t_end = float(os.environ.get("ST_TEND", "8.0"))
        res = run_benchmark(ny=ny, t_end=t_end)
    print(json.dumps(res))
    if "St" in res:
        print(f"St = {res['St']}   (Schaefer-Turek interval "
              f"[0.2950, 0.3050])")
        print(f"staircase: Cd_max = {res['Cd_max']} [3.22, 3.24]   "
              f"Cl_max = {res['Cl_max']} [0.99, 1.01]   "
              f"dP = {res['dP']} [2.46, 2.50]")
        print(f"control-volume: Cd_max = {res['Cd_max_cv']}   "
              f"Cl_max = {res['Cl_max_cv']}   "
              f"dP_surf = {res['dP_surf']}")


if __name__ == "__main__":
    main()
