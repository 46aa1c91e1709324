#!/usr/bin/env python3
"""Time one NS cavity step at N^3 with synchronous vs asynchronous
(``sync: False``) solves.

On the tunneled axon backend every device->host scalar fetch is a full
RTT (~35 ms); a cavity step makes 4 solves (3 momentum + 1 pressure), so
the sync path carries ~140 ms/step of pure host blocking on top of the
device compute. ``sync: False`` enqueues the whole step without blocking.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyapes_tpu.backend import enable_compilation_cache
from pyapes_tpu.geometry import Box
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.models.navier_stokes import LidDrivenCavity

N = int(os.environ.get("N", "128"))
STEPS = int(os.environ.get("STEPS", "5"))


def run(sync: bool) -> float:
    mesh = Mesh(Box[0:1, 0:1, 0:1], None, [N, N, N], device="tpu",
                dtype="single")
    cfg = None if sync else {"sync": False}
    model = LidDrivenCavity(mesh, nu=0.01, lid_velocity=1.0,
                            lid_profile="regularized", config=cfg)
    dt = 0.25 / N
    model.run(dt, 2)  # compile + warm
    float(model.p()[0].ravel()[0])
    tic = time.perf_counter()
    model.run(dt, STEPS)
    float(model.p()[0].ravel()[0])  # value readback = real sync on axon
    wall = (time.perf_counter() - tic) / STEPS
    print(f"sync={sync!s:5}  {wall * 1e3:8.1f} ms/step", flush=True)
    return wall


def main():
    enable_compilation_cache()
    w_sync = run(True)
    w_async = run(False)
    print(f"async saving: {(w_sync - w_async) * 1e3:.1f} ms/step "
          f"({(1 - w_async / w_sync) * 100:.0f}%)")


if __name__ == "__main__":
    main()
