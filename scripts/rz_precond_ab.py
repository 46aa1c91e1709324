#!/usr/bin/env python3
"""On-chip A/B of the implicit-RFP FD preconditioner at bench scale
(512x1024): wall + iteration count per implicit step, precond fd vs
none. Emits one JSON line per arm."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pyapes_tpu.backend import enable_compilation_cache
from pyapes_tpu.geometry import Cylinder
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.models.rfp_evolution import RFPEvolution
from pyapes_tpu.models.rosenbluth import RosenbluthPotentials
from pyapes_tpu.variables import Field


def main() -> None:
    nr = int(os.environ.get("AB_NR", "512"))
    nz = int(os.environ.get("AB_NZ", "1024"))
    n_steps = int(os.environ.get("AB_STEPS", "5"))
    dt = float(os.environ.get("AB_DT", "1e-3"))
    enable_compilation_cache()
    mesh = Mesh(Cylinder[0:4, -4:4], None, [nr, nz], device="tpu",
                dtype="single")
    R, Z = mesh.R, mesh.Z
    f0 = jnp.exp(-(R**2 + Z**2) / 2.0) / (2 * np.pi) ** 1.5
    pots = RosenbluthPotentials(mesh, np.asarray(f0))
    H, G = pots.solve(f0)
    model = RFPEvolution(mesh, H, G)

    for precond in ("none", "fd"):
        cfg = {"precond": precond, "sync": True, "report": False}
        pdf = Field("pdf", 1, mesh, None)
        pdf.set_var_tensor(f0[None])
        # warm/compile
        model.step_implicit(pdf, dt, config=cfg)
        float(pdf()[0].ravel()[0])
        pdf.set_var_tensor(f0[None])
        itrs = []
        tic = time.perf_counter()
        from pyapes_tpu.solver import ops as ops_mod

        orig_solve = ops_mod.Solver.solve

        def spy(self):
            r = orig_solve(self)
            itrs.append(int(self.report["itr"]))
            return r

        ops_mod.Solver.solve = spy
        try:
            for _ in range(n_steps):
                model.step_implicit(pdf, dt, config=cfg)
        finally:
            ops_mod.Solver.solve = orig_solve
        float(pdf()[0].ravel()[0])
        wall = time.perf_counter() - tic
        print(json.dumps({
            "precond": precond, "nr": nr, "nz": nz, "dt": dt,
            "steps": n_steps, "wall_s": round(wall, 4), "itrs": itrs,
        }), flush=True)


if __name__ == "__main__":
    main()
