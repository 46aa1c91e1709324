#!/usr/bin/env python3
"""Fast-diagonalization probes: one-pass accuracy scaling + on-chip speed.

Two questions decide whether ``method: "fastdiag"`` (solver/fastdiag.py)
can beat MG-PCG on the 512^3 Poisson headline:

  1. ACCURACY (host CPU, fast): the one-pass relative residual of the
     eigen-solve with f32/bf16 transform factors, vs grid size. The
     refinement loop contracts by this factor per pass, so it must stay
     well below 1 and grow only mildly with n. Measured 2026-08-18:

         2D n=  33 f32 1.105e-02 bf16 1.652e-02
         2D n=  65 f32 4.325e-02 bf16 6.057e-02
         2D n= 129 f32 5.549e-02 bf16 9.458e-02
         2D n= 257 f32 9.554e-02 bf16 1.333e-01
         2D n= 513 f32 8.899e-02 bf16 1.376e-01
         3D n=  33 f32 6.778e-03 bf16 8.389e-03
         3D n=  65 f32 9.359e-03 bf16 1.120e-02
         3D n= 129 f32 1.045e-02 bf16 1.435e-02

     (condition-number amplification of the f64->f32/bf16 factor
     rounding saturates; bf16 costs only ~1.4x accuracy per pass at 2x
     the MXU rate), i.e. 1e-6 in 3-4 passes at any size here.

  2. SPEED (on-chip): full ``method:"fastdiag"`` Poisson solve at
     256^3/512^3 vs the MG-PCG default, tol 1e-6. Timings are
     dependency-chained with a value readback (block_until_ready does
     not synchronize the tunneled axon backend).

Appends JSON lines to MEASURE_r3.jsonl.
Usage:  timeout 1800 python scripts/fastdiag_probe.py [accuracy|speed]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def accuracy():
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    from pyapes_tpu.solver.fastdiag import FastDiag, axis_matrix_np

    def one_pass(n, dim, tdt):
        h = 1.0 / (n - 1)
        inv = 1.0 / h / h
        ap = np.full(n, inv)
        am = np.full(n, inv)
        ac = np.full(n, -2 * inv)
        A = axis_matrix_np(ap, ac, am, active=slice(1, -1), periodic=False)
        fd = FastDiag([A] * dim, dtype=jnp.float32, transform_dtype=tdt)
        rng = np.random.default_rng(0)
        r = jnp.asarray(
            rng.standard_normal((1,) + (n - 2,) * dim), dtype=jnp.float32
        )
        e = np.asarray(fd.solve(r, jnp.asarray(1.0, jnp.float32))[0],
                       np.float64)
        r64 = np.asarray(r[0], np.float64)
        res = -r64.copy()
        for j in range(dim):
            res += np.moveaxis(np.tensordot(A, e, axes=[[1], [j]]), 0, j)
        return float(np.linalg.norm(res) / np.linalg.norm(r64))

    out = []
    for dim, sizes in ((2, (33, 65, 129, 257, 513)), (3, (33, 65, 129))):
        for n in sizes:
            row = {
                "step": "fd_one_pass", "dim": dim, "n": n,
                "f32": one_pass(n, dim, None),
                "bf16": one_pass(n, dim, "bfloat16"),
                "ts": time.time(),
            }
            print(row)
            out.append(row)
    with open("MEASURE_r3.jsonl", "a") as f:
        for row in out:
            f.write(json.dumps(row) + "\n")


def speed():
    import jax.numpy as jnp

    from pyapes_tpu.backend import enable_compilation_cache
    from pyapes_tpu.geometry import Box
    from pyapes_tpu.mesh import Mesh
    from pyapes_tpu.solver.fdm import FDM
    from pyapes_tpu.solver.ops import Solver
    from pyapes_tpu.testing.poisson import poisson_bcs, poisson_rhs_nd

    enable_compilation_cache()
    import jax

    rows = []
    for n in (256, 512):
        mesh = Mesh(Box[0:1, 0:1, 0:1], None, [n] * 3, dtype="single")
        from pyapes_tpu.variables import Field

        var = Field("p", 1, mesh, {"domain": poisson_bcs(3),
                                   "obstacle": None}, init_val=0.0)
        # fixed-seed random RHS: full spectral content (bench.py workload;
        # a smooth manufactured RHS is near an eigenmode and flatters
        # every solver)
        rhs = jax.random.normal(
            jax.random.PRNGKey(0), (1, n, n, n), dtype=var().dtype
        )
        fdm = FDM()
        mg_opts = {"dtype": "bfloat16", "n_pre": 2, "n_post": 2,
                   "omega": 0.857, "fmg": True, "fuse_rz": True}
        for method, cfg in (
            ("cg", {"precond": "mg", "mg_opts": mg_opts}),
            ("cg", {"precond": "fd"}),
            ("fastdiag", {}),
        ):
            s = Solver({"fdm": {"method": method, "tol": 1e-6,
                                "max_it": 100, "report": False, **cfg}})
            best = None
            itr = None
            for rep in range(4):  # first run includes compile
                var.set_var_tensor(jnp.zeros_like(var()))
                s.set_eq(fdm.laplacian(1.0, var) == rhs)
                t0 = time.perf_counter()
                r = s.solve()  # sync: fetches itr/tol (one RTT)
                dt = time.perf_counter() - t0
                itr = r["itr"]
                if rep:
                    best = dt if best is None else min(best, dt)
            tag = "_" + cfg["precond"] if "precond" in cfg else ""
            row = {
                "step": f"fd_speed_{method}{tag}", "n": n, "itr": itr,
                "s": round(best, 4),
                "mdofps": round(n**3 / best / 1e6, 1),
                "ts": time.time(),
            }
            print(row)
            rows.append(row)
    with open("MEASURE_r3.jsonl", "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "accuracy"
    (accuracy if mode == "accuracy" else speed)()
