#!/usr/bin/env python3
"""Where do the 437 s of 512^3 fastdiag first-compile go? (round-4
VERDICT item 2)

Times, in one fresh process each phase, the compile of the PIECES of the
bench solve — the six dense transforms, the Pallas stencil apply, the
refinement while_loop — vs the whole solver program, on the real chip
through the tunneled compile service. Run with no args; prints one JSON
line per phase. PYAPES_PROBE_N overrides the size (default 512).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def t_compile(fn, *args):
    """Wall time of .lower().compile() (compile only, no execute)."""
    tic = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t_lower = time.perf_counter() - tic
    tic = time.perf_counter()
    lowered.compile()
    t_comp = time.perf_counter() - tic
    return t_lower, t_comp


def main() -> None:
    n = int(os.environ.get("PYAPES_PROBE_N", "512"))
    phase = os.environ.get("PYAPES_PROBE_PHASE", "all")

    from pyapes_tpu.geometry import Box
    from pyapes_tpu.mesh import Mesh
    from pyapes_tpu.solver.fdm import FDM
    from pyapes_tpu.solver.ops import Solver
    from pyapes_tpu.variables import Field
    from pyapes_tpu.variables.bcs import homogeneous_bcs

    mesh = Mesh(Box[0:1, 0:1, 0:1], None, [n, n, n], device="tpu",
                dtype="single")
    f_bc = homogeneous_bcs(3, 0.0, "dirichlet")
    var = Field("p", 1, mesh, {"domain": f_bc, "obstacle": None},
                init_val=0.0)
    rhs = jax.random.normal(jax.random.PRNGKey(0), (1, n, n, n),
                            dtype=var().dtype)

    def emit(name, **kw):
        print(json.dumps({"phase": name, "n": n, **kw}), flush=True)

    if phase in ("all", "transforms"):
        # the six dense MXU contractions alone (fastdiag._transform)
        Q = jnp.eye(n, dtype=jnp.float32)

        def transforms(x):
            for j in range(3):
                y = jnp.tensordot(Q, x, axes=[[1], [j]],
                                  preferred_element_type=jnp.float32,
                                  precision="highest")
                x = jnp.moveaxis(y, 0, j)
            return x

        tl, tc = t_compile(transforms, rhs[0])
        emit("transforms_x3_highest", lower_s=round(tl, 2),
             compile_s=round(tc, 2))

        def transforms_def(x):
            for j in range(3):
                y = jnp.tensordot(Q, x, axes=[[1], [j]],
                                  preferred_element_type=jnp.float32)
                x = jnp.moveaxis(y, 0, j)
            return x

        tl, tc = t_compile(transforms_def, rhs[0])
        emit("transforms_x3_default", lower_s=round(tl, 2),
             compile_s=round(tc, 2))

    if phase in ("all", "stencil"):
        from pyapes_tpu.ops.pallas_stencil_db import pallas_axis_stencil_db

        inv = 1.0 / float(mesh.dx_np[0]) ** 2
        c = jnp.full((n,), -2.0 * inv, dtype=jnp.float32)
        o = jnp.full((n,), inv, dtype=jnp.float32)
        coeffs = tuple((o, c, o) for _ in range(3))
        tl, tc = t_compile(lambda x: pallas_axis_stencil_db(coeffs, x), rhs)
        emit("pallas_stencil_db", lower_s=round(tl, 2), compile_s=round(tc, 2))

    if phase in ("all", "solve"):
        # the whole bench solver program (no persistent cache)
        cfg = {"method": "fastdiag", "tol": 1e-6, "max_it": 100,
               "report": False, "criterion": "residual"}
        solver = Solver({"fdm": cfg})
        fdm = FDM()
        tic = time.perf_counter()
        solver.set_eq(fdm.laplacian(1.0, var) == rhs)
        solver.solve()
        float(var()[0].ravel()[0])
        emit("whole_fastdiag_solve_first_call",
             wall_s=round(time.perf_counter() - tic, 2))

    if phase in ("all", "mg"):
        cfg = {"method": "cg", "tol": 1e-6, "max_it": 100,
               "report": False, "criterion": "residual", "precond": "mg",
               "mg_opts": {"dtype": "bfloat16", "n_pre": 2, "n_post": 2,
                           "omega": 0.857, "fmg": True, "fuse_rz": True}}
        var2 = var.zeros_like()
        solver = Solver({"fdm": cfg})
        fdm = FDM()
        tic = time.perf_counter()
        solver.set_eq(fdm.laplacian(1.0, var2) == rhs)
        solver.solve()
        float(var2()[0].ravel()[0])
        emit("whole_mgpcg_solve_first_call",
             wall_s=round(time.perf_counter() - tic, 2))


if __name__ == "__main__":
    main()
