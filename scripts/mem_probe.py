#!/usr/bin/env python3
"""AOT memory analysis of the bench fastdiag solve at a given size.

Intercepts the solver's jax.jit, lowers (instead of running) the solve,
compiles AOT, and prints XLA's memory_analysis — exact peak HBM without
burning a device OOM. Usage: N=768 python scripts/mem_probe.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import pyapes_tpu.solver.linalg as linalg
from pyapes_tpu.geometry import Box
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.solver.fdm import FDM
from pyapes_tpu.solver.ops import Solver
from pyapes_tpu.variables import Field
from pyapes_tpu.variables.bcs import homogeneous_bcs

n = int(os.environ.get("N", "768"))
method = os.environ.get("METHOD", "fastdiag")


class _Abort(Exception):
    pass


captured = {}
orig_jit = jax.jit


def capture_jit(fn, **kw):
    jitted = orig_jit(fn, **kw)

    def wrapper(*a, **k):
        # the solver entry takes (x0, rhs, tparams, bc_vals)
        if len(a) == 4 and "lowered" not in captured:
            captured["lowered"] = jitted.lower(*a, **k)
            captured["args"] = a
            raise _Abort()
        return jitted(*a, **k)

    return wrapper


linalg.jax = type(jax)("jax_patched")
linalg.jax.__dict__.update(jax.__dict__)
linalg.jax.jit = capture_jit

mesh = Mesh(Box[0:1, 0:1, 0:1], None, [n, n, n], device="tpu",
            dtype="single")
f_bc = homogeneous_bcs(3, 0.0, "dirichlet")
var = Field("p", 1, mesh, {"domain": f_bc, "obstacle": None}, init_val=0.0)
rhs = jax.random.normal(jax.random.PRNGKey(0), (1, n, n, n),
                        dtype=var().dtype)
cfg = {"method": method, "tol": 1e-6, "max_it": 100, "report": False,
       "criterion": "residual",
       "donate": os.environ.get("DONATE", "1") != "0"}
solver = Solver({"fdm": cfg})
fdm = FDM()
solver.set_eq(fdm.laplacian(1.0, var) == rhs)
try:
    solver.solve()
except _Abort:
    pass

low = captured["lowered"]
print("lowering done; compiling...", flush=True)
comp = low.compile()
ma = comp.memory_analysis()
gib = 2**30
print(f"n={n} method={method}")
for k in ("argument_size_in_bytes", "output_size_in_bytes",
          "temp_size_in_bytes", "alias_size_in_bytes",
          "generated_code_size_in_bytes"):
    v = getattr(ma, k, None)
    if v is not None:
        print(f"  {k}: {v:,} ({v / gib:.2f} GiB)")
tot = (getattr(ma, "argument_size_in_bytes", 0)
       + getattr(ma, "output_size_in_bytes", 0)
       + getattr(ma, "temp_size_in_bytes", 0)
       - getattr(ma, "alias_size_in_bytes", 0))
print(f"  TOTAL (arg+out+temp-alias): {tot:,} ({tot / gib:.2f} GiB)")
print(f"  one {n}^3 f32 array: {n**3 * 4 / gib:.3f} GiB")

if os.environ.get("EXECUTE", "1") != "0":
    print("executing the compiled program with live args...", flush=True)
    import time

    args = captured["args"]

    def fresh_args():
        # donation invalidates x0 — re-make it per run
        return (jnp.zeros_like(args[1]),) + tuple(args[1:])

    try:
        tic = time.perf_counter()
        out = comp(*fresh_args())
        # force completion (block_until_ready insufficient on axon)
        itr_v, tol_v = jax.device_get((out[1], out[2]))
        wall = time.perf_counter() - tic
        print(f"  EXECUTION OK: itr={int(itr_v)} tol={float(tol_v):.2e} "
              f"wall={wall:.3f}s (incl. first-dispatch overhead)", flush=True)
        for _ in range(2):
            a = fresh_args()
            jax.device_get(a[0][0, 0, 0, 0])  # settle the zeros alloc
            tic = time.perf_counter()
            out = comp(*a)
            tol_v = jax.device_get(out[2])
            print(f"  run: {time.perf_counter() - tic:.3f}s "
                  f"tol={float(tol_v):.2e}", flush=True)
    except Exception as e:
        print(f"  EXECUTION FAILED: {type(e).__name__}: {e}", flush=True)
