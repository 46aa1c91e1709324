#!/usr/bin/env python3
"""One-shot on-chip measurement roundup (run from the repo root).

Runs the round-3 pending measurements IN SEQUENCE (concurrent remote
compiles starve each other on the tunneled axon backend) and appends
each result as a JSON line to MEASURE_r3.jsonl:

  1. var-gamma e2e probe (129^2 heterogeneous solve, MG)
  2. headline 512^3 Poisson bench (current default config)
  3. darcy 256^3 bench, jnp vs pallas diff-field kernel
  4. strided vs matrix MG transfers at 512^3
  5. power-law Poiseuille probe (rheology stack on chip)

Each step is bounded; a step that fails records {"error": ...} and the
script continues. Usage:  timeout 5400 python scripts/tpu_roundup.py
"""
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "MEASURE_r3.jsonl")


def record(name, payload):
    payload = {"step": name, "ts": time.time(), **payload}
    with open(OUT, "a") as f:
        f.write(json.dumps(payload) + "\n")
    print(json.dumps(payload), flush=True)


def run_py(name, code, timeout=1500, env=None):
    e = dict(os.environ)
    if env:
        e.update(env)
    t0 = time.time()
    try:
        p = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout, cwd=ROOT, env=e,
        )
        out = p.stdout.strip().splitlines()
        last = out[-1] if out else ""
        try:
            payload = json.loads(last)
        except Exception:
            payload = {"raw": last, "rc": p.returncode,
                       "err_tail": p.stderr.strip()[-500:]}
        payload["wall_s_total"] = round(time.time() - t0, 1)
        record(name, payload)
    except subprocess.TimeoutExpired:
        record(name, {"error": f"timeout {timeout}s"})


PROBE = r"""
import json, time
import numpy as np, jax.numpy as jnp
from pyapes_tpu.backend import enable_compilation_cache
enable_compilation_cache()
from pyapes_tpu.geometry import Box
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.solver.fdm import FDM
from pyapes_tpu.solver.ops import Solver
from pyapes_tpu.variables import Field
from pyapes_tpu.variables.bcs import homogeneous_bcs
n = 129
mesh = Mesh(Box[0:1, 0:1], None, [n, n])
X, Y = np.asarray(mesh._grid_np[0]), np.asarray(mesh._grid_np[1])
g = 1.0 + X + 2.0 * Y
phi = np.sin(np.pi*X)*np.sin(np.pi*Y)
rhs = (-2*np.pi**2*g*phi) + np.pi*np.cos(np.pi*X)*np.sin(np.pi*Y) \
      + 2*np.pi*np.sin(np.pi*X)*np.cos(np.pi*Y)
var = Field("t", 1, mesh, {"domain": homogeneous_bcs(2, 0.0, "dirichlet")}, init_val=0.0)
s = Solver({"fdm": {"method": "cg", "tol": 1e-9, "max_it": 500,
                    "report": False, "criterion": "residual", "precond": "mg"}})
fdm = FDM()
t0 = time.perf_counter()
s.set_eq(fdm.laplacian(jnp.asarray(g), var) == jnp.asarray(rhs)[None])
rep = s.solve()
err = float(np.linalg.norm(np.asarray(var()[0]) - phi) / np.linalg.norm(phi))
print(json.dumps({"converge": bool(rep["converge"]), "itr": int(rep["itr"]),
                  "rel_err": err, "wall_s": round(time.perf_counter()-t0, 2)}))
assert rep["converge"] and err < 1e-3
"""

STRIDED = r"""
import json, os, time
import jax, jax.numpy as jnp
from pyapes_tpu.backend import enable_compilation_cache
enable_compilation_cache()
from pyapes_tpu.geometry import Box
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.solver.fdm import FDM
from pyapes_tpu.solver.ops import Solver
from pyapes_tpu.variables import Field
from pyapes_tpu.variables.bcs import homogeneous_bcs
n = 512
mesh = Mesh(Box[0:1, 0:1, 0:1], None, [n, n, n], device="tpu", dtype="single")
var = Field("p", 1, mesh, {"domain": homogeneous_bcs(3, 0.0, "dirichlet")}, init_val=0.0)
rhs = jax.random.normal(jax.random.PRNGKey(0), (1, n, n, n), dtype=var().dtype)
res = {}
for t in ("matrix", "strided"):
    cfg = {"method": "cg", "tol": 1e-6, "max_it": 100, "report": False,
           "criterion": "residual", "precond": "mg",
           "mg_opts": {"dtype": "bfloat16", "n_pre": 2, "n_post": 2,
                        "omega": 0.857, "fmg": True, "fuse_rz": True,
                        "transfers": t}}
    s = Solver({"fdm": cfg}); fdm = FDM()
    def once():
        var.set_var_tensor(jnp.zeros_like(var()))
        s.set_eq(fdm.laplacian(1.0, var) == rhs)
        s.solve()
        return s.report
    rep = once()
    walls = []
    for _ in range(3):
        tic = time.perf_counter(); rep = once()
        walls.append(time.perf_counter() - tic)
    res[t] = {"itr": int(rep["itr"]), "wall_s": round(min(walls), 4)}
print(json.dumps(res))
"""

POWERLAW = r"""
import json, time
import numpy as np, jax.numpy as jnp
from pyapes_tpu.backend import enable_compilation_cache
enable_compilation_cache()
from pyapes_tpu.geometry import Box
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.solver.fdm import FDM
from pyapes_tpu.solver.ops import Solver
from pyapes_tpu.variables import Field
from pyapes_tpu.variables.bcs import mixed_bcs
nn = 65
mesh = Mesh(Box[0:1, 0:1], None, [nn, nn])
bcs_cfg = mixed_bcs([0.0]*4, ["neumann", "neumann", "dirichlet", "dirichlet"])
fdm = FDM()
s = Solver({"fdm": {"method": "bicgstab", "tol": 1e-10, "max_it": 2000,
                    "report": False, "criterion": "residual", "precond": "mg"}})
var = Field("u", 1, mesh, {"domain": bcs_cfg}, init_val=0.0)
rhs = jnp.full((1, nn, nn), -1.0)
dy = float(mesh.dx_np[1]); u = np.zeros((nn, nn))
t0 = time.perf_counter()
for _ in range(40):
    dudy = np.gradient(u, dy, axis=1)
    mu = np.minimum((dudy**2 + 1e-16) ** -0.25, 1e4)
    var.set_var_tensor(jnp.asarray(u)[None])
    s.set_eq(fdm.laplacian(jnp.asarray(mu), var) == rhs)
    rep = s.solve()
    u = np.asarray(var()[0])
Y = np.asarray(mesh._grid_np[1])
exact = (0.5/1.5) * (0.5**3 - np.abs(Y-0.5)**3)
err = float(np.linalg.norm(u-exact)/np.linalg.norm(exact))
print(json.dumps({"rel_err": err, "wall_s": round(time.perf_counter()-t0, 2),
                  "converge": bool(rep["converge"])}))
"""


def main():
    record("start", {"note": "tpu roundup"})
    # 0. is the chip reachable at all?
    run_py("tpu_probe", "import jax, json; print(json.dumps({'devices': str(jax.devices())}))", timeout=180)
    # 1. var-gamma e2e
    run_py("vargamma_e2e_129", PROBE, timeout=1800)
    # 2. headline bench
    t0 = time.time()
    p = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                       text=True, timeout=1800, cwd=ROOT)
    try:
        record("bench_headline", {**json.loads(p.stdout.strip().splitlines()[-1]),
                                  "wall_s_total": round(time.time()-t0, 1)})
    except Exception:
        record("bench_headline", {"error": p.stderr.strip()[-400:]})
    # 3. darcy bench: jnp vs pallas kernel
    for kern, envv in (
        ("auto", {}),
        ("jnp", {"PYAPES_BENCH_KERNEL": "jnp"}),
    ):
        e = {"PYAPES_BENCH_CASE": "darcy"}
        e.update(envv)
        t0 = time.time()
        p = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                           text=True, timeout=1800, cwd=ROOT,
                           env={**os.environ, **e})
        try:
            record(f"bench_darcy_{kern}",
                   {**json.loads(p.stdout.strip().splitlines()[-1]),
                    "wall_s_total": round(time.time()-t0, 1)})
        except Exception:
            record(f"bench_darcy_{kern}", {"error": p.stderr.strip()[-400:]})
    # 4. strided vs matrix transfers
    run_py("mg_transfers_512", STRIDED, timeout=2400)
    # 5. rheology probe
    run_py("power_law_poiseuille", POWERLAW, timeout=1200)
    record("done", {})


if __name__ == "__main__":
    main()
