#!/usr/bin/env python3
"""Round-4 sequential on-chip measurement roundup -> MEASURE_r4.jsonl.

Each phase runs in its own subprocess (fresh jit caches, isolated
failures). Run from the repo root on a QUIET machine — compile times
through the tunneled service are host-CPU- and load-sensitive.

Phases:
  quick_ab   : QUICK 5-point apply, jnp roll-sum vs Pallas v5, 512^3
  (ydot_ab   : REMOVED in round 5 with the y-dot kernel tier)
  size_768   : fastdiag Poisson at 768^3 (vmem-fix validation)
  size_1024  : fastdiag Poisson at 1024^3 (expected HBM wall — records
               the failure mode)
  cache_ab   : 512^3 bench compile, no-cache vs cold persistent cache
  rz         : rz bench re-measure (FD-precond implicit steps)
  cavity     : fused cavity re-measure
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "MEASURE_r4.jsonl")


def emit(rec: dict) -> None:
    rec["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def phase_quick_ab() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pyapes_tpu.ops.pallas_stencil_v3 import (
        pallas_axis_stencil_v5, v5_supported,
    )
    from pyapes_tpu.ops.stencil import apply_axis_stencil

    n = 512
    shape = (n, n, n)
    assert v5_supported(shape, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1,) + shape, jnp.float32)
    rng = np.random.default_rng(3)
    coeffs = tuple(
        tuple(jnp.asarray(rng.standard_normal(n), jnp.float32)
              for _ in range(5))
        for _ in range(3)
    )

    def timed(fn, label):
        f = jax.jit(fn)
        y = f(x)
        float(y[0].ravel()[0])  # settle (block_until_ready no-op on axon)
        reps = 20
        tic = time.perf_counter()
        for _ in range(reps):
            y = f(y)  # dependency chain
        float(y[0].ravel()[0])
        dt = (time.perf_counter() - tic) / reps
        return dt, y

    t_jnp, y1 = timed(lambda v: apply_axis_stencil(coeffs, v), "jnp")
    t_pl, y2 = timed(lambda v: pallas_axis_stencil_v5(coeffs, v), "v5")
    emit({"phase": "quick_ab", "n": n, "jnp_ms": round(t_jnp * 1e3, 3),
          "pallas_v5_ms": round(t_pl * 1e3, 3),
          "speedup": round(t_jnp / t_pl, 2)})


def phase_size(n: int) -> None:
    env = dict(os.environ)
    env["PYAPES_BENCH_SINGLE"] = str(n)
    env["PYAPES_BENCH_MAXIT"] = "100"
    try:
        out = subprocess.run(
            [sys.executable, "bench.py"], env=env, capture_output=True,
            timeout=1500, text=True,
        )
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                r = json.loads(line)
                emit({"phase": f"size_{n}", **{k: r[k] for k in
                      ("n", "wall_s", "compile_s", "itr", "tol",
                       "converge", "dof_per_s") if k in r}})
                return
        tail = (out.stderr or "")[-600:]
        emit({"phase": f"size_{n}", "ok": False, "stderr_tail": tail})
    except subprocess.TimeoutExpired:
        emit({"phase": f"size_{n}", "ok": False, "error": "timeout"})


def phase_cache_ab() -> None:
    for label, extra in (("nocache", {}),
                         ("coldcache",
                          {"PYAPES_COMPILE_CACHE":
                           f"/tmp/r4cache_{os.getpid()}"})):
        env = dict(os.environ)
        env["PYAPES_BENCH_SINGLE"] = "512"
        env.update(extra)
        try:
            out = subprocess.run(
                [sys.executable, "bench.py"], env=env, capture_output=True,
                timeout=1500, text=True,
            )
            for line in out.stdout.splitlines():
                if line.startswith("{"):
                    r = json.loads(line)
                    emit({"phase": "cache_ab", "arm": label,
                          "compile_s": round(r["compile_s"], 1),
                          "wall_s": round(r["wall_s"], 4)})
                    break
            else:
                emit({"phase": "cache_ab", "arm": label, "ok": False,
                      "stderr_tail": (out.stderr or "")[-400:]})
        except subprocess.TimeoutExpired:
            emit({"phase": "cache_ab", "arm": label, "ok": False,
                  "error": "timeout"})


def phase_bench_case(case: str) -> None:
    env = dict(os.environ)
    env["PYAPES_BENCH_CASE"] = case
    try:
        out = subprocess.run(
            [sys.executable, "bench.py"], env=env, capture_output=True,
            timeout=2400, text=True,
        )
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                emit({"phase": case, **json.loads(line)})
                return
        emit({"phase": case, "ok": False,
              "stderr_tail": (out.stderr or "")[-400:]})
    except subprocess.TimeoutExpired:
        emit({"phase": case, "ok": False, "error": "timeout"})


def main() -> None:
    phase = os.environ.get("R4_PHASE")
    if phase == "quick_ab":
        phase_quick_ab()
        return
    # orchestrate: run in-repo subprocesses per phase
    here = os.path.abspath(__file__)
    for p in ("quick_ab",):
        env = dict(os.environ)
        env["R4_PHASE"] = p
        r = subprocess.run([sys.executable, here], env=env, timeout=2400)
        if r.returncode != 0:
            emit({"phase": p, "ok": False,
                  "error": f"exit {r.returncode}"})
    phase_size(768)
    phase_size(1024)
    phase_cache_ab()
    phase_bench_case("rz")
    phase_bench_case("cavity")


if __name__ == "__main__":
    main()
