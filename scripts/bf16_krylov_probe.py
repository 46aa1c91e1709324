#!/usr/bin/env python3
"""On-chip probe for the last ROADMAP perf lever: bf16 outer Krylov vectors.

The r2 calibration showed XLA's own bf16 copy runs at the same
PER-ELEMENT rate as f32 on this chip (so bf16 through plain XLA ops does
not buy bandwidth); the open question is whether the Pallas stencil
kernels' manual DMAs DO convert the halved bytes into halved time. This
script answers it with three measurements at 512^3, each
dependency-chained with a single value readback (``block_until_ready``
does not synchronize on the tunneled axon backend):

  1. pallas_axis_stencil_db apply: f32 vs bf16 input
  2. XLA axpy chain (the CG vector updates): f32 vs bf16
  3. mixed CG step shape: bf16 stencil apply + f32 reduction dot

Appends one JSON line per measurement to MEASURE_r3.jsonl.
Usage: timeout 1800 python scripts/bf16_krylov_probe.py
"""
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "MEASURE_r3.jsonl")


def record(name, payload):
    payload = {"step": name, "ts": time.time(), **payload}
    with open(OUT, "a") as f:
        f.write(json.dumps(payload) + "\n")
    print(json.dumps(payload), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pyapes_tpu.backend import enable_compilation_cache
    from pyapes_tpu.ops.pallas_stencil_db import pallas_axis_stencil_db

    enable_compilation_cache()
    n = int(os.environ.get("PYAPES_PROBE_N", "512"))
    reps = int(os.environ.get("PYAPES_PROBE_REPS", "20"))
    inv_dx2 = float((n - 1) ** 2)

    def chain_time(f, x0, reps=reps):
        o = f(x0)
        float(jnp.asarray(o).ravel()[0])  # compile + settle
        tic = time.perf_counter()
        for _ in range(reps):
            o = f(o)
        float(jnp.asarray(o).ravel()[0])
        return (time.perf_counter() - tic) / reps

    for dt_name in ("float32", "bfloat16"):
        dt = jnp.dtype(dt_name)
        ap = jnp.full((n,), inv_dx2, dt)
        ac = jnp.full((n,), -2.0 * inv_dx2, dt)
        coeffs = tuple((ap, ac, ap) for _ in range(3))
        x = jax.random.normal(jax.random.PRNGKey(0), (1, n, n, n), jnp.float32)
        x = x.astype(dt)

        # 1. stencil apply
        f = jax.jit(lambda v: pallas_axis_stencil_db(coeffs, v))
        t = chain_time(f, x)
        bw = 2 * n**3 * np.dtype(dt).itemsize / t / 1e9
        record(f"stencil_db_{dt_name}",
               {"n": n, "ms": round(t * 1e3, 3), "eff_gbps": round(bw, 1)})

        # 2. axpy chain (r' = r - alpha*q  /  d' = z + beta*d shapes)
        g = jax.jit(lambda v: v * jnp.asarray(0.999, dt)
                    + v * jnp.asarray(1e-4, dt))
        t = chain_time(g, x)
        bw = 2 * n**3 * np.dtype(dt).itemsize / t / 1e9
        record(f"axpy_{dt_name}",
               {"n": n, "ms": round(t * 1e3, 3), "eff_gbps": round(bw, 1)})

        # 3. apply + f32-accumulated dot (the d.(A d) of one CG iteration)
        def step(v):
            q = pallas_axis_stencil_db(coeffs, v)
            dAd = jnp.sum(v.astype(jnp.float32) * q.astype(jnp.float32))
            return q + (dAd * 1e-30).astype(dt)

        h = jax.jit(step)
        t = chain_time(h, x)
        record(f"apply_dot_{dt_name}", {"n": n, "ms": round(t * 1e3, 3)})

    record("bf16_probe_done", {})


if __name__ == "__main__":
    main()
