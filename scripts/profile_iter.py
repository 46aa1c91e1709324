#!/usr/bin/env python3
"""Decompose the 512^3 PCG iteration cost on the real chip.

Each piece is repped REPS times INSIDE one jitted ``lax.fori_loop`` (one
dispatch, one readback) — per-call dispatch through the axon tunnel costs
~35 ms RTT, which buries ms-scale kernels if reps are chained host-side.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyapes_tpu.backend import enable_compilation_cache
from pyapes_tpu.solver.multigrid import MGSpec
from pyapes_tpu.ops.pallas_stencil_db import pallas_axis_stencil_dot

N = int(os.environ.get("N", "512"))
REPS = int(os.environ.get("REPS", "20"))
ONLY = os.environ.get("ONLY", "")


def timeit(name, piece, x0, *extras):
    """piece: (x, *extras) -> x-like. Times REPS chained calls in one jit.
    ``extras`` ride as jit ARGUMENTS (captured constants would be shipped
    through the remote compile service — 2 GB uploads hang it)."""

    @jax.jit
    def loop(x, *es):
        return jax.lax.fori_loop(
            0, REPS, lambda i, x: piece(x, *es), x
        )

    out = loop(x0, *extras)
    float(out.ravel()[0])  # compile + sync
    tic = time.perf_counter()
    out = loop(x0, *extras)
    float(out.ravel()[0])
    dt = (time.perf_counter() - tic) / REPS * 1e3
    print(f"{name:40s} {dt:8.3f} ms", flush=True)
    return dt


def main():
    enable_compilation_cache()
    shape = (N, N, N)
    key = jax.random.PRNGKey(0)
    r = jax.random.normal(key, (1,) + shape, dtype=jnp.float32)

    dx = 1.0 / (N - 1)
    inv = 1.0 / dx**2
    v = jnp.full((N,), inv, jnp.float32)
    coeffs = tuple((v, -2.0 * v, v) for _ in range(3))

    spec = MGSpec(
        shape, [1.0, 1.0, 1.0], dtype=jnp.float32, use_pallas=True,
        cycle_dtype="bfloat16", n_pre=2, n_post=2, omega=0.857,
        fmg=True, fuse_rz=True,
    )

    def want(tag):
        return not ONLY or tag in ONLY.split(",")

    if want("apply"):
        def apply_dot(u):
            out, _ = pallas_axis_stencil_dot(coeffs, u)
            return out * 1e-7  # keep magnitudes bounded across reps

        timeit("Aop_dot (fused apply+dot, +1 scale pass)", apply_dot, r)

    if want("cycle"):
        pd = spec.preconditioner_dot()

        def pshell(u):
            z, rz = pd(u)
            return z

        timeit("precond_dot f32 shell (cast incl.)", pshell, r)

    if want("barecycle"):
        rb = r.astype(jnp.bfloat16)

        def bare(u):
            z, _ = spec._vcycle_dot(u)
            return z

        timeit("bare bf16 V(2,2)+dot cycle", bare, rb)

    if want("axpy"):
        d0 = jax.random.normal(jax.random.PRNGKey(1), r.shape, jnp.float32)
        Ad0 = jax.random.normal(jax.random.PRNGKey(2), r.shape, jnp.float32)
        z0 = jax.random.normal(jax.random.PRNGKey(3), r.shape, jnp.float32)

        def cg_updates(x, rr, dd, Ad, z):
            alpha = 0.3
            xn = x + alpha * dd
            rn = rr - alpha * Ad
            tol = jnp.sqrt(jnp.sum(rn * rn))
            dn = z + 0.5 * dd
            return xn * 1e-3 + rn * 1e-3 + dn * 1e-3 + 0.0 * tol

        timeit("CG axpy chain (x,r,norm,d)", cg_updates, r, r, d0, Ad0, z0)

    if want("cast"):
        def shell(u):
            s = jnp.max(jnp.abs(u))
            s = jnp.where(s > 0, s, 1.0)
            vb = (u / s).astype(jnp.bfloat16)
            return vb.astype(jnp.float32) * s

        timeit("old cast shell (max+down+up)", shell, r)

        def shell2(u):
            return u.astype(jnp.bfloat16).astype(jnp.float32)

        timeit("bare cast down+up", shell2, r)

    if want("mask"):
        M = jnp.ones(r.shape, jnp.float32)

        def maskmul(u):
            return u * M

        timeit("mask multiply (1 full pass)", maskmul, r)

    if want("copy"):
        timeit("pure copy (2 passes: r+w)", lambda u: u + 1.0, r)


if __name__ == "__main__":
    main()
