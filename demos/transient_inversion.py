"""Transient inverse problem via the end-to-end adjoint (round 4).

Recover an unknown diffusivity ν AND a spatially-varying conductivity
field Γ(x) from a single observed endpoint of a transient heat run —
gradients flow through N implicit solves (one adjoint solve per step,
``jax.checkpoint``-rematerialized reverse; ``solver/adjoint.py``).

The torch reference cannot express any of this: its solvers mutate
state eagerly and are not differentiable (reference
``pyapes/solver/linalg.py:74-159``).

Run: ``python demos/transient_inversion.py`` (CPU-friendly, ~1 min).
"""
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
if "JAX_PLATFORMS" not in os.environ:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from pyapes_tpu.geometry import Box
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.ops.stencil import laplacian_axis_coeffs
from pyapes_tpu.solver.adjoint import (
    DifferentiableTransient,
    DifferentiableTransientDiffusion,
)
from pyapes_tpu.variables import Field
from pyapes_tpu.variables.bcs import mixed_bcs


def recover_nu() -> None:
    print("=== scalar diffusivity from one endpoint (secant on grad) ===")
    n, dt, n_steps = 17, 0.02, 6
    mesh = Mesh(Box[0:1, 0:1], None, [n, n])
    var = Field("T", 1, mesh,
                {"domain": mixed_bcs([0.0] * 4, ["dirichlet"] * 4),
                 "obstacle": None})
    lap = laplacian_axis_coeffs(mesh, var.bcs)

    def coeff_fn(nu):
        return tuple((-nu * ap, -nu * ac, -nu * am) for ap, ac, am in lap)

    roll = DifferentiableTransient(mesh, var.bcs, coeff_fn, dt=dt,
                                   tol=1e-12)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, n, n)))
    nu_true = 0.08
    obs = roll(jnp.asarray(nu_true), x0, n_steps)

    def loss(nu):
        return jnp.sum((roll(nu, x0, n_steps) - obs) ** 2)

    gfn = jax.jit(jax.grad(loss))
    nu0, nu1 = 0.02, 0.04
    g0 = float(gfn(jnp.asarray(nu0)))
    for it in range(12):
        g1 = float(gfn(jnp.asarray(nu1)))
        if g1 == g0 or abs(nu1 - nu0) < 1e-12:
            break
        nu0, nu1, g0 = nu1, nu1 - g1 * (nu1 - nu0) / (g1 - g0), g1
        print(f"  it {it}: nu = {nu1:.6f}")
    print(f"  recovered nu = {nu1:.6f} (true {nu_true}) "
          f"error {abs(nu1 - nu_true):.2e}")


def recover_gamma() -> None:
    print("=== per-point Gamma(x) from one endpoint (adam) ===")
    import optax

    n, dt, n_steps = 17, 0.02, 4
    mesh = Mesh(Box[0:1, 0:1], None, [n, n])
    var = Field("T", 1, mesh,
                {"domain": mixed_bcs([0.0] * 4, ["dirichlet"] * 4),
                 "obstacle": None})
    roll = DifferentiableTransientDiffusion(mesh, var.bcs, dt=dt,
                                            tol=1e-12)
    X, Y = np.asarray(mesh.X), np.asarray(mesh.Y)
    inside = (X - 0.5) ** 2 + (Y - 0.5) ** 2 < 0.2 ** 2
    g_true = jnp.asarray(np.where(inside, 0.3, 1.0))
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.standard_normal((1, n, n)))
    obs = roll(g_true, x0, n_steps)

    def loss(theta):
        return jnp.sum((roll(jnp.exp(theta), x0, n_steps) - obs) ** 2)

    theta = jnp.zeros((n, n))
    opt = optax.adam(0.1)
    state = opt.init(theta)
    vg = jax.jit(jax.value_and_grad(loss))
    l0 = float(loss(theta))
    for it in range(80):
        l, g = vg(theta)
        upd, state = opt.update(g, state)
        theta = optax.apply_updates(theta, upd)
    l1 = float(loss(theta))
    g_rec = np.asarray(jnp.exp(theta))
    print(f"  loss {l0:.3e} -> {l1:.3e}")
    print(f"  recovered Gamma inside inclusion: {g_rec[inside].mean():.3f}"
          f" (true 0.3), outside: {g_rec[~inside].mean():.3f} (true 1.0)")


if __name__ == "__main__":
    recover_nu()
    recover_gamma()
