"""Differentiable-solve demo: recover the source amplitudes of a Poisson
problem from an observed solution by gradient descent.

Every gradient evaluation costs ONE extra (adjoint) CG solve via
``jax.lax.custom_linear_solve`` — gradients never differentiate through
the Krylov iterations (``pyapes_tpu/solver/adjoint.py``). The torch
reference has no differentiable-solver capability at all.

Run:  python demos/adjoint_inverse_source.py
"""
import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), ".."))
)
import jax
import jax.numpy as jnp
import numpy as np

from pyapes_tpu.geometry import Box
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.ops.stencil import laplacian_axis_coeffs
from pyapes_tpu.solver import DifferentiableSolve
from pyapes_tpu.variables import Field
from pyapes_tpu.variables.bcs import homogeneous_bcs


def main() -> None:
    n = 33
    mesh = Mesh(Box[0:1, 0:1], None, [n, n])
    var = Field("p", 1, mesh,
                {"domain": homogeneous_bcs(2, 0.0, "dirichlet"),
                 "obstacle": None})
    coeffs = laplacian_axis_coeffs(mesh, var.bcs)
    dsolve = DifferentiableSolve(mesh, var.bcs, tol=1e-10)

    # ground truth: three sources with unknown amplitudes
    locs = [(8, 24), (16, 10), (25, 20)]
    basis = jnp.stack([
        jnp.zeros((1, n, n)).at[0, i, j].set(1.0) for i, j in locs
    ])
    a_true = jnp.asarray([-3.0, 1.5, 2.0])
    x_obs = dsolve(coeffs, jnp.einsum("k,kcij->cij", a_true, basis))

    def loss(a):
        x = dsolve(coeffs, jnp.einsum("k,kcij->cij", a, basis))
        return jnp.sum((x - x_obs) ** 2)

    g = jax.jit(jax.grad(loss))
    a = jnp.zeros(3)
    lr = 5e3
    for it in range(300):
        a = a - lr * g(a)
        if it % 50 == 0:
            print(f"it {it:3d}  loss {float(loss(a)):.3e}  a {np.asarray(a)}")
    print("recovered:", np.asarray(a), " true:", np.asarray(a_true))
    assert np.allclose(np.asarray(a), np.asarray(a_true), atol=1e-2)
    print("OK")


if __name__ == "__main__":
    main()
