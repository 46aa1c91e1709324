"""Manufactured solutions / BCs for the N-D Poisson equation
(reference ``pyapes/testing/poisson.py``).

References:
    - 1D: https://farside.ph.utexas.edu/teaching/329/lectures/node66.html
    - 2D: https://farside.ph.utexas.edu/teaching/329/lectures/node71.html
    - 3D: Zhi Shi et al (2012)
"""
from __future__ import annotations

from math import pi

import jax.numpy as jnp

from pyapes_tpu.geometry.basis import FDIR
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.variables import Field
from pyapes_tpu.variables.bcs import BCConfig


def poisson_rhs_nd(mesh: Mesh, var: Field) -> jnp.ndarray:
    """RHS of the Poisson equation (reference ``poisson.py:20-33``)."""
    rhs = jnp.zeros_like(var())
    if mesh.dim == 1:
        rhs = rhs.at[0].set(1.0 - 2.0 * mesh.X**2)
    elif mesh.dim == 2:
        rhs = rhs.at[0].set(
            6.0 * mesh.X * mesh.Y * (1.0 - mesh.Y) - 2.0 * (mesh.X**3)
        )
    else:
        rhs = rhs.at[0].set(
            jnp.sin(pi * mesh.X) * jnp.sin(pi * mesh.Y) * jnp.sin(pi * mesh.Z)
        )
    return rhs


def poisson_exact_nd(mesh: Mesh) -> jnp.ndarray:
    """Exact solution (reference ``poisson.py:36-50``)."""
    if mesh.dim == 1:
        return 7.0 / 9.0 - 2.0 / 9.0 * mesh.X + mesh.X**2 / 2.0 - mesh.X**4 / 6.0
    elif mesh.dim == 2:
        return mesh.Y * (1.0 - mesh.Y) * (mesh.X**3)
    return (
        -1.0
        / (3 * pi**2)
        * jnp.sin(pi * mesh.X)
        * jnp.sin(pi * mesh.Y)
        * jnp.sin(pi * mesh.Z)
    )


def poisson_bcs(dim: int = 3, debug: bool = False) -> list[BCConfig]:
    """Dirichlet BC configuration for the N-D Poisson problem
    (reference ``poisson.py:53-74``)."""
    bc_config: list[BCConfig] = []
    for i in range(dim * 2):
        if dim == 1:
            bc_val = poisson_1d_bc
        elif dim == 2:
            bc_val = poisson_2d_bc
        else:
            bc_val = 0.0
        bc_config.append(
            {
                "bc_face": FDIR[i],
                "bc_type": "dirichlet",
                "bc_val": 4.44 if debug else bc_val,
            }
        )
    return bc_config


def poisson_1d_bc(grid, mask, *_) -> jnp.ndarray:
    """Full-grid evaluation; the BC machinery slices the face row
    (callable convention of ``pyapes_tpu.variables.bcs``)."""
    x = grid[0]
    return 7.0 / 9.0 - 2.0 / 9.0 * x + x**2 / 2.0 - x**4 / 6.0


def poisson_2d_bc(grid, mask, *_) -> jnp.ndarray:
    return grid[1] * (1.0 - grid[1]) * (grid[0] ** 3)
