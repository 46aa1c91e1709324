"""Exact solution of the 1-D viscous Burgers equation
(reference ``pyapes/testing/burgers.py``).

Reference: http://www.thevisualroom.com/burgers_equation.html
"""
from __future__ import annotations

from math import pi

import jax.numpy as jnp

from pyapes_tpu.mesh import Mesh


def burger_exact_nd(mesh: Mesh, nu: float, t: float) -> jnp.ndarray:
    """Travelling-wave exact solution (reference ``burgers.py:16-41``)."""
    if mesh.dim != 1:
        raise NotImplementedError

    x = mesh.X
    phi = jnp.exp(-((x - 4 * t) ** 2) / (4 * nu * (t + 1))) + jnp.exp(
        -((x - 4 * t - 2 * pi) ** 2) / (4 * nu * (t + 1))
    )
    dphi_dx = -(
        0.5 * (x - 4 * t) / (nu * (t + 1))
        * jnp.exp(-((x - 4 * t) ** 2) / (4 * nu * (t + 1)))
    ) - (
        0.5 * (x - 4 * t - 2 * pi) / (nu * (t + 1))
        * jnp.exp(-((x - 4 * t - 2 * pi) ** 2) / (4 * nu * (t + 1)))
    )
    return -2 * nu * dphi_dx / phi + 4
