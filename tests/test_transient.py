"""Transient (Ddt) and vector-field solver coverage."""
from math import pi

import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from pyapes_tpu.geometry import Box
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.solver.fdm import FDM
from pyapes_tpu.solver.ops import Solver
from pyapes_tpu.variables import Field
from pyapes_tpu.variables.bcs import homogeneous_bcs


def test_heat_equation_2d_analytic_decay() -> None:
    """u_t = alpha lap(u); the sin x sin y mode decays as
    exp(-2 alpha pi^2 t) — pins backward-Euler Ddt + Laplacian in time."""
    mesh = Mesh(Box[0:1, 0:1], None, [41, 41])
    alpha = 0.1

    var = Field(
        "T", 1, mesh,
        {"domain": homogeneous_bcs(2, 0.0, "dirichlet"), "obstacle": None},
    )
    u0 = jnp.sin(pi * mesh.X) * jnp.sin(pi * mesh.Y)
    var.set_var_tensor(u0[None])

    solver = Solver(
        {"fdm": {"method": "cg", "tol": 1e-10, "max_it": 2000,
                 "report": False, "criterion": "residual"}}
    )
    fdm = FDM()

    dt = 0.002
    n_steps = 50
    var.set_time(dt, 0.0)
    for _ in range(n_steps):
        var.save_old()
        solver.set_eq(fdm.ddt(var) - fdm.laplacian(alpha, var) == 0.0)
        solver.solve()
        var.update_time()

    t = var.t
    # Discrete decay rate differs from the PDE's by O(dx^2) + O(dt);
    # compare against the backward-Euler amplification of the DISCRETE
    # eigenvalue to pin the time integrator tightly.
    dx = float(mesh.dx_np[0])
    # discrete eigenvalue of the 5-point Laplacian for the (1,1) mode
    lam_h = alpha * (2 - 2 * np.cos(pi * dx)) / dx**2 * 2
    amp = (1.0 / (1.0 + dt * lam_h)) ** n_steps
    expected = amp * np.asarray(u0)

    assert_allclose(np.asarray(var()[0]), expected, atol=2e-4)
    # and loosely against the continuous solution
    cont = np.exp(-2 * alpha * pi**2 * t) * np.asarray(u0)
    assert_allclose(np.asarray(var()[0]), cont, atol=0.02)


def test_vector_field_solve() -> None:
    """A dim=2 Field solves like two independent scalar problems."""
    mesh = Mesh(Box[0:1, 0:1], None, [33, 33])
    bcs = homogeneous_bcs(2, 0.0, "dirichlet")

    rng = np.random.default_rng(3)
    rhs0 = rng.standard_normal((33, 33))
    rhs1 = rng.standard_normal((33, 33))

    # vector solve
    vec = Field("uv", 2, mesh, {"domain": bcs, "obstacle": None}, init_val=0.0)
    solver = Solver(
        {"fdm": {"method": "cg", "tol": 1e-10, "max_it": 3000,
                 "report": False, "criterion": "residual"}}
    )
    fdm = FDM()
    solver.set_eq(
        fdm.laplacian(1.0, vec) == jnp.asarray(np.stack([rhs0, rhs1]))
    )
    solver.solve()

    # component solves
    outs = []
    for rhs in (rhs0, rhs1):
        sc = Field("u", 1, mesh, {"domain": bcs, "obstacle": None},
                   init_val=0.0)
        s = Solver(
            {"fdm": {"method": "cg", "tol": 1e-10, "max_it": 3000,
                     "report": False, "criterion": "residual"}}
        )
        s.set_eq(fdm.laplacian(1.0, sc) == jnp.asarray(rhs[None]))
        s.solve()
        outs.append(np.asarray(sc()[0]))

    assert_allclose(np.asarray(vec()[0]), outs[0], atol=1e-7)
    assert_allclose(np.asarray(vec()[1]), outs[1], atol=1e-7)


def test_conv_operator_matches_manual() -> None:
    """fdm.conv(u, phi) == u_j d(phi_i)/dx_j (central, interior)."""
    from pyapes_tpu.solver.ops import Solver

    mesh = Mesh(Box[0:1, 0:1], None, [17, 17])
    X, Y = np.asarray(mesh.X), np.asarray(mesh.Y)

    u = Field("u", 2, mesh, None)
    u.set_var_tensor(jnp.asarray(np.stack([Y, -X])))  # rotation field
    phi = Field("phi", 2, mesh, None)
    phi.set_var_tensor(
        jnp.asarray(np.stack([X**2 + Y, X * Y]))
    )

    solver = Solver(None)
    fdm = FDM()
    solver.set_eq(fdm.conv(u, phi) == 0.0)
    out = np.asarray(solver.Aop(phi))

    dx = float(mesh.dx_np[0])

    def ddx(f, axis):
        return (np.roll(f, -1, axis) - np.roll(f, 1, axis)) / (2 * dx)

    for i, f in enumerate([X**2 + Y, X * Y]):
        expected = Y * ddx(f, 0) + (-X) * ddx(f, 1)
        np.testing.assert_allclose(
            out[i][1:-1, 1:-1], expected[1:-1, 1:-1], atol=1e-12
        )


def test_conv_neumann_nonzero_flux_wall() -> None:
    """Conv's Neumann RHS adjustment (round-1 gap: ``adjust_rhs: None`` at
    ``fdm.py:336-339`` silently dropped nonzero-flux walls).

    Steady MMS: u dp/dx - p'' = 2x^2 - 2 with u = x, p(0)=0,
    dp/dn(1) = 2 -> p = x^2; conv is the advective operator, so this pins
    the same math as Div advective form but through ``fdm.conv``.
    """
    from pyapes_tpu.variables.bcs import mixed_bcs

    mesh = Mesh(Box[0:1], None, [41])
    x = mesh.X
    u = Field("u", 1, mesh, None)
    u.set_var_tensor(x[None])

    f_bc = mixed_bcs([0.0, 2.0], ["dirichlet", "neumann"])
    var = Field("p", 1, mesh, {"domain": f_bc, "obstacle": None})
    fdm = FDM({"div": {"limiter": "none", "edge": False}})
    solver = Solver(
        {"fdm": {"method": "bicgstab", "tol": 1e-10, "max_it": 1000,
                 "report": False}}
    )
    rhs = (2.0 * x * x - 2.0)[None]
    solver.set_eq(fdm.conv(u, var) - fdm.laplacian(1.0, var) == rhs)
    solver.solve()
    assert_allclose(
        np.asarray(var()[0]), np.asarray(x) ** 2, rtol=1e-2, atol=5e-3
    )


def test_vector_burgers_2d() -> None:
    """BASELINE config 4 (2-D Burgers): the vector system
    u_t + (u.grad)u = nu lap(u) with conv + ddt stays stable and decays."""
    from pyapes_tpu.solver.ops import Solver

    mesh = Mesh(Box[0:1, 0:1], None, [33, 33])
    bcs = homogeneous_bcs(2, 0.0, "dirichlet")
    u = Field("u", 2, mesh, {"domain": bcs, "obstacle": None})
    X, Y = np.asarray(mesh.X), np.asarray(mesh.Y)
    u0 = np.stack([
        np.sin(np.pi * X) * np.sin(np.pi * Y),
        np.sin(2 * np.pi * X) * np.sin(np.pi * Y) * 0.5,
    ])
    u.set_var_tensor(jnp.asarray(u0))

    nu = 0.05
    solver = Solver(
        {"fdm": {"method": "bicgstab", "tol": 1e-9, "max_it": 2000,
                 "report": False, "picard": 2}}
    )
    fdm = FDM({"div": {"limiter": "upwind", "edge": False}})

    dt = 0.01
    u.set_time(dt, 0.0)
    e_prev = float(jnp.sum(u() ** 2))
    for _ in range(10):
        u.save_old()
        solver.set_eq(
            fdm.ddt(u) + fdm.conv(u, u) - fdm.laplacian(nu, u) == 0.0
        )
        solver.solve()
        u.update_time()
        e = float(jnp.sum(u() ** 2))
        assert np.isfinite(e)
        assert e < e_prev  # viscous decay, no blow-up
        e_prev = e


def _heat_1d_amplitude(scheme: str, dt: float, T: float) -> tuple:
    """March u_t = eps u_xx for the discrete sin(pi x) eigenmode; return
    (numeric amplitude, exact amplitude for the DISCRETE eigenvalue) so
    only the TEMPORAL error remains."""
    n = 65
    eps = 0.5
    mesh = Mesh(Box[0:1], None, [n])
    var = Field(
        "u", 1, mesh,
        {"domain": homogeneous_bcs(1, 0.0, "dirichlet"), "obstacle": None},
    )
    var.set_var_tensor(jnp.sin(pi * mesh.X)[None])
    solver = Solver(
        {"fdm": {"method": "cg", "tol": 1e-13, "max_it": 2000,
                 "report": False, "criterion": "residual"}}
    )
    fdm = FDM()
    var.set_time(dt, 0.0)
    for _ in range(round(T / dt)):
        var.save_old()
        solver.set_eq(
            fdm.ddt(var, scheme=scheme) - fdm.laplacian(eps, var) == 0.0
        )
        solver.solve()
        var.update_time()
    dx = 1.0 / (n - 1)
    lam = -4.0 * np.sin(pi * dx / 2.0) ** 2 / dx**2
    mid = n // 2
    a_num = float(var()[0][mid]) / float(np.sin(pi * 0.5))
    return a_num, float(np.exp(eps * lam * T))


def test_bdf2_second_order_in_time() -> None:
    """Halving dt cuts the BDF2 temporal error ~4x (second order) while
    backward Euler only halves it; BDF2 is also strictly more accurate."""
    T = 0.1
    errs = {}
    for scheme in ("euler", "bdf2"):
        for dt in (0.01, 0.005):
            a, a_ex = _heat_1d_amplitude(scheme, dt, T)
            errs[(scheme, dt)] = abs(a - a_ex)

    ratio_be = errs[("euler", 0.01)] / errs[("euler", 0.005)]
    ratio_b2 = errs[("bdf2", 0.01)] / errs[("bdf2", 0.005)]
    assert 1.7 < ratio_be < 2.4, ratio_be
    assert 3.2 < ratio_b2 < 5.0, ratio_b2
    assert errs[("bdf2", 0.01)] < errs[("euler", 0.01)] / 5
