"""Runtime-streamed BC values and content-keyed custom operators
(round-3 VERDICT item 2): time-varying BCs must not recompile.

The reference bakes BC values into each apply (``bcs.py:197-253``) and has
no compiled-solver cache at all; here the compiled ``lax.while_loop`` is
cached by problem STRUCTURE and scalar/array/callable BC values stream in
as runtime operands.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from pyapes_tpu.geometry import Box
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.solver import Solver, linalg
from pyapes_tpu.solver.fdm import FDM
from pyapes_tpu.variables import Field
from pyapes_tpu.variables.bcs import homogeneous_bcs, mixed_bcs


def _jit_cache_size(fn) -> int:
    try:
        return fn._cache_size()
    except AttributeError:  # checkify-wrapped or older jax
        return -1


def test_streamed_dirichlet_value_no_recompile() -> None:
    """Changing a Dirichlet value re-uses the one compiled solver (one
    cache entry, one jit trace) and produces the right boundary value."""
    linalg.clear_cache()
    n = 17
    mesh = Mesh(Box[0:1, 0:1], None, [n, n])
    fdm = FDM()
    for lid in (1.0, 2.5, -3.0):
        f = Field(
            "u", 1, mesh,
            {"domain": mixed_bcs([0.0, 0.0, 0.0, lid], ["dirichlet"] * 4)},
        )
        s = Solver({"fdm": {"method": "cg", "tol": 1e-8, "max_it": 500}})
        s.set_eq(fdm.laplacian(1.0, f) == jnp.zeros((1, n, n)))
        s.solve()
        assert abs(float(f()[0, n // 2, -1]) - lid) < 1e-6
    assert len(linalg._SOLVER_CACHE) == 1
    fn_c = next(iter(linalg._SOLVER_CACHE.values()))[0]
    assert _jit_cache_size(fn_c) in (1, -1)


def test_oscillating_lid_single_compile() -> None:
    """100 transient steps with a time-dependent callable BC (the
    oscillating-lid pattern) compile exactly once; the callable receives
    the field's current time through its ``t`` parameter."""
    linalg.clear_cache()
    n = 17
    mesh = Mesh(Box[0:1, 0:1], None, [n, n])
    fdm = FDM()
    seen_t = []

    def lid(grid, mask, var, opt, t):
        seen_t.append(t)
        return np.sin(2.0 * np.pi * t)

    bcs = [
        {"bc_face": fc, "bc_type": "dirichlet", "bc_val": 0.0,
         "bc_val_opt": None}
        for fc in ("xl", "xu", "yl")
    ] + [{"bc_face": "yu", "bc_type": "dirichlet", "bc_val": lid,
          "bc_val_opt": None}]
    f = Field("u", 1, mesh, {"domain": bcs})
    dt = 0.01
    f.set_time(dt, 0.0)
    s = Solver({"fdm": {"method": "cg", "tol": 1e-8, "max_it": 500}})
    for _ in range(100):
        f.save_old()
        s.set_eq(
            fdm.ddt(f) - fdm.laplacian(0.1, f) == jnp.zeros((1, n, n))
        )
        s.solve()
        f.update_time()
    assert len(linalg._SOLVER_CACHE) == 1
    fn_c = next(iter(linalg._SOLVER_CACHE.values()))[0]
    assert _jit_cache_size(fn_c) in (1, -1)
    # the callable saw the marching time and the lid actually moved
    assert seen_t[0] == pytest.approx(0.0)
    assert seen_t[-1] == pytest.approx(0.99, abs=1e-6)
    assert abs(
        float(f()[0, n // 2, -1]) - np.sin(2 * np.pi * 0.99)
    ) < 1e-6


def test_per_iteration_callable_opt_out() -> None:
    """``bc_val_opt={"per_iteration": True}`` keeps the reference's
    iterate-dependent semantics (value traced into the loop, content-keyed
    cache)."""
    linalg.clear_cache()
    n = 17
    mesh = Mesh(Box[0:1], None, [n])

    def follower(grid, mask, var, opt):
        # iterate-dependent: boundary chases the neighbor mean
        return 0.5 * jnp.mean(var)

    bcs = [
        {"bc_face": "xl", "bc_type": "dirichlet", "bc_val": 0.0,
         "bc_val_opt": None},
        {"bc_face": "xu", "bc_type": "dirichlet", "bc_val": follower,
         "bc_val_opt": {"per_iteration": True}},
    ]
    f = Field("u", 1, mesh, {"domain": bcs})
    fdm = FDM()
    s = Solver({"fdm": {"method": "cg", "tol": 1e-8, "max_it": 200}})
    s.set_eq(fdm.laplacian(1.0, f) == jnp.zeros((1, n)))
    rep = s.solve()
    assert rep["converge"]


def test_streamed_neumann_flux() -> None:
    """Streamed Neumann flux values: changing the flux re-uses the
    compiled solver and changes the solution slope."""
    linalg.clear_cache()
    n = 33
    mesh = Mesh(Box[0:1], None, [n])
    fdm = FDM()
    for flux in (0.5, 2.0):
        f = Field(
            "u", 1, mesh,
            {"domain": mixed_bcs([0.0, flux], ["dirichlet", "neumann"])},
        )
        s = Solver({"fdm": {"method": "cg", "tol": 1e-10, "max_it": 500}})
        s.set_eq(fdm.laplacian(1.0, f) == jnp.zeros((1, n)))
        s.solve()
        # laplace(u) = 0, u(0) = 0, u'(1) = flux -> u = flux * x
        x = np.linspace(0, 1, n)
        np.testing.assert_allclose(
            np.asarray(f()[0]), flux * x, atol=1e-5
        )
    assert len(linalg._SOLVER_CACHE) == 1


def test_custom_fn_content_key() -> None:
    """Two behaviorally-identical fresh closures for ``fdm.custom`` hit the
    same compiled solver (VERDICT r2: ``step_implicit`` used to recompile
    per call)."""
    linalg.clear_cache()
    n = 17
    mesh = Mesh(Box[0:1], None, [n])
    fdm = FDM()
    for _ in range(3):
        f = Field("u", 1, mesh,
                  {"domain": homogeneous_bcs(1, 0.0, "dirichlet")})

        def op(x):  # fresh object every loop, identical content
            return 2.0 * x

        s = Solver({"fdm": {"method": "bicgstab", "tol": 1e-8,
                            "max_it": 200}})
        s.set_eq(fdm.custom(op, f) == jnp.ones((1, n)))
        s.solve()
        np.testing.assert_allclose(
            np.asarray(f()[0][1:-1]), 0.5, atol=1e-6
        )
    assert len(linalg._SOLVER_CACHE) == 1


def test_solver_cache_bounded() -> None:
    """The compiled-solver cache is a bounded LRU."""
    assert linalg._SOLVER_CACHE_MAX <= 256
    linalg.clear_cache()
    n = 9
    mesh = Mesh(Box[0:1], None, [n])
    fdm = FDM()
    # distinct STRUCTURES (different tolerances) -> distinct entries
    for i in range(3):
        f = Field("u", 1, mesh,
                  {"domain": homogeneous_bcs(1, 0.0, "dirichlet")})
        s = Solver({"fdm": {"method": "cg", "tol": 10.0 ** (-6 - i),
                            "max_it": 200}})
        s.set_eq(fdm.laplacian(1.0, f) == jnp.ones((1, n)))
        s.solve()
    assert len(linalg._SOLVER_CACHE) == 3


def test_oscillating_lid_cavity_model() -> None:
    """The NS model's time-varying lid: a callable ``U(t)`` streams through
    the compiled momentum/pressure solvers — the whole run compiles once
    per solver structure."""
    from pyapes_tpu.models.navier_stokes import LidDrivenCavity

    linalg.clear_cache()
    n = 17
    mesh = Mesh(Box[0:1, 0:1], None, [n, n])
    model = LidDrivenCavity(
        mesh, nu=0.05,
        lid_velocity=lambda t: float(np.cos(2 * np.pi * t)),
    )
    n_before = None
    for i in range(6):
        model.step(0.02)
        if i == 1:
            n_before = len(linalg._SOLVER_CACHE)
    # no growth after the first full step's structures are compiled
    assert len(linalg._SOLVER_CACHE) == n_before
    # the lid actually follows U(t): boundary value of u == cos(2 pi t)
    lid_u = float(model.u()[0, n // 2, -1])
    assert abs(lid_u - np.cos(2 * np.pi * model.t)) < 1e-6


def test_dynamic_obstacle_mask_no_recompile() -> None:
    """Moving-body obstacles (round-3 item 10): a dynamic
    ObstacleDirichlet's mask streams as a runtime operand — translating
    the body re-uses the one compiled solver and the solution pins the
    NEW cells."""
    from pyapes_tpu.variables.bcs import ObstacleDirichlet

    linalg.clear_cache()
    n = 33
    mesh = Mesh(Box[0:1, 0:1], None, [n, n])
    f = Field("u", 1, mesh, {"domain": homogeneous_bcs(2, 0.0, "dirichlet")})
    body = np.zeros((n, n), dtype=bool)
    body[8:13, 8:13] = True
    obc = ObstacleDirichlet("body", 2.0, body, dynamic=True)
    f.bcs.append(obc)

    fdm = FDM()
    s = Solver({"fdm": {"method": "cg", "tol": 1e-8, "max_it": 500,
                        "criterion": "residual"}})

    sols = []
    for shift in (0, 6, 12):
        m = np.zeros((n, n), dtype=bool)
        m[8 + shift:13 + shift, 8:13] = True
        obc.bc_mask = m
        s.set_eq(fdm.laplacian(1.0, f) == jnp.zeros((1, n, n)))
        s.solve()
        sol = np.asarray(f()[0])
        # body cells pinned at the CURRENT position
        np.testing.assert_allclose(sol[m], 2.0, atol=1e-7)
        # previous position is free field again (solution decays there)
        sols.append(sol)
    assert len(linalg._SOLVER_CACHE) == 1
    fn_c = next(iter(linalg._SOLVER_CACHE.values()))[0]
    assert _jit_cache_size(fn_c) in (1, -1)
    # moving the body really changed the solution
    assert np.abs(sols[0] - sols[2]).max() > 0.5
    # old body cells are no longer pinned once the body moved on
    old_only = np.zeros((n, n), dtype=bool)
    old_only[8:13, 8:13] = True
    old_only[20:25, 8:13] = False
    assert np.abs(sols[2][8:13, 8:13] - 2.0).max() > 0.1
