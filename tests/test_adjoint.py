"""Differentiable (adjoint) solves: gradients via implicit differentiation
(`solver/adjoint.py`) — a capability the torch reference has no analogue
for. Gradients are validated against central finite differences."""
import jax
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from pyapes_tpu.geometry import Box
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.ops.stencil import laplacian_axis_coeffs
from pyapes_tpu.solver.adjoint import DifferentiableSolve
from pyapes_tpu.variables import Field
from pyapes_tpu.variables.bcs import homogeneous_bcs, mixed_bcs


def _setup(n=17, bc_types=("dirichlet",) * 4):
    mesh = Mesh(Box[0:1, 0:1], None, [n, n])
    f_bc = mixed_bcs([0.0] * 4, list(bc_types))
    var = Field("p", 1, mesh, {"domain": f_bc, "obstacle": None},
                init_val=0.0)
    coeffs = laplacian_axis_coeffs(mesh, var.bcs)
    dsolve = DifferentiableSolve(mesh, var.bcs, tol=1e-12, max_it=2000)
    rng = np.random.default_rng(0)
    rhs = jnp.asarray(rng.standard_normal((1, n, n)))
    return mesh, var, coeffs, dsolve, rhs


def test_forward_matches_plain_solver() -> None:
    """The differentiable wrapper solves the same system as the plain
    solver machinery (identical operator + interior restriction)."""
    from pyapes_tpu.solver.fdm import FDM
    from pyapes_tpu.solver.ops import Solver

    mesh, var, coeffs, dsolve, rhs = _setup()
    x = dsolve(coeffs, rhs)

    solver = Solver({"fdm": {"method": "cg", "tol": 1e-12, "max_it": 2000,
                             "report": False, "criterion": "residual"}})
    fdm = FDM()
    solver.set_eq(fdm.laplacian(1.0, var) == rhs)
    solver.solve()
    assert_allclose(np.asarray(x), np.asarray(var()), atol=1e-9)


def test_grad_wrt_rhs_vs_finite_difference() -> None:
    """d/d(rhs) of sum(x^2): adjoint gradient == central differences."""
    mesh, var, coeffs, dsolve, rhs = _setup()

    def loss(b):
        return jnp.sum(dsolve(coeffs, b) ** 2)

    g = np.asarray(jax.grad(loss)(rhs))
    eps = 1e-5
    rng = np.random.default_rng(1)
    for _ in range(4):
        i, j = rng.integers(1, 16, size=2)
        e = jnp.zeros_like(rhs).at[0, i, j].set(1.0)
        fd = (float(loss(rhs + eps * e)) - float(loss(rhs - eps * e))) / (
            2 * eps
        )
        assert_allclose(g[0, i, j], fd, rtol=2e-5, atol=1e-8)


def test_grad_wrt_coefficients() -> None:
    """Gradients flow to the stencil coefficients (e.g. a conductivity
    scale): d/d(gamma) of sum(x) with A = gamma * Laplacian."""
    mesh, var, coeffs, dsolve, rhs = _setup()

    def loss(gamma):
        scaled = tuple(
            tuple(gamma * c for c in cs) for cs in coeffs
        )
        return jnp.sum(dsolve(scaled, rhs))

    g = float(jax.grad(loss)(2.0))
    eps = 1e-4
    fd = (float(loss(2.0 + eps)) - float(loss(2.0 - eps))) / (2 * eps)
    assert_allclose(g, fd, rtol=1e-5)
    # analytic: x = A^-1 b / gamma  =>  d sum(x)/d gamma = -sum(x)/gamma
    x_sum = float(loss(2.0))
    assert_allclose(g, -x_sum / 2.0, rtol=1e-6)


def test_grad_nonlinear_loss_and_value_gate() -> None:
    """A nonlinear functional of the solution still matches finite
    differences; non-homogeneous BC values are rejected with a clear
    message (the solve must be a linear map for the IFT adjoint)."""
    import pytest

    mesh, var, coeffs, dsolve, rhs = _setup()

    def loss(b):
        return jnp.sum(jnp.sin(dsolve(coeffs, b)))

    g = np.asarray(jax.grad(loss)(rhs))
    eps = 1e-5
    e = jnp.zeros_like(rhs).at[0, 7, 9].set(1.0)
    fd = (float(loss(rhs + eps * e)) - float(loss(rhs - eps * e))) / (
        2 * eps
    )
    assert_allclose(g[0, 7, 9], fd, rtol=5e-5, atol=1e-8)

    mesh2 = Mesh(Box[0:1, 0:1], None, [17, 17])
    f_bc = mixed_bcs([1.0, 0.0, 0.0, 0.0], ["dirichlet"] * 4)
    var2 = Field("p", 1, mesh2, {"domain": f_bc, "obstacle": None})
    with pytest.raises(AssertionError, match="homogeneous"):
        DifferentiableSolve(mesh2, var2.bcs)


def test_inverse_problem_source_recovery() -> None:
    """End-to-end inverse problem: recover the amplitudes of two sources
    at known locations by gradient descent on the solution mismatch —
    the flagship use of the adjoint capability (each gradient is ONE
    extra adjoint solve, never differentiation through CG iterations)."""
    mesh, var, coeffs, dsolve, _ = _setup()
    e1 = jnp.zeros((1, 17, 17)).at[0, 5, 11].set(1.0)
    e2 = jnp.zeros((1, 17, 17)).at[0, 12, 4].set(1.0)
    a_true = jnp.asarray([-3.0, 2.0])
    x_obs = dsolve(coeffs, a_true[0] * e1 + a_true[1] * e2)

    def loss(a):
        return jnp.sum((dsolve(coeffs, a[0] * e1 + a[1] * e2) - x_obs) ** 2)

    g_fn = jax.jit(jax.grad(loss))
    a = jnp.zeros(2)
    lr = 3e3
    for _ in range(200):
        a = a - lr * g_fn(a)
    assert_allclose(np.asarray(a), np.asarray(a_true), atol=1e-2)


def test_transpose_axis_coeffs_is_exact() -> None:
    """The analytic stencil transpose equals jax.linear_transpose of the
    roll-based apply (the math the adjoint pass relies on)."""
    from pyapes_tpu.ops.stencil import apply_axis_stencil
    from pyapes_tpu.solver.adjoint import transpose_axis_coeffs

    rng = np.random.default_rng(5)
    coeffs = tuple(
        tuple(jnp.asarray(rng.standard_normal(n)) for _ in range(3))
        for n in (9, 11)
    )
    x = jnp.asarray(rng.standard_normal((1, 9, 11)))
    y = jnp.asarray(rng.standard_normal((1, 9, 11)))
    f = lambda v: apply_axis_stencil(coeffs, v)
    fT = jax.linear_transpose(f, x)
    (via_jax,) = fT(y)
    via_analytic = apply_axis_stencil(transpose_axis_coeffs(coeffs), y)
    assert_allclose(np.asarray(via_analytic), np.asarray(via_jax),
                    atol=1e-12)


def test_grad_mixed_neumann_poisson() -> None:
    """Round-3 scope extension: mixed Dirichlet/Neumann Poisson solves
    differentiate correctly (the surgered operator is nonsymmetric; the
    adjoint uses the transpose solve). Grad vs finite differences."""
    from pyapes_tpu.ops.stencil import laplacian_axis_coeffs

    mesh = Mesh(Box[0:1, 0:1], None, [17, 17])
    f_bc = mixed_bcs(
        [0.0, 0.0, 0.0, 0.0],
        ["neumann", "dirichlet", "neumann", "dirichlet"],
    )
    var = Field("p", 1, mesh, {"domain": f_bc, "obstacle": None})
    coeffs = laplacian_axis_coeffs(mesh, var.bcs)
    dsolve = DifferentiableSolve(mesh, var.bcs, tol=1e-12)
    rng = np.random.default_rng(2)
    rhs = jnp.asarray(rng.standard_normal((1, 17, 17)))

    def loss(b):
        return jnp.sum(dsolve(coeffs, b) ** 2)

    g = np.asarray(jax.grad(loss)(rhs))
    eps = 1e-6
    for idx in ((0, 5, 7), (0, 1, 8), (0, 15, 3)):
        e = jnp.zeros_like(rhs).at[idx].set(1.0)
        fd = (float(loss(rhs + eps * e)) - float(loss(rhs - eps * e))) / (
            2 * eps
        )
        # atol sits above the central-difference roundoff floor
        # (~|loss| * 2^-52 / eps ~ 1e-7 here): the check validates
        # the adjoint, not the FD probe's own noise
        assert_allclose(g[idx], fd, rtol=2e-4, atol=5e-7)


def test_grad_advection_diffusion_transport_step() -> None:
    """Round-3 scope extension: a FULL implicit advection-diffusion
    transport step ``(I/dt + u d/dx - nu lap) x = b/dt`` (nonsymmetric)
    differentiates; grads w.r.t. the previous state match finite
    differences — the building block for adjoint optimization of
    transient transport."""
    from pyapes_tpu.ops.stencil import (
        div_axis_coeffs,
        laplacian_axis_coeffs,
    )

    mesh = Mesh(Box[0:1, 0:1], None, [17, 17])
    f_bc = mixed_bcs([0.0] * 4, ["dirichlet"] * 4)
    var = Field("c", 1, mesh, {"domain": f_bc, "obstacle": None})
    nu, u, dt = 0.05, 1.0, 0.1
    lap = laplacian_axis_coeffs(mesh, var.bcs)
    div = div_axis_coeffs(mesh, var.bcs, u, "none")
    # (I/dt + u d/dx - nu lap): fold 1/dt into axis-0 center vector
    coeffs = tuple(
        (
            div[j][0] - nu * lap[j][0],
            div[j][1] - nu * lap[j][1]
            + (1.0 / dt if j == 0 else 0.0),
            div[j][2] - nu * lap[j][2],
        )
        for j in range(2)
    )
    dsolve = DifferentiableSolve(mesh, var.bcs, tol=1e-12)
    rng = np.random.default_rng(8)
    c0 = jnp.asarray(rng.standard_normal((1, 17, 17)))

    def step_loss(c):
        c1 = dsolve(coeffs, c / dt)
        return jnp.sum((c1 - 0.3) ** 2)

    g = np.asarray(jax.grad(step_loss)(c0))
    eps = 1e-6
    for idx in ((0, 8, 8), (0, 3, 12)):
        e = jnp.zeros_like(c0).at[idx].set(1.0)
        fd = (
            float(step_loss(c0 + eps * e)) - float(step_loss(c0 - eps * e))
        ) / (2 * eps)
        # atol sits above the central-difference roundoff floor
        # (~|loss| * 2^-52 / eps ~ 1e-7 here): the check validates
        # the adjoint, not the FD probe's own noise
        assert_allclose(g[idx], fd, rtol=2e-4, atol=5e-7)


class TestDifferentiableDiffusionSolve:
    """Gradients w.r.t. the PER-POINT coefficient field Γ (permeability
    inversion primitive)."""

    def _setup(self, bc_types, n=17):
        from pyapes_tpu.geometry import Box
        from pyapes_tpu.mesh import Mesh
        from pyapes_tpu.variables import Field
        from pyapes_tpu.variables.bcs import mixed_bcs

        mesh = Mesh(Box[0:1, 0:1], None, [n, n])
        var = Field(
            "t", 1, mesh,
            {"domain": mixed_bcs([0.0] * 4, bc_types)}, init_val=0.0,
        )
        return mesh, var

    def _check_directional(self, dsolve, gamma, rhs, seed=0):
        rng = np.random.default_rng(seed)
        target = jnp.asarray(rng.standard_normal(rhs.shape))

        def loss(g):
            x = dsolve(g, rhs)
            return jnp.sum((x - target) ** 2)

        g = jax.grad(loss)(gamma)
        v = jnp.asarray(rng.standard_normal(gamma.shape))
        eps = 1e-4
        fd = (loss(gamma + eps * v) - loss(gamma - eps * v)) / (2 * eps)
        ad = jnp.sum(g * v)
        np.testing.assert_allclose(
            float(ad), float(fd), rtol=2e-4,
            err_msg=f"ad={float(ad)} fd={float(fd)}",
        )

    def test_grad_wrt_gamma_dirichlet(self):
        from pyapes_tpu.solver.adjoint import DifferentiableDiffusionSolve

        mesh, var = self._setup(["dirichlet"] * 4)
        X, Y = (np.asarray(g) for g in mesh._grid_np)
        gamma = jnp.asarray(1.0 + 0.5 * X + 0.3 * Y)
        rhs = jnp.asarray(
            np.sin(np.pi * X) * np.sin(np.pi * Y)
        )[None]
        dsolve = DifferentiableDiffusionSolve(
            mesh, var.bcs, tol=1e-12, symmetric=True
        )
        self._check_directional(dsolve, gamma, rhs)

    def test_grad_wrt_gamma_neumann_harmonic(self):
        """Neumann face (Γ-dependent nonsymmetric surgery) + the
        nonlinear-in-Γ harmonic face rule."""
        from pyapes_tpu.solver.adjoint import DifferentiableDiffusionSolve

        mesh, var = self._setup(
            ["neumann", "dirichlet", "dirichlet", "dirichlet"]
        )
        X, Y = (np.asarray(g) for g in mesh._grid_np)
        gamma = jnp.asarray(1.5 + 0.4 * X * Y)
        rhs = jnp.asarray(np.cos(np.pi * X) * np.sin(np.pi * Y))[None]
        dsolve = DifferentiableDiffusionSolve(
            mesh, var.bcs, tol=1e-12, avg="harmonic"
        )
        self._check_directional(dsolve, gamma, rhs, seed=1)

    def test_inversion_recovers_inclusion(self):
        """End-to-end permeability inversion: recover a low-K inclusion
        from full-field pressure observations by gradient descent on
        log K (positivity by construction)."""
        from pyapes_tpu.solver.adjoint import DifferentiableDiffusionSolve

        mesh, var = self._setup(["dirichlet"] * 4, n=17)
        X, Y = (np.asarray(g) for g in mesh._grid_np)
        k_true = np.where(
            (X - 0.5) ** 2 + (Y - 0.5) ** 2 < 0.15**2, 0.3, 1.0
        )
        rhs = jnp.asarray(np.ones_like(X))[None]
        dsolve = DifferentiableDiffusionSolve(
            mesh, var.bcs, tol=1e-10, symmetric=True
        )
        p_obs = dsolve(jnp.asarray(k_true), rhs)

        def loss(theta):
            x = dsolve(jnp.exp(theta), rhs)
            return jnp.sum((x - p_obs) ** 2)

        import optax

        theta = jnp.zeros_like(jnp.asarray(k_true))  # K = 1 everywhere
        l0 = float(loss(theta))
        opt = optax.adam(0.05)
        state = opt.init(theta)
        vg = jax.jit(jax.value_and_grad(loss))
        for _ in range(150):
            _, g = vg(theta)
            updates, state = opt.update(g, state)
            theta = optax.apply_updates(theta, updates)
        l1 = float(loss(theta))
        assert l1 < 1e-3 * l0, (l0, l1)
        # the recovered field must dip where the inclusion is
        k_rec = np.asarray(jnp.exp(theta))
        inside = (X - 0.5) ** 2 + (Y - 0.5) ** 2 < 0.12**2
        outside = (X - 0.5) ** 2 + (Y - 0.5) ** 2 > 0.25**2
        assert k_rec[inside].mean() < 0.7 * k_rec[outside & (X > 0) & (X < 1)].mean()


class TestDifferentiableTransient:
    """Round-4 VERDICT item 7: differentiate a TRANSIENT run end-to-end —
    N implicit steps in one lax.scan with jax.checkpoint-rematerialized
    reverse; gradients w.r.t. the physical parameter, the initial
    condition, and the per-point diffusivity field vs finite differences."""

    def _heat(self, n=17, dt=0.02, checkpoint=True):
        from pyapes_tpu.solver.adjoint import DifferentiableTransient

        mesh = Mesh(Box[0:1, 0:1], None, [n, n])
        f_bc = mixed_bcs([0.0] * 4, ["dirichlet"] * 4)
        var = Field("T", 1, mesh, {"domain": f_bc, "obstacle": None})
        lap = laplacian_axis_coeffs(mesh, var.bcs)

        def coeff_fn(nu):
            # A(nu) = -nu lap  =>  step solves (I/dt - nu lap) x1 = x/dt
            return tuple((-nu * ap, -nu * ac, -nu * am)
                         for ap, ac, am in lap)

        roll = DifferentiableTransient(
            mesh, var.bcs, coeff_fn, dt=dt, tol=1e-12,
            checkpoint=checkpoint,
        )
        rng = np.random.default_rng(3)
        x0 = jnp.asarray(rng.standard_normal((1, n, n)))
        X, Y = mesh.grid
        target = jnp.sin(np.pi * X) * jnp.sin(np.pi * Y)
        return roll, x0, target[None]

    def test_grad_wrt_nu_vs_fd(self):
        roll, x0, target = self._heat()
        n_steps = 5

        def loss(nu):
            xN = roll(nu, x0, n_steps)
            return jnp.sum((xN - target) ** 2)

        nu0 = jnp.asarray(0.05)
        g = float(jax.grad(loss)(nu0))
        eps = 1e-5
        fd = (float(loss(nu0 + eps)) - float(loss(nu0 - eps))) / (2 * eps)
        assert_allclose(g, fd, rtol=5e-5)

    def test_grad_wrt_initial_condition_vs_fd(self):
        roll, x0, target = self._heat()
        n_steps = 4

        def loss(x):
            return jnp.sum((roll(jnp.asarray(0.05), x, n_steps)
                            - target) ** 2)

        g = np.asarray(jax.grad(loss)(x0))
        eps = 1e-6
        for idx in ((0, 8, 8), (0, 4, 12)):
            e = jnp.zeros_like(x0).at[idx].set(1.0)
            fd = (float(loss(x0 + eps * e))
                  - float(loss(x0 - eps * e))) / (2 * eps)
            assert_allclose(g[idx], fd, rtol=2e-4, atol=1e-8)

    def test_checkpoint_matches_stored_reverse(self):
        """jax.checkpoint rematerialization changes memory, not values:
        gradients with and without it agree to roundoff."""
        roll_ck, x0, target = self._heat(checkpoint=True)
        roll_st, _, _ = self._heat(checkpoint=False)

        def loss_of(roll):
            return lambda nu: jnp.sum(
                (roll(nu, x0, 4) - target) ** 2
            )

        nu0 = jnp.asarray(0.07)
        g_ck = float(jax.grad(loss_of(roll_ck))(nu0))
        g_st = float(jax.grad(loss_of(roll_st))(nu0))
        assert_allclose(g_ck, g_st, rtol=1e-12)

    def test_recover_nu_from_trajectory(self):
        """Inverse problem: recover the diffusivity from one observed
        endpoint by descending the transient-adjoint gradient."""
        roll, x0, _ = self._heat()
        n_steps = 5
        nu_true = 0.08
        obs = roll(jnp.asarray(nu_true), x0, n_steps)

        def loss(nu):
            return jnp.sum((roll(nu, x0, n_steps) - obs) ** 2)

        gfn = jax.jit(jax.grad(loss))
        # secant iteration on g(nu) = 0 (loss is smooth and convex in nu
        # near the optimum; derivative-only root find needs no step size)
        nu0, nu1 = 0.02, 0.04  # bad initial guesses
        g0 = float(gfn(jnp.asarray(nu0)))
        for _ in range(12):
            g1 = float(gfn(jnp.asarray(nu1)))
            if g1 == g0:
                break
            nu0, nu1, g0 = nu1, nu1 - g1 * (nu1 - nu0) / (g1 - g0), g1
            if abs(nu1 - nu0) < 1e-10:
                break
        assert abs(nu1 - nu_true) < 1e-4, nu1

    def test_transient_gamma_grad_vs_fd(self):
        """Per-point Γ through N steps (DifferentiableTransientDiffusion):
        the transient permeability-inversion primitive."""
        from pyapes_tpu.solver.adjoint import (
            DifferentiableTransientDiffusion,
        )

        n, dt, n_steps = 13, 0.02, 3
        mesh = Mesh(Box[0:1, 0:1], None, [n, n])
        f_bc = mixed_bcs([0.0] * 4, ["dirichlet"] * 4)
        var = Field("T", 1, mesh, {"domain": f_bc, "obstacle": None})
        roll = DifferentiableTransientDiffusion(
            mesh, var.bcs, dt=dt, tol=1e-12
        )
        rng = np.random.default_rng(5)
        x0 = jnp.asarray(rng.standard_normal((1, n, n)))
        gamma = jnp.asarray(1.0 + 0.3 * rng.random((n, n)))

        def loss(g):
            return jnp.sum(roll(g, x0, n_steps) ** 2)

        grad = np.asarray(jax.grad(loss)(gamma))
        eps = 1e-6
        for idx in ((6, 6), (3, 9)):
            e = jnp.zeros_like(gamma).at[idx].set(1.0)
            fd = (float(loss(gamma + eps * e))
                  - float(loss(gamma - eps * e))) / (2 * eps)
            assert_allclose(grad[idx], fd, rtol=5e-4, atol=1e-9)
