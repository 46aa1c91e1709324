"""Conservative variable-coefficient Laplacian ``∂_j (Γ(x) ∂_j φ)``
(``fdm.laplacian(gamma_array, var)`` — implicit heterogeneous
diffusivity, beyond the reference's scalar-only coefficient,
``fdm.py:108-169``). Manufactured-solution verification for Dirichlet,
Neumann, and periodic faces, plus operator-level consistency with the
constant-coefficient stencil."""
import jax.numpy as jnp
import numpy as np
import pytest

from pyapes_tpu.geometry import Box
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.ops.stencil import (
    apply_axis_stencil,
    apply_diff_field,
    laplacian_axis_coeffs,
)
from pyapes_tpu.solver.fdm import FDM
from pyapes_tpu.solver.ops import Solver
from pyapes_tpu.variables import Field
from pyapes_tpu.variables.bcs import homogeneous_bcs, mixed_bcs


def _rel_l2(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.linalg.norm(a - b) / np.linalg.norm(b)


def test_diff_field_constant_gamma_matches_axis_stencil() -> None:
    """With constant Γ = c the conservative operator IS c ∇² — bit-level
    agreement with the per-axis-vector Laplacian on interior rows,
    including the Neumann boundary-node elimination."""
    mesh = Mesh(Box[0:1, 0:2], None, [17, 25])
    bcs_cfg = mixed_bcs(
        [0.0] * 4, ["neumann", "dirichlet", "dirichlet", "neumann"]
    )
    var = Field("t", 1, mesh, {"domain": bcs_cfg}, init_val=0.0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 17, 25)))

    c = 2.5
    ref = apply_axis_stencil(
        laplacian_axis_coeffs(mesh, var.bcs), x
    ) * c

    from pyapes_tpu.ops.stencil import div_surgery_info

    got = apply_diff_field(
        x,
        jnp.full((17, 25), c),
        tuple(1.0 / float(d) ** 2 for d in mesh.dx_np),
        div_surgery_info(var.bcs, 2),
    )
    # interior rows only: the axis-vector operator leaves unsurgered
    # garbage on the boundary planes (masked by the solver), while the
    # conservative form computes a one-sided value there
    np.testing.assert_allclose(
        np.asarray(got)[:, 1:-1, 1:-1],
        np.asarray(ref)[:, 1:-1, 1:-1],
        rtol=1e-5,
        atol=1e-6,
    )


@pytest.mark.parametrize("n", [33, 65])
def test_var_gamma_dirichlet_mms(n: int) -> None:
    """MMS: Γ = 1 + x + 2y, φ = sin(πx) sin(πy) on [0,1]² with
    homogeneous Dirichlet faces; all-Dirichlet variable-Γ is exactly SPD
    so CG applies."""
    mesh = Mesh(Box[0:1, 0:1], None, [n, n])
    X, Y = np.asarray(mesh._grid_np[0]), np.asarray(mesh._grid_np[1])
    g = 1.0 + X + 2.0 * Y
    phi = np.sin(np.pi * X) * np.sin(np.pi * Y)
    px = np.pi * np.cos(np.pi * X) * np.sin(np.pi * Y)
    py = np.pi * np.sin(np.pi * X) * np.cos(np.pi * Y)
    rhs = (-2.0 * np.pi**2 * g * phi) + 1.0 * px + 2.0 * py

    var = Field("t", 1, mesh,
                {"domain": homogeneous_bcs(2, 0.0, "dirichlet")},
                init_val=0.0)
    fdm = FDM()
    s = Solver({"fdm": {"method": "cg", "tol": 1e-9, "max_it": 3000,
                        "report": False, "criterion": "residual"}})
    s.set_eq(fdm.laplacian(jnp.asarray(g), var) == jnp.asarray(rhs)[None])
    rep = s.solve()
    assert rep["converge"], rep
    err = _rel_l2(var()[0], phi)
    assert err < (0.012 if n == 33 else 0.003), err
    if n == 65:
        test_var_gamma_dirichlet_mms.err65 = err


def test_var_gamma_neumann_mms() -> None:
    """MMS with a zero-flux face: φ = cos(πx) sin(πy) (∂φ/∂x = 0 at
    x=0 -> Neumann xl), Dirichlet elsewhere; the Γ-weighted elimination
    is nonsymmetric, so BiCGSTAB."""
    n = 65
    mesh = Mesh(Box[0:1, 0:1], None, [n, n])
    X, Y = np.asarray(mesh._grid_np[0]), np.asarray(mesh._grid_np[1])
    g = 1.5 + X + 0.5 * Y
    phi = np.cos(np.pi * X) * np.sin(np.pi * Y)
    px = -np.pi * np.sin(np.pi * X) * np.sin(np.pi * Y)
    py = np.pi * np.cos(np.pi * X) * np.cos(np.pi * Y)
    rhs = (-2.0 * np.pi**2 * g * phi) + 1.0 * px + 0.5 * py

    def xu_val(grid, mask, var, opt):
        return -jnp.sin(np.pi * grid[1])

    bcs_cfg = mixed_bcs(
        [0.0, xu_val, 0.0, 0.0],
        ["neumann", "dirichlet", "dirichlet", "dirichlet"],
    )
    var = Field("t", 1, mesh, {"domain": bcs_cfg}, init_val=0.0)
    fdm = FDM()
    s = Solver({"fdm": {"method": "bicgstab", "tol": 1e-9, "max_it": 3000,
                        "report": False, "criterion": "residual"}})
    s.set_eq(fdm.laplacian(jnp.asarray(g), var) == jnp.asarray(rhs)[None])
    rep = s.solve()
    assert rep["converge"], rep
    err = _rel_l2(var()[0], phi)
    assert err < 0.005, err


def test_var_gamma_periodic_mms() -> None:
    """Periodic x (torus-reduced; Γ reduced with it), Dirichlet y:
    φ = sin(2πx) sin(πy), Γ = 2 + cos(2πx)."""
    n = 65
    mesh = Mesh(Box[0:1, 0:1], None, [n, n])
    X, Y = np.asarray(mesh._grid_np[0]), np.asarray(mesh._grid_np[1])
    g = 2.0 + np.cos(2 * np.pi * X)
    gx = -2 * np.pi * np.sin(2 * np.pi * X)
    phi = np.sin(2 * np.pi * X) * np.sin(np.pi * Y)
    px = 2 * np.pi * np.cos(2 * np.pi * X) * np.sin(np.pi * Y)
    lap = -(4 * np.pi**2 + np.pi**2) * phi
    rhs = g * lap + gx * px

    bcs_cfg = mixed_bcs(
        [None, None, 0.0, 0.0],
        ["periodic", "periodic", "dirichlet", "dirichlet"],
    )
    var = Field("t", 1, mesh, {"domain": bcs_cfg}, init_val=0.0)
    fdm = FDM()
    s = Solver({"fdm": {"method": "cg", "tol": 1e-9, "max_it": 3000,
                        "report": False, "criterion": "residual"}})
    s.set_eq(fdm.laplacian(jnp.asarray(g), var) == jnp.asarray(rhs)[None])
    rep = s.solve()
    assert rep["converge"], rep
    err = _rel_l2(var()[0], phi)
    assert err < 0.005, err


def test_var_gamma_transient_and_guards() -> None:
    """ddt + variable-Γ diffusion steps without recompiling across dt
    changes; rz / nonzero-Neumann / obstacle guards raise cleanly."""
    n = 33
    mesh = Mesh(Box[0:1, 0:1], None, [n, n])
    X = np.asarray(mesh._grid_np[0])
    g = jnp.asarray(1.0 + X)
    var = Field("t", 1, mesh,
                {"domain": homogeneous_bcs(2, 0.0, "dirichlet")},
                init_val=0.0)
    var.set_time(1e-3, 0.0)
    rhs0 = jnp.ones((1, n, n))
    fdm = FDM()
    s = Solver({"fdm": {"method": "cg", "tol": 1e-8, "max_it": 2000,
                        "report": False, "criterion": "residual"}})
    from pyapes_tpu.solver import linalg

    linalg.clear_cache()
    for _ in range(3):
        var.save_old()
        s.set_eq(fdm.ddt(var) - fdm.laplacian(g, var) == rhs0)
        rep = s.solve()
        assert rep["converge"]
        var.update_time()
    assert len(linalg._SOLVER_CACHE) == 1
    assert np.all(np.asarray(var()[0]) >= -1e-8)  # heating, positive rhs

    # guards
    from pyapes_tpu.geometry import Cylinder

    rz = Mesh(Cylinder[0:1, 0:1], None, [17, 17])
    vrz = Field("f", 1, rz, None)
    with pytest.raises(NotImplementedError):
        fdm.laplacian(jnp.ones((17, 17)), vrz)

    bcs_flux = mixed_bcs(
        [1.0, 0.0, 0.0, 0.0],
        ["neumann", "dirichlet", "dirichlet", "dirichlet"],
    )
    vfx = Field("t2", 1, mesh, {"domain": bcs_flux}, init_val=0.0)
    with pytest.raises(NotImplementedError):
        fdm.laplacian(g, vfx)


def _mms_dirichlet_setup(n):
    mesh = Mesh(Box[0:1, 0:1], None, [n, n])
    X, Y = np.asarray(mesh._grid_np[0]), np.asarray(mesh._grid_np[1])
    g = 1.0 + X + 2.0 * Y
    phi = np.sin(np.pi * X) * np.sin(np.pi * Y)
    px = np.pi * np.cos(np.pi * X) * np.sin(np.pi * Y)
    py = np.pi * np.sin(np.pi * X) * np.cos(np.pi * Y)
    rhs = (-2.0 * np.pi**2 * g * phi) + 1.0 * px + 2.0 * py
    var = Field("t", 1, mesh,
                {"domain": homogeneous_bcs(2, 0.0, "dirichlet")},
                init_val=0.0)
    return mesh, g, phi, rhs, var


def test_var_gamma_mg_preconditioned_cg() -> None:
    """G-aware V-cycle PCG: same MMS answer in FAR fewer iterations than
    plain CG (the level operators carry the restricted G and per-point
    Jacobi diagonals; ``MGSpec.set_gamma``)."""
    n = 65
    _, g, phi, rhs, var = _mms_dirichlet_setup(n)
    fdm = FDM()
    s = Solver({"fdm": {"method": "cg", "tol": 1e-9, "max_it": 200,
                        "report": False, "criterion": "residual",
                        "precond": "mg"}})
    s.set_eq(fdm.laplacian(jnp.asarray(g), var) == jnp.asarray(rhs)[None])
    rep = s.solve()
    assert rep["converge"], rep
    assert rep["itr"] <= 25, rep  # plain CG needs ~170 here
    assert _rel_l2(var()[0], phi) < 0.003


def test_var_gamma_mg_bicgstab_neumann() -> None:
    """Neumann face (G-weighted nonsymmetric rows) with MG-preconditioned
    BiCGSTAB."""
    n = 65
    mesh = Mesh(Box[0:1, 0:1], None, [n, n])
    X, Y = np.asarray(mesh._grid_np[0]), np.asarray(mesh._grid_np[1])
    g = 1.5 + X + 0.5 * Y
    phi = np.cos(np.pi * X) * np.sin(np.pi * Y)
    px = -np.pi * np.sin(np.pi * X) * np.sin(np.pi * Y)
    py = np.pi * np.cos(np.pi * X) * np.cos(np.pi * Y)
    rhs = (-2.0 * np.pi**2 * g * phi) + 1.0 * px + 0.5 * py

    def xu_val(grid, mask, var, opt):
        return -jnp.sin(np.pi * grid[1])

    bcs_cfg = mixed_bcs(
        [0.0, xu_val, 0.0, 0.0],
        ["neumann", "dirichlet", "dirichlet", "dirichlet"],
    )
    var = Field("t", 1, mesh, {"domain": bcs_cfg}, init_val=0.0)
    fdm = FDM()
    s = Solver({"fdm": {"method": "bicgstab", "tol": 1e-9, "max_it": 120,
                        "report": False, "criterion": "residual",
                        "precond": "mg"}})
    s.set_eq(fdm.laplacian(jnp.asarray(g), var) == jnp.asarray(rhs)[None])
    rep = s.solve()
    assert rep["converge"], rep
    assert rep["itr"] <= 30, rep  # plain BiCGSTAB needs ~300 here
    assert _rel_l2(var()[0], phi) < 0.005


def test_var_gamma_mg_gamma_streams_no_recompile() -> None:
    """G is a runtime operand of the PRECONDITIONED solver too: solving
    with a different (high-contrast) G reuses the compiled executable and
    still converges fast."""
    n = 65
    mesh, g, phi, rhs, var = _mms_dirichlet_setup(n)
    from pyapes_tpu.solver import linalg

    linalg.clear_cache()
    fdm = FDM()
    s = Solver({"fdm": {"method": "cg", "tol": 1e-9, "max_it": 400,
                        "report": False, "criterion": "residual",
                        "precond": "mg"}})
    s.set_eq(fdm.laplacian(jnp.asarray(g), var) == jnp.asarray(rhs)[None])
    rep1 = s.solve()
    assert rep1["converge"]
    assert _rel_l2(var()[0], phi) < 0.003

    # high-contrast blob (100:1) — same compiled structure, new operand
    X, Y = np.asarray(mesh._grid_np[0]), np.asarray(mesh._grid_np[1])
    g2 = 1.0 + 99.0 * (((X - 0.5) ** 2 + (Y - 0.5) ** 2) < 0.04)
    var2 = Field("t", 1, mesh,
                 {"domain": homogeneous_bcs(2, 0.0, "dirichlet")},
                 init_val=0.0)
    rhs2 = np.ones((n, n))
    s.set_eq(fdm.laplacian(jnp.asarray(g2), var2) == jnp.asarray(rhs2)[None])
    rep2 = s.solve()
    assert rep2["converge"], rep2
    assert len(linalg._SOLVER_CACHE) == 1
    # discrete residual check against the operator itself
    from pyapes_tpu.ops.stencil import div_surgery_info

    r = np.asarray(
        apply_diff_field(
            var2()[...],
            jnp.asarray(g2),
            tuple(1.0 / float(d) ** 2 for d in mesh.dx_np),
            div_surgery_info(var2.bcs, 2),
        )
    )[0][1:-1, 1:-1] - rhs2[1:-1, 1:-1]
    assert np.max(np.abs(r)) < 1e-6 * np.max(np.abs(rhs2))


def test_var_gamma_anisotropic_mms() -> None:
    """Diagonal-tensor diffusivity ``fdm.laplacian((gx, gy), var)``:
    Γx = 1+x, Γy = 2+y, φ = sin(πx) sin(πy), all-Dirichlet, G-aware MG
    PCG."""
    n = 65
    mesh = Mesh(Box[0:1, 0:1], None, [n, n])
    X, Y = np.asarray(mesh._grid_np[0]), np.asarray(mesh._grid_np[1])
    gx, gy = 1.0 + X, 2.0 + Y
    phi = np.sin(np.pi * X) * np.sin(np.pi * Y)
    rhs = (
        (np.pi * np.cos(np.pi * X) - (1.0 + X) * np.pi**2 * np.sin(np.pi * X))
        * np.sin(np.pi * Y)
        + (np.pi * np.cos(np.pi * Y) - (2.0 + Y) * np.pi**2 * np.sin(np.pi * Y))
        * np.sin(np.pi * X)
    )
    var = Field("t", 1, mesh,
                {"domain": homogeneous_bcs(2, 0.0, "dirichlet")},
                init_val=0.0)
    fdm = FDM()
    s = Solver({"fdm": {"method": "cg", "tol": 1e-9, "max_it": 200,
                        "report": False, "criterion": "residual",
                        "precond": "mg"}})
    s.set_eq(
        fdm.laplacian((jnp.asarray(gx), jnp.asarray(gy)), var)
        == jnp.asarray(rhs)[None]
    )
    rep = s.solve()
    assert rep["converge"], rep
    assert rep["itr"] <= 25, rep
    assert _rel_l2(var()[0], phi) < 0.003


def test_var_gamma_harmonic_two_layer_exact() -> None:
    """Piecewise-constant Γ (1 vs 100) with the interface on a face
    midpoint: harmonic face averaging reproduces the continuum two-layer
    solution NODALLY EXACTLY (resistor-series transmissibility);
    arithmetic averaging has an O(1) interface error."""
    n = 65
    m = 32  # jump between nodes m and m+1 -> interface at (m+1/2) dx
    k1, k2 = 1.0, 100.0
    mesh = Mesh(Box[0:1, 0:1], None, [n, n])
    X = np.asarray(mesh._grid_np[0])
    g = np.where(X <= (m + 0.5) / (n - 1), k1, k2)

    dx = 1.0 / (n - 1)
    xi = (m + 0.5) * dx
    q = 1.0 / (xi / k1 + (1.0 - xi) / k2)
    exact = np.where(X <= xi, 1.0 - q * X / k1, q * (1.0 - X) / k2)

    errs = {}
    for avg in ("harmonic", "arithmetic"):
        bcs_cfg = mixed_bcs(
            [1.0, 0.0, 0.0, 0.0],
            ["dirichlet", "dirichlet", "neumann", "neumann"],
        )
        var = Field("p", 1, mesh, {"domain": bcs_cfg}, init_val=0.0)
        fdm = FDM()
        s = Solver({"fdm": {"method": "bicgstab", "tol": 1e-12,
                            "max_it": 400, "report": False,
                            "criterion": "residual", "precond": "mg"}})
        s.set_eq(
            fdm.laplacian(jnp.asarray(g), var, avg=avg)
            == jnp.zeros((1, n, n))
        )
        rep = s.solve()
        assert rep["converge"], (avg, rep)
        errs[avg] = float(np.max(np.abs(np.asarray(var()[0]) - exact)))
    assert errs["harmonic"] < 1e-7, errs
    assert errs["arithmetic"] > 1e-3, errs  # the wrong face rule is O(1)


def test_power_law_poiseuille_picard() -> None:
    """Non-Newtonian (power-law) planar Poiseuille via Picard iteration
    on the variable-Γ operator: ``d/dy(mu(|du/dy|) du/dy) = -G`` with
    ``mu = K γ̇^{n-1}``; the converged profile matches the analytic
    ``u = n/(n+1) (G/K)^{1/n} [ (H/2)^{1+1/n} - |y-H/2|^{1+1/n} ]``."""
    n_pow, K, G = 0.5, 1.0, 1.0
    nn = 65
    mesh = Mesh(Box[0:1, 0:1], None, [nn, nn])
    Y = np.asarray(mesh._grid_np[1])
    bcs_cfg = mixed_bcs(
        [0.0, 0.0, 0.0, 0.0],
        ["neumann", "neumann", "dirichlet", "dirichlet"],
    )
    fdm = FDM()
    s = Solver({"fdm": {"method": "bicgstab", "tol": 1e-10, "max_it": 2000,
                        "report": False, "criterion": "residual",
                        "precond": "mg"}})
    var = Field("u", 1, mesh, {"domain": bcs_cfg}, init_val=0.0)
    rhs = jnp.full((1, nn, nn), -G)

    dy = float(mesh.dx_np[1])
    eps = 1e-8
    u = np.zeros((nn, nn))
    for _ in range(40):  # Picard on the viscosity
        dudy = np.gradient(u, dy, axis=1)
        mu = K * (dudy**2 + eps**2) ** (0.5 * (n_pow - 1.0))
        mu = np.minimum(mu, 1e4)  # regularize the zero-shear start
        var.set_var_tensor(jnp.asarray(u)[None])
        s.set_eq(fdm.laplacian(jnp.asarray(mu), var) == rhs)
        rep = s.solve()
        assert rep["converge"], rep
        u = np.asarray(var()[0])

    ex = 1.0 + 1.0 / n_pow
    exact = (n_pow / (n_pow + 1.0)) * (G / K) ** (1.0 / n_pow) * (
        0.5**ex - np.abs(Y - 0.5) ** ex
    )
    err = np.linalg.norm(u - exact) / np.linalg.norm(exact)
    assert err < 0.01, err
    # shear-thinning signature: flatter core than the Newtonian parabola
    ratio = u[nn // 2, nn // 2] / u[nn // 2].mean()
    assert abs(ratio - (2 * n_pow + 1) / (n_pow + 1)) < 0.03, ratio


def test_var_gamma_3d_mms() -> None:
    """3-D heterogeneous diffusivity with the Γ-aware MG: Γ = 1+x+y+z,
    φ = sin(πx)sin(πy)sin(πz), all-Dirichlet."""
    n = 33
    mesh = Mesh(Box[0:1, 0:1, 0:1], None, [n, n, n])
    X, Y, Z = (np.asarray(g) for g in mesh._grid_np)
    g = 1.0 + X + Y + Z
    sx, sy, sz = np.sin(np.pi * X), np.sin(np.pi * Y), np.sin(np.pi * Z)
    cx, cy, cz = np.cos(np.pi * X), np.cos(np.pi * Y), np.cos(np.pi * Z)
    phi = sx * sy * sz
    rhs = (-3.0 * np.pi**2 * g * phi) + np.pi * (
        cx * sy * sz + sx * cy * sz + sx * sy * cz
    )
    var = Field("t", 1, mesh,
                {"domain": homogeneous_bcs(3, 0.0, "dirichlet")},
                init_val=0.0)
    fdm = FDM()
    s = Solver({"fdm": {"method": "cg", "tol": 1e-8, "max_it": 100,
                        "report": False, "criterion": "residual",
                        "precond": "mg"}})
    s.set_eq(fdm.laplacian(jnp.asarray(g), var) == jnp.asarray(rhs)[None])
    rep = s.solve()
    assert rep["converge"] and rep["itr"] <= 20, rep
    assert _rel_l2(var()[0], phi) < 0.01
