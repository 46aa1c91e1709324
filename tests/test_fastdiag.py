"""Fast-diagonalization direct solver (``solver/fastdiag.py``).

The reference's only solve is CG (``/root/reference/pyapes/solver/
linalg.py:74-159``); fast diagonalization is a beyond-reference DIRECT
method for the separable (Kronecker-sum) operators this framework's
Poisson/transient-diffusion solves produce — six dense MXU contractions
per pass instead of an HBM-bound Krylov loop. These tests pin:

* agreement with the CG path for every BC family (Dirichlet, eliminated
  Neumann incl. the singular quotient-space solve, reduced periodic),
* 3-D mixed-BC f32 and bf16-factor convergence,
* streamed dt/coefficients (ONE compile across dt changes),
* the stagnation exit at the dtype accuracy floor,
* rejection of non-separable systems (advection, var-gamma, rz).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pyapes_tpu.geometry import Box, Cylinder
from pyapes_tpu.geometry.basis import FDIR
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.solver import linalg
from pyapes_tpu.solver.fastdiag import (
    FastDiag,
    _symmetrize_similarity,
    axis_matrix_np,
)
from pyapes_tpu.solver.fdm import FDM
from pyapes_tpu.solver.ops import Solver
from pyapes_tpu.testing.poisson import (
    poisson_bcs,
    poisson_exact_nd,
    poisson_rhs_nd,
)
from pyapes_tpu.variables import Field
from pyapes_tpu.variables.bcs import homogeneous_bcs


def _mixed_bcs(dim):
    """Dirichlet on the x faces, Neumann on the rest."""
    return [
        {
            "bc_face": f,
            "bc_type": "dirichlet" if f[0] == "x" else "neumann",
            "bc_val": 0.0,
            "bc_val_opt": None,
        }
        for f in FDIR[: 2 * dim]
    ]


def _solve(method, mesh, var, rhs, nullspace=None, **cfg):
    c = {"method": method, "tol": 1e-10, "max_it": 3000, "report": False}
    if nullspace:
        c["nullspace"] = nullspace
    c.update(cfg)
    s = Solver({"fdm": c})
    fdm = FDM()
    s.set_eq(fdm.laplacian(1.0, var) == rhs)
    rep = s.solve()
    return np.asarray(var()[0]), rep


@pytest.mark.parametrize(
    ["bc", "nullspace"],
    [["dirichlet", None], ["neumann", "mean"], ["periodic", "mean"]],
)
def test_fastdiag_matches_cg(bc, nullspace):
    """One refinement pass in f64 lands ~1e-13; matches CG per BC family
    (Neumann/periodic: the singular quotient solve, up to a constant)."""
    n, dim = 65, 2
    rng = np.random.default_rng(0)

    def run(method, **cfg):
        mesh = Mesh(Box[0:1, 0:1], None, [n] * dim)
        f_bc = homogeneous_bcs(dim, 0.0, bc)
        var = Field("p", 1, mesh, {"domain": f_bc, "obstacle": None},
                    init_val=0.0)
        rhs = jnp.asarray(
            rng.standard_normal(tuple(mesh.nx)), dtype=var().dtype
        )[None]
        if nullspace:
            rhs = rhs - jnp.mean(rhs)
        return _solve(method, mesh, var, rhs, nullspace=nullspace, **cfg)

    rng = np.random.default_rng(0)
    x_cg, rep_cg = run("cg", precond="mg" if bc != "periodic" else None)
    rng = np.random.default_rng(0)
    x_fd, rep_fd = run("fastdiag")

    assert rep_fd["converge"]
    assert rep_fd["itr"] <= 2  # direct solve: f64 one pass ~1e-13
    if nullspace:
        sl = (slice(1, -1),) * dim if bc == "neumann" else (slice(None),) * dim
        a, b = x_cg[sl], x_fd[sl]
        a = a - a.mean()
        b = b - b.mean()
    else:
        a, b = x_cg, x_fd
    err = np.abs(a - b).max() / np.abs(a).max()
    assert err < 1e-7, err


def test_fastdiag_poisson_mms():
    """Manufactured Poisson solution, pure Dirichlet (the reference's own
    correctness anchor, ``tests/test_solver.py:30-88``)."""
    mesh = Mesh(Box[0:1, 0:1], None, [0.02, 0.02])
    var = Field("p", 1, mesh, {"domain": poisson_bcs(2), "obstacle": None})
    rhs = poisson_rhs_nd(mesh, var)
    _, rep = _solve("fastdiag", mesh, var, rhs, tol=1e-8)
    assert rep["converge"]
    np.testing.assert_allclose(
        np.asarray(var()[0]), np.asarray(poisson_exact_nd(mesh)),
        rtol=0.1, atol=0.01,
    )


@pytest.mark.parametrize("fd_dtype", [None, "bfloat16"])
def test_fastdiag_3d_mixed_f32(fd_dtype):
    """3-D mixed Dirichlet/Neumann in f32; bf16 transform factors reach
    the same tolerance (one-pass accuracy ~1e-2 for both — measured)."""
    n, dim = 33, 3
    mesh = Mesh(Box[0:1, 0:1, 0:1], None, [n] * dim, dtype="single")
    var = Field("p", 1, mesh, {"domain": _mixed_bcs(dim), "obstacle": None},
                init_val=0.0)
    rng = np.random.default_rng(1)
    rhs = jnp.asarray(rng.standard_normal(tuple(mesh.nx)),
                      dtype=var().dtype)[None]
    cfg = {"fd_opts": {"dtype": fd_dtype}} if fd_dtype else {}
    x_fd, rep = _solve("fastdiag", mesh, var, rhs, tol=1e-6, **cfg)
    assert rep["converge"]
    assert rep["tol"] < 1e-6
    assert rep["itr"] <= 8

    var.set_var_tensor(jnp.zeros_like(var()))
    x_cg, _ = _solve("cg", mesh, var, rhs, tol=1e-8, precond="mg")
    err = np.abs(x_fd - x_cg).max() / np.abs(x_cg).max()
    assert err < 1e-4, err


def test_fastdiag_transient_streams_dt():
    """ddt + laplacian: dt and gamma enter only the diagonal symbol —
    changing dt adds NO solver-cache entry (no recompile, no
    re-factorization) and the solution matches CG."""
    n, dim = 33, 2
    mesh = Mesh(Box[0:1, 0:1], None, [n] * dim, dtype="single")
    var = Field("p", 1, mesh, {"domain": _mixed_bcs(dim), "obstacle": None},
                init_val=0.0)
    var.set_time(0.01, 0.0)
    rng = np.random.default_rng(2)
    fdm = FDM()
    s = Solver({"fdm": {"method": "fastdiag", "tol": 1e-6, "max_it": 100,
                        "report": False}})
    n0 = len(linalg._SOLVER_CACHE)
    rhs = None
    for dt in (0.01, 0.002):
        var._dt = dt
        var.save_old()
        rhs = jnp.asarray(rng.standard_normal(tuple(mesh.nx)),
                          dtype=var().dtype)[None]
        s.set_eq(fdm.ddt(var) - fdm.laplacian(0.5, var) == rhs)
        rep = s.solve()
        assert rep["tol"] < 1e-6
    assert len(linalg._SOLVER_CACHE) - n0 == 1
    x_fd = np.asarray(var()[0])

    var.set_var_tensor(jnp.zeros_like(var()))
    s2 = Solver({"fdm": {"method": "cg", "tol": 1e-10, "max_it": 2000,
                         "report": False}})
    s2.set_eq(fdm.ddt(var) - fdm.laplacian(0.5, var) == rhs)
    s2.solve()
    x_cg = np.asarray(var()[0])
    assert np.abs(x_fd - x_cg).max() / np.abs(x_cg).max() < 1e-4


def test_fastdiag_stagnation_exit():
    """An unreachable tolerance in f32 stops at the accuracy floor
    (stall detection) instead of spinning to max_it."""
    n, dim = 33, 2
    mesh = Mesh(Box[0:1, 0:1], None, [n] * dim, dtype="single")
    var = Field("p", 1, mesh, {"domain": _mixed_bcs(dim), "obstacle": None},
                init_val=0.0)
    rng = np.random.default_rng(3)
    rhs = jnp.asarray(rng.standard_normal(tuple(mesh.nx)),
                      dtype=var().dtype)[None]
    _, rep = _solve("fastdiag", mesh, var, rhs, tol=1e-14, max_it=100)
    assert rep["itr"] <= 12  # floor is hit in a handful of passes
    assert rep["tol"] < 1e-5  # ...at genuinely small residual


def test_fastdiag_rejects_nonseparable():
    """Advection terms / var-gamma / rz break the Kronecker-sum structure
    the eigen-solve needs: a clear error, not a wrong answer."""
    n, dim = 17, 2
    mesh = Mesh(Box[0:1, 0:1], None, [n] * dim, dtype="single")
    var = Field("p", 1, mesh, {"domain": _mixed_bcs(dim), "obstacle": None},
                init_val=0.0)
    rhs = jnp.zeros((1, *mesh.nx), dtype=var().dtype)
    fdm = FDM()
    s = Solver({"fdm": {"method": "fastdiag", "tol": 1e-6, "max_it": 10,
                        "report": False}})
    # two axis terms (advection + diffusion)
    s.set_eq(fdm.div(1.0, var) - fdm.laplacian(1.0, var) == rhs)
    with pytest.raises(ValueError, match="fastdiag"):
        s.solve()
    # heterogeneous gamma (array coefficient)
    gam = jnp.ones(tuple(mesh.nx), dtype=var().dtype)
    s.set_eq(fdm.laplacian(gam, var) == rhs)
    with pytest.raises(ValueError, match="fastdiag"):
        s.solve()


def test_fd_preconditioned_cg_mixed():
    """precond "fd": CG with the eigen-solve as preconditioner. Under the
    sym_vecs row scaling the loop solves D A; the preconditioner applies
    A^-1 D^-1 = (D A)^-1, so convergence is a handful of iterations —
    strictly fewer than MG-PCG — and solutions agree."""
    n, dim = 33, 3
    mesh = Mesh(Box[0:1, 0:1, 0:1], None, [n] * dim, dtype="single")
    var = Field("p", 1, mesh, {"domain": _mixed_bcs(dim), "obstacle": None},
                init_val=0.0)
    rng = np.random.default_rng(7)
    rhs = jnp.asarray(rng.standard_normal(tuple(mesh.nx)),
                      dtype=var().dtype)[None]
    x_fd, rep_fd = _solve("cg", mesh, var, rhs, tol=1e-7, precond="fd",
                          criterion="residual")
    assert rep_fd["converge"]
    assert rep_fd["itr"] <= 6
    var.set_var_tensor(jnp.zeros_like(var()))
    x_mg, rep_mg = _solve("cg", mesh, var, rhs, tol=1e-7, precond="mg",
                          criterion="residual")
    assert rep_fd["itr"] < rep_mg["itr"]
    err = np.abs(x_fd - x_mg).max() / np.abs(x_mg).max()
    assert err < 1e-5, err


def test_fd_preconditioned_cg_singular_neumann():
    """All-Neumann pressure-type system: the pseudo-inverse FD
    preconditioner on the quotient space — near-direct convergence."""
    n, dim = 65, 2
    rng = np.random.default_rng(8)
    mesh = Mesh(Box[0:1, 0:1], None, [n] * dim)
    var = Field("p", 1, mesh,
                {"domain": homogeneous_bcs(dim, 0.0, "neumann"),
                 "obstacle": None}, init_val=0.0)
    rhs = jnp.asarray(rng.standard_normal(tuple(mesh.nx)))[None].astype(
        var().dtype)
    rhs = rhs - jnp.mean(rhs)
    x_fd, rep = _solve("cg", mesh, var, rhs, tol=1e-10, precond="fd",
                       nullspace="mean")
    assert rep["converge"]
    assert rep["itr"] <= 4
    var.set_var_tensor(jnp.zeros_like(var()))
    x_mg, _ = _solve("cg", mesh, var, rhs, tol=1e-10, precond="mg",
                     nullspace="mean")
    sl = (slice(1, -1),) * dim
    a = x_fd[sl] - x_fd[sl].mean()
    b = x_mg[sl] - x_mg[sl].mean()
    assert np.abs(a - b).max() / np.abs(b).max() < 1e-7


def test_fd_precond_bicgstab_and_streams_dt():
    """BiCGSTAB accepts precond "fd" too, and dt changes stream through
    set_scalars without a new compile."""
    n, dim = 33, 2
    mesh = Mesh(Box[0:1, 0:1], None, [n] * dim, dtype="single")
    var = Field("p", 1, mesh, {"domain": _mixed_bcs(dim), "obstacle": None},
                init_val=0.0)
    var.set_time(0.01, 0.0)
    rng = np.random.default_rng(9)
    fdm = FDM()
    s = Solver({"fdm": {"method": "bicgstab", "precond": "fd", "tol": 1e-7,
                        "max_it": 50, "report": False}})
    n0 = len(linalg._SOLVER_CACHE)
    for dt in (0.01, 0.0025):
        var._dt = dt
        var.save_old()
        rhs = jnp.asarray(rng.standard_normal(tuple(mesh.nx)),
                          dtype=var().dtype)[None]
        s.set_eq(fdm.ddt(var) - fdm.laplacian(0.5, var) == rhs)
        rep = s.solve()
        assert rep["tol"] < 1e-7
        assert rep["itr"] <= 4
    assert len(linalg._SOLVER_CACHE) - n0 == 1


def test_fd_precond_rejects_nonseparable():
    """precond "fd" on a non-separable equation raises the same clear
    error as method "fastdiag"."""
    n, dim = 17, 2
    mesh = Mesh(Box[0:1, 0:1], None, [n] * dim, dtype="single")
    var = Field("p", 1, mesh, {"domain": _mixed_bcs(dim), "obstacle": None},
                init_val=0.0)
    rhs = jnp.zeros((1, *mesh.nx), dtype=var().dtype)
    fdm = FDM()
    s = Solver({"fdm": {"method": "cg", "precond": "fd", "tol": 1e-6,
                        "max_it": 10, "report": False}})
    gam = jnp.ones(tuple(mesh.nx), dtype=var().dtype)
    s.set_eq(fdm.laplacian(gam, var) == rhs)
    with pytest.raises(ValueError, match="precond 'fd'"):
        s.solve()


def test_fd_precond_partial_separable():
    """precond "fd" on NON-separable equations preconditions with the
    separable part: constant-velocity advection-diffusion (two axis
    terms, matrices summed with frozen weights) is near-direct; a
    per-point advector (conv) leaves a frozen diffusion+dt
    preconditioner that still beats plain BiCGSTAB."""
    n, dim = 65, 2
    mesh = Mesh(Box[0:1, 0:1], None, [n] * dim, dtype="single")
    rng = np.random.default_rng(3)
    rhs = jnp.asarray(rng.standard_normal(tuple(mesh.nx)),
                      dtype=jnp.float32)[None]
    fdm = FDM()

    def solve(cfg, eq_of):
        var = Field("phi", 1, mesh,
                    {"domain": homogeneous_bcs(dim, 0.0, "dirichlet"),
                     "obstacle": None}, init_val=0.0)
        s = Solver({"fdm": {"method": "bicgstab", "tol": 1e-7,
                            "max_it": 4000, "report": False,
                            "criterion": "residual", **cfg}})
        s.set_eq(eq_of(var))
        rep = s.solve()
        return np.asarray(var()[0]), rep

    # two axis terms: div(1.0) + laplacian -> summed matrices, ~direct
    def adv_diff(var):
        return fdm.div(1.0, var) - fdm.laplacian(0.05, var) == rhs

    x_p, rep_p = solve({}, adv_diff)
    x_f, rep_f = solve({"precond": "fd"}, adv_diff)
    assert rep_f["itr"] <= 5 < rep_p["itr"]
    assert np.abs(x_f - x_p).max() / np.abs(x_p).max() < 1e-3

    # per-point advector (conv term, ignored by the preconditioner)
    uvec = jnp.stack([
        jnp.asarray(2 * np.sin(np.pi * np.asarray(mesh._grid_np[0])),
                    dtype=jnp.float32),
        jnp.asarray(np.cos(np.pi * np.asarray(mesh._grid_np[1])),
                    dtype=jnp.float32),
    ])

    def transport(var):
        var.set_time(0.05, 0.0)
        var.save_old()
        return (fdm.ddt(var) + fdm.conv(uvec, var)
                - fdm.laplacian(0.002, var) == rhs)

    # the frozen-diffusion preconditioner's advantage compounds with the
    # digits asked for (measured 151 vs 366 its at 1e-8; 98 vs 136 at
    # 1e-4) — the test asks for the modest-tolerance regime
    x_p, rep_p = solve({"tol": 1e-4}, transport)
    x_f, rep_f = solve({"tol": 1e-4, "precond": "fd"}, transport)
    assert rep_f["itr"] < 0.85 * rep_p["itr"]
    assert np.abs(x_f - x_p).max() / np.abs(x_p).max() < 1e-2


def test_fastdiag_rz():
    """rz (axisymmetric) operators ARE separable: the radial operator
    (1/r)d/dr(r d/dr) folds the metric into the per-axis vectors and the
    resulting tridiagonal is diagonally symmetrizable (off-diagonal
    products stay positive, r=0 axis included). One f64 pass lands
    ~1e-13; FD-preconditioned BiCGSTAB converges in 1 iteration."""
    from pyapes_tpu.variables.bcs import CylinderBoundary

    mesh = Mesh(Cylinder[0:1, 0:2], None, [33, 65])
    f_bc = CylinderBoundary(
        rl={"bc_type": "neumann", "bc_val": 0.0},
        ru={"bc_type": "dirichlet", "bc_val": 0.0},
        zl={"bc_type": "dirichlet", "bc_val": 0.0},
        zu={"bc_type": "dirichlet", "bc_val": 0.0},
    )()
    var = Field("p", 1, mesh, {"domain": f_bc, "obstacle": None},
                init_val=0.0)
    rng = np.random.default_rng(5)
    rhs = jnp.asarray(rng.standard_normal(tuple(mesh.nx)))[None].astype(
        var().dtype)
    sols = {}
    for label, method, cfg in (
        ("bicgstab", "bicgstab", {}),
        ("fastdiag", "fastdiag", {}),
        ("bicgstab-fd", "bicgstab", {"precond": "fd"}),
    ):
        var.set_var_tensor(jnp.zeros_like(var()))
        x, rep = _solve(method, mesh, var, rhs, **cfg)
        sols[label] = x
        if label == "fastdiag":
            assert rep["itr"] <= 2 and rep["tol"] < 1e-12
        if label == "bicgstab-fd":
            assert rep["itr"] <= 2
    for k in ("fastdiag", "bicgstab-fd"):
        err = (np.abs(sols[k] - sols["bicgstab"]).max()
               / np.abs(sols["bicgstab"]).max())
        assert err < 1e-8, (k, err)


def test_ns_model_defaults_to_fastdiag():
    """NS models on plain boxes default both solves to the direct
    fast-diagonalization path (``navier_stokes._init_solvers``); the
    cavity result matches the Krylov-configured model."""
    from pyapes_tpu.models.navier_stokes import LidDrivenCavity

    mesh = Mesh(Box[0:1, 0:1], None, [33, 33])
    m_fd = LidDrivenCavity(mesh, nu=0.01, lid_velocity=1.0)
    assert m_fd.mom_solver.config["fdm"]["method"] == "fastdiag"
    assert m_fd.p_solver.config["fdm"]["method"] == "fastdiag"
    m_fd.run(dt=0.02, n_steps=30)
    u_fd = np.asarray(m_fd.vel[0]()[0])

    m_kr = LidDrivenCavity(
        mesh, nu=0.01, lid_velocity=1.0,
        config={"method": "bicgstab", "precond": None},
    )
    assert m_kr.mom_solver.config["fdm"]["method"] == "bicgstab"
    m_kr.run(dt=0.02, n_steps=30)
    u_kr = np.asarray(m_kr.vel[0]()[0])
    assert np.abs(u_fd - u_kr).max() < 2e-6


def test_ns_fd_fallback_on_dynamic_obstacle():
    """Appending a dynamic-obstacle BC AFTER model construction silently
    reverts that momentum solve to the Krylov path (``fd_fallback``) —
    the moving-body workflow keeps working with fastdiag defaults."""
    from pyapes_tpu.models.navier_stokes import ChannelFlow
    from pyapes_tpu.variables.bcs import ObstacleDirichlet

    mesh = Mesh(Box[0:2, 0:1], None, [33, 17])
    model = ChannelFlow(mesh, nu=0.02, u_in=1.0)
    assert model.mom_solver.config["fdm"]["method"] == "fastdiag"
    mask = np.zeros(tuple(mesh.nx), dtype=bool)
    mask[12:16, 6:10] = True
    for v in model.vel:
        v.bcs.append(
            ObstacleDirichlet(f"body-{v.name}", 0.0, jnp.asarray(mask),
                              dynamic=True)
        )
    model.run(dt=0.01, n_steps=3)  # raises without the fallback
    u = np.asarray(model.vel[0]()[0])
    assert np.isfinite(u).all()
    assert np.abs(u[13:15, 7:9]).max() < 1e-8  # body interior pinned


def test_poisson_model_defaults_to_fastdiag():
    """PoissonSolver rides fastdiag on plain boxes and falls back to
    MG-PCG for a heterogeneous coefficient array."""
    from pyapes_tpu.models.poisson import PoissonSolver

    mesh = Mesh(Box[0:1, 0:1], None, [33, 33])
    bc = homogeneous_bcs(2, 0.0, "dirichlet")
    rng = np.random.default_rng(11)
    rhs = rng.standard_normal(tuple(mesh.nx))
    ps = PoissonSolver(mesh, bc)
    assert ps.solver.config["fdm"]["method"] == "fastdiag"
    x_fd = np.asarray(ps.solve(rhs)()[0])
    ps_cg = PoissonSolver(mesh, bc, config={"method": "cg",
                                            "precond": "mg"})
    x_cg = np.asarray(ps_cg.solve(rhs)()[0])
    assert np.abs(x_fd - x_cg).max() / np.abs(x_cg).max() < 1e-5
    # heterogeneous coefficient: same model class, silent CG fallback
    gamma = 1.0 + jnp.asarray(rng.random(tuple(mesh.nx)))
    ps_var = PoissonSolver(mesh, bc, coeff=gamma)
    x_var = np.asarray(ps_var.solve(rhs)()[0])
    assert np.isfinite(x_var).all()
    assert ps_var.report["converge"]


def test_symmetrize_similarity():
    """Eliminated-Neumann axis operators are nonsymmetric tridiagonals
    with same-sign off-diagonal pairs: the diagonal similarity recovers a
    symmetric matrix with identical eigenvalues; mixed signs raise."""
    A = np.array([[-2.0, 2.0 / 3.0, 0.0],
                  [1.0, -2.0, 1.0],
                  [0.0, 2.0 / 3.0, -2.0]])
    d, S = _symmetrize_similarity(A)
    np.testing.assert_allclose(S, S.T, atol=1e-14)
    np.testing.assert_allclose(np.diag(d) @ A @ np.diag(1.0 / d), S,
                               atol=1e-14)
    np.testing.assert_allclose(
        np.sort(np.linalg.eigvals(A).real), np.linalg.eigvalsh(S),
        atol=1e-12,
    )
    B = A.copy()
    B[0, 1] = -B[0, 1]  # advection-like mixed-sign pair
    with pytest.raises(ValueError, match="mixed-sign"):
        _symmetrize_similarity(B)


def test_fastdiag_kernel_periodic_circulant():
    """The reduced periodic axis is a symmetric circulant: the raw
    FastDiag solve inverts the wrapped operator exactly (f64)."""
    n = 16  # reduced size
    inv = float(n * n)
    ap = np.full(n, inv)
    am = np.full(n, inv)
    ac = np.full(n, -2 * inv)
    A = axis_matrix_np(ap, ac, am, active=slice(None), periodic=True)
    assert A[0, -1] == inv and A[-1, 0] == inv
    fd = FastDiag([A, A], dtype=jnp.float64)
    rng = np.random.default_rng(4)
    r = rng.standard_normal((1, n, n))
    r -= r.mean()
    e = np.asarray(fd.solve(jnp.asarray(r), jnp.asarray(1.0),
                            pseudo=True))[0]
    res = (np.tensordot(A, e, axes=[[1], [0]])
           + np.moveaxis(np.tensordot(A, e, axes=[[1], [1]]), 0, 1)
           - r[0])
    res -= res.mean()
    assert np.linalg.norm(res) / np.linalg.norm(r) < 1e-11


def test_solver_programs_embed_no_fullgrid_literal(monkeypatch):
    """Round-5 compile-latency guard (MEASURE_r5 fd_symbol_literal_fix):
    the fastdiag eigen-symbol and the Krylov null-vector field must be
    built IN-TRACE from per-axis vectors, never embedded as full-grid
    HLO literals — a 512³ literal is 530 MB and was the dominant
    first-compile cost (78–815 s). A full-grid constant at n=48 adds
    ~2 MB of hex to the lowered text; without one the whole program
    lowers to well under 1 MB, so the text-size bound below fails
    loudly if either regression returns."""
    import jax

    texts = []
    real_jit = jax.jit

    def spy_jit(fn, **kw):
        jitted = real_jit(fn, **kw)
        if getattr(fn, "__name__", "") not in ("fd_fn", "cg_fn"):
            return jitted

        def wrapper(*a, **k):
            texts.append(real_jit(fn, **kw).lower(*a, **k).as_text())
            return jitted(*a, **k)

        return wrapper

    monkeypatch.setattr(jax, "jit", spy_jit)
    linalg.clear_cache()

    n = 48
    # fastdiag Dirichlet (the eigen-symbol path)
    mesh = Mesh(Box[0:1, 0:1, 0:1], None, [n, n, n], dtype="single")
    var = Field(
        "p", 1, mesh,
        {"domain": homogeneous_bcs(3, 0.0, "dirichlet"), "obstacle": None},
        init_val=0.0,
    )
    s = Solver({"fdm": {"method": "fastdiag", "tol": 1e-5, "max_it": 5,
                        "report": False}})
    fdm = FDM()
    s.set_eq(fdm.laplacian(1.0, var) == jnp.ones_like(var()))
    s.solve()

    # all-Neumann CG (the sym_vecs row-scale + null-shift path)
    var_n = Field(
        "p", 1, mesh,
        {"domain": homogeneous_bcs(3, 0.0, "neumann"), "obstacle": None},
        init_val=0.0,
    )
    rhs = jnp.ones_like(var_n())
    rhs = rhs - jnp.mean(rhs) + 0.0
    sn = Solver({"fdm": {"method": "cg", "tol": 1e-5, "max_it": 5,
                         "report": False, "nullspace": "mean"}})
    sn.set_eq(fdm.laplacian(1.0, var_n) == rhs)
    sn.solve()

    # FD-preconditioned CG with Neumann faces: the sym_vecs row-scale
    # is active, so the preconditioner's pre_scale (1/D on the active
    # set) must ALSO compose in-trace (round-5 review finding: the
    # original fix missed this site)
    var_m = Field(
        "p", 1, mesh,
        {"domain": __import__(
            "pyapes_tpu.variables.bcs", fromlist=["mixed_bcs"]
        ).mixed_bcs(
            [0.0] * 6,
            ["neumann", "dirichlet"] * 3,
        ), "obstacle": None},
        init_val=0.0,
    )
    sm = Solver({"fdm": {"method": "cg", "tol": 1e-5, "max_it": 5,
                         "report": False, "precond": "fd"}})
    sm.set_eq(fdm.laplacian(1.0, var_m) == jnp.ones_like(var_m()))
    sm.solve()

    linalg.clear_cache()
    assert len(texts) >= 3, [len(t) for t in texts]
    print("lowered text sizes:", [len(t) for t in texts])
    for txt in texts:
        assert len(txt) < 500_000, (
            f"solver program lowered to {len(txt)} bytes of HLO text "
            "(clean programs measure 77-144 KB; one 48^3 literal adds ~885 KB) - "
            "a full-grid literal is back (see MEASURE_r5 "
            "fd_symbol_literal_fix)"
        )
