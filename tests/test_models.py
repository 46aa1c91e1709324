"""Model-family templates: end-to-end physics checks."""
from math import exp, pi

import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pyapes_tpu.geometry import Box, Cylinder
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.models import (
    AdvectionDiffusion,
    Burgers1D,
    LidDrivenCavity,
    PoissonSolver,
    RFPEvolution,
)
from pyapes_tpu.testing.burgers import burger_exact_nd
from pyapes_tpu.testing.poisson import (
    poisson_bcs,
    poisson_exact_nd,
    poisson_rhs_nd,
)
from pyapes_tpu.variables import Field


def test_poisson_model() -> None:
    mesh = Mesh(Box[0:1, 0:1], None, [65, 65])
    model = PoissonSolver(mesh, poisson_bcs(2), config={"precond": "mg"})
    var = model.solve(poisson_rhs_nd(mesh, model.var))
    assert model.report["converge"]
    assert_allclose(
        np.asarray(var()[0]), np.asarray(poisson_exact_nd(mesh)),
        rtol=0.1, atol=0.01,
    )


def test_advection_diffusion_model() -> None:
    from pyapes_tpu.variables.bcs import homogeneous_bcs

    mesh = Mesh(Box[0:1], None, [0.02])
    model = AdvectionDiffusion(
        mesh, homogeneous_bcs(1, 0.0, "dirichlet"),
        velocity=1.0, epsilon=0.5, limiter="none", init_val=0.5,
    )
    model.solve_steady(rhs=1.0)
    eps = 0.5
    X = mesh.X
    sol_ex = X - (jnp.exp(-(1 - X) / eps) - exp(-1 / eps)) / (1 - exp(-1 / eps))
    assert_allclose(np.asarray(model.var()[0]), np.asarray(sol_ex),
                    rtol=0.1, atol=0.01)

    # Transient: march to steady state, must approach the steady solution.
    model2 = AdvectionDiffusion(
        mesh, homogeneous_bcs(1, 0.0, "dirichlet"),
        velocity=1.0, epsilon=0.5, limiter="none", init_val=0.0,
    )
    for _ in range(200):
        model2.step(0.05, rhs=1.0)
    assert_allclose(
        np.asarray(model2.var()[0]), np.asarray(model.var()[0]), atol=1e-3
    )


def test_burgers_model() -> None:
    mesh = Mesh(Box[0 : 2 * pi], None, [101])
    model = Burgers1D(mesh, nu=0.1)
    for _ in range(10):
        model.step(0.01)
    sol_ex = burger_exact_nd(mesh, 0.1, model.var.t)
    err = np.asarray(model.var()[0] - sol_ex)
    rel_l2 = np.linalg.norm(err) / np.linalg.norm(np.asarray(sol_ex))
    assert rel_l2 < 0.05


def test_lid_driven_cavity() -> None:
    """Re=100 cavity: qualitative Ghia et al. (1982) structure — the
    centerline u-velocity dips negative below the lid vortex."""
    mesh = Mesh(Box[0:1, 0:1], None, [33, 33])
    model = LidDrivenCavity(mesh, nu=0.01, lid_velocity=1.0)
    # deliberately EAGER: run()'s fallback path keeps a quantitative
    # anchor of its own now that most model tests ride the fused capture
    model.run(dt=0.02, n_steps=150)

    u = np.asarray(model.u()[0])
    v = np.asarray(model.v()[0])
    mid = u.shape[0] // 2

    # lid BC enforced
    assert_allclose(u[:, -1][1:-1], 1.0, atol=1e-12)
    assert_allclose(u[:, 0], 0.0, atol=1e-12)
    # primary vortex: u on vertical centerline goes negative in the lower
    # half (Ghia Re=100 converged min ~ -0.21; coarse/early: < -0.05)
    assert u[mid, :].min() < -0.05, u[mid, :].min()
    # v on horizontal centerline antisymmetric-ish: positive near left,
    # negative near right wall
    assert v[:, mid].max() > 0.02
    assert v[:, mid].min() < -0.02
    # projection keeps the bulk divergence small (the lid corners are a
    # genuine velocity-BC singularity; exclude two layers)
    div = np.asarray(model.divergence())[2:-2, 2:-2]
    assert np.mean(np.abs(div)) < 0.05, np.mean(np.abs(div))


def test_rfp_evolution_conserves_density() -> None:
    """Conservative RFP stepping preserves the velocity-space density
    integral (zero-flux boundaries)."""
    mesh = Mesh(Cylinder[0:3, -3:3], None, [48, 64])
    R, Z = np.asarray(mesh.R), np.asarray(mesh.Z)
    vth = 0.8
    f0 = np.exp(-(R**2 + Z**2) / (2 * vth**2))
    # Isotropic-ish potentials (qualitatively Maxwellian-like)
    H = -np.sqrt(R**2 + Z**2 + 0.5)
    G = np.sqrt(R**2 + Z**2 + 0.5)

    f = Field("pdf", 1, mesh, {"domain": None, "obstacle": None})
    f.set_var_tensor(jnp.asarray(f0))
    den0 = float(f.volume_integral()[0])

    model = RFPEvolution(mesh, H, G)
    f = model.run(f, dt=1e-4, n_steps=50)

    den1 = float(f.volume_integral()[0])
    assert abs(den1 - den0) / den0 < 5e-3, (den0, den1)
    assert np.all(np.isfinite(np.asarray(f())))


def test_advection_diffusion_2d_transient_upwind() -> None:
    """BASELINE config 2: 2-D advection-diffusion with upwind Div + Ddt.
    A Gaussian blob advects at the prescribed velocity (center-of-mass
    drift == c*t) while diffusing, on a periodic-x domain."""
    from pyapes_tpu.variables.bcs import mixed_bcs
    from pyapes_tpu.solver.fdm import FDM
    from pyapes_tpu.solver.ops import Solver

    mesh = Mesh(Box[0:1, 0:1], None, [65, 65])
    f_bc = mixed_bcs(
        [None, None, 0.0, 0.0],
        ["periodic", "periodic", "dirichlet", "dirichlet"],
    )
    var = Field("phi", 1, mesh, {"domain": f_bc, "obstacle": None})
    X, Y = np.asarray(mesh.X), np.asarray(mesh.Y)
    blob = np.exp(-((X - 0.3) ** 2 + (Y - 0.5) ** 2) / 0.005)
    var.set_var_tensor(jnp.asarray(blob[None]))

    c = 1.0
    eps = 1e-3
    solver = Solver(
        {"fdm": {"method": "bicgstab", "tol": 1e-9, "max_it": 2000,
                 "report": False}}
    )
    fdm = FDM({"div": {"limiter": "upwind", "edge": False}})

    dt = 0.01
    n_steps = 20
    var.set_time(dt, 0.0)
    for _ in range(n_steps):
        var.save_old()
        solver.set_eq(
            fdm.ddt(var) + fdm.div(c, var) - fdm.laplacian(eps, var) == 0.0
        )
        solver.solve()
        var.update_time()

    v = np.asarray(var()[0])
    assert np.all(np.isfinite(v))
    # center of mass along x (periodic: blob far from seam after t=0.2)
    com_x = (v * X).sum() / v.sum()
    assert abs(com_x - (0.3 + c * var.t)) < 0.02, com_x
    # upwind+BE is diffusive: peak decays but mass stays positive
    assert v.max() < blob.max()
    assert v.min() > -1e-8


def test_lid_driven_cavity_implicit_advection() -> None:
    """Implicit-convection momentum step: larger dt stays stable and
    reaches the same vortex structure."""
    mesh = Mesh(Box[0:1, 0:1], None, [33, 33])
    model = LidDrivenCavity(mesh, nu=0.01, lid_velocity=1.0,
                            implicit_advection=True)
    model.run(dt=0.05, n_steps=60, fused=True)  # dt ~2.5x the explicit-CFL-safe value

    u = np.asarray(model.u()[0])
    assert np.all(np.isfinite(u))
    mid = u.shape[0] // 2
    assert u[mid, :].min() < -0.05, u[mid, :].min()


@pytest.mark.slow
def test_lid_driven_cavity_ghia_quantitative() -> None:
    """Quantitative Ghia et al. (1982) Re=100 benchmark (opt-in, ~3 min).

    65² grid, implicit convection, marched to steady state (t=30).
    Measured on this code: u_min=-0.1943, v_max=0.1649, v_min=-0.2263;
    Ghia's 129² converged values are -0.2109 / 0.1753 / -0.2453 — the
    tolerances below bracket second-order coarse-grid agreement."""
    mesh = Mesh(Box[0:1, 0:1], None, [65, 65])
    model = LidDrivenCavity(mesh, nu=0.01, lid_velocity=1.0,
                            implicit_advection=True)
    model.run(dt=0.025, n_steps=1200, fused=True)

    u = np.asarray(model.u()[0])
    v = np.asarray(model.v()[0])
    mid = u.shape[0] // 2
    u_min = u[mid, :].min()
    v_max = v[:, mid].max()
    v_min = v[:, mid].min()
    assert abs(u_min - (-0.2109)) < 0.03, u_min
    assert abs(v_max - 0.1753) < 0.02, v_max
    assert abs(v_min - (-0.2453)) < 0.03, v_min


def test_rfp_implicit_step() -> None:
    """Implicit RFP stepping (fdm.custom matrix-free operator): stable at
    10x the explicit dt, conserves density, matches the explicit evolution
    in the small-dt limit."""
    mesh = Mesh(Cylinder[0:3, -3:3], None, [32, 48])
    R, Z = np.asarray(mesh.R), np.asarray(mesh.Z)
    f0 = np.exp(-(R**2 + Z**2) / (2 * 0.8**2))
    H = -np.sqrt(R**2 + Z**2 + 0.5)
    G = np.sqrt(R**2 + Z**2 + 0.5)

    model = RFPEvolution(mesh, H, G)

    # explicit reference trajectory
    fe = Field("pdf", 1, mesh, None)
    fe.set_var_tensor(jnp.asarray(f0))
    fe = model.run(fe, dt=2e-4, n_steps=10)

    # implicit with the same resolution in time
    fi = Field("pdf", 1, mesh, None)
    fi.set_var_tensor(jnp.asarray(f0))
    for _ in range(10):
        fi = model.step_implicit(fi, 2e-4)
    # forward vs backward Euler differ at O(dt) locally; same trajectory
    assert_allclose(np.asarray(fi()), np.asarray(fe()), atol=5e-3)

    # implicit at 10x dt: still finite and density-conserving
    fb = Field("pdf", 1, mesh, None)
    fb.set_var_tensor(jnp.asarray(f0))
    den0 = float(fb.volume_integral()[0])
    for _ in range(5):
        fb = model.step_implicit(fb, 2e-3)
    den1 = float(fb.volume_integral()[0])
    assert np.all(np.isfinite(np.asarray(fb())))
    assert abs(den1 - den0) / den0 < 1e-2


def test_rfp_implicit_fd_precond() -> None:
    """Custom-term FD preconditioning (round-4 VERDICT item 3): the
    frozen separable diagonal-diffusion surrogate (``rfp.rfp_fd_hint``)
    drives the fast-diagonalization preconditioner through
    ``fdm.custom(..., fd_hint=...)``. Preconditioned BiCGSTAB must return
    the same solution and take fewer iterations than plain BiCGSTAB."""
    from pyapes_tpu.solver import ops as ops_mod

    mesh = Mesh(Cylinder[0:3, -3:3], None, [32, 48])
    R, Z = np.asarray(mesh.R), np.asarray(mesh.Z)
    f0 = np.exp(-(R**2 + Z**2) / (2 * 0.8**2))
    H = -np.sqrt(R**2 + Z**2 + 0.5)
    G = np.sqrt(R**2 + Z**2 + 0.5)
    model = RFPEvolution(mesh, H, G)

    def run_one(cfg, n_steps=3, dt=2e-3):
        f = Field("pdf", 1, mesh, None)
        f.set_var_tensor(jnp.asarray(f0))
        itrs = []
        orig_solve = ops_mod.Solver.solve

        def spy(self):
            r = orig_solve(self)
            itrs.append(int(self.report["itr"]))
            return r

        ops_mod.Solver.solve = spy
        try:
            for _ in range(n_steps):
                f = model.step_implicit(f, dt, config=cfg)
        finally:
            ops_mod.Solver.solve = orig_solve
        return f, itrs

    f_plain, it_plain = run_one({"precond": "none", "sync": True})
    f_fd, it_fd = run_one({"sync": True})  # default: precond "fd"
    assert_allclose(np.asarray(f_fd()), np.asarray(f_plain()), atol=1e-10)
    assert sum(it_fd) < sum(it_plain), (it_fd, it_plain)


def test_channel_flow_poiseuille() -> None:
    """Inflow/outflow channel: the parabolic profile is a steady solution
    (preserved to grid accuracy), v stays ~0, and the volume flux is
    conserved along the channel (outlet-anchored, non-singular pressure)."""
    from pyapes_tpu.models import ChannelFlow

    mesh = Mesh(Box[0:3, 0:1], None, [49, 33])
    model = ChannelFlow(mesh, nu=0.05, u_in=1.0)
    model.run(dt=0.01, n_steps=300, fused=True)

    u = np.asarray(model.u()[0])
    v = np.asarray(model.v()[0])
    y = np.asarray(mesh._x_np[1])
    exact = 4.0 * y * (1 - y)
    for i in (12, 24, 40):
        assert np.abs(u[i, :] - exact).max() < 0.02, i
    assert np.abs(v).max() < 0.01
    assert abs(model.flux(1) - model.flux(47)) / model.flux(1) < 0.01


def test_channel_flow_past_obstacle() -> None:
    """Flow past an immersed square: no-slip on the body, flux in == flux
    out, wake deficit behind the body with acceleration beside it."""
    from pyapes_tpu.models import ChannelFlow

    mesh = Mesh(Box[0:3, 0:1], [Box[0.9:1.2, 0.35:0.65]], [49, 33])
    model = ChannelFlow(mesh, nu=0.05, u_in=1.0)
    model.run(dt=0.005, n_steps=400, fused=True)

    u = np.asarray(model.u()[0])
    assert np.all(np.isfinite(u))
    body = mesh.obstacle_body_masks[0]
    assert_allclose(u[body], 0.0, atol=1e-12)
    # mass conservation inlet -> outlet
    assert abs(model.flux(1) - model.flux(47)) / model.flux(1) < 0.03
    # wake deficit on the centerline behind the body (x=1.5, y=0.5:
    # unobstructed Poiseuille would be 1.0) and blockage acceleration in
    # the side gap
    assert u[24, 16] < 0.7, u[24, 16]
    assert u[24, 5] > 4.0 * 0.15 * 0.85 + 0.1, u[24, 5]


@pytest.mark.slow
def test_lid_driven_cavity_ghia_129() -> None:
    """Ghia et al. (1982) Re=100 at the reference's own 129² resolution
    (opt-in; VERDICT r1 item 5: u_min within 3% of -0.2109). Implicit
    convection + Rhie-Chow stabilization, marched to steady state."""
    mesh = Mesh(Box[0:1, 0:1], None, [129, 129])
    model = LidDrivenCavity(mesh, nu=0.01, lid_velocity=1.0,
                            implicit_advection=True)
    model.run(dt=0.05, n_steps=600, fused=True)  # t = 30

    u = np.asarray(model.u()[0])
    v = np.asarray(model.v()[0])
    mid = u.shape[0] // 2
    u_min = u[mid, :].min()
    v_max = v[:, mid].max()
    v_min = v[:, mid].min()
    assert abs(u_min - (-0.2109)) < 0.03 * 0.2109, u_min
    assert abs(v_max - 0.1753) < 0.05 * 0.1753, v_max
    assert abs(v_min - (-0.2453)) < 0.05 * 0.2453, v_min


def test_lid_driven_cavity_3d() -> None:
    """3-D lid-driven cavity (lid = zu face moving along +x): primary
    vortex forms in the x-z midplane, spanwise flow is antisymmetric-ish,
    bulk stays near divergence-free. The reference has no NS at all; the
    2-D scheme generalizes unchanged."""
    mesh = Mesh(Box[0:1, 0:1, 0:1], None, [21, 21, 21])
    model = LidDrivenCavity(mesh, nu=0.02, lid_velocity=1.0)
    model.run(dt=0.02, n_steps=50, fused=True)

    u = np.asarray(model.u()[0])
    w = np.asarray(model.w()[0])
    assert np.all(np.isfinite(u)) and np.all(np.isfinite(w))
    mid = u.shape[0] // 2
    # lid BC enforced on the top wall interior
    assert_allclose(u[1:-1, 1:-1, -1], 1.0, atol=1e-12)
    # primary vortex: u along the vertical centerline dips negative
    assert u[mid, mid, :].min() < -0.03, u[mid, mid, :].min()
    # z-velocity develops (downwash at the right wall, upwash at left)
    assert w.min() < -0.05 and w.max() > 0.05
    # bulk divergence small
    div = np.abs(np.asarray(model.divergence())[2:-2, 2:-2, 2:-2])
    assert div.mean() < 0.05, div.mean()


def test_burgers_2d_reduces_to_1d() -> None:
    """2-D vector Burgers with an x-only initial condition (v=0) stays
    x-only and matches the 1-D travelling-wave solution — consistency of
    fdm.conv with the validated 1-D model."""
    from math import pi

    from pyapes_tpu.models import BurgersND
    from pyapes_tpu.testing.burgers import burger_exact_nd

    nu = 0.25
    mesh1 = Mesh(Box[0 : 2 * pi], None, [101])
    u0 = jnp.asarray(burger_exact_nd(mesh1, nu, 0.0))  # (65,)

    mesh2 = Mesh(Box[0 : 2 * pi, 0 : 2 * pi], None, [101, 101])
    u0_2d = jnp.broadcast_to(u0[None, :, None], (1, 101, 101))
    model = BurgersND(
        mesh2, nu=nu, init_vals=[u0_2d, jnp.zeros((1, 101, 101))]
    )
    dt, n_steps = 0.01, 10
    model.run(dt, n_steps)

    u = np.asarray(model.u if False else model.vel[0]()[0])
    v = np.asarray(model.vel[1]()[0])
    # v stays zero, u stays y-independent
    assert np.abs(v).max() < 1e-6, np.abs(v).max()
    assert np.abs(u - u[:, :1]).max() < 1e-6
    # matches the 1-D exact solution at t (same tolerance convention as
    # test_burger_1d_transient: the central+BE scheme has an O(1) max-norm
    # floor at the travelling front; pin relative L2 + that bound)
    exact = np.asarray(burger_exact_nd(mesh1, nu, dt * n_steps))
    err = u[:, 0] - exact
    rel_l2 = np.linalg.norm(err) / np.linalg.norm(exact)
    assert rel_l2 < 0.05, rel_l2
    assert np.abs(err).max() < 1.2


def test_channel_duct_3d() -> None:
    """3-D rectangular duct: product-parabola inflow, outflow anchor,
    no-slip walls. Mass flux is conserved along the duct and the
    transverse velocities stay small."""
    from pyapes_tpu.models import ChannelFlow

    mesh = Mesh(Box[0:2, 0:1, 0:1], None, [33, 17, 17])
    model = ChannelFlow(mesh, nu=0.05, u_in=1.0)
    # deliberately EAGER (see test_lid_driven_cavity): 3-D + channel
    # family coverage of the per-step dispatch path
    model.run(dt=0.01, n_steps=25)

    u = np.asarray(model.u()[0])
    assert np.all(np.isfinite(u))
    # discrete inflow flux of the product parabola: ~16/36 = 0.444
    fin = model.flux(1)
    fout = model.flux(u.shape[0] - 2)
    assert abs(fin - 0.444) < 0.02, fin
    assert abs(fout - fin) / fin < 0.05, (fin, fout)
    # transverse components stay secondary
    v = np.asarray(model.v()[0])
    w = np.asarray(model.w()[0])
    assert np.abs(v).max() < 0.3 and np.abs(w).max() < 0.3


def test_natural_convection_davis_ra1e3() -> None:
    """Differentially-heated cavity (de Vahl Davis 1983), Ra=1e3, Pr=0.71:
    hot-wall Nusselt number vs the benchmark value 1.118 (buoyancy-coupled
    NS + implicit heat transport — the reference has no coupled physics)."""
    from pyapes_tpu.models import NaturalConvection

    mesh = Mesh(Box[0:1, 0:1], None, [33, 33])
    model = NaturalConvection(mesh, ra=1e3, pr=0.71)
    model.run(dt=0.0125, n_steps=60)  # t = 0.75, steady at this Ra

    nu_wall = model.nusselt_hot_wall()
    assert abs(nu_wall - 1.118) < 0.03 * 1.118, nu_wall
    # circulation: single clockwise-ish roll driven by the hot wall
    v = np.asarray(model.v()[0])
    assert v.max() > 0.5 and v.min() < -0.5
    # temperature bounded by the wall values (maximum principle)
    T = np.asarray(model.T()[0])
    assert T.max() <= 1.0 + 1e-8 and T.min() >= -1e-8


def _davis_diagnostics(model, mesh):
    """De Vahl Davis comparison quantities: cavity-averaged Nusselt
    number (``NaturalConvection.nusselt_avg`` — robust to wall-gradient
    truncation, unlike the one-sided wall formula) and the mid-line
    velocity extrema."""
    u = np.asarray(model.u()[0])
    v = np.asarray(model.v()[0])
    n = u.shape[0]
    return {
        "nu_avg": model.nusselt_avg(),
        "u_max": float(u[n // 2, :].max()),  # vertical mid-line x=0.5
        "v_max": float(v[:, n // 2].max()),  # horizontal mid-line y=0.5
    }


@pytest.mark.slow
def test_natural_convection_davis_ra1e4() -> None:
    """De Vahl Davis (1983) Ra=1e4 (round-4 VERDICT item 4 — the
    advection-dominated regime beyond the Ra=1e3 anchor): benchmark
    Nu_avg = 2.243, u_max = 16.178, v_max = 19.617. 65² second-order
    values measured here: nu_avg 2.257 (+0.6%), u_max 15.67 (-3.1%),
    v_max 18.58 (-5.3%) — tolerances bracket coarse-grid convergence."""
    from pyapes_tpu.models import NaturalConvection

    mesh = Mesh(Box[0:1, 0:1], None, [65, 65])
    model = NaturalConvection(mesh, ra=1e4, pr=0.71)
    model.run(dt=2e-3, n_steps=250, fused=True)  # t = 0.5, steady
    d = _davis_diagnostics(model, mesh)
    assert abs(d["nu_avg"] - 2.243) < 0.02 * 2.243, d
    assert abs(d["u_max"] - 16.178) < 0.05 * 16.178, d
    assert abs(d["v_max"] - 19.617) < 0.07 * 19.617, d
    # the one-sided wall formula under-reads the thin layer; keep a
    # looser sanity band on it
    assert abs(model.nusselt_hot_wall() - 2.243) < 0.06 * 2.243


@pytest.mark.slow
def test_natural_convection_davis_ra1e5() -> None:
    """De Vahl Davis Ra=1e5: Nu_avg = 4.519 (97² measured 4.586, +1.5%).
    Velocity peaks live in ~Ra^(-1/4) wall layers that 97² resolves with
    only a few cells; Nu is the robust anchor at this Ra."""
    from pyapes_tpu.models import NaturalConvection

    mesh = Mesh(Box[0:1, 0:1], None, [97, 97])
    model = NaturalConvection(mesh, ra=1e5, pr=0.71)
    model.run(dt=1e-3, n_steps=500, fused=True)  # t = 0.5
    d = _davis_diagnostics(model, mesh)
    assert abs(d["nu_avg"] - 4.519) < 0.03 * 4.519, d
    # circulation magnitudes in the benchmark's ballpark (coarse-grid
    # peaks under-read; see docstring)
    assert 25.0 < d["u_max"] < 40.0, d
    assert 50.0 < d["v_max"] < 75.0, d


def test_natural_convection_3d_smoke() -> None:
    """3-D heated cavity: the Boussinesq model generalizes with the NS
    base (vertical = z); temperature bounded, circulation develops."""
    from pyapes_tpu.models import NaturalConvection

    mesh = Mesh(Box[0:1, 0:1, 0:1], None, [17, 17, 17])
    model = NaturalConvection(mesh, ra=1e3, pr=0.71)
    model.run(dt=0.02, n_steps=15)
    T = np.asarray(model.T()[0])
    w = np.asarray(model.w()[0])
    assert np.all(np.isfinite(T)) and np.all(np.isfinite(w))
    assert T.max() <= 1.0 + 1e-8 and T.min() >= -1e-8
    assert np.abs(w).max() > 0.5  # buoyant circulation
    assert 0.9 < model.nusselt_hot_wall() < 1.5


@pytest.mark.slow
def test_cavity_3d_cube_richardson_anchor() -> None:
    """TRUE 3-D lid-driven cube at Re=100 (round-4 VERDICT item 4): a
    grid-convergence (Richardson) anchor for genuinely 3-D physics —
    no-slip spanwise walls, so this is NOT the quasi-2-D reduction case.

    Published 3-D tables (Ku et al. 1987 / Jiang et al. 1994) cannot be
    fetched in this environment, so the anchor is internal and
    physics-discriminating: (1) the symmetry-plane centerline u-minimum
    converges at ~2nd order across 25/33/49 grids, (2) its Richardson
    limit is pinned (measured here: -0.2143; regression golden), (3) it
    lands within 5% of the 2-D Ghia value -0.2109 — at Re=100 the cube's
    mid-plane profile deviates little from 2-D (end-wall braking is a
    high-Re effect), which quasi-2-D reduction alone cannot certify —
    and (4) the steady solution is spanwise-symmetric about y=0.5."""
    grids = (25, 33, 49)
    u_mins = []
    u_last = None
    for n in grids:
        mesh = Mesh(Box[0:1, 0:1, 0:1], None, [n, n, n])
        m = LidDrivenCavity(mesh, nu=0.01, lid_velocity=1.0,
                            implicit_advection=True)
        m.run(dt=0.05, n_steps=300, fused=True)  # t = 15, steady
        u = np.asarray(m.u()[0])
        mid = n // 2
        u_mins.append(float(u[mid, mid, :].min()))
        u_last = u
    d1 = u_mins[1] - u_mins[0]
    d2 = u_mins[2] - u_mins[1]
    # monotone contraction toward the limit
    assert abs(d2) < abs(d1), u_mins
    # 2nd-order Richardson limit from the finest pair
    h2 = (1.0 / 32) ** 2
    h3 = (1.0 / 48) ** 2
    u_star = u_mins[2] + d2 * h3 / (h2 - h3)
    assert abs(u_star - (-0.2143)) < 0.004, (u_mins, u_star)
    assert abs(u_star - (-0.2109)) < 0.05 * 0.2109, u_star
    # spanwise symmetry about the y mid-plane (steady, symmetric forcing)
    asym = np.abs(u_last - u_last[:, ::-1, :]).max()
    assert asym < 5e-3 * np.abs(u_last).max(), asym


def test_cavity_3d_quasi2d_reduction() -> None:
    """Quantitative 3-D NS validation by exact reduction: a 3-D cavity with
    symmetry spanwise BCs and spanwise-uniform state is EXACTLY the 2-D
    cavity (y-advection and y-diffusion vanish identically), so the 3-D
    solver must reproduce the Ghia-validated 2-D solver's centerline
    profile. This anchors the full 3-D machinery (momentum, pressure
    Poisson, projection) to published data through the 2-D Ghia tests
    (round-3 VERDICT item 5; 3-D reference tables are unfetchable here,
    the reduction argument is exact instead)."""
    n = 33
    dt, steps, nu = 0.01, 40, 0.05
    m2 = Mesh(Box[0:1, 0:1], None, [n, n])
    model2 = LidDrivenCavity(m2, nu=nu, rhie_chow=False,
                             config={"tol": 1e-10})
    model2.run(dt, steps, fused=True)
    u2 = np.asarray(model2.u()[0])  # (x, y)

    m3 = Mesh(Box[0:1, 0:1, 0:1], None, [n, 5, n])
    model3 = LidDrivenCavity(m3, nu=nu, rhie_chow=False,
                             spanwise="symmetry", config={"tol": 1e-10})
    model3.run(dt, steps, fused=True)
    u3 = np.asarray(model3.u()[0])  # (x, y_span, z)
    v3 = np.asarray(model3.v()[0])

    # spanwise invariance holds to solver tolerance
    assert np.max(np.abs(u3 - u3[:, :1, :])) < 1e-6
    # spanwise velocity never develops
    assert np.max(np.abs(v3)) < 1e-6
    # the mid-span slice IS the 2-D solution
    np.testing.assert_allclose(u3[:, 2, :], u2, atol=5e-6)
    # and the 2-D solution moves like a cavity (sanity on the anchor)
    assert u2[n // 2, -1] == 1.0
    assert u2[n // 2, 1:-1].min() < -0.1


def test_cavity_regularized_lid_corner_divergence() -> None:
    """The regularized lid (16 s^2 (1-s)^2) removes the corner velocity
    discontinuity; the O(1) divergence spike within a few cells of the
    lid corners (ROADMAP r2) drops by an order of magnitude, while the
    bulk stays divergence-free."""
    n = 49
    dt, steps, nu = 0.005, 30, 0.02

    def run(profile):
        mesh = Mesh(Box[0:1, 0:1], None, [n, n])
        model = LidDrivenCavity(mesh, nu=nu, lid_profile=profile)
        model.run(dt, steps)
        div = np.abs(np.asarray(model.divergence()))
        corner = max(div[:4, -4:].max(), div[-4:, -4:].max())
        bulk = div[4:-4, 4:-4].mean()
        return corner, bulk

    c_uni, b_uni = run("uniform")
    c_reg, b_reg = run("regularized")
    # an order of magnitude off the corner spike (measured at 49^2:
    # ~2.1 -> ~0.21); the remaining localized error is the collocated
    # one-sided wall treatment, not the lid discontinuity, and decays
    # with resolution (documented in ROADMAP.md)
    assert c_reg < c_uni / 10, (c_reg, c_uni)
    assert c_reg < 0.5, c_reg
    assert b_reg < 5e-3, b_reg


def test_cavity_adaptive_dt() -> None:
    """CFL-adaptive stepping: reaches t_end exactly, shrinks dt as the
    flow spins up (max|u| grows from 0 toward the lid speed), stays
    finite, and NEVER recompiles (dt streams as a runtime operand)."""
    from pyapes_tpu.solver import linalg

    linalg.clear_cache()
    mesh = Mesh(Box[0:1, 0:1], None, [17, 17])
    model = LidDrivenCavity(mesh, nu=0.01, lid_velocity=1.0)
    cfl = 0.4
    taken = []
    t_prev = 0.0

    orig_step = model.step

    def record_step(dt):
        taken.append(dt)
        orig_step(dt)

    model.step = record_step
    n = model.run_adaptive(cfl, t_end=0.2, dt_max=0.1)
    assert n == len(taken)
    assert abs(model.t - 0.2) < 1e-10
    # first step is the at-rest cap; once the lid spins the flow up
    # (max|u| -> lid speed 1), the CFL limit binds: dt -> cfl * dx
    dx = 1.0 / 16
    assert abs(taken[0] - 0.1) < 1e-12
    assert taken[-2] < 0.5 * taken[0]  # (last step may shorten to t_end)
    assert abs(taken[-2] - cfl * dx) < 0.2 * cfl * dx
    umax = float(model.max_velocity())
    assert 0.5 < umax <= 1.0 + 1e-6
    assert np.all(np.isfinite(np.asarray(model.u()[0])))
    n_structs = len(linalg._SOLVER_CACHE)
    # one more pass must not add cache entries (no recompile on dt change)
    model.run_adaptive(cfl, t_end=0.25)
    assert len(linalg._SOLVER_CACHE) == n_structs


def test_variable_viscosity_stress_mms() -> None:
    """Variable-viscosity stress divergence ``div(mu (grad u + grad u^T))``
    = implicit conservative part (``apply_diff_field``) + the explicit
    transpose source (``_visc_transpose_rhs``): 2nd-order convergence on
    a manufactured incompressible field."""
    from pyapes_tpu.ops.stencil import apply_diff_field

    def err_at(n):
        mesh = Mesh(Box[0:1, 0:1], None, [n, n])
        model = LidDrivenCavity(mesh, nu=np.ones((n, n)), lid_velocity=0.0)
        X, Y = (np.asarray(g) for g in mesh._grid_np)
        mu = 1.0 + 0.5 * X + 0.3 * Y
        model.update_viscosity(jnp.asarray(mu))
        # psi = sin(pi x) sin(pi y): u = psi_y, v = -psi_x (div-free)
        u = np.pi * np.sin(np.pi * X) * np.cos(np.pi * Y)
        v = -np.pi * np.cos(np.pi * X) * np.sin(np.pi * Y)
        model.vel[0].set_var_tensor(jnp.asarray(u)[None])
        model.vel[1].set_var_tensor(jnp.asarray(v)[None])

        # analytic S_j = mu lap(u_j) + grad(mu).grad(u_j)
        #              + sum_k d_k(mu) d_j(u_k)
        ux = np.pi**2 * np.cos(np.pi * X) * np.cos(np.pi * Y)
        uy = -np.pi**2 * np.sin(np.pi * X) * np.sin(np.pi * Y)
        vx = np.pi**2 * np.sin(np.pi * X) * np.sin(np.pi * Y)
        vy = -np.pi**2 * np.cos(np.pi * X) * np.cos(np.pi * Y)
        lap_u = -2 * np.pi**2 * u
        lap_v = -2 * np.pi**2 * v
        mux, muy = 0.5, 0.3
        S = [
            mu * lap_u + mux * ux + muy * uy + (mux * ux + muy * vx),
            mu * lap_v + mux * vx + muy * vy + (mux * uy + muy * vy),
        ]

        inv_dx2 = tuple(1.0 / float(d) ** 2 for d in mesh.dx_np)
        surgery = (("none", "none"),) * 2
        trans = model._visc_transpose_rhs()
        errs = []
        for j, w in enumerate((u, v)):
            impl = np.asarray(
                apply_diff_field(
                    jnp.asarray(w)[None], jnp.asarray(mu), inv_dx2, surgery
                )
            )[0]
            got = impl + np.asarray(trans[j])
            e = np.abs(got - S[j])[2:-2, 2:-2]
            errs.append(e.max())
        return max(errs)

    e33, e65 = err_at(33), err_at(65)
    assert e65 < e33 / 3.2, (e33, e65)  # ~2nd order


def test_natural_convection_variable_viscosity() -> None:
    """Temperature-dependent viscosity mu(T): the constant-callable case
    reproduces the scalar path, and a real mu(T) run stays physical
    (bounded T, sane Nusselt) while compiling the momentum solver once."""
    from pyapes_tpu.models import NaturalConvection
    from pyapes_tpu.solver import linalg

    n = 33
    # (a) constant mu_fn == scalar path
    mesh = Mesh(Box[0:1, 0:1], None, [n, n])
    m_ref = NaturalConvection(mesh, ra=1e3, pr=0.71)
    m_ref.run(dt=0.0125, n_steps=12)
    mesh2 = Mesh(Box[0:1, 0:1], None, [n, n])
    m_fn = NaturalConvection(
        mesh2, ra=1e3, pr=0.71,
        mu_fn=lambda T: 0.71 * jnp.ones_like(T),
    )
    m_fn.run(dt=0.0125, n_steps=12)
    assert_allclose(
        np.asarray(m_fn.T()[0]), np.asarray(m_ref.T()[0]),
        rtol=0, atol=2e-5,
    )
    assert_allclose(
        np.asarray(m_fn.v()[0]), np.asarray(m_ref.v()[0]),
        rtol=0, atol=2e-4,
    )

    # (b) hot fluid half as viscous: physical run, one compile
    mesh3 = Mesh(Box[0:1, 0:1], None, [n, n])
    m_var = NaturalConvection(
        mesh3, ra=1e3, pr=0.71,
        mu_fn=lambda T: 0.71 * jnp.exp(-0.6931 * T),
    )
    linalg.clear_cache()
    m_var.run(dt=0.0125, n_steps=40)
    # momentum (u, v share one structure) + pressure + temperature
    assert len(linalg._SOLVER_CACHE) <= 3, len(linalg._SOLVER_CACHE)
    T = np.asarray(m_var.T()[0])
    assert T.max() <= 1.0 + 1e-6 and T.min() >= -1e-6
    nu_wall = m_var.nusselt_hot_wall()
    assert 1.0 < nu_wall < 2.0, nu_wall


def test_channel_power_law_shear_thinning() -> None:
    """Generalized-Newtonian ChannelFlow (regularized power-law,
    n = 0.5): the developed profile is FLATTER than the Newtonian
    parabola — u_max/u_mean approaches the power-law value
    (2n+1)/(n+1) = 4/3 instead of 3/2 (mu(strain) re-evaluated per step
    from the strain rate and streamed)."""
    from pyapes_tpu.models import ChannelFlow, power_law_viscosity

    mesh = Mesh(Box[0:3, 0:1], None, [49, 33])
    model = ChannelFlow(
        mesh, nu=0.05, u_in=1.0,
        mu_strain_fn=power_law_viscosity(K=0.05, n=0.5, eps=1e-3),
    )
    model.run(dt=0.01, n_steps=300, fused=True)

    u = np.asarray(model.u()[0])
    i = 40  # far downstream
    ratio = u[i].max() / u[i].mean()
    assert 1.22 < ratio < 1.44, ratio  # Newtonian would sit at ~1.5
    assert abs(model.flux(1) - model.flux(47)) / model.flux(1) < 0.02


def test_natural_convection_nonlinear_conduction_k_of_T() -> None:
    """Temperature-dependent conductivity k(T) = 1 + T at negligible
    Rayleigh number: the steady state is the EXACT nonlinear conduction
    profile ``T(x) = -1 + sqrt(4 - 3x)`` (from (1+T) dT/dx = const with
    T(0)=1, T(1)=0) — the conservative div(k grad T) path, k streamed
    per step."""
    from pyapes_tpu.models import NaturalConvection

    n = 33
    mesh = Mesh(Box[0:1, 0:1], None, [n, n])
    model = NaturalConvection(
        mesh, ra=1.0, pr=0.71, k_fn=lambda T: 1.0 + T
    )
    model.run(dt=0.05, n_steps=60)  # t = 3: conduction steady state

    X = np.asarray(mesh._grid_np[0])[:, n // 2]
    T = np.asarray(model.T()[0])[:, n // 2]
    exact = -1.0 + np.sqrt(4.0 - 3.0 * X)
    assert np.abs(T - exact).max() < 0.01, np.abs(T - exact).max()


def test_smagorinsky_les_closure_and_high_re_cavity() -> None:
    """Smagorinsky LES on the variable-viscosity machinery.

    (a) Closure correctness on a manufactured field: for pure shear
    u = (y, 0) the resolved strain magnitude is |S| = sqrt(2 S:S) = 1
    exactly (S12 = 1/2), so nu_eff = nu + (C_s Δ)² everywhere.

    (b) Under-resolved Re = 5000 cavity (65², regularized lid): the run
    stays finite and bounded, and the eddy viscosity is ACTIVE — its
    max is several times molecular nu in the lid shear layer while the
    quiescent core stays at ~nu (the closure vanishes with the strain).
    """
    from pyapes_tpu.models import LidDrivenCavity, smagorinsky_viscosity

    # (a) manufactured shear
    n = 33
    mesh = Mesh(Box[0:1, 0:1], None, [n, n])
    nu_mol = 0.01
    model = LidDrivenCavity(
        mesh, nu=nu_mol, lid_velocity=1.0,
        mu_strain_fn=smagorinsky_viscosity(nu_mol, mesh, cs=0.17),
    )
    Y = jnp.asarray(mesh._grid_np[1])
    model.vel[0].set_var_tensor(Y[None])
    model.vel[1].set_var_tensor(jnp.zeros_like(Y)[None])
    gdot = np.asarray(model.strain_rate())
    inner = gdot[2:-2, 2:-2]
    assert_allclose(inner, 1.0, rtol=0, atol=1e-6)
    delta = float(np.prod(np.asarray(mesh.dx_np))) ** 0.5
    nu_eff = smagorinsky_viscosity(nu_mol, mesh, cs=0.17)(
        jnp.asarray(gdot)
    )
    assert_allclose(
        np.asarray(nu_eff)[2:-2, 2:-2],
        nu_mol + (0.17 * delta) ** 2,
        rtol=1e-6,
    )

    # damping array scales the constant
    damp = np.zeros((n, n))
    nu_d = smagorinsky_viscosity(nu_mol, mesh, cs=0.17, damping=damp)(
        jnp.ones((n, n))
    )
    assert_allclose(np.asarray(nu_d), nu_mol, rtol=0, atol=1e-12)

    # (b) under-resolved high-Re cavity
    n = 65
    mesh2 = Mesh(Box[0:1, 0:1], None, [n, n])
    nu_mol = 2e-4  # Re = 5000
    les = LidDrivenCavity(
        mesh2, nu=nu_mol, lid_velocity=1.0, lid_profile="regularized",
        mu_strain_fn=smagorinsky_viscosity(nu_mol, mesh2, cs=0.17),
    )
    les.run(dt=2e-3, n_steps=150, fused=True)
    u = np.asarray(les.vel[0]())
    v = np.asarray(les.vel[1]())
    assert np.isfinite(u).all() and np.isfinite(v).all()
    assert np.abs(u).max() <= 1.5 and np.abs(v).max() <= 1.5
    nu_t = np.asarray(les._nu_field) - nu_mol
    assert nu_t.max() > 1.5 * nu_mol, nu_t.max()  # model active in shear
    # quiescent early-time core: eddy viscosity ~0 where strain ~0
    assert nu_t.min() >= -1e-12


def test_taylor_green_decay() -> None:
    """2-D decaying Taylor-Green vortex on the fully periodic box — an
    EXACT transient NS solution (the nonlinear term is a pure gradient
    absorbed by the pressure, so the velocity decays self-similarly at
    rate exp(-8 pi^2 nu t)). Validates advection + incremental projection
    + all-periodic BC machinery against a closed form; the reference has
    no NS model and no periodic-flow capability."""
    from pyapes_tpu.models import PeriodicFlow

    n, nu = 65, 0.01
    mesh = Mesh(Box[0:1, 0:1], None, [n, n])
    model = PeriodicFlow(mesh, nu=nu)
    k = 2 * pi
    u0 = -jnp.cos(k * mesh.X) * jnp.sin(k * mesh.Y)
    v0 = jnp.sin(k * mesh.X) * jnp.cos(k * mesh.Y)
    model.set_velocity(u0, v0)

    dt, steps = 2e-3, 50
    model.run(dt, steps)
    decay = exp(-2 * k**2 * nu * dt * steps)

    u = np.asarray(model.u()[0])
    v = np.asarray(model.v()[0])
    u_ex = np.asarray(u0) * decay
    v_ex = np.asarray(v0) * decay
    rel_u = np.linalg.norm(u - u_ex) / np.linalg.norm(u_ex)
    rel_v = np.linalg.norm(v - v_ex) / np.linalg.norm(v_ex)
    assert rel_u < 0.01 and rel_v < 0.01, (rel_u, rel_v)

    # kinetic energy: exact integral is 1/4 at t=0, decaying at twice the
    # amplitude rate
    ke = float(model.kinetic_energy())
    assert abs(ke / (0.25 * decay**2) - 1.0) < 0.02, ke

    # the field stays divergence-free in the projection sense
    div = np.asarray(model.divergence())
    assert np.abs(div).max() < 0.05, np.abs(div).max()


def test_taylor_green_3d_z_invariant() -> None:
    """z-invariant Taylor-Green in a fully periodic 3-D box must
    reproduce the 2-D decay (w stays zero; no vortex stretching for a
    z-invariant field) — validates the 3-D all-periodic NS path."""
    from pyapes_tpu.models import PeriodicFlow

    n, nz, nu = 33, 9, 0.01
    mesh = Mesh(Box[0:1, 0:1, 0:1], None, [n, n, nz])
    # tight tolerances: w picks up pressure-solve noise amplified by
    # 1/dz through the projection, so the z-invariance bound below is
    # solver-tolerance-limited, not scheme-limited
    model = PeriodicFlow(mesh, nu=nu, config={"tol": 1e-9})
    k = 2 * pi
    u0 = -jnp.cos(k * mesh.X) * jnp.sin(k * mesh.Y)
    v0 = jnp.sin(k * mesh.X) * jnp.cos(k * mesh.Y)
    model.set_velocity(u0, v0, jnp.zeros_like(u0))

    dt, steps = 2e-3, 20
    model.run(dt, steps)
    decay = exp(-2 * k**2 * nu * dt * steps)

    u = np.asarray(model.u()[0])
    w = np.asarray(model.w()[0])
    u_ex = np.asarray(u0) * decay
    rel_u = np.linalg.norm(u - u_ex) / np.linalg.norm(u_ex)
    assert rel_u < 0.02, rel_u
    assert np.abs(w).max() < 1e-6, np.abs(w).max()


@pytest.mark.slow
def test_tgv3d_les_dissipation_peak() -> None:
    """3-D Taylor-Green vortex at Re=1600 with the Smagorinsky closure —
    THE quantitative LES anchor (transition to turbulence). The total
    dissipation rate eps(t) = -d<E>/dt must trace the canonical curve:
    a slow start, a sharp peak at the transition, then decay. DNS
    reference (van Rees et al. 2011, 512^3 spectral; Brachet 1983):
    eps_max ~ 0.0122 at t ~ 9.0. A 64^3 Smagorinsky LES reproduces the
    peak approximately (measured here on TPU and CPU: 0.0108 at t=7.7 —
    slightly early/low, as expected of a dissipative SGS model at
    coarse resolution with 2nd-order stencils).

    Runs the SKEW-SYMMETRIC advection form (the PeriodicFlow default):
    the advective form blows up at t ~ 4.5 on this grid (quadratic
    aliasing), which this test would catch as a NaN/absurd peak.
    """
    from pyapes_tpu.models import PeriodicFlow
    from pyapes_tpu.models.navier_stokes import smagorinsky_viscosity

    n, L, nu = 64, 2 * pi, 1.0 / 1600.0
    mesh = Mesh(Box[0:L, 0:L, 0:L], None, [n, n, n], dtype="single")
    model = PeriodicFlow(
        mesh, nu=nu, mu_strain_fn=smagorinsky_viscosity(nu, mesh, cs=0.17),
        config={"sync": False},
    )
    X, Y, Z = mesh.X, mesh.Y, mesh.Z
    model.set_velocity(
        jnp.sin(X) * jnp.cos(Y) * jnp.cos(Z),
        -jnp.cos(X) * jnp.sin(Y) * jnp.cos(Z),
        jnp.zeros_like(X),
    )

    vol = L**3
    dt = 0.2 * (L / (n - 1))
    every = max(1, int(round(0.25 / dt)))
    t_end = 12.0
    ts, Es = [0.0], [float(model.kinetic_energy()) / vol]
    assert abs(Es[0] - 0.125) < 2e-3  # <E>(0) = 1/8
    for _ in range(int(np.ceil(t_end / (every * dt)))):
        model.run(dt, every, fused=True)
        ts.append(model.t)
        Es.append(float(model.kinetic_energy()) / vol)

    es, ts_np = np.asarray(Es), np.asarray(ts)
    assert np.all(np.isfinite(es)), "energy blew up"
    assert np.all(np.diff(es) < 0), "kinetic energy must decay monotonically"
    eps = -(es[1:] - es[:-1]) / (ts_np[1:] - ts_np[:-1])
    t_mid = 0.5 * (ts_np[1:] + ts_np[:-1])
    i_pk = int(np.argmax(eps))
    eps_max, t_pk = float(eps[i_pk]), float(t_mid[i_pk])
    # DNS: 0.0122 @ t=9.0; 64^3 LES bounds (generous for dt/cs jitter)
    assert 0.008 < eps_max < 0.0135, eps_max
    assert 6.0 < t_pk < 10.0, t_pk
    # the transition actually happened: late-time energy well below the
    # laminar-decay value exp(-2 nu t) * E0 it would keep without it
    assert es[-1] < 0.07


def test_beltrami_abc_decay_3d_anchor() -> None:
    """Decaying ABC/Beltrami flow — an EXACT fully-3-D nonlinear NS
    solution (Ethier & Steinman 1994 class; Antuono 2020 tri-periodic):

        u = (A sin z + C cos y, B sin x + A cos z, C sin y + B cos x)

    is a Beltrami field (curl u = u), so the advection term is a pure
    gradient balanced by ``p = -|u|^2/2 e^{-2 nu t}`` and the velocity
    decays self-similarly: ``u(t) = u0 e^{-nu t}``. Unlike the 2-D
    Taylor-Green anchor this is genuinely three-dimensional (all three
    components, all three directions active), so it pins the 3-D
    advection + projection + periodic machinery against exact values —
    the round-4 gap was that 3-D NS had only self-convergence plus the
    TGV LES peak. Asserts pointwise accuracy at two resolutions AND the
    grid-convergence order; the kinetic energy must track the exact
    ``E0 e^{-2 nu t}``."""
    from pyapes_tpu.models import PeriodicFlow

    L, nu, t_end = 2 * pi, 0.2, 0.5

    def run(n):
        mesh = Mesh(Box[0:L, 0:L, 0:L], None, [n, n, n], dtype="double")
        model = PeriodicFlow(mesh, nu=nu, config={"sync": False})
        X, Y, Z = mesh.X, mesh.Y, mesh.Z
        u0 = jnp.sin(Z) + jnp.cos(Y)
        v0 = jnp.sin(X) + jnp.cos(Z)
        w0 = jnp.sin(Y) + jnp.cos(X)
        model.set_velocity(u0, v0, w0)
        E0 = float(model.kinetic_energy())
        h = L / (n - 1)
        steps = int(round(t_end / (0.2 * h / 2.0)))
        dt = t_end / steps
        model.run(dt, steps, fused=True)
        dec = np.exp(-nu * model.t)
        num = den = 0.0
        for j, e0 in enumerate((u0, v0, w0)):
            ue = np.asarray(e0) * dec
            num += float(np.sum((np.asarray(model.vel[j]()[0]) - ue) ** 2))
            den += float(np.sum(ue**2))
        E = float(model.kinetic_energy())
        return np.sqrt(num / den), E / E0, dec

    e17, Er17, dec = run(17)
    # measured (CPU f64): 1.73e-3 at 17^3, 8.1e-4 at 25^3 (order ~1.96)
    assert e17 < 3.0e-3, e17
    assert abs(Er17 - dec**2) < 4e-3, (Er17, dec**2)

    e25, Er25, _ = run(25)
    assert e25 < 1.5e-3, e25
    order = np.log(e17 / e25) / np.log(24.0 / 16.0)
    assert order > 1.5, (e17, e25, order)
