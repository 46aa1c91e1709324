"""Direct numerical parity against the torch reference implementation.

BASELINE.json pins "within 1e-8 of torch reference on ported test_fdm /
test_solver cases (CPU, f64)". These tests run the reference (read-only at
/root/reference) side by side and compare:

  * Laplacian coefficient application with Neumann surgery (identical
    discretization -> bitwise-level agreement),
  * Dirichlet Poisson solves (identical discrete systems -> solutions
    agree to solver tolerance),
  * axisymmetric rz Poisson solve,
  * RFP friction/diffusion operators.

Deliberate deviations (documented in PARITY.md) are NOT asserted here:
grad/div Neumann surgery (reference inconsistent with its own BC
application), upwind (reference fails its own test), edge-mode Laplacian.

Skipped when torch or the reference checkout is unavailable.
"""
import sys
import types

import numpy as np
import pytest
from numpy.testing import assert_allclose

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

# The reference imports `pymytools` (a personal helper package, SURVEY §0);
# inline the one function it uses (upper-triangular index pairs,
# reference fdc.py:12).
if "pymytools" not in sys.modules:
    pmt = types.ModuleType("pymytools")
    idx_mod = types.ModuleType("pymytools.indices")
    idx_mod.tensor_idx = lambda dim: [
        (i, j) for i in range(dim) for j in range(i, dim)
    ]
    pmt.indices = idx_mod
    sys.modules["pymytools"] = pmt
    sys.modules["pymytools.indices"] = idx_mod

try:
    from pyapes.geometry import Box as RBox
    from pyapes.geometry import Cylinder as RCylinder
    from pyapes.mesh import Mesh as RMesh
    from pyapes.solver.fdc import FDC as RFDC
    from pyapes.solver.fdm import FDM as RFDM
    from pyapes.solver.ops import Solver as RSolver
    from pyapes.solver.rfp import RFP as RRFP
    from pyapes.variables import Field as RField
    from pyapes.variables.bcs import mixed_bcs as r_mixed_bcs
    from pyapes.variables.container import Hess as RHess, Jac as RJac

    HAVE_REF = True
except Exception:  # reference not mounted
    HAVE_REF = False

import jax.numpy as jnp

from pyapes_tpu.geometry import Box, Cylinder
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.solver.fdc import FDC, hessian, jacobian
from pyapes_tpu.solver.fdm import FDM
from pyapes_tpu.solver.ops import Solver
from pyapes_tpu.solver.rfp import RFP
from pyapes_tpu.variables import Field
from pyapes_tpu.variables.bcs import homogeneous_bcs, mixed_bcs

needs_ref = pytest.mark.skipif(not HAVE_REF, reason="reference unavailable")


@needs_ref
def test_parity_laplacian_neumann_interior() -> None:
    """Same field, same Neumann BCs: FDC laplacian agrees on the interior
    (identical coefficient surgery) to machine precision."""
    rng = np.random.default_rng(0)
    f = rng.standard_normal((9, 9))

    r_mesh = RMesh(RBox[0:1, 0:1], None, [9, 9])
    r_var = RField(
        "t", 1, r_mesh,
        {"domain": __ref_hbc(2, 2.0, "neumann"), "obstacle": None},
    )
    r_var.set_var_tensor(torch.from_numpy(f[None].copy()))
    r_lap = RFDC({"laplacian": {"edge": False}}).laplacian(r_var)

    mesh = Mesh(Box[0:1, 0:1], None, [9, 9])
    var = Field(
        "t", 1, mesh, {"domain": homogeneous_bcs(2, 2.0, "neumann"),
                       "obstacle": None},
    )
    var.set_var_tensor(jnp.asarray(f[None]))
    lap = FDC({"laplacian": {"edge": False}}).laplacian(var)

    assert_allclose(
        np.asarray(lap[0])[1:-1, 1:-1],
        r_lap[0].numpy()[1:-1, 1:-1],
        atol=1e-11,
    )


def __ref_hbc(dim, val, kind):
    from pyapes.variables.bcs import homogeneous_bcs as rh

    return rh(dim, val, kind)


@needs_ref
@pytest.mark.parametrize("dim,spacing", [(1, [21]), (2, [0.05, 0.05])])
def test_parity_poisson_dirichlet_solution(dim, spacing) -> None:
    """Identical discrete systems: both solvers' Poisson solutions agree to
    within the (tight) solver tolerances."""
    from pyapes.testing.poisson import poisson_bcs as r_pbcs
    from pyapes.testing.poisson import poisson_rhs_nd as r_rhs

    from pyapes_tpu.testing.poisson import poisson_bcs, poisson_rhs_nd

    dom = RBox[0:1] if dim == 1 else RBox[0:1, 0:1]
    r_mesh = RMesh(dom, None, spacing)
    r_var = RField("p", 1, r_mesh, {"domain": r_pbcs(dim), "obstacle": None})
    r_solver = RSolver(
        {"fdm": {"method": "cg", "tol": 1e-10, "max_it": 5000,
                 "report": False}}
    )
    r_fdm = RFDM()
    r_solver.set_eq(r_fdm.laplacian(1.0, r_var) == r_rhs(r_mesh, r_var))
    r_solver.solve()

    dom2 = Box[0:1] if dim == 1 else Box[0:1, 0:1]
    mesh = Mesh(dom2, None, spacing)
    var = Field("p", 1, mesh, {"domain": poisson_bcs(dim), "obstacle": None})
    solver = Solver(
        {"fdm": {"method": "cg", "tol": 1e-12, "max_it": 5000,
                 "report": False, "criterion": "residual"}}
    )
    fdm = FDM()
    solver.set_eq(fdm.laplacian(1.0, var) == poisson_rhs_nd(mesh, var))
    solver.solve()

    assert_allclose(
        np.asarray(var()[0]), r_var()[0].numpy(), atol=1e-8, rtol=1e-8
    )


@needs_ref
def test_parity_poisson_rz_solution() -> None:
    from math import cos, exp

    r_mesh = RMesh(RCylinder[0:1, 0:1], None, [41, 41])

    def r_bc_ru(grid, mask, *_):
        return torch.exp(-grid[1][mask]) * cos(1)

    def r_bc_zl(grid, mask, *_):
        return torch.cos(grid[0][mask])

    def r_bc_zu(grid, mask, *_):
        return torch.cos(grid[0][mask]) * exp(-1)

    from pyapes.variables.bcs import CylinderBoundary as RCB

    r_bc = RCB(
        rl={"bc_type": "neumann", "bc_val": 0.0},
        ru={"bc_type": "dirichlet", "bc_val": r_bc_ru},
        zl={"bc_type": "dirichlet", "bc_val": r_bc_zl},
        zu={"bc_type": "dirichlet", "bc_val": r_bc_zu},
    )
    r_var = RField("U", 1, r_mesh, {"domain": r_bc(), "obstacle": None},
                   init_val=0.0)
    rhs_t = torch.zeros_like(r_var())
    Xr, Zr = r_mesh.X, r_mesh.Z
    val = -torch.sin(Xr) / (Xr * torch.exp(Zr))
    val[Xr.eq(0.0)] = -1.0 / torch.exp(Zr[Xr.eq(0.0)])
    rhs_t[0] = val
    r_solver = RSolver(
        {"fdm": {"method": "bicgstab", "tol": 1e-8, "max_it": 5000,
                 "report": False}}
    )
    r_fdm = RFDM()
    r_solver.set_eq(r_fdm.laplacian(1.0, r_var) == rhs_t)
    r_solver.solve()

    from pyapes_tpu.variables.bcs import CylinderBoundary

    mesh = Mesh(Cylinder[0:1, 0:1], None, [41, 41])
    f_bc = CylinderBoundary(
        rl={"bc_type": "neumann", "bc_val": 0.0},
        ru={"bc_type": "dirichlet",
            "bc_val": lambda g, m, v, o: jnp.exp(-g[1]) * cos(1)},
        zl={"bc_type": "dirichlet",
            "bc_val": lambda g, m, v, o: jnp.cos(g[0])},
        zu={"bc_type": "dirichlet",
            "bc_val": lambda g, m, v, o: jnp.cos(g[0]) * exp(-1)},
    )
    var = Field("U", 1, mesh, {"domain": f_bc(), "obstacle": None},
                init_val=0.0)
    rhs = jnp.zeros_like(var())
    rv = -jnp.sin(mesh.X) / (mesh.X * jnp.exp(mesh.Z))
    rv = jnp.where(mesh.X == 0.0, -1.0 / jnp.exp(mesh.Z), rv)
    rhs = rhs.at[0].set(rv)
    solver = Solver(
        {"fdm": {"method": "bicgstab", "tol": 1e-10, "max_it": 5000,
                 "report": False}}
    )
    fdm = FDM()
    solver.set_eq(fdm.laplacian(1.0, var) == rhs)
    solver.solve()

    assert_allclose(
        np.asarray(var()[0]), r_var()[0].numpy(), atol=1e-6, rtol=1e-6
    )


@needs_ref
def test_parity_rfp_operators() -> None:
    """RFP friction/diffusion: bit-level parity with the reference."""
    r_mesh = RMesh(RCylinder[0:2, -2:2], None, [33, 33])
    mesh = Mesh(Cylinder[0:2, -2:2], None, [33, 33])
    R, Z = np.asarray(mesh.R), np.asarray(mesh.Z)
    H = np.cos(R) * np.exp(-(Z**2) / 2)
    G = np.exp(-(R**2) / 4 - Z**2 / 4)
    f = np.exp(-(R**2) / 2 - Z**2 / 2)

    pdf = Field("pdf", 1, mesh, None)
    pdf.set_var_tensor(jnp.asarray(f))
    hp = Field("H", 1, mesh, None)
    jacH = jacobian(hp.set_var_tensor(jnp.asarray(H)))
    gp = Field("G", 1, mesh, None)
    hessG = hessian(gp.set_var_tensor(jnp.asarray(G)))

    r_pdf = RField("pdf", 1, r_mesh, {"domain": None, "obstacle": None})
    r_pdf.set_var_tensor(torch.from_numpy(f[None].copy()))
    r_jac = RJac(r=torch.from_numpy(np.array(jacH.r)),
                 z=torch.from_numpy(np.array(jacH.z)))
    r_hess = RHess(rr=torch.from_numpy(np.array(hessG.rr)),
                   rz=torch.from_numpy(np.array(hessG.rz)),
                   zz=torch.from_numpy(np.array(hessG.zz)))

    fr = np.asarray(RFP().friction(jacH, pdf))
    r_fr = RRFP().friction(r_jac, r_pdf).numpy()
    assert_allclose(fr, r_fr, atol=1e-12)

    df = np.asarray(RFP().diffusion(hessG, pdf))
    r_df = RRFP().diffusion(r_hess, r_pdf).numpy()
    assert_allclose(df, r_df, atol=1e-12)


@needs_ref
def test_parity_heat_conduction_mixed() -> None:
    """2-D Laplace with mixed Neumann/Dirichlet: both discretizations are
    consistent 2nd-order schemes of the same PDE; solutions agree to the
    schemes' common accuracy. (Exact coefficient parity is impossible:
    the reference's Neumann grad surgery contradicts its own BC
    application — see PARITY.md.)"""
    r_mesh = RMesh(RBox[0:1, 0:1], None, [11, 11])
    r_bc = r_mixed_bcs(
        [0.0, 0.0, 0.0, 1.0],
        ["neumann", "dirichlet", "neumann", "dirichlet"],
    )
    r_var = RField("p", 1, r_mesh, {"domain": r_bc, "obstacle": None},
                   init_val=0.0)
    r_solver = RSolver(
        {"fdm": {"method": "bicgstab", "tol": 1e-10, "max_it": 5000,
                 "report": False}}
    )
    r_fdm = RFDM()
    r_solver.set_eq(r_fdm.laplacian(r_var) == 0.0)
    r_solver.solve()

    mesh = Mesh(Box[0:1, 0:1], None, [11, 11])
    f_bc = mixed_bcs(
        [0.0, 0.0, 0.0, 1.0],
        ["neumann", "dirichlet", "neumann", "dirichlet"],
    )
    var = Field("p", 1, mesh, {"domain": f_bc, "obstacle": None},
                init_val=0.0)
    solver = Solver(
        {"fdm": {"method": "bicgstab", "tol": 1e-10, "max_it": 5000,
                 "report": False}}
    )
    fdm = FDM()
    solver.set_eq(fdm.laplacian(var) == 0.0)
    solver.solve()

    assert_allclose(np.asarray(var()[0]), r_var()[0].numpy(),
                    atol=1e-8, rtol=1e-8)


@needs_ref
def test_parity_fdc_grad_interior() -> None:
    """Explicit FDC grad with Dirichlet BCs: interior agreement to
    machine precision (identical central differences)."""
    rng = np.random.default_rng(3)
    f = rng.standard_normal((11, 13))

    r_mesh = RMesh(RBox[0:1, 0:1.2], None, [11, 13])
    r_var = RField(
        "t", 1, r_mesh,
        {"domain": __ref_hbc(2, 0.5, "dirichlet"), "obstacle": None},
    )
    r_var.set_var_tensor(torch.from_numpy(f[None].copy()))
    r_grad = RFDC({"grad": {"edge": False}}).grad(r_var)

    mesh = Mesh(Box[0:1, 0:1.2], None, [11, 13])
    var = Field(
        "t", 1, mesh,
        {"domain": homogeneous_bcs(2, 0.5, "dirichlet"), "obstacle": None},
    )
    var.set_var_tensor(jnp.asarray(f[None]))
    grad = FDC({"grad": {"edge": False}}).grad(var)

    assert_allclose(
        np.asarray(grad[0])[:, 1:-1, 1:-1],
        r_grad[0].numpy()[:, 1:-1, 1:-1],
        atol=1e-12,
    )


@needs_ref
def test_parity_jacobian_hessian_rz() -> None:
    """Bank-free jacobian/hessian vs the reference's (rz mesh): all
    components agree to machine precision — the derivative stack that
    feeds the RFP operators."""
    from pyapes.solver.fdc import hessian as r_hessian
    from pyapes.solver.fdc import jacobian as r_jacobian

    r_mesh = RMesh(RCylinder[0:2, -2:2], None, [17, 25])
    R, Z = r_mesh.grid
    smooth = torch.exp(-(R**2 + Z**2) / 2.0)
    r_var = RField("h", 1, r_mesh, None)
    r_var.set_var_tensor(smooth[None].clone())
    r_jac = r_jacobian(r_var)
    r_hess = r_hessian(r_var)

    mesh = Mesh(Cylinder[0:2, -2:2], None, [17, 25])
    var = Field("h", 1, mesh, None)
    var.set_var_tensor(jnp.asarray(smooth.numpy()[None]))
    jac = jacobian(var)
    hess = hessian(var)

    assert_allclose(np.asarray(jac.r), r_jac.r.numpy(), atol=1e-12)
    assert_allclose(np.asarray(jac.z), r_jac.z.numpy(), atol=1e-12)
    for comp in ("rr", "rz", "zz"):
        assert_allclose(
            np.asarray(getattr(hess, comp)),
            getattr(r_hess, comp).numpy(),
            atol=1e-12,
        )
