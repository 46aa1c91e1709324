"""FDC/FDM discretization tests (ported from reference ``tests/test_fdm.py``).

Corrections vs the stale reference tests (which fail against the reference
itself — see SURVEY §2 quirks 5/6 and the repo notes):
  * Neumann forward-gradient expectation uses the outward-normal convention
    (lower face gradient = -V).
  * The upwind Div target matches the standard first-order scheme the
    reference test intends (``tests/test_fdm.py:239``), which this build
    implements (the reference's upwind bank builder is broken).
  * ``fdm.ddt`` works (backward Euler), semantics per
    ``tests/test_fdm.py:274-301``.
"""
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pyapes_tpu.geometry import Box
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.mesh.tools import inner_slicer
from pyapes_tpu.ops.stencil import (
    div_axis_coeffs,
    grad_axis_coeffs,
    laplacian_axis_coeffs,
)
from pyapes_tpu.solver.fdc import FDC
from pyapes_tpu.solver.fdm import FDM
from pyapes_tpu.solver.ops import Solver
from pyapes_tpu.variables import Field
from pyapes_tpu.variables.bcs import homogeneous_bcs


def test_fdc_edge() -> None:
    """Edge-mode grad/laplacian vs numpy.gradient(edge_order=2) oracle
    (reference ``test_fdm.py:22-52``)."""
    mesh = Mesh(Box[0:1, 0:1], None, [5, 5])

    var = Field("test", 1, mesh, {"domain": None, "obstacle": None})
    var <<= 0.3 * mesh.X**2

    fdc = FDC()

    v_np = np.asarray(var()[0])
    dx = float(mesh.dx_np[0])

    grad_np = np.gradient(v_np, dx, edge_order=2)
    grad_fdc = fdc.grad(var, edge=True)
    assert_allclose(np.asarray(grad_fdc[0][0]), grad_np[0], atol=1e-12)

    lap_np = (
        np.gradient(grad_np[0], dx, edge_order=2)[0]
        + np.gradient(grad_np[1], dx, edge_order=2)[1]
    )
    lap_fdc = fdc.laplacian(var, edge=True)
    assert_allclose(np.asarray(lap_fdc[0]), lap_np, atol=1e-12)


@pytest.mark.parametrize(
    ["domain", "spacing"],
    [
        [Box[0:1], [0.2]],
        [Box[0:1, 0:1], [0.2, 0.2]],
        [Box[0:1, 0:1, 0:1], [0.2, 0.2, 0.2]],
    ],
)
def test_fdc_ops(domain, spacing) -> None:
    """FDC ops vs hand-rolled stencils with Neumann BC surgery
    (reference ``test_fdm.py:63-119``)."""
    mesh = Mesh(domain, None, spacing)
    slicer = inner_slicer(mesh.dim)

    f_bc = homogeneous_bcs(mesh.dim, 2.0, "neumann")
    var = Field("test", 1, mesh, {"domain": f_bc, "obstacle": None})
    var <<= 0.3 * mesh.X**2
    var.apply_bcs()

    v = np.asarray(var()[0])
    dx = float(mesh.dx_np[0])

    # Outward-normal convention: one-sided gradient at lower face == -V.
    phi0 = (-3 / 2 * v[0] + 2 * v[1] - 1 / 2 * v[2]) / dx
    phiN = (3 / 2 * v[-1] - 2 * v[-2] + 1 / 2 * v[-3]) / dx
    assert_allclose(phi0.mean(), -2.0, atol=1e-12)
    assert_allclose(phiN.mean(), 2.0, atol=1e-12)

    fdc = FDC()

    lap = fdc.laplacian(var, edge=False)
    lap_manuel = _lap_manuel_op(v, dx, mesh.dim)
    assert_allclose(np.asarray(lap[0])[slicer], lap_manuel[slicer], atol=1e-12)

    assert fdc.laplacian.A_coeffs is not None
    fdc.laplacian.reset()
    assert fdc.laplacian.A_coeffs is None
    assert fdc.laplacian.rhs_adj is None

    grad = fdc.grad(var, edge=False)
    grad_manuel = _grad_manuel_op(v, dx, mesh.dim)
    assert_allclose(
        np.asarray(grad[0][0])[slicer], grad_manuel[0][slicer], atol=1e-12
    )


def _grad_manuel_op(var: np.ndarray, dx: float, dim: int) -> list[np.ndarray]:
    """Hand-rolled x-gradient with Neumann surgery rows
    (reference ``test_fdm.py:122-157``)."""
    grad_manuel = [(np.roll(var, -1, 0) - np.roll(var, 1, 0)) / (2 * dx)]

    x_inner = (np.roll(var, -1, 0) - np.roll(var, 1, 0)) / (2 * dx)
    x_inner[1] = (4 / 3 * var[2] - 4 / 3 * var[1]) / (2 * dx)
    # Upper row: boundary-node elimination gives +4/3(v[-2]-v[-3])/(2dx);
    # the reference's oracle sign here (test_fdm.py:135) is flipped and its
    # test never ran (fails earlier) — see module docstring.
    x_inner[-2] = (4 / 3 * var[-2] - 4 / 3 * var[-3]) / (2 * dx)

    if dim == 1:
        grad_manuel[0] = x_inner
    elif dim == 2:
        grad_manuel[0][:, 1] = x_inner[:, 1]
        grad_manuel[0][:, -2] = x_inner[:, -2]
        grad_manuel[0][1, :] = x_inner[1, :]
        grad_manuel[0][-2, :] = x_inner[-2, :]
    else:
        grad_manuel[0][:, :, 1] = x_inner[:, :, 1]
        grad_manuel[0][:, :, -2] = x_inner[:, :, -2]
        grad_manuel[0][:, 1, :] = x_inner[:, 1, :]
        grad_manuel[0][:, -2, :] = x_inner[:, -2, :]
        grad_manuel[0][1, :, :] = x_inner[1, :, :]
        grad_manuel[0][-2, :, :] = x_inner[-2, :, :]
    return grad_manuel


def _lap_manuel_op(var: np.ndarray, dx: float, dim: int) -> np.ndarray:
    """Hand-rolled Laplacian with Neumann surgery rows
    (reference ``test_fdm.py:160-195``)."""
    lap_manuel = np.zeros_like(var)
    for i in range(dim):
        lap_manuel += (np.roll(var, -1, i) - 2 * var + np.roll(var, 1, i)) / dx**2

    x_inner = (np.roll(var, -1, 0) - 2 * var + np.roll(var, 1, 0)) / dx**2
    x_inner[1] = (2 / 3 * var[2] - 2 / 3 * var[1]) / dx**2
    x_inner[-2] = (-2 / 3 * var[-2] + 2 / 3 * var[-3]) / dx**2

    if dim == 1:
        lap_manuel = x_inner
    elif dim == 2:
        lap_manuel[:, 1] = x_inner[:, 1]
        lap_manuel[:, -2] = x_inner[:, -2]
        lap_manuel[1, :] = x_inner[1, :]
        lap_manuel[-2, :] = x_inner[-2, :]
    else:
        lap_manuel[:, :, 1] = x_inner[:, :, 1]
        lap_manuel[:, :, -2] = x_inner[:, :, -2]
        lap_manuel[:, 1, :] = x_inner[:, 1, :]
        lap_manuel[:, -2, :] = x_inner[:, -2, :]
        lap_manuel[1, :, :] = x_inner[1, :, :]
        lap_manuel[-2, :, :] = x_inner[-2, :, :]
    return lap_manuel


@pytest.mark.parametrize(
    ["domain", "spacing"],
    [
        [Box[0:1], [0.2]],
        [Box[0:1, 0:1], [0.2, 0.2]],
        [Box[0:1, 0:1, 0:1], [0.2, 0.2, 0.2]],
    ],
)
def test_solver_fdm_ops(domain, spacing) -> None:
    """Assembled-equation Aop vs hand-built roll expressions on the interior
    (reference ``test_fdm.py:206-301``; upwind target corrected to the
    intended standard scheme)."""
    mesh = Mesh(domain, None, spacing)

    var_i = Field("test_Fi", 1, mesh, None)
    var_j = Field("test_Fj", 1, mesh, None, init_val=5.0)

    var_i.set_var_tensor(2 * mesh.X**2)

    solver = Solver(None)
    fdm = FDM({"div": {"limiter": "upwind", "edge": False}})

    solver.set_eq(fdm.laplacian(2.0, var_i) == 0.0)

    v = np.asarray(var_i()[0])
    dx = float(mesh.dx_np[0])
    t_mask = mesh.t_mask

    target = (np.roll(v, -1, 0) - 2 * v + np.roll(v, 1, 0)) / dx**2 * 2.0
    assert_allclose(
        np.asarray(solver.Aop(var_i)[0])[~t_mask], target[~t_mask], atol=1e-12
    )
    assert_allclose(np.zeros_like(target)[None], np.asarray(solver.rhs))

    var_i.set_var_tensor(4 * mesh.X**2)
    v = np.asarray(var_i()[0])
    target = (np.roll(v, -1, 0) - 2 * v + np.roll(v, 1, 0)) / dx**2 * 2.0
    assert_allclose(
        np.asarray(solver.Aop(var_i)[0])[~t_mask], target[~t_mask], atol=1e-12
    )

    # Upwind Div + Laplacian
    solver.set_eq(fdm.div(var_j, var_i) + fdm.laplacian(3.0, var_i) == 2.0)

    t_div = (v - np.roll(v, 1, 0)) / dx * 5.0
    t_laplacian = (np.roll(v, -1, 0) - 2 * v + np.roll(v, 1, 0)) / dx**2 * 3.0
    target = t_div[~t_mask] + t_laplacian[~t_mask]

    assert "div" in fdm.config
    assert fdm.config["div"]["limiter"] == "upwind"
    assert_allclose(np.asarray(solver.Aop(var_i)[0])[~t_mask], target, atol=1e-12)

    # 1D advection-diffusion: fdm.grad and fdm.div interchangeable.
    if mesh.dim == 1:
        solver.set_eq(fdm.grad(var_i) - fdm.laplacian(3.0, var_i) == 2.0)

        t_grad = (np.roll(v, -1, 0) - np.roll(v, 1, 0)) / (2 * dx)
        target = t_grad[~t_mask] - t_laplacian[~t_mask]
        assert_allclose(
            np.asarray(solver.Aop(var_i)[0])[~t_mask], target, atol=1e-12
        )

    # Transient advection-diffusion (Ddt semantics pinned by
    # reference ``tests/test_fdm.py:274-301``).
    dt = 0.01
    var_i.set_time(dt, 0.0)
    var_old = np.random.rand(*var_i().shape)
    var_i.VARo = var_old
    rhs = jnp.asarray(np.random.rand(*var_i().shape))

    solver.set_eq(
        fdm.ddt(var_i) + fdm.div(var_j, var_i) + fdm.laplacian(3.0, var_i) == rhs
    )
    t_div = (v - np.roll(v, 1, 0)) / dx * 5.0
    t_laplacian = (np.roll(v, -1, 0) - 2 * v + np.roll(v, 1, 0)) / dx**2 * 3.0
    d_t_var = (v - var_old[0]) / dt

    target = d_t_var + (t_div + t_laplacian)
    assert_allclose(
        np.asarray(solver.Aop(var_i)[0])[~t_mask], target[~t_mask], atol=1e-9
    )
    # Backward Euler moves var_old/dt to the RHS for the linear solve.
    assert_allclose(np.asarray(solver.rhs), np.asarray(rhs) + var_old / dt)


class TestLaplacianAxisCoeffs:
    """1-D coefficient-bank unit tests pinning the BC surgery numerically
    (modeled on reference ``tests/test_fdm.py:304-372``)."""

    def _mesh(self, bc_type: str):
        mesh = Mesh(Box[0:1], None, [6])
        val = None if bc_type in ("periodic", "symmetry") else 0.0
        bcs = homogeneous_bcs(1, val, bc_type)
        var = Field("t", 1, mesh, {"domain": bcs, "obstacle": None})
        return mesh, var

    def test_dirichlet(self):
        mesh, var = self._mesh("dirichlet")
        (ap, ac, am), = laplacian_axis_coeffs(mesh, var.bcs)
        dx2 = float(mesh.dx_np[0]) ** 2
        assert_allclose(np.asarray(ap) * dx2, np.ones(6))
        assert_allclose(np.asarray(ac) * dx2, -2 * np.ones(6))
        assert_allclose(np.asarray(am) * dx2, np.ones(6))

    def test_neumann(self):
        mesh, var = self._mesh("neumann")
        (ap, ac, am), = laplacian_axis_coeffs(mesh, var.bcs)
        dx2 = float(mesh.dx_np[0]) ** 2
        ap, ac, am = (np.asarray(c) * dx2 for c in (ap, ac, am))
        assert_allclose([ap[1], ac[1], am[1]], [2 / 3, -2 / 3, 0.0])
        assert_allclose([ap[-2], ac[-2], am[-2]], [0.0, -2 / 3, 2 / 3])
        # interior untouched
        assert_allclose([ap[2], ac[2], am[2]], [1.0, -2.0, 1.0])

    def test_periodic(self):
        # Periodic Laplacian needs no surgery: the roll wraps naturally
        # (reference ``fdc.py:415-417`` leaves banks untouched).
        mesh, var = self._mesh("periodic")
        (ap, ac, am), = laplacian_axis_coeffs(mesh, var.bcs)
        dx2 = float(mesh.dx_np[0]) ** 2
        assert_allclose(np.asarray(ap) * dx2, np.ones(6))
        assert_allclose(np.asarray(ac) * dx2, -2 * np.ones(6))
        assert_allclose(np.asarray(am) * dx2, np.ones(6))

    def test_grad_periodic(self):
        # Periodic gradient needs no surgery either: every node of the
        # torus is interior (the seam handling lives in the appliers —
        # reduced-roll in ``fdc._A_coeff_var_sum``, torus reduction in
        # ``linalg._reduce_periodic``). Rounds 1-2 zeroed the
        # seam-adjacent coefficients here, which broke EXPLICIT gradients
        # at rows 1 and n-2 of a periodic axis (caught by the
        # Taylor-Green transient, ``test_models.py::test_taylor_green_decay``).
        mesh, var = self._mesh("periodic")
        (ap, ac, am), = grad_axis_coeffs(mesh, var.bcs)
        dx2 = 2 * float(mesh.dx_np[0])
        ap, ac, am = (np.asarray(c) * dx2 for c in (ap, ac, am))
        assert_allclose(ap, np.ones(6))
        assert_allclose(ac, np.zeros(6))
        assert_allclose(am, -np.ones(6))

    def test_div_upwind_const(self):
        mesh, var = self._mesh("dirichlet")
        (ap, ac, am), = div_axis_coeffs(mesh, var.bcs, 5.0, "upwind")
        dx = float(mesh.dx_np[0])
        # gamma > 0: (phi_i - phi_{i-1}) * gamma / dx
        assert_allclose(np.asarray(ap), np.zeros(6))
        assert_allclose(np.asarray(ac), 5.0 / dx * np.ones(6))
        assert_allclose(np.asarray(am), -5.0 / dx * np.ones(6))


def test_banks_match_axis_coeffs() -> None:
    """The full-bank (FDC) and per-axis (hot path) representations must
    agree: apply both to the same field."""
    mesh = Mesh(Box[0:1, 0:1], None, [8, 8])
    f_bc = homogeneous_bcs(2, 1.0, "neumann")
    var = Field("t", 1, mesh, {"domain": f_bc, "obstacle": None})
    var <<= mesh.X**2 + 0.5 * mesh.Y**2

    fdc = FDC()
    lap_banks = fdc.laplacian(var, edge=False)

    from pyapes_tpu.ops.stencil import apply_axis_stencil

    coeffs = laplacian_axis_coeffs(mesh, var.bcs)
    lap_axis = apply_axis_stencil(coeffs, var())

    assert_allclose(np.asarray(lap_banks), np.asarray(lap_axis), atol=1e-12)

    grad_banks = fdc.grad(var, edge=False)
    gcoeffs = grad_axis_coeffs(mesh, var.bcs)
    # compare per axis with the (vdim, mesh.dim, *nx) banks-path grad
    from pyapes_tpu.ops.stencil import _bshape

    for j in range(2):
        ap, ac, am = gcoeffs[j]
        shape = _bshape(var().ndim, j)
        expected = (
            ap.reshape(shape) * jnp.roll(var(), -1, 1 + j)
            + ac.reshape(shape) * var()
            + am.reshape(shape) * jnp.roll(var(), 1, 1 + j)
        )
        assert_allclose(
            np.asarray(grad_banks[0][j]), np.asarray(expected[0]), atol=1e-12
        )


def test_explicit_fdc_structured_coefficients() -> None:
    """Explicit Laplacian/Grad/scalar-Div coefficients are per-axis 1-D
    vectors (KB), not full-grid banks (VERDICT r1 item 4: the reference
    layout is ~8 GB at 512^3). Varying advection legitimately keeps banks."""
    from pyapes_tpu.solver.fdc import FDC, AxisCoeffs

    from pyapes_tpu.variables.bcs import mixed_bcs

    mesh = Mesh(Box[0:1, 0:1], None, [33, 33])
    f_bc = mixed_bcs([0.0, 0.0, 0.0, 0.0],
                     ["neumann", "dirichlet", "periodic", "periodic"])
    var = Field("p", 1, mesh, {"domain": f_bc, "obstacle": None},
                init_val="random")
    fdc = FDC({"laplacian": {"edge": False}, "grad": {"edge": False},
               "div": {"limiter": "upwind", "edge": False}})

    fdc.laplacian(var)
    assert isinstance(fdc.laplacian.A_coeffs, AxisCoeffs)
    for j, cs in enumerate(fdc.laplacian.A_coeffs.vecs):
        assert all(c.shape == (33,) for c in cs)

    fdc.grad(var)
    assert isinstance(fdc.grad.A_coeffs, AxisCoeffs)

    fdc.div(2.0, var)
    assert isinstance(fdc.div.A_coeffs, AxisCoeffs)

    # varying advection: full banks remain (coefficients are per-point)
    adv = Field("u", 1, mesh, None, init_val="random")
    fdc.div(adv, var)
    assert not isinstance(fdc.div.A_coeffs, AxisCoeffs)

    # scalar-div vectors == varying-div banks with a constant field
    const = Field("c", 1, mesh, None, init_val=0.0)
    const.VAR = jnp.full_like(const(), 2.0)
    d1 = fdc.div(2.0, var)
    d2 = fdc.div(const, var)
    assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-12)
