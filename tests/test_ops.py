"""RFP (Rosenbluth-Fokker-Planck) operator tests.

The reference's ``tests/test_ops.py::test_fp`` loads a golden HDF5 fixture
and only *plots* the operators (no numerical assertion,
``test_ops.py:52-68``); its ``test_div_diff_flux`` fails against the
reference itself (broken upwind path). Here the same physics is pinned
numerically with analytic manufactured potentials:

  * friction(jacH, f) approximates div(f grad H) in rz — checked against
    the analytic divergence and against the FDC formulation.
  * diffusion(hessG, f) approximates div(D grad f) with D = hess(G) —
    checked against the FDC ``div(diffFlux)`` formulation.
"""
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from pyapes_tpu.geometry import Cylinder
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.solver.fdc import FDC, hessian, jacobian
from pyapes_tpu.solver.rfp import RFP, mc_limiter, minmod
from pyapes_tpu.variables import Field


def _setup(nr=64, nz=64):
    mesh = Mesh(Cylinder[0:2, -2:2], None, [nr, nz])
    R = np.asarray(mesh.R)
    Z = np.asarray(mesh.Z)
    return mesh, R, Z


def test_rfp_friction_analytic() -> None:
    """friction = (1/r) d/dr (r f dH/dr) + d/dz (f dH/dz) vs closed form."""
    mesh, R, Z = _setup()

    # Smooth manufactured fields (H even in r so dH/dr -> 0 at the axis).
    H = R**2 * np.exp(-(Z**2))
    f = np.exp(-(R**2) - Z**2 / 2)

    pdf = Field("pdf", 1, mesh, {"domain": None, "obstacle": None})
    pdf.set_var_tensor(jnp.asarray(f))
    H_pot = Field("H", 1, mesh, {"domain": None, "obstacle": None})
    jacH = jacobian(H_pot.set_var_tensor(jnp.asarray(H)))

    friction = np.asarray(RFP().friction(jacH, pdf))

    Hr = 2 * R * np.exp(-(Z**2))
    Hz = -2 * Z * R**2 * np.exp(-(Z**2))
    fr = -2 * R * f
    fz = -Z * f
    dHz_dz = (-2 + 4 * Z**2) * R**2 * np.exp(-(Z**2))
    # (1/r) d/dr (r f Hr) + d/dz (f Hz)
    exact = (
        f * Hr / np.where(R == 0, np.inf, R)
        + (fr * Hr + f * 2 * np.exp(-(Z**2)))
        + (fz * Hz + f * dHz_dz)
    )
    # At the axis, f*Hr/r -> 2 f e^{-z^2} (limit).
    exact[0, :] = (
        2 * f[0, :] * np.exp(-(Z[0, :] ** 2))
        + fr[0, :] * Hr[0, :]
        + f[0, :] * 2 * np.exp(-(Z[0, :] ** 2))
        + fz[0, :] * Hz[0, :]
        + f[0, :] * dHz_dz[0, :]
    )

    inner = (slice(2, -2), slice(2, -2))
    err = np.abs(friction[inner] - exact[inner]).max()
    scale = np.abs(exact[inner]).max()
    assert err / scale < 0.01, f"relative error {err / scale}"


def test_rfp_friction_vs_fdc() -> None:
    """RFP friction vs FDC div formulation (interior consistency,
    mirrors the visual check of reference ``test_ops.py:47-48``)."""
    mesh, R, Z = _setup()
    H = np.cos(R) * np.exp(-(Z**2) / 2)
    f = np.exp(-(R**2) / 2 - Z**2 / 2)

    pdf = Field("pdf", 1, mesh, {"domain": None, "obstacle": None})
    pdf.set_var_tensor(jnp.asarray(f))
    H_pot = Field("H", 1, mesh, {"domain": None, "obstacle": None})
    jacH = jacobian(H_pot.set_var_tensor(jnp.asarray(H)))

    friction = np.asarray(RFP().friction(jacH, pdf))

    fdc = FDC({"div": {"limiter": "none", "edge": True}})
    f_fdc = np.asarray(fdc.div(jacH, pdf)[0])

    inner = (slice(2, -2), slice(2, -2))
    scale = np.abs(f_fdc[inner]).max()
    assert np.abs(friction[inner] - f_fdc[inner]).max() / scale < 0.02


def test_rfp_diffusion_analytic() -> None:
    """RFP diffusion vs the analytic div(D grad f), D = hess(G).

    (The reference only *plots* ``rfp.diffusion`` next to the FDC
    ``div(diffFlux)`` composition, ``test_ops.py:49-67``; the two are NOT
    the same operator — the composition double-counts the r-weight — so we
    pin the physical one against the closed form.)"""
    mesh, R, Z = _setup()
    G = np.exp(-(R**2) / 4 - Z**2 / 4)
    f = np.exp(-(R**2) / 2 - Z**2 / 2)

    pdf = Field("pdf", 1, mesh, {"domain": None, "obstacle": None})
    pdf.set_var_tensor(jnp.asarray(f))
    G_pot = Field("G", 1, mesh, {"domain": None, "obstacle": None})
    hessG = hessian(G_pot.set_var_tensor(jnp.asarray(G)))

    diffusion = np.asarray(RFP().diffusion(hessG, pdf))

    # Closed-form flux components for these G, f.
    def flux_r(r, z):
        gg = np.exp(-(r**2 + z**2) / 4) * np.exp(-(r**2 + z**2) / 2)
        return gg * (r / 2 - r**3 / 4 - r * z**2 / 4)

    def flux_z(r, z):
        gg = np.exp(-(r**2 + z**2) / 4) * np.exp(-(r**2 + z**2) / 2)
        return gg * (-(r**2) * z / 4 + z / 2 - z**3 / 4)

    h = 1e-6
    dfz = (flux_z(R, Z + h) - flux_z(R, Z - h)) / (2 * h)
    t = ((R + h) * flux_r(R + h, Z) - (R - h) * flux_r(R - h, Z)) / (2 * h)
    with np.errstate(all="ignore"):
        exact = np.where(
            R == 0,
            2 * (flux_r(R + h, Z) - flux_r(R, Z)) / h,
            t / np.where(R == 0, 1, R),
        ) + dfz

    inner = (slice(2, -2), slice(2, -2))
    scale = np.abs(exact[inner]).max()
    # The reference scheme's Drz cross-term carries a ~10% localized error
    # plateau (verified bit-for-bit against the reference implementation);
    # the operator converges at second order away from it.
    assert np.abs(diffusion[inner] - exact[inner]).max() / scale < 0.12
    mid = diffusion.shape[0] // 2
    assert abs(diffusion[mid, mid] - exact[mid, mid]) < 1e-2


def test_density_normalization() -> None:
    """Volume integral with 2 pi r weight (reference ``test_ops.py:38-40``)."""
    mesh, R, Z = _setup(128, 128)
    # 3-D Maxwellian in cylindrical velocity coordinates, vth = 0.4
    vth = 0.4
    f = (2 * np.pi * vth**2) ** (-1.5) * np.exp(-(R**2 + Z**2) / (2 * vth**2))
    pdf = Field("pdf", 1, mesh, {"domain": None, "obstacle": None})
    pdf.set_var_tensor(jnp.asarray(f))
    den = float(pdf.volume_integral()[0])
    assert abs(den - 1.0) < 1e-3


def test_div_diff_flux_rz() -> None:
    """div(D grad var) and div(jac, var) identities in rz
    (reference ``test_ops.py:71-109``, run with the central scheme its
    oracle implies — the reference configures the broken upwind and fails)."""
    mesh, R, Z = _setup(5, 5)
    var = Field("test", 1, mesh, {"domain": None, "obstacle": None})
    var.set_var_tensor(mesh.grid[0] ** 2)

    hess = hessian(var)
    jac = jacobian(var)

    fdc = FDC({"grad": {"edge": True}, "div": {"limiter": "none", "edge": True}})

    diffFlux = fdc.diffFlux(hess, var)
    diffFlux_r = R * np.asarray(hess.rr) * np.asarray(jac.r) + R * np.asarray(
        hess.rz
    ) * np.asarray(jac.z)
    diffFlux_z = np.asarray(hess.rz) * np.asarray(jac.r) + np.asarray(
        hess.zz
    ) * np.asarray(jac.z)

    assert_allclose(np.asarray(diffFlux[0]), diffFlux_r, atol=1e-12)
    assert_allclose(np.asarray(diffFlux[1]), diffFlux_z, atol=1e-12)

    div_diff_grad = fdc.div(1.0, fdc.diffFlux(hess, var))

    dxs = [float(d) for d in mesh.dx_np]
    div_x = np.gradient(diffFlux_r, *dxs, edge_order=2)[0]
    with np.errstate(divide="ignore", invalid="ignore"):
        div_x = np.nan_to_num(
            div_x + diffFlux_r / R, nan=0.0, posinf=0.0, neginf=0.0
        )

    assert_allclose(np.asarray(div_diff_grad[0]), div_x, atol=1e-10)

    fdc.div.reset()

    div_var = fdc.div(jac, var)
    div_var_x = np.gradient(
        np.asarray(var[0]) * np.asarray(jac.r), *dxs, edge_order=2
    )[0]
    with np.errstate(divide="ignore", invalid="ignore"):
        div_var_x = div_var_x + np.nan_to_num(
            np.asarray(jac.r) * np.asarray(var[0]) / R,
            nan=0.0,
            posinf=0.0,
            neginf=0.0,
        )
    assert_allclose(np.asarray(div_var[0]), div_var_x, atol=1e-10)


def test_limiters() -> None:
    """minmod / mc_limiter behaviors (reference ``rfp.py:260-282``)."""
    a = jnp.asarray([1.0, -1.0, 2.0, 0.5, -3.0])
    b = jnp.asarray([2.0, -2.0, -1.0, 0.25, -1.0])
    mm = np.asarray(minmod(a, b))
    assert_allclose(mm, [1.0, -1.0, 0.0, 0.25, -1.0])

    mc = np.asarray(mc_limiter(a, b))
    # same-sign pairs: min(2*minmod(a,b), (a+b)/2); opposite sign: 0
    assert mc[2] == 0.0
    assert_allclose(mc[0], 1.5)
