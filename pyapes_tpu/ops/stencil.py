"""Structured stencil representation — the TPU-native hot path.

The reference encodes every operator as five **full-grid** coefficient banks
``[App, Ap, Ac, Am, Amm]`` (``solver/tools.py:29-112``), i.e. 5 x mesh.dim
arrays the size of the solution. At 512^3 that is ~8 GB of coefficients —
untenable on a 16 GB TPU chip and a pure waste of HBM bandwidth.

Key observation: for every implicit operator with *domain-face* boundary
conditions, the coefficients are **separable per axis and vary only along
that axis**: the interior value is constant (or, in rz, a function of r
only), and BC surgery edits exactly the rows adjacent to each face
(``fdc.py:381-421``, ``fdc.py:543-609``) with values constant along the row.

So the implicit stencil is stored as per-axis 1-D vectors ``(ap, ac, am)``
of length ``nx[axis]`` — a few KB instead of GB — and applied as a fused
roll-sum that XLA tiles into VMEM. Spatially-varying advection (nonlinear
Div) multiplies the advecting field in at apply time, fused into the same
loop, never materializing banks.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
import numpy as np


def _bshape(ndim: int, axis: int) -> list[int]:
    """Broadcast shape placing a 1-D axis vector along mesh-axis ``axis`` of
    a ``(vdim, *nx)`` array."""
    shape = [1] * ndim
    shape[1 + axis] = -1
    return shape


def apply_axis_stencil(
    coeffs: Sequence[tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    x: jnp.ndarray,
) -> jnp.ndarray:
    """Apply a per-axis (ap, ac, am) stencil, summed over axes.

    Equivalent to the reference roll-sum ``_A_coeff_var_sum``
    (``fdc.py:171-200``) restricted to the +-1 offsets (the reference's
    App/Amm banks are always zero for the implemented schemes).

    Args:
        coeffs: per mesh axis, 1-D coefficient vectors (len ``nx[axis]``).
        x: field values, shape ``(vdim, *nx)``.
    """
    out = jnp.zeros_like(x)
    for j, (ap, ac, am) in enumerate(coeffs):
        shape = _bshape(x.ndim, j)
        out = (
            out
            + ap.reshape(shape) * jnp.roll(x, -1, 1 + j)
            + ac.reshape(shape) * x
            + am.reshape(shape) * jnp.roll(x, 1, 1 + j)
        )
    return out


def _aligned_bcs(bcs, axis: int):
    return [bc for bc in (bcs or []) if bc.bc_face_dim == axis]


def laplacian_axis_coeffs(mesh, bcs, dtype=None) -> tuple:
    """Per-axis Laplacian coefficients with BC surgery.

    Numerically identical to ``Laplacian.build_A_coeffs``
    (``fdc.py:376-423``), built on host in float64 then cast.
    """
    dtype = dtype or mesh.dtype.float
    out = []
    rz = mesh.coord_sys == "rz"
    for j in range(mesh.dim):
        n = mesh.nx[j]
        dxj = float(mesh.dx_np[j])
        ap = np.ones(n)
        ac = -2.0 * np.ones(n)
        am = np.ones(n)
        if rz and j == 0:
            r = np.asarray(mesh._x_np[0])
            with np.errstate(divide="ignore", invalid="ignore"):
                scale = np.nan_to_num(dxj / (2.0 * r), nan=0.0, posinf=0.0, neginf=0.0)
            ap = 1.0 + scale
            am = 1.0 - scale
        for bc in _aligned_bcs(bcs, j):
            if bc.bc_type in ("neumann", "symmetry"):
                dr = dxj if j == 0 else 0.0
                if bc.bc_n_dir < 0:
                    r_prev = float(mesh._x_np[j][1])
                    alpha = (2.0 / 3.0) * dr / r_prev if (rz and r_prev != 0) else 0.0
                    ap[1] = 2.0 / 3.0 + alpha
                    ac[1] = -(2.0 / 3.0 + alpha)
                    am[1] = 0.0
                else:
                    r_prev = float(mesh._x_np[j][-2])
                    alpha = (2.0 / 3.0) * dr / r_prev if (rz and r_prev != 0) else 0.0
                    ap[-2] = 0.0
                    ac[-2] = -(2.0 / 3.0 + alpha)
                    am[-2] = 2.0 / 3.0 + alpha
        scale2 = dxj * dxj
        out.append(
            (
                jnp.asarray(ap / scale2, dtype=dtype),
                jnp.asarray(ac / scale2, dtype=dtype),
                jnp.asarray(am / scale2, dtype=dtype),
            )
        )
    return tuple(out)


def grad_axis_coeffs(mesh, bcs, gamma: float = 1.0, dtype=None) -> tuple:
    """Per-axis central-gradient coefficients with BC surgery.

    Mirrors ``Grad.build_A_coeffs`` + ``_grad_central_adjust``
    (``fdc.py:480-492``, ``fdc.py:543-609``) for spatially-constant gamma.
    """
    dtype = dtype or mesh.dtype.float
    out = []
    for j in range(mesh.dim):
        n = mesh.nx[j]
        dxj = float(mesh.dx_np[j])
        ap = gamma * np.ones(n)
        ac = np.zeros(n)
        am = -gamma * np.ones(n)
        for bc in _aligned_bcs(bcs, j):
            if bc.bc_type in ("neumann", "symmetry"):
                if bc.bc_n_dir < 0:
                    ap[1] += gamma / 3.0
                    ac[1] -= gamma / 3.0
                    am[1] = 0.0
                else:
                    ap[-2] = 0.0
                    ac[-2] += gamma / 3.0
                    am[-2] -= gamma / 3.0
            elif bc.bc_type == "periodic":
                if bc.bc_n_dir < 0:
                    am[1] = 0.0
                else:
                    ap[-2] = 0.0
        scale = 2.0 * dxj
        out.append(
            (
                jnp.asarray(ap / scale, dtype=dtype),
                jnp.asarray(ac / scale, dtype=dtype),
                jnp.asarray(am / scale, dtype=dtype),
            )
        )
    return tuple(out)


def div_axis_coeffs(
    mesh, bcs, gamma: float, limiter: str = "none", dtype=None
) -> tuple:
    """Per-axis divergence coefficients for spatially-constant advection.

    * ``limiter="none"`` (central): mirrors ``_adv_central`` +
      ``_grad_central_adjust`` (``fdc.py:708-743``); in rz the axis-0 center
      coefficient carries the ``2 dr / r`` geometric term
      (``solver/tools.py:57-77``).
    * ``limiter="upwind"``: standard first-order upwind
      ``gamma_max (phi_i - phi_{i-1})/dx + gamma_min (phi_{i+1} - phi_i)/dx``.
      NOTE: the reference's upwind bank builder (``fdc.py:746-772``) omits
      the 1/dx scaling and zeroes the center coefficient — its own pinning
      test (``tests/test_fdm.py:239``) fails against it. We implement the
      scheme the test intends.
    """
    dtype = dtype or mesh.dtype.float
    rz = mesh.coord_sys == "rz"
    out = []
    g_min = min(gamma, 0.0)
    g_max = max(gamma, 0.0)
    for j in range(mesh.dim):
        n = mesh.nx[j]
        dxj = float(mesh.dx_np[j])
        if limiter == "none":
            ap = gamma * np.ones(n)
            ac = np.zeros(n)
            am = -gamma * np.ones(n)
            if rz and j == 0:
                r = np.asarray(mesh._x_np[0])
                with np.errstate(divide="ignore", invalid="ignore"):
                    ac = gamma * np.nan_to_num(
                        2.0 * dxj / r, nan=0.0, posinf=0.0, neginf=0.0
                    )
            gl, gu = gamma, gamma
        elif limiter == "upwind":
            ap = 2.0 * g_min * np.ones(n)
            ac = 2.0 * (g_max - g_min) * np.ones(n)
            am = -2.0 * g_max * np.ones(n)
            if rz and j == 0:
                r = np.asarray(mesh._x_np[0])
                with np.errstate(divide="ignore", invalid="ignore"):
                    ac = ac + 2.0 * gamma * np.nan_to_num(
                        dxj / r, nan=0.0, posinf=0.0, neginf=0.0
                    )
            gl, gu = 2.0 * g_min, 2.0 * g_max
        else:
            raise NotImplementedError(f"div: limiter {limiter} not supported")
        for bc in _aligned_bcs(bcs, j):
            if bc.bc_type in ("neumann", "symmetry"):
                if bc.bc_n_dir < 0:
                    ap[1] += gu / 3.0
                    ac[1] -= gl / 3.0
                    am[1] = 0.0
                else:
                    ap[-2] = 0.0
                    ac[-2] += gl / 3.0
                    am[-2] -= gu / 3.0
            elif bc.bc_type == "periodic":
                if bc.bc_n_dir < 0:
                    am[1] = 0.0
                else:
                    ap[-2] = 0.0
        scale = 2.0 * dxj
        out.append(
            (
                jnp.asarray(ap / scale, dtype=dtype),
                jnp.asarray(ac / scale, dtype=dtype),
                jnp.asarray(am / scale, dtype=dtype),
            )
        )
    return tuple(out)


def apply_div_field(
    x: jnp.ndarray,
    adv: jnp.ndarray,
    base_coeffs: tuple,
    limiter: str,
    surgery: tuple,
) -> jnp.ndarray:
    """Divergence with a spatially-varying advecting field, fused at apply
    time (never materializes full coefficient banks).

    Semantics follow the reference: the advection coefficient for variable
    component ``i`` is ``adv[i]`` (``fdc.py:728-741``); for scalar targets
    ``adv[0]`` drives every mesh axis. The apply contract matches
    ``Discretizer.apply`` for Div (``fdc.py:93-102``): a scalar field summed
    over ``(axis, component)`` diagonal pairs, shape ``(1, *nx)``.

    Args:
        x: target values ``(vdim, *nx)``.
        adv: advecting values ``(vdim | 1, *nx)``.
        base_coeffs: per-axis (ap0, ac0, am0) *geometry-only* 1-D vectors
            built by ``div_axis_coeffs(..., gamma=1.0)`` WITHOUT bc surgery
            (i.e. 1, 0-or-rz-term, -1, scaled by 1/(2 dx)).
        limiter: "none" | "upwind".
        surgery: per-axis ``(lower_kind, upper_kind)`` with kind in
            {"none", "neumann", "periodic"} describing the BC on that axis
            (symmetry maps to "neumann": same coefficient treatment,
            ``fdc.py:582``).
    """
    vdim = x.shape[0]
    ndim_mesh = x.ndim - 1
    out = jnp.zeros_like(x[0])[None]
    for j in range(ndim_mesh):
        ap0, ac0, am0 = base_coeffs[j]
        shape = _bshape(x.ndim, j)[1:]
        apb = ap0.reshape(shape)
        acb = ac0.reshape(shape)
        amb = am0.reshape(shape)
        inv_2dx = jnp.abs(apb)  # |ap0| == 1/(2 dx_j)
        i = j if vdim > 1 else 0
        a = adv[i] if adv.shape[0] > 1 else adv[0]
        xi = x[i]
        if limiter == "none":
            ap = apb * jnp.roll(a, -1, j)
            ac = acb * a
            am = amb * jnp.roll(a, 1, j)
            # Neumann surgery gammas (``_grad_central_adjust`` with a
            # length-1 gamma tuple: gamma_min == gamma_max == adv).
            gl = gu = a
        else:
            g_min = jnp.minimum(a, 0.0)
            g_max = jnp.maximum(a, 0.0)
            ap = 2.0 * inv_2dx * g_min
            ac = 2.0 * inv_2dx * (g_max - g_min) + acb * a
            am = -2.0 * inv_2dx * g_max
            gl, gu = 2.0 * g_min, 2.0 * g_max
        lo_kind, up_kind = surgery[j]
        # The reference adds (1/3)*gamma pre-division then divides by 2 dx
        # (``fdc.py:588-609``); coefficients here are already divided, so the
        # correction is (1/3) * gamma * 1/(2 dx).
        third = inv_2dx / 3.0
        row = lambda arr, idx: arr[_row_sel(j, idx)]
        if lo_kind == "neumann":
            sel = _row_sel(j, 1)
            ap = ap.at[sel].add(row(third * gu, 1))
            ac = ac.at[sel].add(-row(third * gl, 1))
            am = am.at[sel].set(0.0)
        elif lo_kind == "periodic":
            am = am.at[_row_sel(j, 1)].set(0.0)
        if up_kind == "neumann":
            sel = _row_sel(j, -2)
            ap = ap.at[sel].set(0.0)
            ac = ac.at[sel].add(row(third * gl, -2))
            am = am.at[sel].add(-row(third * gu, -2))
        elif up_kind == "periodic":
            ap = ap.at[_row_sel(j, -2)].set(0.0)
        out = out.at[0].add(
            ap * jnp.roll(xi, -1, j) + ac * xi + am * jnp.roll(xi, 1, j)
        )
    return out


def _row_sel(axis: int, idx: int) -> tuple:
    """Index tuple selecting row ``idx`` along ``axis`` of an (*nx) array."""
    return (slice(None),) * axis + (idx,)


def div_surgery_info(bcs, mesh_dim: int) -> tuple:
    """Static per-axis (lower_kind, upper_kind) BC descriptors for
    ``apply_div_field``."""
    info = [["none", "none"] for _ in range(mesh_dim)]
    for bc in bcs or []:
        side = 0 if bc.bc_n_dir < 0 else 1
        if bc.bc_type in ("neumann", "symmetry"):
            info[bc.bc_face_dim][side] = "neumann"
        elif bc.bc_type == "periodic":
            info[bc.bc_face_dim][side] = "periodic"
    return tuple(tuple(p) for p in info)


def estimate_stencil_bytes(nx: tuple[int, ...], dtype_bytes: int = 4) -> int:
    """Bytes moved by one fused stencil apply (read x + write out)."""
    n = math.prod(nx)
    return 2 * n * dtype_bytes
