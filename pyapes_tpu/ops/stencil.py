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


def apply_axis_stencil(coeffs: Sequence[tuple], x: jnp.ndarray) -> jnp.ndarray:
    """Apply a per-axis coefficient-vector stencil, summed over axes.

    Equivalent to the reference roll-sum ``_A_coeff_var_sum``
    (``fdc.py:171-200``). Each axis entry is either a 3-tuple
    ``(ap, ac, am)`` (offsets +1, 0, -1) or a 5-tuple
    ``(app, ap, ac, am, amm)`` (offsets +2..-2; used by the QUICK scheme).

    Args:
        coeffs: per mesh axis, 1-D coefficient vectors (len ``nx[axis]``).
        x: field values, shape ``(vdim, *nx)``.
    """
    out = jnp.zeros_like(x)
    for j, cs in enumerate(coeffs):
        shape = _bshape(x.ndim, j)
        if len(cs) == 3:
            offsets = (-1, 0, 1)
        else:
            offsets = (-2, -1, 0, 1, 2)
        for c, off in zip(cs, offsets):
            shifted = jnp.roll(x, off, 1 + j) if off else x
            out = out + c.reshape(shape) * shifted
    return out


def _aligned_bcs(bcs, axis: int):
    return [bc for bc in (bcs or []) if bc.bc_face_dim == axis]


def _eliminate_boundary_node(ap, ac, am, lower: bool) -> None:
    """Neumann/Symmetry coefficient surgery via boundary-node elimination.

    The boundary value obeys ``v_b = 4/3 p - 1/3 pp + 2/3 V dx`` (the BC
    application, ``variables/bcs.py``); substituting it into the row
    adjacent to the face moves its coefficient ``c0`` onto the neighbors:
    ``+4/3 c0`` to the center, ``-1/3 c0`` to the far neighbor (the constant
    part goes to the RHS via ``adjust_rhs``).

    This single rule reproduces the reference's Laplacian surgery exactly —
    including the rz ``alpha`` term (``fdc.py:405-414``) — and is the
    self-consistent form of its Grad/Div surgery (the reference's ``-1/3``
    center term at ``fdc.py:589,594`` contradicts its own BC application
    and its own RHS adjustments, and is pinned wrong by its
    ``_grad_manuel_op`` oracle, ``tests/test_fdm.py:134-135``).

    Mutates the numpy vectors in place.
    """
    if lower:
        c0 = am[1]
        ac[1] += (4.0 / 3.0) * c0
        ap[1] += -(1.0 / 3.0) * c0
        am[1] = 0.0
    else:
        c0 = ap[-2]
        ac[-2] += (4.0 / 3.0) * c0
        am[-2] += -(1.0 / 3.0) * c0
        ap[-2] = 0.0


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
                _eliminate_boundary_node(ap, ac, am, bc.bc_n_dir < 0)
        scale2 = dxj * dxj
        out.append(
            (
                np.asarray(ap / scale2, dtype=dtype),
                np.asarray(ac / scale2, dtype=dtype),
                np.asarray(am / scale2, dtype=dtype),
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
                _eliminate_boundary_node(ap, ac, am, bc.bc_n_dir < 0)
            # Periodic faces: NO surgery — every node of the torus is
            # interior. The implicit path solves on the reduced torus
            # (``linalg._reduce_periodic`` rebuilds the vectors anyway);
            # the explicit path applies the exact reduced-roll stencil
            # (``fdc._A_coeff_var_sum``), which consumes interior values
            # at every row.
        scale = 2.0 * dxj
        out.append(
            (
                np.asarray(ap / scale, dtype=dtype),
                np.asarray(ac / scale, dtype=dtype),
                np.asarray(am / scale, dtype=dtype),
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
    * ``limiter="quick"``: 3rd-order upwind-biased QUICK (the reference's
      advertised-but-unimplemented scheme, ``fdc.py:659-660``); returns
      5-vectors ``(app, ap, ac, am, amm)``; boundary-adjacent rows fall
      back to first-order upwind (the +-2 reach would cross the face).
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
        elif limiter in ("upwind", "quick"):
            up_ap = 2.0 * g_min * np.ones(n)
            up_ac = 2.0 * (g_max - g_min) * np.ones(n)
            up_am = -2.0 * g_max * np.ones(n)
            rz_term = np.zeros(n)
            if rz and j == 0:
                r = np.asarray(mesh._x_np[0])
                with np.errstate(divide="ignore", invalid="ignore"):
                    rz_term = 2.0 * gamma * np.nan_to_num(
                        dxj / r, nan=0.0, posinf=0.0, neginf=0.0
                    )
            if limiter == "upwind":
                ap, ac, am = up_ap, up_ac + rz_term, up_am
                app = amm = None
            else:
                # QUICK face interpolation, advective form (pre 1/(2 dx)
                # scaling, hence the x2 factors):
                #   gamma>0: (3 p+ + 3 p0 - 7 p- + p--)/8 / dx
                #   gamma<0: (-p++ + 7 p+ - 3 p0 - 3 p-)/8 / dx
                app = (-g_min / 4.0) * np.ones(n)
                ap = ((3 * g_max + 7 * g_min) / 4.0) * np.ones(n)
                ac = (3 * (g_max - g_min) / 4.0) * np.ones(n) + rz_term
                am = (-(7 * g_max + 3 * g_min) / 4.0) * np.ones(n)
                amm = (g_max / 4.0) * np.ones(n)
                # Boundary-adjacent rows: first-order upwind fallback (the
                # +-2 reach would cross the boundary face).
                for idx in (1, -2):
                    ap[idx] = up_ap[idx]
                    ac[idx] = up_ac[idx] + rz_term[idx]
                    am[idx] = up_am[idx]
                    app[idx] = 0.0
                    amm[idx] = 0.0
        else:
            raise NotImplementedError(f"div: limiter {limiter} not supported")
        for bc in _aligned_bcs(bcs, j):
            if bc.bc_type in ("neumann", "symmetry"):
                _eliminate_boundary_node(ap, ac, am, bc.bc_n_dir < 0)
            # periodic: no surgery (see grad_axis_coeffs)
        scale = 2.0 * dxj
        if limiter == "quick":
            out.append(
                tuple(
                    np.asarray(c / scale, dtype=dtype)
                    for c in (app, ap, ac, am, amm)
                )
            )
        else:
            out.append(
                (
                    np.asarray(ap / scale, dtype=dtype),
                    np.asarray(ac / scale, dtype=dtype),
                    np.asarray(am / scale, dtype=dtype),
                )
            )
    return tuple(out)


def apply_div_field(
    x: jnp.ndarray,
    adv: jnp.ndarray,
    base_coeffs: tuple,
    limiter: str,
    surgery: tuple,
    form: str = "conservative",
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
        app = amm = None
        if limiter == "none":
            if form == "conservative":
                # Flux form d(gamma phi)/dx: neighbor gammas multiply the
                # neighbor values (reference ``_adv_central``,
                # ``fdc.py:736-738``).
                ap = apb * jnp.roll(a, -1, j)
                am = amb * jnp.roll(a, 1, j)
            else:
                # Advective form gamma * d(phi)/dx (the reference Div's
                # OTHER documented math, ``fdc.py:628-631``) — required for
                # e.g. Burgers ``u u_x``.
                ap = apb * a
                am = amb * a
            ac = acb * a
        elif limiter == "upwind":
            g_min = jnp.minimum(a, 0.0)
            g_max = jnp.maximum(a, 0.0)
            ap = 2.0 * inv_2dx * g_min
            ac = 2.0 * inv_2dx * (g_max - g_min) + acb * a
            am = -2.0 * inv_2dx * g_max
        else:  # quick
            g_min = jnp.minimum(a, 0.0)
            g_max = jnp.maximum(a, 0.0)
            s = 2.0 * inv_2dx  # == 1/dx
            app = -s * g_min / 8.0
            ap = s * (3 * g_max + 7 * g_min) / 8.0
            ac = s * 3 * (g_max - g_min) / 8.0 + acb * a
            am = -s * (7 * g_max + 3 * g_min) / 8.0
            amm = s * g_max / 8.0
            # boundary-adjacent rows: first-order upwind fallback
            for idx in (1, -2):
                sel = _row_sel(j, idx)
                ap = ap.at[sel].set((2.0 * inv_2dx * g_min)[sel])
                ac = ac.at[sel].set(
                    (2.0 * inv_2dx * (g_max - g_min) + acb * a)[sel]
                )
                am = am.at[sel].set((-2.0 * inv_2dx * g_max)[sel])
                app = app.at[sel].set(0.0)
                amm = amm.at[sel].set(0.0)
        lo_kind, up_kind = surgery[j]
        # Boundary-node elimination rule (see ``_eliminate_boundary_node``),
        # applied on the fly with the spatially-varying coefficients.
        if lo_kind == "neumann":
            sel = _row_sel(j, 1)
            c0 = am[sel]
            ac = ac.at[sel].add((4.0 / 3.0) * c0)
            ap = ap.at[sel].add(-(1.0 / 3.0) * c0)
            am = am.at[sel].set(0.0)
        elif lo_kind == "periodic":
            am = am.at[_row_sel(j, 1)].set(0.0)
        if up_kind == "neumann":
            sel = _row_sel(j, -2)
            c0 = ap[sel]
            ac = ac.at[sel].add((4.0 / 3.0) * c0)
            am = am.at[sel].add(-(1.0 / 3.0) * c0)
            ap = ap.at[sel].set(0.0)
        elif up_kind == "periodic":
            ap = ap.at[_row_sel(j, -2)].set(0.0)
        term = ap * jnp.roll(xi, -1, j) + ac * xi + am * jnp.roll(xi, 1, j)
        if app is not None:
            term = (
                term
                + app * jnp.roll(xi, -2, j)
                + amm * jnp.roll(xi, 2, j)
            )
        out = out.at[0].add(term)
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


def apply_conv_field(
    x: jnp.ndarray,
    adv: jnp.ndarray,
    base_coeffs: tuple,
    limiter: str,
    surgery: tuple,
) -> jnp.ndarray:
    """Convection ``u_j d(phi_i)/dx_j`` for vector fields (advective form,
    advection indexed per MESH AXIS), applied per component.

    The reference's Div cannot express this operator (it sums axis/component
    diagonal pairs into a scalar, ``fdc.py:93-102``); it is required for
    implicit Navier-Stokes momentum and vector Burgers systems.

    Args:
        x: target values ``(vdim, *nx)``.
        adv: advecting velocity ``(mesh.dim, *nx)`` (component per axis).
        base_coeffs: per-axis geometry-only vectors from
            ``div_axis_coeffs(..., gamma=1.0, limiter="none")``.
        limiter: "none" | "upwind" | "quick" (3rd-order upwind-biased,
            first-order fallback on boundary-adjacent rows — the scheme
            the reference advertises but never implemented,
            ``fdc.py:659-660``).
        surgery: ``div_surgery_info`` output.
    """
    ndim_mesh = x.ndim - 1
    assert adv.shape[0] == ndim_mesh, "conv: adv needs one component per axis"
    out = jnp.zeros_like(x)
    for j in range(ndim_mesh):
        ap0, ac0, am0 = base_coeffs[j]
        shape = _bshape(x.ndim, j)[1:]
        apb = ap0.reshape(shape)
        acb = ac0.reshape(shape)
        amb = am0.reshape(shape)
        inv_2dx = jnp.abs(apb)
        a = adv[j]
        app = amm = None
        if limiter == "none":
            ap = apb * a
            ac = acb * a
            am = amb * a
        elif limiter == "upwind":
            g_min = jnp.minimum(a, 0.0)
            g_max = jnp.maximum(a, 0.0)
            ap = 2.0 * inv_2dx * g_min
            ac = 2.0 * inv_2dx * (g_max - g_min) + acb * a
            am = -2.0 * inv_2dx * g_max
        else:  # quick (3rd-order upwind-biased; mirrors apply_div_field)
            g_min = jnp.minimum(a, 0.0)
            g_max = jnp.maximum(a, 0.0)
            s = 2.0 * inv_2dx  # == 1/dx
            app = -s * g_min / 8.0
            ap = s * (3 * g_max + 7 * g_min) / 8.0
            ac = s * 3 * (g_max - g_min) / 8.0 + acb * a
            am = -s * (7 * g_max + 3 * g_min) / 8.0
            amm = s * g_max / 8.0
            # boundary-adjacent rows: first-order upwind fallback (the
            # +-2 reach would cross the boundary face)
            for idx in (1, -2):
                sel = _row_sel(j, idx)
                ap = ap.at[sel].set((2.0 * inv_2dx * g_min)[sel])
                ac = ac.at[sel].set(
                    (2.0 * inv_2dx * (g_max - g_min) + acb * a)[sel]
                )
                am = am.at[sel].set((-2.0 * inv_2dx * g_max)[sel])
                app = app.at[sel].set(0.0)
                amm = amm.at[sel].set(0.0)
        lo_kind, up_kind = surgery[j]
        if lo_kind == "neumann":
            sel = _row_sel(j, 1)
            c0 = am[sel]
            ac = ac.at[sel].add((4.0 / 3.0) * c0)
            ap = ap.at[sel].add(-(1.0 / 3.0) * c0)
            am = am.at[sel].set(0.0)
        elif lo_kind == "periodic":
            am = am.at[_row_sel(j, 1)].set(0.0)
        if up_kind == "neumann":
            sel = _row_sel(j, -2)
            c0 = ap[sel]
            ac = ac.at[sel].add((4.0 / 3.0) * c0)
            am = am.at[sel].add(-(1.0 / 3.0) * c0)
            ap = ap.at[sel].set(0.0)
        elif up_kind == "periodic":
            ap = ap.at[_row_sel(j, -2)].set(0.0)
        term = (
            ap[None] * jnp.roll(x, -1, 1 + j)
            + ac[None] * x
            + am[None] * jnp.roll(x, 1, 1 + j)
        )
        if app is not None:
            term = (
                term
                + app[None] * jnp.roll(x, -2, 1 + j)
                + amm[None] * jnp.roll(x, 2, 1 + j)
            )
        out = out + term
    return out


def apply_diff_field(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    inv_dx2: Sequence[float],
    surgery: tuple,
    avg: str = "arithmetic",
) -> jnp.ndarray:
    """Conservative variable-coefficient Laplacian ``∂_j (Γ_j(x) ∂_j φ)``.

    Face-averaged flux form (exactly symmetric on interior rows):

        out_i = Σ_j [ Γ_{i+½}(φ_{i+1}-φ_i) - Γ_{i-½}(φ_i-φ_{i-1}) ] / dx_j²

    The reference's implicit Laplacian only supports a SCALAR coefficient
    (``fdm.py:108-169`` multiplies the constant-coefficient stencil by Γ,
    which for varying Γ would be the non-conservative ``Γ ∇²φ``); this is
    the implicit heterogeneous-diffusivity operator (Darcy/conductivity
    problems), with Γ streamed as a runtime operand.

    ``gamma``: isotropic per-point field of shape ``nx`` — or a STACKED
    ``(dim, *nx)`` array for diagonal-tensor (anisotropic) diffusivity,
    axis ``j`` diffusing with ``gamma[j]``.

    ``avg``: face value rule. "arithmetic" ``(Γ_i+Γ_{i±1})/2`` (exact
    for smooth Γ); "harmonic" ``2Γ_iΓ_{i±1}/(Γ_i+Γ_{i±1})`` — the
    flux-continuous (resistor-series) choice, NODALLY EXACT for
    piecewise-constant Γ with the interface on a face midpoint (the
    standard transmissibility in reservoir simulation; requires Γ > 0).

    ``surgery``: per-axis ``(lower, upper)`` kinds. "neumann" eliminates
    the boundary node from the adjacent row via the zero-flux
    reconstruction ``φ_b = 4/3 φ_1 - 1/3 φ_2`` (the elimination
    coefficient carries the LOCAL face Γ); "none" reads the neighbor
    normally (Dirichlet boundary values ride the entry residual).
    Periodic axes must arrive torus-reduced (surgery "none"; ``roll`` is
    then the exact periodic stencil, with ``gamma`` reduced too).
    """
    aniso = gamma.ndim == x.ndim and gamma.shape[0] == x.ndim - 1

    def face(a, b):
        if avg == "harmonic":
            return (2.0 * a) * b / (a + b)
        return 0.5 * (a + b)

    out = jnp.zeros_like(x)
    for j in range(x.ndim - 1):
        ax = 1 + j
        gj = gamma[j] if aniso else gamma
        g = gj[None] if gj.ndim == x.ndim - 1 else gj
        gp = face(g, jnp.roll(g, -1, ax))
        gm = face(g, jnp.roll(g, 1, ax))
        term = gp * (jnp.roll(x, -1, ax) - x) - gm * (
            x - jnp.roll(x, 1, ax)
        )
        out = out + term * inv_dx2[j]
        lo_kind, up_kind = surgery[j]
        row = lambda idx: (slice(None),) + _row_sel(j, idx)
        if lo_kind == "neumann":
            c0 = gm[row(1)] * inv_dx2[j]
            out = out.at[row(1)].add(
                c0
                * (
                    (4.0 / 3.0) * x[row(1)]
                    - (1.0 / 3.0) * x[row(2)]
                    - x[row(0)]
                )
            )
        if up_kind == "neumann":
            c0 = gp[row(-2)] * inv_dx2[j]
            out = out.at[row(-2)].add(
                c0
                * (
                    (4.0 / 3.0) * x[row(-2)]
                    - (1.0 / 3.0) * x[row(-3)]
                    - x[row(-1)]
                )
            )
    return out
