"""Finite-difference explicit discretizers ``FDC`` (OpenFOAM ``fvc``-like).

TPU-native rebuild of reference ``pyapes/solver/fdc.py``. Stencils are
encoded as five coefficient banks ``[App, Ap, Ac, Am, Amm]`` for offsets
``i+2 .. i-2`` (``fdc.py:2-4``); application is the roll-sum
``sum_k coeff_k * roll(var, -2+k, axis)`` (``fdc.py:171-200``) which XLA
fuses into a single VMEM pass. BC surgery uses **static-slice** row updates
(domain-face masks are slabs) so everything constant-folds under jit.

Functional-style: ``apply`` and ``_treat_edge`` return new arrays instead of
mutating.
"""
from __future__ import annotations

import warnings
from abc import ABC, abstractmethod
from dataclasses import dataclass

import jax.numpy as jnp

from pyapes_tpu.geometry.basis import n2d_coord
from pyapes_tpu.solver.tools import default_A_ops
from pyapes_tpu.solver.types import DiscretizerConfigType
from pyapes_tpu.variables import Field
from pyapes_tpu.variables.bcs import BC
from pyapes_tpu.variables.container import Hess, Jac


def tensor_idx(dim: int) -> list[tuple[int, int]]:
    """Upper-triangular index pairs (inlines ``pymytools.indices.tensor_idx``,
    used at reference ``fdc.py:12,920``)."""
    return [(i, j) for i in range(dim) for j in range(i, dim)]


def _row_sel(axis: int, idx: int, leading: int = 0) -> tuple:
    return (slice(None),) * (leading + axis) + (idx,)


def _periodic_axes_of(var: Field) -> tuple[int, ...]:
    """Mesh axes on which ``var`` carries periodic BCs.

    The grid stores BOTH endpoints of a periodic axis (duplicated seam
    node, reference ``_mesh.py:84-96``), so ``jnp.roll`` is NOT the
    periodic stencil on the full grid: node 0's minus-neighbor is node
    ``n-2`` (node ``n-1`` IS node 0), while roll grabs node ``n-1``. The
    implicit solver handles this by solving on the reduced torus
    (``linalg._reduce_periodic``); the explicit appliers reduce/restore
    per axis inside ``_A_coeff_var_sum``."""
    return tuple(
        sorted(
            {
                bc.bc_face_dim
                for bc in (var.bcs or [])
                if getattr(bc, "bc_type", None) == "periodic"
            }
        )
    )


def _face_bcs(var: Field, axis: int):
    """Domain-face BCs whose normal has a component along ``axis``.

    Obstacle BCs (``ObstacleDirichlet``/``ObstacleNeumann``) carry no
    ``bc_n_vec``; coefficient surgery is face-row surgery only, so they are
    filtered out here (the implicit fdm path filters by ``bc_face_dim``
    already — this keeps the explicit path consistent)."""
    for bc in var.bcs or []:
        n_vec = getattr(bc, "bc_n_vec", None)
        if n_vec is None or n_vec[axis] == 0:
            continue
        yield bc


@dataclass
class Discretizer(ABC):
    """Base explicit discretizer (reference ``fdc.py:25-168``)."""

    A_coeffs: list[list[jnp.ndarray]] | None = None
    rhs_adj: jnp.ndarray | None = None
    _op_type: str = "Discretizer"
    _config: DiscretizerConfigType | None = None

    @property
    def op_type(self) -> str:
        return self._op_type

    @property
    def config(self) -> DiscretizerConfigType | None:
        return self._config

    @staticmethod
    @abstractmethod
    def build_A_coeffs(*args, config=None) -> list[list[jnp.ndarray]]:
        ...

    @staticmethod
    @abstractmethod
    def adjust_rhs(*args, config=None) -> jnp.ndarray:
        ...

    def apply(
        self, A_coeffs: list[list[jnp.ndarray]], var: Field, edge: bool | None = None
    ) -> jnp.ndarray:
        """Apply the discretization (reference ``fdc.py:67-118``).

        Per-op output shape: Grad -> ``(var.dim, mesh.dim, *nx)``;
        Div -> ``(1, *nx)``; Laplacian -> ``(var.dim, *nx)``.
        """
        assert A_coeffs is not None, "FDC: A_coeffs is not defined!"
        if edge is None:
            if self.config is not None and self.op_type.lower() in self.config:
                edge = bool(self.config[self.op_type.lower()].get("edge", False))
            else:
                edge = False
                warnings.warn(
                    f"FDC: config is not defined! Using default config ({edge=})."
                )

        v = var()
        # Periodic axes: exact torus stencils inside _A_coeff_var_sum, and
        # NO one-sided edge replacement (the wrap rows are interior nodes
        # of the torus — one-sided formulas would be both less accurate
        # and inconsistent between the two duplicate seam rows).
        paxes = _periodic_axes_of(var)

        if self.op_type == "Grad":
            dis_var_dim = []
            for idx in range(var.dim):
                grad_d = [
                    _A_coeff_var_sum(A_coeffs, v, idx, dim, var.dim, paxes)
                    for dim in range(var.mesh.dim)
                ]
                dis_var_dim.append(jnp.stack(grad_d))
            discretized = jnp.stack(dis_var_dim)
            if edge:
                for dim in range(discretized.shape[0]):
                    discretized = _treat_edge(
                        discretized, var, self.op_type, dim, skip_axes=paxes
                    )

        elif self.op_type == "Div":
            form = "conservative"
            if self.config is not None and "div" in self.config:
                form = self.config["div"].get("form", "conservative")
            acc = jnp.zeros_like(v[0])
            for idx in range(var.mesh.dim):
                disc = _A_coeff_var_sum(A_coeffs, v, idx, idx, var.dim, paxes)
                if edge and idx not in paxes:
                    disc = _treat_edge(
                        disc, var, self.op_type, idx, self.var_addition, form
                    )
                acc = acc + disc
            discretized = acc[None]

        elif self.op_type == "Laplacian":
            # Edge mode replaces each axis's contribution at that axis's
            # boundary slabs with the one-sided second derivative BEFORE
            # summation. (The reference overwrites the summed Laplacian
            # after the fact, ``fdc.py:110-113`` + ``fdc.py:223-258``,
            # dropping the tangential axes' contributions at boundaries —
            # its own oracle test ``test_fdm.py:42-49`` disagrees.)
            discretized = jnp.zeros_like(v)
            for idx in range(var.dim):
                s = jnp.zeros_like(v[0])
                for dim in range(var.mesh.dim):
                    term = _A_coeff_var_sum(A_coeffs, v, idx, dim, var.dim,
                                            paxes)
                    if edge and dim not in paxes:
                        term = _one_sided_second_derivative(
                            term, v[idx if var.dim > 1 else 0], dim,
                            var.mesh.dx[dim],
                        )
                    s = s + term
                discretized = discretized.at[idx].set(s)
        else:
            raise TypeError(f"FDC: ({self.op_type=} is not supported!")

        return discretized

    def reset(self) -> None:
        self.A_coeffs = None
        self.rhs_adj = None

    def set_config(self, config: DiscretizerConfigType) -> None:
        self._config = config

    def __call__(self, *args, edge: bool | None = None):
        """Discretize. Accepts an ``edge=`` keyword override (the reference
        rejects kwargs, making its own ``tests/test_fdm.py:37`` stale —
        quirk 6 in SURVEY §2)."""
        if len(args) == 1:
            assert isinstance(args[0], Field), "FDC: only `Field` is allowed for var!"
            return self.__call_one_var(args[0], edge)
        else:
            assert isinstance(args[1], Field), "FDC: only `Field` is allowed for var_i!"
            return self.__call_two_vars(args[0], args[1], edge)

    def __call_one_var(self, var: Field, edge: bool | None):
        self.A_coeffs = self.build_A_coeffs(var)
        self.rhs_adj = self.adjust_rhs(var)
        return self.apply(self.A_coeffs, var, edge)

    def __call_two_vars(self, var_j, var_i: Field, edge: bool | None):
        self.A_coeffs = self.build_A_coeffs(var_j, var_i, config=self.config)
        self.rhs_adj = self.adjust_rhs(var_j, var_i, config=self.config)
        self.var_addition = var_j
        return self.apply(self.A_coeffs, var_i, edge)


class AxisCoeffs:
    """Separable explicit-stencil representation: per-axis 1-D coefficient
    vectors — a few KB — instead of the reference's five full-grid banks
    (``tools.py:29-112``; ~8 GB at 512^3, VERDICT r1 item 4).

    Valid whenever coefficients vary only along their own axis: Laplacian
    and Grad always (BC surgery edits whole rows with row-constant values;
    the rz 1/r terms vary along axis 0 only), Div with spatially-constant
    advection. Wraps the same builders the implicit hot path uses
    (``ops/stencil.py``), so the two paths share their parity tests.
    Spatially-varying advection keeps the banks (genuinely per-point).
    """

    def __init__(self, vecs):
        self.vecs = tuple(tuple(v) for v in vecs)


def _A_coeff_var_sum(
    A_coeffs,
    v: jnp.ndarray,
    idx: int,
    dim: int,
    vdim: int,
    paxes: tuple = (),
) -> jnp.ndarray:
    """Roll-sum of the stencil coefficients along mesh-axis ``dim``
    (reference ``fdc.py:171-200``). Accepts the full-grid 5-bank layout or
    the separable ``AxisCoeffs`` vectors (identical term order, so results
    agree exactly: the banks' zero App/Amm terms add exact zeros).

    If ``dim`` is a periodic axis (``dim in paxes``), the sum runs on the
    reduced torus (duplicate seam node dropped — where ``jnp.roll`` IS the
    exact periodic stencil) and the duplicate output row is restored
    afterwards. Coefficients on a periodic axis carry interior values at
    every node (no seam surgery), so slicing their rows is exact."""
    v_idx = 0 if vdim == 1 else idx
    vv = v[v_idx]
    periodic = dim in paxes
    red = _row_sel(dim, slice(None, -1))
    if isinstance(A_coeffs, AxisCoeffs):
        cs = A_coeffs.vecs[dim]
        offsets = (-1, 0, 1) if len(cs) == 3 else (-2, -1, 0, 1, 2)
        if periodic:
            vv = vv[red]
            cs = tuple(c[:-1] for c in cs)
        shape = [1] * vv.ndim
        shape[dim] = -1
        summed = jnp.zeros_like(vv)
        for c, off in zip(cs, offsets):
            shifted = jnp.roll(vv, off, dim) if off else vv
            summed = summed + c.reshape(shape) * shifted
    else:
        assert len(A_coeffs) == 5, (
            "FDC: the total number of coefficient tensors should be 5!"
        )
        if periodic:
            vv = vv[red]
        summed = jnp.zeros_like(vv)
        for i, c in enumerate(A_coeffs):
            coeff = c[dim][v_idx]
            if periodic:
                coeff = coeff[red]
            summed = summed + coeff * jnp.roll(vv, -2 + i, dim)
    if periodic:
        seam = summed[_row_sel(dim, slice(0, 1))]
        summed = jnp.concatenate([summed, seam], axis=dim)
    return summed


def _one_sided_second_derivative(
    term: jnp.ndarray, v: jnp.ndarray, axis: int, dx
) -> jnp.ndarray:
    """Replace the boundary slabs of a single-axis second-derivative field
    with the 2nd-order one-sided formula
    ``(2 b - 5 b' + 4 b'' - b''')/dx^2`` (reference ``fdc.py:237-253``)."""
    for side in (0, 1):
        if side == 0:
            i0, i1, i2, i3 = 0, 1, 2, 3
        else:
            i0, i1, i2, i3 = -1, -2, -3, -4
        val = (
            2.0 * v[_row_sel(axis, i0)]
            - 5.0 * v[_row_sel(axis, i1)]
            + 4.0 * v[_row_sel(axis, i2)]
            - v[_row_sel(axis, i3)]
        ) / (dx**2)
        term = term.at[_row_sel(axis, i0)].set(val)
    return term


def _treat_edge(
    discretized: jnp.ndarray,
    var: Field,
    ops: str,
    dim: int,
    var_add=None,
    form: str = "conservative",
    skip_axes: tuple = (),
) -> jnp.ndarray:
    """One-sided 2nd-order boundary treatment for ``edge=True`` mode
    (reference ``fdc.py:203-366``). Returns the updated array.
    ``skip_axes``: periodic axes — their wrap rows are torus-interior
    nodes, already exact from the reduced-roll apply."""
    md = var.mesh.dim
    v = var()

    if ops == "Grad":
        for idx in range(md):
            if idx in skip_axes:
                continue
            for side in (0, 1):
                if side == 0:
                    i0, i1, i2, sgn = 0, 1, 2, -1.0
                else:
                    i0, i1, i2, sgn = -1, -2, -3, 1.0
                b = v[dim][_row_sel(idx, i0)]
                bp = v[dim][_row_sel(idx, i1)]
                bpp = v[dim][_row_sel(idx, i2)]
                val = sgn * (1.5 * b - 2.0 * bp + 0.5 * bpp) / var.mesh.dx[idx]
                discretized = discretized.at[(dim, idx) + _row_sel(idx, i0)].set(val)

    elif ops == "Div":
        n2d = n2d_coord(var.mesh.coord_sys)
        if isinstance(var_add, Field):
            adv = var_add[dim]
        elif isinstance(var_add, Jac):
            adv = var_add[n2d[dim]]
        elif isinstance(var_add, float):
            adv = jnp.ones_like(var[dim]) * var_add
        elif var_add is None:
            adv = jnp.ones_like(var[dim])
        elif isinstance(var_add, Hess):
            # tensor advection: the (component, axis) pair for this edge
            # sweep (component == axis for vector targets, 0 for scalars)
            i_comp = 0 if v.shape[0] == 1 else dim
            adv = var_add[n2d[i_comp] + n2d[dim]]
        elif hasattr(var_add, "shape"):
            var_add = jnp.asarray(var_add)
            adv = var_add[dim] if var_add.shape == v.shape else var_add
        else:
            raise NotImplementedError(
                f"FDC: unsupported advector type {type(var_add)}"
            )

        target = v[0] if v.shape[0] == 1 else v[dim]

        # Conservative form differentiates the product adv*phi one-sided;
        # advective form scales the one-sided derivative of phi by adv —
        # each consistent with its interior scheme. (The reference mixes the
        # two and drops ``adv`` from the rz term on one side,
        # ``fdc.py:324-357``; its pinning test fails against it.)
        prod = adv * target if form == "conservative" else target
        for side in (0, 1):
            if side == 0:
                i0, i1, i2, sgn = 0, 1, 2, -1.0
            else:
                i0, i1, i2, sgn = -1, -2, -3, 1.0
            sel = _row_sel(dim, i0)
            b = prod[sel]
            bp = prod[_row_sel(dim, i1)]
            bpp = prod[_row_sel(dim, i2)]
            val = sgn * (1.5 * b - 2.0 * bp + 0.5 * bpp) / var.mesh.dx[dim]
            if form != "conservative":
                val = val * adv[sel]
            if var.mesh.coord_sys == "rz" and dim == 0:
                val = val + jnp.nan_to_num(
                    adv[sel] * target[sel] / var.mesh.R[sel],
                    nan=0.0,
                    posinf=0.0,
                    neginf=0.0,
                )
            discretized = discretized.at[sel].set(val)
    else:
        raise RuntimeError(f"FDC: edge treatment of {ops=} is not supported!")

    return discretized


class Laplacian(Discretizer):
    """Laplacian discretizer (reference ``fdc.py:369-458``)."""

    def __init__(self):
        self._op_type = __class__.__name__

    @staticmethod
    def build_A_coeffs(var: Field, config=None) -> AxisCoeffs:
        """Separable per-axis coefficient vectors (O(KB) instead of the
        reference's 5 full-grid banks; numerically identical — the
        boundary-node-elimination rule in ``laplacian_axis_coeffs``
        reproduces the bank surgery ``2/3 + alpha`` values exactly)."""
        from pyapes_tpu.ops.stencil import laplacian_axis_coeffs

        return AxisCoeffs(
            laplacian_axis_coeffs(var.mesh, var.bcs, dtype=var().dtype)
        )

    @staticmethod
    def adjust_rhs(var: Field, config=None) -> jnp.ndarray:
        """Neumann flux correction folded into the RHS.

        Derived from the boundary-node elimination: the eliminated
        coefficient ``c0`` (the bank value pointing at the boundary node,
        pre ``1/dx^2`` scaling) carries the constant part of the BC
        application ``v_b = (4 v1 - v2)/3 + (2/3) V dx`` (outward-normal
        ``V``, ``variables/bcs.py``), so ``rhs += -(2/3) c0 V / dx`` on the
        adjacent row — for BOTH faces (the stencil is symmetric; the
        reference's ``* bc_n_vec`` sign flip, ``fdc.py:449-455``, makes a
        nonzero upper-face flux wrong and is deliberately not replicated —
        see PARITY.md)."""
        mesh = var.mesh
        rhs_adj = jnp.zeros_like(var())
        dx = mesh.dx_np

        for i in range(var.dim):
            for j in range(mesh.dim):
                for bc in _face_bcs(var, j):
                    if bc.bc_type != "neumann":
                        continue
                    dr = dx[j] if j == 0 else 0.0
                    pi = 1 if bc.bc_n_dir < 0 else -2
                    bi = 0 if bc.bc_n_dir < 0 else -1
                    if mesh.coord_sys == "rz":
                        r_row = float(mesh._x_np[j][pi])
                        s_row = dr / (2.0 * r_row) if r_row != 0.0 else 0.0
                    else:
                        s_row = 0.0
                    # bank value eliminated by the surgery: Am = 1 - s
                    # (lower) / Ap = 1 + s (upper); s = dr/(2r) in rz.
                    c0 = 1.0 - s_row if bc.bc_n_dir < 0 else 1.0 + s_row
                    at_bc = _return_bc_val(bc, var, i, j, bi)
                    # np.float64 dx would strong-type the scatter value
                    # to f64 (a FutureWarning-then-error on f32 fields)
                    rhs_adj = rhs_adj.at[(i,) + _row_sel(j, pi)].add(
                        jnp.asarray(
                            -(2.0 / 3.0) * c0 * at_bc / dx[j],
                            dtype=rhs_adj.dtype,
                        )
                    )
        return rhs_adj


class Grad(Discretizer):
    r"""Gradient: :math:`\nabla \Phi` via second-order central difference
    (reference ``fdc.py:461-502``). Output shape ``(var.dim, mesh.dim, *nx)``."""

    def __init__(self):
        self._op_type = __class__.__name__

    @staticmethod
    def build_A_coeffs(var: Field, config=None) -> AxisCoeffs:
        from pyapes_tpu.ops.stencil import grad_axis_coeffs

        return AxisCoeffs(
            grad_axis_coeffs(var.mesh, var.bcs, 1.0, dtype=var().dtype)
        )

    @staticmethod
    def adjust_rhs(var: Field, config=None) -> jnp.ndarray:
        rhs_adj = jnp.zeros_like(var())
        if var.bcs is not None:
            for i in range(var.dim):
                rhs_adj = _grad_rhs_adjust(var, rhs_adj, i)
        return rhs_adj


def _grad_rhs_adjust(
    var: Field, rhs_adj: jnp.ndarray, dim: int, gamma=None,
    form: str = "conservative",
) -> jnp.ndarray:
    """Neumann RHS adjustment shared by Grad/Div.

    Each case adds ``-c0 * V / 3`` on the boundary-adjacent row, where
    ``c0`` is the pre-``1/(2 dx)`` bank coefficient the surgery eliminates
    (``_grad_central_adjust``) and ``V`` the outward-normal flux:

    * ``gamma is None`` (Grad): ``c0 = n`` (antisymmetric unit stencil),
      giving the reference's ``-(1/3) V n`` (``fdc.py:505-540``).
    * ``len(gamma) == 1`` (central Div): ``c0 = n * gamma`` sampled at the
      boundary node (conservative/flux form) or at the row itself
      (advective form) — matching ``_adv_central``'s rolled multiply.
      (The reference's hand-written ``1/3 * 2 gamma`` at the row,
      ``fdc.py:520-530``, is 2x the eliminated coefficient; not
      replicated — see PARITY.md.)
    * ``len(gamma) == 2`` (upwind/QUICK): ``c0 = -2 g_max`` (lower) /
      ``+2 g_min`` (upper) at the row, matching ``_adv_upwind``.
    """
    if gamma is not None and len(gamma) == 2:
        gamma_min = 2.0 * gamma[0]
        gamma_max = 2.0 * gamma[1]

    for j in range(var.mesh.dim):
        for bc in _face_bcs(var, j):
            if bc.bc_type != "neumann":
                continue
            pi = 1 if bc.bc_n_dir < 0 else -2
            bi = 0 if bc.bc_n_dir < 0 else -1
            at_bc = _return_bc_val(bc, var, dim, j, bi)
            if gamma is None:
                term = -(1.0 / 3.0) * at_bc * bc.bc_n_dir
            elif len(gamma) == 1:
                g_i = bi if form == "conservative" else pi
                g_row = gamma[0][(dim,) + _row_sel(j, g_i)]
                term = -(1.0 / 3.0) * at_bc * bc.bc_n_dir * g_row
            else:
                g = gamma_max if bc.bc_n_dir < 0 else gamma_min
                g_row = g[(dim,) + _row_sel(j, pi)]
                term = -(1.0 / 3.0) * at_bc * bc.bc_n_dir * g_row
            rhs_adj = rhs_adj.at[(dim,) + _row_sel(j, pi)].add(term)
    return rhs_adj


def conv_rhs_adjust(
    adv: jnp.ndarray, var: Field, limiter: str = "none"
) -> jnp.ndarray:
    """Neumann RHS adjustment for the Conv operator
    (``u_j d(phi_i)/dx_j``, advective form, advection per MESH AXIS).

    Mirrors ``apply_conv_field``'s on-the-fly boundary-node elimination
    (``ops/stencil.py``): the eliminated coefficient is
    ``c0 = n * adv[j]`` at the adjacent row (central) or
    ``-2 g_max`` / ``+2 g_min`` (upwind); each contributes
    ``-c0 * V_i / 3`` to the RHS. Zero unless the target has
    nonzero-value Neumann faces (closes the gap at ``fdm.py:336-339``
    flagged in round 1)."""
    rhs_adj = jnp.zeros_like(var())
    for i in range(var.dim):
        for j in range(var.mesh.dim):
            for bc in _face_bcs(var, j):
                if bc.bc_type != "neumann":
                    continue
                pi = 1 if bc.bc_n_dir < 0 else -2
                bi = 0 if bc.bc_n_dir < 0 else -1
                at_bc = _return_bc_val(bc, var, i, j, bi)
                a_row = adv[(j,) + _row_sel(j, pi)]
                if limiter == "none":
                    term = -(1.0 / 3.0) * at_bc * bc.bc_n_dir * a_row
                else:
                    g = (
                        jnp.maximum(a_row, 0.0)
                        if bc.bc_n_dir < 0
                        else jnp.minimum(a_row, 0.0)
                    )
                    term = -(2.0 / 3.0) * at_bc * bc.bc_n_dir * g
                rhs_adj = rhs_adj.at[(i,) + _row_sel(j, pi)].add(term)
    return rhs_adj


def _grad_central_adjust(
    var: Field, A_ops: list[list[jnp.ndarray]], dim: int, gamma=None
) -> list[list[jnp.ndarray]]:
    """Boundary surgery for the central gradient / advective divergence
    banks, then 1/(2 dx) scaling (reference ``fdc.py:543-609``).

    Neumann/Symmetry surgery uses the boundary-node **elimination rule**
    (see ``ops/stencil.py::_eliminate_boundary_node``): the coefficient
    ``c0`` currently multiplying the boundary node moves ``+4/3 c0`` to the
    center and ``-1/3 c0`` to the far neighbor. This reads the banks' own
    values, so it is exact for spatially-varying advection, upwind, and rz
    alike. (The reference's hand-written ``±1/3`` center terms,
    ``fdc.py:588-595``, contradict its BC application and its own RHS
    adjustments; its oracle ``_grad_manuel_op`` pins the elimination form.)

    ``gamma`` is unused for the surgery itself (kept for signature parity).
    Returns the updated ``[Ap, Ac, Am]`` banks (functional)."""
    del gamma
    Ap, Ac, Am = A_ops
    dx = var.mesh.dx_np

    for j in range(var.mesh.dim):
        for bc in _face_bcs(var, j):
            pi = 1 if bc.bc_n_dir < 0 else -2
            sel = (dim,) + _row_sel(j, pi)
            if bc.bc_type in ("neumann", "symmetry"):
                if bc.bc_n_dir < 0:
                    c0 = Am[j][sel]
                    Ac[j] = Ac[j].at[sel].add((4.0 / 3.0) * c0)
                    Ap[j] = Ap[j].at[sel].add(-(1.0 / 3.0) * c0)
                    Am[j] = Am[j].at[sel].set(0.0)
                else:
                    c0 = Ap[j][sel]
                    Ac[j] = Ac[j].at[sel].add((4.0 / 3.0) * c0)
                    Am[j] = Am[j].at[sel].add(-(1.0 / 3.0) * c0)
                    Ap[j] = Ap[j].at[sel].set(0.0)
            # Periodic faces need NO surgery: every node of the torus is
            # interior, and the explicit apply runs the exact reduced-roll
            # stencil (``_A_coeff_var_sum``). (Rounds 1-2 zeroed the
            # seam-adjacent coefficients here, which broke explicit
            # operators at rows 1 and n-2 of a periodic axis.)
        Ap[j] = Ap[j].at[dim].divide(2.0 * dx[j])
        Ac[j] = Ac[j].at[dim].divide(2.0 * dx[j])
        Am[j] = Am[j].at[dim].divide(2.0 * dx[j])

    return [Ap, Ac, Am]


class Div(Discretizer):
    r"""Divergence :math:`\partial_j (u_j \phi_i)` in advective form with
    ``central`` and ``upwind`` schemes (reference ``fdc.py:612-694``).

    NOTE: the reference's upwind bank builder (``fdc.py:746-772``) drops the
    1/dx scaling and zeroes the center coefficient, failing its own test
    (``tests/test_fdm.py:239``); this build implements the standard
    first-order upwind the test intends.
    """

    def __init__(self):
        self._op_type = __class__.__name__

    @staticmethod
    def build_A_coeffs(var_j, var_i: Field, config):
        assert config is not None and "div" in config, (
            "FDC Div: config should contain 'div' key."
        )
        if isinstance(var_j, (int, float)) and not isinstance(var_j, bool):
            # Spatially-constant advection: separable per-axis vectors
            # (KB) — the same builder the implicit path uses; full banks
            # are kept only for genuinely per-point advection below.
            from pyapes_tpu.ops.stencil import div_axis_coeffs

            return AxisCoeffs(
                div_axis_coeffs(
                    var_i.mesh,
                    var_i.bcs,
                    float(var_j),
                    _check_limiter(config["div"]),
                    dtype=var_i().dtype,
                )
            )
        adv = var_j if isinstance(var_j, (Jac, Hess)) else _div_var_j_to_tensor(
            var_j, var_i
        )

        limiter = _check_limiter(config["div"])

        App, Ap, Ac, Am, Amm = default_A_ops(var_i, "Div")

        form = config["div"].get("form", "conservative")
        if limiter == "none":
            Ap, Ac, Am = _adv_central(adv, var_i, [Ap, Ac, Am], form)
        elif limiter == "upwind":
            Ap, Ac, Am = _adv_upwind(adv, var_i, [Ap, Ac, Am])
        elif limiter == "quick":
            App, Ap, Ac, Am, Amm = _adv_quick(
                adv, var_i, [App, Ap, Ac, Am, Amm]
            )
        else:
            raise RuntimeError(f"FDC Div: {limiter=} is an unknown limiter type.")

        return [App, Ap, Ac, Am, Amm]

    @staticmethod
    def adjust_rhs(var_j, var_i: Field, config) -> jnp.ndarray:
        rhs_adj = jnp.zeros_like(var_i())
        if var_i.bcs is not None and not isinstance(var_j, (Jac, Hess)):
            adv = _div_var_j_to_tensor(var_j, var_i)
            assert config is not None and "div" in config
            limiter = _check_limiter(config["div"])
            if limiter == "none":
                form = config["div"].get("form", "conservative")
                for i in range(var_i.dim):
                    rhs_adj = _grad_rhs_adjust(
                        var_i, rhs_adj, i, (adv,), form
                    )
            elif limiter in ("upwind", "quick"):
                # QUICK falls back to upwind at boundary-adjacent rows, so
                # its RHS adjustment is the upwind one.
                gamma_min, gamma_max = _gamma_from_adv(adv, var_i)
                for i in range(var_i.dim):
                    rhs_adj = _grad_rhs_adjust(
                        var_i, rhs_adj, i, (gamma_min, gamma_max)
                    )
            else:
                raise RuntimeError(f"FDC Div: {limiter=} unknown limiter type.")
        return rhs_adj


def _check_limiter(config) -> str:
    if config is not None and "limiter" in config:
        return config["limiter"].lower()
    warnings.warn(
        "FDM: no limiter is specified. Use `none` (central difference) as default."
    )
    return "none"


def _adv_central(
    adv, var: Field, A_ops, form: str = "conservative"
) -> list[list[jnp.ndarray]]:
    """Central-difference advection coefficients (reference ``fdc.py:708-743``).

    ``form="conservative"`` multiplies neighbor coefficients by the rolled
    advection (flux form, reference behavior); ``"advective"`` uses the
    local advection (``gamma * d(phi)/dx``)."""
    Ap, Ac, Am = A_ops
    n2d = n2d_coord(var.mesh.coord_sys)
    advection = jnp.zeros_like(var()[0])
    paxes = _periodic_axes_of(var)

    for i in range(var.dim):
        for j in range(var.mesh.dim):
            if isinstance(adv, Jac):
                # For a scalar target the Jac supplies the flux component
                # per MESH AXIS (physical div of (J_r f, J_z f)); the
                # reference indexes by var-dim (``fdc.py:731``), which for
                # scalars reuses the r-component on every axis.
                advection = adv[n2d[j if var.dim == 1 else i]]
            elif isinstance(adv, Hess):
                advection = adv[n2d[i] + n2d[j]]
            else:
                advection = adv[i]
            if form == "conservative":
                a_minus = jnp.roll(advection, 1, j)
                if j in paxes:
                    # duplicated-endpoint seam: the minus-neighbor of row
                    # 0 is row n-2 (roll grabs the duplicate row n-1); the
                    # reduced-roll apply consumes bank row 0, so fix it
                    a_minus = a_minus.at[_row_sel(j, 0)].set(
                        advection[_row_sel(j, -2)]
                    )
                Ap[j] = Ap[j].at[i].multiply(jnp.roll(advection, -1, j))
                Am[j] = Am[j].at[i].multiply(a_minus)
            else:
                Ap[j] = Ap[j].at[i].multiply(advection)
                Am[j] = Am[j].at[i].multiply(advection)
            Ac[j] = Ac[j].at[i].multiply(advection)
        gamma_full = jnp.broadcast_to(advection, var().shape)
        Ap, Ac, Am = _grad_central_adjust(var, [Ap, Ac, Am], i, (gamma_full,))

    return [Ap, Ac, Am]


def _adv_upwind(adv, var: Field, A_ops) -> list[list[jnp.ndarray]]:
    """First-order upwind advection coefficients.

    ``gamma_max (phi_i - phi_{i-1})/dx + gamma_min (phi_{i+1} - phi_i)/dx``
    (corrected scheme; see class docstring)."""
    n2d = n2d_coord(var.mesh.coord_sys)
    Ap, Ac, Am = A_ops
    zeros = jnp.zeros_like(var()[0])

    for i in range(var.dim):
        advection = zeros
        for j in range(var.mesh.dim):
            if isinstance(adv, Jac):
                advection = adv[n2d[j if var.dim == 1 else i]]
            elif isinstance(adv, Hess):
                # tensor advection: component (i, j) drives target i along
                # axis j (same selection as the central scheme above)
                advection = adv[n2d[i] + n2d[j]]
            else:
                advection = adv[i]
            g_min = jnp.minimum(advection, zeros)
            g_max = jnp.maximum(advection, zeros)
            Ap[j] = Ap[j].at[i].set(2.0 * g_min)
            Ac[j] = Ac[j].at[i].set(
                2.0 * (g_max - g_min) + Ac[j][i] * advection
            )
            Am[j] = Am[j].at[i].set(-2.0 * g_max)
        gamma_min_f = jnp.broadcast_to(
            2.0 * jnp.minimum(advection, zeros), var().shape
        )
        gamma_max_f = jnp.broadcast_to(
            2.0 * jnp.maximum(advection, zeros), var().shape
        )
        Ap, Ac, Am = _grad_central_adjust(
            var, [Ap, Ac, Am], i, (gamma_min_f, gamma_max_f)
        )

    return [Ap, Ac, Am]


def _adv_quick(adv, var: Field, A_ops_all) -> list[list[jnp.ndarray]]:
    """3rd-order upwind-biased QUICK advection coefficients (the reference
    advertises it but raises NotImplementedError, ``fdc.py:659-660``).

    Face interpolation (advective form, per unit 1/dx):
      gamma>0: (3 p+ + 3 p0 - 7 p- + p--)/8
      gamma<0: (-p++ + 7 p+ - 3 p0 - 3 p-)/8
    Boundary-adjacent rows fall back to first-order upwind (the +-2 reach
    would cross the face). App/Amm are stored post-scaled (only the +-1
    banks go through ``_grad_central_adjust``'s 1/(2 dx) division).
    """
    n2d = n2d_coord(var.mesh.coord_sys)
    App, Ap, Ac, Am, Amm = A_ops_all
    zeros = jnp.zeros_like(var()[0])
    dx = var.mesh.dx_np

    for i in range(var.dim):
        advection = zeros
        for j in range(var.mesh.dim):
            if isinstance(adv, Jac):
                advection = adv[n2d[j if var.dim == 1 else i]]
            elif isinstance(adv, Hess):
                advection = adv[n2d[i] + n2d[j]]
            else:
                advection = adv[i]
            g_min = jnp.minimum(advection, zeros)
            g_max = jnp.maximum(advection, zeros)

            ac_base = Ac[j][i]  # rz geometric term (zeros in xyz)
            ap_q = (3 * g_max + 7 * g_min) / 4.0
            ac_q = 3 * (g_max - g_min) / 4.0 + ac_base * advection
            am_q = -(7 * g_max + 3 * g_min) / 4.0
            app_q = -g_min / (8.0 * dx[j])
            amm_q = g_max / (8.0 * dx[j])

            ap_u = 2.0 * g_min
            ac_u = 2.0 * (g_max - g_min) + ac_base * advection
            am_u = -2.0 * g_max

            for idx in (1, -2):
                sel = _row_sel(j, idx)
                ap_q = ap_q.at[sel].set(ap_u[sel])
                ac_q = ac_q.at[sel].set(ac_u[sel])
                am_q = am_q.at[sel].set(am_u[sel])
                app_q = app_q.at[sel].set(0.0)
                amm_q = amm_q.at[sel].set(0.0)

            Ap[j] = Ap[j].at[i].set(ap_q)
            Ac[j] = Ac[j].at[i].set(ac_q)
            Am[j] = Am[j].at[i].set(am_q)
            App[j] = App[j].at[i].set(app_q)
            Amm[j] = Amm[j].at[i].set(amm_q)

        gamma_min_f = jnp.broadcast_to(
            2.0 * jnp.minimum(advection, zeros), var().shape
        )
        gamma_max_f = jnp.broadcast_to(
            2.0 * jnp.maximum(advection, zeros), var().shape
        )
        Ap, Ac, Am = _grad_central_adjust(
            var, [Ap, Ac, Am], i, (gamma_min_f, gamma_max_f)
        )

    return [App, Ap, Ac, Am, Amm]


def _div_var_j_to_tensor(var_j, var_i: Field) -> jnp.ndarray:
    """Coerce the advecting argument to an array (reference ``fdc.py:775-792``)."""
    if isinstance(var_j, float):
        return jnp.ones_like(var_i()) * var_j
    if isinstance(var_j, Field):
        return var_j()
    if isinstance(var_j, Jac):
        n2d = n2d_coord(var_i.mesh.coord_sys)
        adv = jnp.zeros((len(var_j), *var_i().shape[1:]), dtype=var_i().dtype)
        for i in range(len(var_j)):
            adv = adv.at[i].set(var_j[n2d[i]])
        return adv
    adv = jnp.asarray(var_j)
    assert adv.shape == var_i().shape, "FDC Div: adv shape must match var_i shape"
    return adv


def _gamma_from_adv(adv: jnp.ndarray, var: Field):
    zeros = jnp.zeros_like(var())
    return jnp.minimum(adv, zeros), jnp.maximum(adv, zeros)


def _return_bc_val(bc: BC, var: Field, dim: int, axis: int, face_idx: int):
    """Boundary value resolved to the face row (reference ``fdc.py:803-817``).

    Callables are evaluated on the full grid and sliced to the face row
    (see ``variables/bcs.py`` docstring for the callable convention)."""
    v = bc.bc_val
    if callable(v):
        full = jnp.asarray(v(var.mesh.grid, bc.bc_mask, var(), bc.bc_n_vec))
        if full.ndim == var.mesh.dim:
            return full[_row_sel(axis, face_idx)]
        return full
    if isinstance(v, list):
        return v[dim]
    if isinstance(v, (int, float)):
        return float(v)
    if v is None:
        return 0.0
    return jnp.asarray(v)


class DiffFlux:
    r"""Tensor-diffusion flux :math:`D_{ij} \partial \Phi / \partial x_j`
    (reference ``fdc.py:820-857``). Returns a vector ``Field``; the radial
    component carries the ``r`` weight in rz."""

    @staticmethod
    def __call__(diff: Hess, var: Field) -> Field:
        jac_var = jacobian(var)
        flux = Field("DiffFlux", len(jac_var), var.mesh, None)
        n2d = n2d_coord(var.mesh.coord_sys)

        for i in range(var.mesh.dim):
            diff_flux = jnp.zeros_like(var()[0])
            for j in range(var.mesh.dim):
                j_key = n2d[j]
                h_key = n2d[i] + n2d[j]
                if n2d[i] == "r":
                    d_coeff = var.mesh.grid[0] * diff[h_key]
                else:
                    d_coeff = diff[h_key]
                diff_flux = diff_flux + d_coeff * jac_var[j_key]
            flux.set_var_tensor(diff_flux, i)

        return flux


class FDC:
    """Facade over the explicit discretizers (reference ``fdc.py:860-893``)."""

    def __init__(self, config: DiscretizerConfigType | None = None):
        # Per-instance operator objects (the reference's class-level
        # singletons are a re-entrancy trap — SURVEY §2 quirk 3).
        self.div = Div()
        self.laplacian = Laplacian()
        self.grad = Grad()
        self.diffFlux = DiffFlux()
        self.config = config
        if self.config is not None:
            for c in self.config:
                getattr(self, c).set_config(self.config)

    def update_config(self, scheme: str, target: str, val) -> None:
        if self.config is not None:
            self.config.setdefault(scheme, {})[target] = val
        else:
            self.config = {scheme: {target: val}}
        for c in self.config:
            getattr(self, c).set_config(self.config)


def _grad_edge_1axis(v: jnp.ndarray, dx, axis: int) -> jnp.ndarray:
    """Central difference with 2nd-order one-sided edges along one axis of
    a (*nx)-shaped array (the BC-free edge-mode gradient the reference
    builds via full coefficient banks, ``fdc.py:479-502`` + ``260-288``;
    identical values, no bank materialization)."""
    d = (jnp.roll(v, -1, axis) - jnp.roll(v, 1, axis)) / (2.0 * dx)
    lo = (-1.5 * v[_row_sel(axis, 0)] + 2.0 * v[_row_sel(axis, 1)]
          - 0.5 * v[_row_sel(axis, 2)]) / dx
    hi = (1.5 * v[_row_sel(axis, -1)] - 2.0 * v[_row_sel(axis, -2)]
          + 0.5 * v[_row_sel(axis, -3)]) / dx
    d = d.at[_row_sel(axis, 0)].set(lo)
    d = d.at[_row_sel(axis, -1)].set(hi)
    return d


def jacobian(var: Field) -> Jac:
    """Jacobian of a scalar field via edge-mode gradient
    (reference ``fdc.py:896-914``; bank-free — the reference materializes
    5 x mesh.dim full-grid coefficient banks per call)."""
    assert var().shape[0] == 1, "Scalar: var must be a scalar field."
    n2d = n2d_coord(var.mesh.coord_sys)
    v = var()[0]
    dx = var.mesh.dx

    data_jac = {
        n2d[i]: _grad_edge_1axis(v, dx[i], i) for i in range(var.mesh.dim)
    }
    return Jac(**data_jac)


def hessian(var: Field) -> Hess:
    """Hessian of a scalar field: gradient applied twice, keeping the
    upper-triangular pairs (reference ``fdc.py:917-944``; bank-free)."""
    indices = tensor_idx(var.mesh.dim)
    n2d = n2d_coord(var.mesh.coord_sys)
    v = var()[0]
    dx = var.mesh.dx
    md = var.mesh.dim

    jac = [_grad_edge_1axis(v, dx[i], i) for i in range(md)]
    data_hess = {}
    for i in range(md):
        for j in range(md):
            if (i, j) in indices:
                data_hess[n2d[i] + n2d[j]] = _grad_edge_1axis(
                    jac[i], dx[j], j
                )
    return Hess(**data_hess)
