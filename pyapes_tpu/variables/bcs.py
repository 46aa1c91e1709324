"""Boundary conditions for the FDM method (TPU-native rebuild of
``pyapes/variables/bcs.py``).

Supported: Dirichlet / Neumann / Symmetry / Periodic, identified by face ids
``["xl","xu","yl","yu","zl","zu"]`` (or ``["rl","ru","zl","zu"]`` in rz).

Design differences from the torch reference:
  * ``apply`` is **pure**: ``new_var = bc.apply(var, grid)`` (the reference
    mutates boundary nodes in place, ``bcs.py:200-280``).
  * Domain-face masks are static full-face slabs, so application uses
    **static-slice updates** (``x.at[..., 0].set(row)``) which XLA fuses —
    no boolean scatter (gather/scatter with dynamic shapes is not jittable).
  * Callable BC values receive the full ``grid`` tuple and must return either
    a full ``(*nx)``-shaped array (its face row is extracted) or an array
    broadcastable to the face row. Signature: ``f(grid, mask, var, opt)``
    like the reference (``bcs.py:204``), but no boolean mask indexing.

Sign convention (matches reference *behavior*, pinned by its passing tests
``test_variables.py::test_cylinder_field_bcs`` and
``test_solver.py::test_poisson_1d_mixed_neumann``): the Neumann value is the
gradient along the **outward face normal**; the applied update is
``p_face = 4/3 p1 - 1/3 p2 + 2/3 * V * dx`` on both sides
(``bcs.py:236-253``).
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import Any, Callable, NamedTuple, TypedDict

import jax.numpy as jnp
import numpy as np

from pyapes_tpu.geometry.basis import (
    DIR_TO_NUM,
    DIR_TO_NUM_RZ,
    FDIR,
    FDIR_RZ,
)

BC_val_type = Any
"""int | float | list | Callable | Array | None."""


class BCConfig(TypedDict, total=False):
    bc_face: str
    bc_type: str
    bc_val: BC_val_type
    bc_val_opt: dict | None


def _face_index(axis: int, i: int, leading: int = 1) -> tuple:
    """Index tuple selecting face row ``i`` along mesh-axis ``axis`` of an
    array with ``leading`` extra leading dims (e.g. the var-dim axis)."""
    return (slice(None),) * (leading + axis) + (i,)


@dataclass
class BC(ABC):
    """Abstract base boundary condition (reference ``bcs.py:45-194``)."""

    bc_id: str
    bc_val: BC_val_type
    bc_val_opt: dict | None
    bc_face: str
    bc_mask: np.ndarray
    bc_var_name: str
    bc_coord_sys: str
    mesh_dim: int
    dtype: Any
    device: Any
    dx_face: float = 0.0
    """Grid spacing along the face-normal axis (positive)."""

    def __post_init__(self):
        if self.bc_coord_sys == "rz":
            self._bc_face_dim = DIR_TO_NUM_RZ[self.bc_face[0]]
        else:
            self._bc_face_dim = DIR_TO_NUM[self.bc_face[0]]

        self._bc_n_dir: int = -1 if self.bc_face[-1] == "l" else 1
        self._bc_type = self.__class__.__name__.lower()

        m = np.asarray(self.bc_mask, dtype=bool)
        self.bc_mask = m
        self._bc_mask_prev = np.roll(m, -self._bc_n_dir, self._bc_face_dim)
        self._bc_mask_prev2 = np.roll(m, -self._bc_n_dir * 2, self._bc_face_dim)
        self._bc_mask_forward = np.roll(m, self._bc_n_dir, self._bc_face_dim)
        self._bc_mask_forward2 = np.roll(m, self._bc_n_dir * 2, self._bc_face_dim)

        self._bc_n_vec = np.zeros(3)
        self._bc_n_vec[self._bc_face_dim] = self._bc_n_dir

        # Verify the mask is the full boundary slab on its face (domain BCs
        # always are — ``mesh/_mesh.py:375-399`` snaps faces to the grid).
        slab = np.zeros_like(m)
        slab[_face_index(self._bc_face_dim, 0 if self._bc_n_dir < 0 else -1, 0)] = True
        self._is_slab = bool(np.array_equal(m, slab))

    # -- mask views (parity with ``bcs.py:97-155``) -----------------------
    def bc_mask_shift(self, shift: int) -> np.ndarray:
        return np.roll(self.bc_mask, shift, self._bc_face_dim)

    @property
    def bc_n_vec(self) -> np.ndarray:
        return self._bc_n_vec

    @property
    def bc_mask_prev(self) -> np.ndarray:
        return self._bc_mask_prev

    @property
    def bc_mask_prev2(self) -> np.ndarray:
        return self._bc_mask_prev2

    @property
    def bc_mask_forward(self) -> np.ndarray:
        return self._bc_mask_forward

    @property
    def bc_mask_forward2(self) -> np.ndarray:
        return self._bc_mask_forward2

    @property
    def bc_treat(self) -> bool:
        """True when stencil-coefficient surgery is required
        (``bcs.py:157-163``)."""
        return self._bc_type in ("neumann", "symmetry")

    @property
    def bc_type(self) -> str:
        return self._bc_type

    @property
    def bc_face_dim(self) -> int:
        return self._bc_face_dim

    @property
    def bc_n_dir(self) -> int:
        return self._bc_n_dir

    @property
    def type(self) -> str:
        return self._bc_type

    # -- value resolution --------------------------------------------------
    def _call_val(self, v, grid, var, t):
        """Invoke a callable BC value. Signature ``f(grid, mask, var, opt)``
        (reference ``bcs.py:204``); callables that also take a ``t``
        parameter (5th positional or keyword) receive the target field's
        current time — the hook for time-varying BCs."""
        import inspect

        try:
            params = inspect.signature(v).parameters
            wants_t = "t" in params or len(params) >= 5
        except (TypeError, ValueError):
            wants_t = False
        if wants_t:
            return v(grid, self.bc_mask, var, self.bc_val_opt, t)
        return v(grid, self.bc_mask, var, self.bc_val_opt)

    def _value_row(
        self, var: jnp.ndarray, grid, var_dim: int, row_idx: int, t=None
    ):
        """Resolve ``bc_val`` to something broadcastable to the face row."""
        v = self.bc_val
        if callable(v):
            full = jnp.asarray(self._call_val(v, grid, var, t))
            if full.ndim == self.mesh_dim:
                return full[_face_index(self._bc_face_dim, row_idx, 0)]
            return full
        if isinstance(v, list):
            return float(v[var_dim])
        if isinstance(v, (int, float)):
            return float(v)
        if v is None:
            raise ValueError(f"BC {self.bc_id}: bc_val is not specified!")
        arr = jnp.asarray(v)
        if arr.ndim == self.mesh_dim:
            return arr[_face_index(self._bc_face_dim, row_idx, 0)]
        return arr

    @property
    def streamable(self) -> bool:
        """Whether the BC value can be resolved once per solve call and
        streamed into the compiled solver as a runtime operand (no
        recompile when the value changes). Opt out — for callables that
        must see the evolving Krylov iterate — with
        ``bc_val_opt={"per_iteration": True}``."""
        if self._bc_type in ("symmetry", "periodic"):
            return False  # no value
        if self.bc_val is None:
            return False
        if callable(self.bc_val) and (
            (self.bc_val_opt or {}).get("per_iteration")
        ):
            return False
        return True

    def stream_values(self, var: jnp.ndarray, grid, t=None):
        """Resolve the BC value per component into runtime operands for the
        compiled solver (``None`` when not streamable). Callables are
        evaluated HERE — once per solve call, outside the jitted loop —
        with the entry iterate and the field's current time."""
        if not self.streamable:
            return None
        i0 = 0 if self._bc_n_dir < 0 else -1
        return tuple(
            jnp.asarray(
                self._value_row(var, grid, d, i0, t), dtype=var.dtype
            )
            for d in range(var.shape[0])
        )

    # -- application -------------------------------------------------------
    def apply(
        self, var: jnp.ndarray, grid, var_dim: int | None = None, vals=None
    ) -> jnp.ndarray:
        """Apply the BC, returning the updated array.

        Args:
            var: field values, shape ``(var_dim, *nx)``.
            grid: mesh grid tuple.
            var_dim: apply to this component only; ``None`` applies to all.
            vals: optional pre-resolved per-component value operands
                (``stream_values`` output) — the runtime-streamed path
                used inside the compiled solver.
        """
        if not self._is_slab:
            raise NotImplementedError(
                "BC: non-face (obstacle) masks are not supported yet "
                "(matches reference `_apply_bc_otf`, linalg.py:282-299)."
            )
        dims = range(var.shape[0]) if var_dim is None else [var_dim]
        for d in dims:
            var = self._apply_one(
                var, grid, d, None if vals is None else vals[d]
            )
        return var

    @abstractmethod
    def _apply_one(
        self, var: jnp.ndarray, grid, d: int, val=None
    ) -> jnp.ndarray:
        ...


def _row(var: jnp.ndarray, d: int, axis: int, i: int) -> jnp.ndarray:
    return var[(d,) + _face_index(axis, i, 0)]


class Dirichlet(BC):
    """Dirichlet BC (reference ``bcs.py:197-213``)."""

    def _apply_one(self, var, grid, d, val=None):
        a = self._bc_face_dim
        i0 = 0 if self._bc_n_dir < 0 else -1
        if val is None:
            val = self._value_row(var, grid, d, i0)
        return var.at[(d,) + _face_index(a, i0, 0)].set(val)


class Neumann(BC):
    """Neumann BC, 2nd-order one-sided (reference ``bcs.py:216-253``):
    ``p_face = 4/3 p1 - 1/3 p2 + 2/3 V dx`` (outward-normal convention)."""

    def _apply_one(self, var, grid, d, val=None):
        a = self._bc_face_dim
        if self._bc_n_dir < 0:
            i0, i1, i2 = 0, 1, 2
        else:
            i0, i1, i2 = -1, -2, -3
        if val is None:
            val = self._value_row(var, grid, d, i0)
        p = _row(var, d, a, i1)
        pp = _row(var, d, a, i2)
        new = 4.0 / 3.0 * p - 1.0 / 3.0 * pp + 2.0 / 3.0 * val * self.dx_face
        return var.at[(d,) + _face_index(a, i0, 0)].set(new)


class Symmetry(BC):
    """Symmetry BC: copy the adjacent interior row (reference ``bcs.py:256-262``)."""

    def _apply_one(self, var, grid, d, val=None):
        a = self._bc_face_dim
        i0, i1 = (0, 1) if self._bc_n_dir < 0 else (-1, -2)
        return var.at[(d,) + _face_index(a, i0, 0)].set(_row(var, d, a, i1))


class Periodic(BC):
    """Periodic BC: the grid stores BOTH endpoints of a periodic axis, and
    they are the SAME physical torus node. Row 0 is authoritative (the
    implicit solver solves the reduced torus and restores row ``n-1`` from
    row 0, ``linalg._restore_periodic``; the explicit reduced-roll
    operators produce row 0 exactly, ``fdc._A_coeff_var_sum``), so apply =
    copy row 0 onto row ``n-1``. The lower face is a no-op.

    The reference instead patches the lower seam with the extrapolation
    ``p1 - p[-1] + p[-2]`` (``bcs.py:265-280``) — an O(h^2)-inconsistent
    seam value that only survives because its solver re-applies BCs every
    iteration. Applying it to an exactly-periodic field PERTURBS the seam
    node by O(h^2) per call (caught by the Taylor-Green transient); not
    replicated, see PARITY.md."""

    def _apply_one(self, var, grid, d, val=None):
        a = self._bc_face_dim
        if self._bc_n_dir < 0:
            return var
        return var.at[(d,) + _face_index(a, -1, 0)].set(_row(var, d, a, 0))


# -- configuration helpers (reference ``bcs.py:293-467``) -------------------


class BCContainer(TypedDict, total=False):
    bc_type: str
    bc_val: BC_val_type
    bc_val_opt: dict | None


class CylinderBoundary(NamedTuple):
    """Per-face BC setup for ``Cylinder`` domains (``bcs.py:301-328``)."""

    rl: BCContainer | None = None
    ru: BCContainer | None = None
    zl: BCContainer | None = None
    zu: BCContainer | None = None

    def __call__(self) -> list[BCConfig]:
        return _get_bc_dict(self, FDIR_RZ)


class BoxBoundary(NamedTuple):
    """Per-face BC setup for ``Box`` domains (``bcs.py:331-360``)."""

    xl: BCContainer | None = None
    xu: BCContainer | None = None
    yl: BCContainer | None = None
    yu: BCContainer | None = None
    zl: BCContainer | None = None
    zu: BCContainer | None = None

    def __call__(self) -> list[BCConfig]:
        return _get_bc_dict(self, FDIR)


def _get_bc_dict(bc_config, fdir: list[str]) -> list[BCConfig]:
    config: list[BCConfig] = []
    for face in fdir:
        bc_dict = getattr(bc_config, face)
        if bc_dict is not None:
            config.append(
                {
                    "bc_face": face,
                    "bc_type": bc_dict["bc_type"],
                    "bc_val": bc_dict["bc_val"],
                    "bc_val_opt": bc_dict.get("bc_val_opt"),
                }
            )
    return config


def mixed_bcs(bc_val: list, bc_type: list[str]) -> list[BCConfig]:
    """Per-face values/types in FDIR order (``bcs.py:385-408``).
    Box domains only."""
    return [
        {"bc_face": FDIR[i], "bc_type": t, "bc_val": v, "bc_val_opt": None}
        for i, (v, t) in enumerate(zip(bc_val, bc_type))
    ]


def homogeneous_bcs(dim: int, bc_val, bc_type: str) -> list[BCConfig]:
    """Same BC on every face (``bcs.py:411-440``). Box domains only."""
    return [
        {
            "bc_face": FDIR[i],
            "bc_type": bc_type,
            "bc_val": bc_val[i] if isinstance(bc_val, list) else bc_val,
            "bc_val_opt": None,
        }
        for i in range(dim * 2)
    ]


class BC_HD:
    """Homogeneous Dirichlet shorthand (``bcs.py:443-447``)."""

    def __new__(cls, dim: int, bc_val: float):
        return homogeneous_bcs(dim, bc_val, "dirichlet")


class BC_HN:
    """Homogeneous Neumann shorthand (``bcs.py:450-454``)."""

    def __new__(cls, dim: int, bc_val: float):
        return homogeneous_bcs(dim, bc_val, "neumann")


class ObstacleDirichlet:
    """Dirichlet condition on an interior obstacle mask (immersed-boundary
    style: the masked cells are pinned to the value and excluded from the
    Krylov solve's active set).

    The reference builds obstacle masks (``mesh/_mesh.py:352-366``) but its
    BC application raises NotImplementedError (``linalg.py:286-292``); this
    class makes them usable. General boolean masks are applied with
    ``jnp.where`` (a static mask constant-folds under jit).
    """

    def __init__(self, bc_id: str, bc_val, bc_mask, bc_val_opt=None,
                 dynamic: bool = False):
        self.bc_id = bc_id
        self.bc_val = bc_val
        self.bc_val_opt = bc_val_opt
        self.bc_mask = np.asarray(bc_mask, dtype=bool)
        self.bc_type = "obstacle_dirichlet"
        self.bc_face = "obstacle"
        self.bc_face_dim = -1
        self.bc_n_dir = 0
        self.bc_treat = False
        # dynamic (moving-body) obstacles: the mask and value become
        # RUNTIME OPERANDS of the compiled solver — update ``bc_mask``
        # between solves (same shape) and the one executable re-runs with
        # the new body position, no recompile (round-3 VERDICT item 10).
        self.dynamic = bool(dynamic)

    @property
    def type(self) -> str:
        return self.bc_type

    @property
    def streamable(self) -> bool:
        return self.dynamic

    def _resolved_val(self, var, grid):
        v = self.bc_val
        if callable(v):
            return jnp.asarray(v(grid, self.bc_mask, var, self.bc_val_opt))
        return jnp.asarray(float(v) if isinstance(v, (int, float)) else v)

    def stream_values(self, var: jnp.ndarray, grid, t=None):
        """Runtime operands ``(mask, value)`` for a dynamic obstacle
        (``None`` for static ones — their mask constant-folds)."""
        if not self.dynamic:
            return None
        return (jnp.asarray(self.bc_mask), self._resolved_val(var, grid))

    def apply(self, var: jnp.ndarray, grid, var_dim: int | None = None,
              vals=None):
        if vals is not None:
            mask, val = vals
        else:
            mask = jnp.asarray(self.bc_mask)
            val = self._resolved_val(var, grid)
        dims = range(var.shape[0]) if var_dim is None else [var_dim]
        for d in dims:
            vd = val[d] if (hasattr(val, "ndim") and val.ndim > len(var.shape) - 1) else val
            var = var.at[d].set(jnp.where(mask, vd, var[d]))
        return var


class ObstacleNeumann:
    """Neumann (flux) condition on an interior obstacle.

    The reference raises NotImplementedError on any obstacle BC
    (``linalg.py:286-292``). Here the obstacle's surface-shell cells take a
    one-sided extrapolation of their fluid-side neighbors (the
    second-order 4/3 rule used on domain Neumann faces, outward normal
    pointing from the obstacle into the fluid), applied as a static-mask
    ``jnp.where`` over per-face rolls. The whole solid body is excluded
    from the Krylov active set, and the LINEAR part of the copy is folded
    into the operator applied to search directions (``linalg.py`` wraps
    ``Aop``) so the reduced system is consistent.

    Nonzero flux ``V`` adds the affine shift ``+ (2/3) V dx`` per face
    (matching the domain-Neumann convention ``bcs.py:216-253``): the shell
    value is ``(4 v1 - v2)/3 + (2/3) V dx``. The affine part is exposed as
    ``affine_field`` and moved to the solve's RHS
    (``rhs -= A(e)``, the standard elimination of an affine BC), while
    ``apply_linear`` serves the operator fold.

    Shell cells shared by two faces (body edges/corners) are written by
    whichever face applies LAST in ``faces`` order — a deterministic
    last-face-wins rule (faces come in mesh ``o_mask`` key order:
    xl, xu, yl, yu, zl, zu).

    Args:
        faces: list of ``(shell_mask, axis, shift, dx)`` — ``shift`` is the
            ``jnp.roll`` amount that brings the fluid neighbor onto the
            shell cell (+1 for a lower face, -1 for an upper face).
        body_mask: filled solid mask (``Mesh.obstacle_body_masks``).
        all_body_masks: optional list of every obstacle's filled mask; when
            given, construction validates that each face's 1- and 2-step
            extrapolation sources are genuine fluid cells (not inside any
            body, and not wrapped around the domain boundary) — the 4/3
            rule silently reads garbage otherwise (advisor finding r1).
    """

    def __init__(self, bc_id: str, bc_val, faces, body_mask,
                 all_body_masks=None):
        self.bc_id = bc_id
        self.bc_val = float(bc_val)
        self.bc_val_opt = None
        self.faces = [
            (np.asarray(m, dtype=bool), int(ax), int(sh), float(dx))
            for (m, ax, sh, dx) in faces
        ]
        self.bc_mask = np.asarray(body_mask, dtype=bool)
        if all_body_masks is not None:
            solid = np.zeros_like(self.bc_mask)
            for m in all_body_masks:
                solid |= np.asarray(m, dtype=bool)
            for mask, axis, shift, _dx in self.faces:
                n = mask.shape[axis]
                pos = np.nonzero(mask)[axis]
                # apply() computes v_k = roll(var, k*shift)[shell], i.e. it
                # reads var at (shell - k*shift); those source cells must
                # exist without wrap and must be fluid.
                for k in (1, 2):
                    src = pos - k * shift
                    if ((src < 0) | (src >= n)).any():
                        raise ValueError(
                            f"obstacle neumann {bc_id}: shell cells are "
                            f"within {k} cells of the domain boundary along "
                            f"axis {axis}; the one-sided extrapolation "
                            "would wrap around the grid."
                        )
                    if (np.roll(mask, -k * shift, axis) & solid).any():
                        raise ValueError(
                            f"obstacle neumann {bc_id}: the {k}-step "
                            f"extrapolation source along axis {axis} lies "
                            "inside a solid body (bodies too thin or too "
                            "close together for the 4/3 shell rule)."
                        )
        self.bc_type = "obstacle_neumann"
        self.bc_face = "obstacle"
        self.bc_face_dim = -1
        self.bc_n_dir = 0
        self.bc_treat = False

    @property
    def type(self) -> str:
        return self.bc_type

    def apply(self, var: jnp.ndarray, grid, var_dim: int | None = None,
              vals=None):
        # second-order one-sided gradient (the 4/3 rule used for domain
        # Neumann faces): v_shell = (4 v1 - v2)/3 + (2/3) V dx with
        # v1, v2 the first/second fluid-side neighbors
        for mask, axis, shift, dx in self.faces:
            m = jnp.asarray(mask)[None]
            v1 = jnp.roll(var, shift, axis=1 + axis)
            v2 = jnp.roll(var, 2 * shift, axis=1 + axis)
            new = (4.0 * v1 - v2) / 3.0
            if self.bc_val != 0.0:
                new = new + (2.0 / 3.0) * self.bc_val * dx
            var = jnp.where(m, new, var)
        return var

    def apply_linear(self, var: jnp.ndarray, grid,
                     var_dim: int | None = None):
        """The linear (zero-flux) part of ``apply`` — folded into the
        operator for Krylov search directions."""
        for mask, axis, shift, _dx in self.faces:
            m = jnp.asarray(mask)[None]
            v1 = jnp.roll(var, shift, axis=1 + axis)
            v2 = jnp.roll(var, 2 * shift, axis=1 + axis)
            var = jnp.where(m, (4.0 * v1 - v2) / 3.0, var)
        return var

    def affine_field(self, shape, dtype) -> jnp.ndarray:
        """The affine shift ``e``: zeros with ``(2/3) V dx`` on each face's
        shell (last-face-wins at edges, matching ``apply``). The solve
        eliminates it via ``rhs -= A(e)``."""
        e = jnp.zeros(shape, dtype=dtype)
        if self.bc_val == 0.0:
            return e
        for mask, axis, shift, dx in self.faces:
            m = jnp.asarray(mask)[None]
            e = jnp.where(m, (2.0 / 3.0) * self.bc_val * dx, e)
        return e


BC_type = (
    Dirichlet | Neumann | Symmetry | Periodic
    | ObstacleDirichlet | ObstacleNeumann
)

BC_FACTORY: dict[str, type] = {
    "dirichlet": Dirichlet,
    "neumann": Neumann,
    "symmetry": Symmetry,
    "periodic": Periodic,
}


def apply_bcs_fn(bcs: list[BC_type], grid) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Build a pure ``x -> x`` function applying all BCs in order.

    This is the jit-safe equivalent of ``_apply_bc_otf``
    (``linalg.py:282-299``); it is traced into the Krylov ``while_loop`` body
    so the whole solve stays on device.
    """

    def apply_all(x: jnp.ndarray, bc_vals=None) -> jnp.ndarray:
        for i, bc in enumerate(bcs):
            x = bc.apply(
                x, grid,
                vals=None if bc_vals is None else bc_vals[i],
            )
        return x

    return apply_all
