"""Field variable container (TPU-native rebuild of ``pyapes/variables/fields.py``).

Design differences from the torch reference:
  * The payload ``VAR`` is an immutable ``jnp`` array; arithmetic operators
    return **new** ``Field`` objects instead of mutating ``self``
    (the reference's in-place ``__add__`` etc., ``fields.py:256-316``, is an
    aliasing hazard noted in SURVEY §2 quirk 1). In-place-looking syntax
    (``var += t``, ``var <<= t``) still works through Python rebinding.
  * ``Field`` is registered as a JAX pytree (``VAR`` leaf, everything else
    aux data) so it can cross ``jit`` boundaries when convenient.
"""
from __future__ import annotations

import copy
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from pyapes_tpu.mesh import Mesh
from pyapes_tpu.variables.bcs import BC_FACTORY, BC_type, BCConfig


@dataclass
class Field:
    """Field variable (reference ``fields.py:19-422``).

    Examples:
        >>> mesh = Mesh(Box[0 : 2 * pi], None, [21])
        >>> f_bc = homogeneous_bcs(1, None, "periodic")
        >>> var = Field("U", 1, mesh, {"domain": f_bc, "obstacle": None},
        ...             init_val=0.5)
    """

    name: str
    dim: int
    """Variable dimension (scalar field: 1). Not the mesh dimension!"""
    mesh: Mesh
    bc_config: dict[str, list[BCConfig] | None] | None = None
    init_val: Any = None
    object_interp: bool = False

    def __post_init__(self):
        self._VAR = jnp.zeros(
            (self.dim, *self.mesh.nx), dtype=self.mesh.dtype.float
        )
        self._VARo = self._VAR
        self._t = 0.0
        self._dt: float | None = None

        iv = self.init_val
        if iv is not None:
            if isinstance(iv, float):
                self._VAR = self._VAR + iv
            elif isinstance(iv, list):
                assert self.dim == len(
                    iv
                ), "Field: init_val should match with Field dimension!"
                if isinstance(iv[0], float):
                    for d in range(self.dim):
                        self._VAR = self._VAR.at[d].add(float(iv[d]))
                else:
                    for d in range(self.dim):
                        self._VAR = self._VAR.at[d].add(jnp.asarray(iv[d]))
            elif isinstance(iv, (jnp.ndarray, np.ndarray)) or hasattr(
                iv, "shape"
            ):
                arr = jnp.asarray(iv)
                assert self.dim == arr.shape[0], (
                    "Field: init_val should match with Field dimension!"
                )
                self._VAR = self._VAR + arr
            elif isinstance(iv, str) and iv.lower() == "random":
                self._VAR = jnp.asarray(
                    np.random.rand(*self._VAR.shape),
                    dtype=self.mesh.dtype.float,
                )
            else:
                raise ValueError("Field: unsupported data type!")

        if self.bc_config is not None:
            if "domain" not in self.bc_config:
                raise ValueError("Field: domain must be defined!")
            if "obstacle" not in self.bc_config:
                self.bc_config["obstacle"] = None

        self.set_bcs()

    # -- time state (reference ``fields.py:109-145``) ---------------------
    @property
    def mesh_axis(self) -> list[int]:
        return [i + 1 for i in range(self.mesh.dim)]

    def set_time(self, dt: float, init_val: float | None = None) -> None:
        self._t = init_val if init_val is not None else 0.0
        self._dt = dt

    def update_time(self, dt: float | None = None) -> None:
        self._t += self.dt if dt is None else dt

    @property
    def t(self) -> float:
        return self._t

    def save_old(self) -> None:
        # Shift the history: VARoo <- VARo <- VAR (two levels kept for
        # BDF2; the counter gates the BDF2 bootstrap — the first step of a
        # run falls back to backward Euler until two states exist).
        self._VARoo = self._VARo
        self._VARo = self._VAR
        self._n_hist = getattr(self, "_n_hist", 0) + 1

    @property
    def VARo(self) -> jnp.ndarray:
        return self._VARo

    @VARo.setter
    def VARo(self, other) -> None:
        self._VARo = jnp.asarray(other)

    @property
    def VARoo(self) -> jnp.ndarray:
        """Second-oldest state (BDF2); falls back to VARo before two
        ``save_old`` calls have happened."""
        return getattr(self, "_VARoo", self._VARo)

    @property
    def n_hist(self) -> int:
        return getattr(self, "_n_hist", 0)

    @property
    def dt(self) -> float:
        assert self._dt is not None, "Field: No time step is specified."
        return self._dt

    # -- geometry passthrough ---------------------------------------------
    @property
    def dx(self) -> jnp.ndarray:
        return self.mesh.dx

    @property
    def nx(self) -> tuple[int, ...]:
        return self.mesh.nx

    # -- payload access ----------------------------------------------------
    @property
    def VAR(self) -> jnp.ndarray:
        return self._VAR

    @VAR.setter
    def VAR(self, other) -> None:
        self._VAR = jnp.asarray(other)

    def copy(self, name: str | None = None) -> "Field":
        copied = copy.copy(self)
        copied.bcs = list(self.bcs)
        if name is not None:
            copied.name = name
        return copied

    def zeros_like(self, name: str | None = None) -> "Field":
        copied = self.copy(name)
        copied._VAR = jnp.zeros_like(self._VAR)
        return copied

    def zeros_like_tensor(self) -> jnp.ndarray:
        return jnp.zeros_like(self._VAR)

    @property
    def size(self) -> tuple[int, ...]:
        return tuple(self._VAR.shape)

    def sum(self, dim: int = 0) -> jnp.ndarray:
        return jnp.sum(self._VAR, axis=dim)

    def set_var_tensor(self, val, insert: int | None = None) -> "Field":
        """Assign values (reference ``fields.py:209-235``). Returns self."""
        val = jnp.asarray(val, dtype=self._VAR.dtype)
        if self.size == tuple(val.shape):
            self._VAR = val
        else:
            for i in range(self.dim):
                if insert is not None:
                    if i == insert:
                        self._VAR = self._VAR.at[i].set(val)
                else:
                    self._VAR = self._VAR.at[i].set(val)
        return self

    def __getitem__(self, idx):
        if isinstance(idx, slice):
            return self._VAR
        return self._VAR[idx]

    def __setitem__(self, idx, val) -> None:
        if isinstance(idx, slice):
            self._VAR = jnp.asarray(val)
        else:
            self._VAR = self._VAR.at[idx].set(jnp.asarray(val))

    def __call__(self) -> jnp.ndarray:
        return self._VAR

    # -- arithmetic (functional; reference mutates: ``fields.py:256-337``) --
    def _with(self, val: jnp.ndarray) -> "Field":
        new = self.copy()
        new._VAR = val
        return new

    def __add__(self, other) -> "Field":
        if isinstance(other, Field):
            return self._with(self._VAR + other())
        if isinstance(other, float):
            return self._with(self._VAR + other)
        if isinstance(other, list):
            assert len(other) == self.dim, (
                "Field: input vector should match with Field dimension!"
            )
            val = self._VAR
            for i in range(self.dim):
                val = val.at[i].add(other[i])
            return self._with(val)
        if hasattr(other, "shape"):
            other = jnp.asarray(other)
            if other.shape[0] == self.dim and other.shape == self._VAR.shape:
                return self._with(other)
            val = self._VAR
            for i in range(other.shape[0]):
                val = val.at[i].add(other[i])
            return self._with(val)
        raise TypeError(
            "Field: you can only add Field, float, Array, or list!"
        )

    def __sub__(self, other) -> "Field":
        if isinstance(other, Field):
            return self._with(self._VAR - other())
        raise TypeError("Field: you can only subtract Field!")

    def __mul__(self, other) -> "Field":
        if isinstance(other, Field):
            return self._with(self._VAR * other())
        if isinstance(other, (float, int)):
            return self._with(self._VAR * other)
        raise TypeError("Field: you can only multiply Field, int, or float!")

    def __truediv__(self, other) -> "Field":
        if isinstance(other, Field):
            mask = other() > 0.0
            return self._with(
                jnp.where(mask, self._VAR / jnp.where(mask, other(), 1.0), self._VAR)
            )
        raise TypeError("Field: you can only divide by Field!")

    def __ilshift__(self, other) -> "Field":
        """``var <<= other`` assignment (reference ``fields.py:318-337``)."""
        if isinstance(other, Field):
            return self._with(other())
        if isinstance(other, (float, int)):
            return self._with(jnp.zeros_like(self._VAR) + other)
        if isinstance(other, list):
            assert self.dim == len(other), "Field: dimension mismatch!"
            val = jnp.zeros_like(self._VAR)
            for i in range(self.dim):
                val = val.at[i].add(other[i])
            return self._with(val)
        if hasattr(other, "shape"):
            new = self.copy()
            new.set_var_tensor(jnp.asarray(other))
            return new
        raise TypeError(
            "Field: you can only assign Field, Array, float, int, or list!"
        )

    def volume_integral(self, target=None) -> jnp.ndarray:
        """Volume integral; 2*pi*r weight in rz (reference ``fields.py:339-359``)."""
        if target is None:
            target = jnp.ones_like(self._VAR[0])
        dv = jnp.prod(self.mesh.dx)
        vals = []
        for i in range(self.dim):
            if self.mesh.coord_sys == "xyz":
                vals.append(jnp.sum(target * self._VAR[i] * dv))
            else:
                vals.append(
                    jnp.sum(2.0 * jnp.pi * self._VAR[i] * self.mesh.grid[0] * dv)
                )
        return jnp.stack(vals)

    # -- boundary conditions ------------------------------------------------
    def get_bc(self, bc_id: str) -> BC_type | None:
        """Lookup BC by id, e.g. ``"d-xl"`` (reference ``fields.py:361-376``)."""
        found = [bc for bc in self.bcs if bc.bc_id == bc_id]
        if len(found) == 0:
            return None
        if len(found) > 1:
            raise KeyError(
                f"Field: bc_id {bc_id} returned multiple bcs. Check id once again!"
            )
        return found[0]

    def set_bcs(self) -> None:
        """Construct BC objects from config (reference ``fields.py:378-422``)."""
        self.bcs: list[BC_type] = []

        if self.bc_config is not None:
            if self.bc_config["domain"] is not None:
                d_obj_config = self.mesh.domain.config
                d_bc_config = self.bc_config["domain"]

                assert len(d_obj_config) == len(d_bc_config), (
                    f"Field: domain config ({len(d_obj_config)}) mismatch "
                    f"with bc config ({len(d_bc_config)})!"
                )

                for bc in d_bc_config:
                    bc_face = bc["bc_face"]
                    face_dim = (
                        {"r": 0, "z": 1}[bc_face[0]]
                        if self.mesh.coord_sys == "rz"
                        else {"x": 0, "y": 1, "z": 2}[bc_face[0]]
                    )
                    self.bcs.append(
                        BC_FACTORY[str(bc["bc_type"])](
                            bc_id=f"d-{bc_face}",
                            bc_val=bc["bc_val"],
                            bc_val_opt=bc.get("bc_val_opt"),
                            bc_face=bc_face,
                            bc_mask=self.mesh.d_mask[bc_face],
                            bc_var_name=self.name,
                            bc_coord_sys=self.mesh.coord_sys,
                            mesh_dim=self.mesh.dim,
                            dtype=self.mesh.dtype,
                            device=self.mesh.device,
                            dx_face=float(self.mesh.dx_np[face_dim]),
                        )
                    )

            if (
                self.mesh.obstacle is not None
                and self.bc_config["obstacle"] is not None
            ):
                # Obstacle BCs (beyond the reference, which raises here):
                # one config dict per obstacle; "dirichlet" pins the shell,
                # "neumann" (zero-flux) copies the fluid-side neighbor.
                from pyapes_tpu.geometry.basis import (
                    DIR_TO_NUM,
                    DIR_TO_NUM_RZ,
                )
                from pyapes_tpu.variables.bcs import (
                    ObstacleDirichlet,
                    ObstacleNeumann,
                )

                d2n = (
                    DIR_TO_NUM
                    if self.mesh.coord_sys == "xyz"
                    else DIR_TO_NUM_RZ
                )
                o_configs = self.bc_config["obstacle"]
                if isinstance(o_configs, dict):
                    o_configs = [o_configs] * len(self.mesh.o_mask)
                for i, oc in enumerate(o_configs):
                    if oc is None:
                        continue
                    assert oc["bc_type"] in ("dirichlet", "neumann"), (
                        "obstacle BCs: dirichlet or neumann (zero-flux)"
                    )
                    if oc["bc_type"] == "dirichlet":
                        masks = list(self.mesh.o_mask[i].values())
                        union = masks[0].copy()
                        for m in masks[1:]:
                            union |= m
                        self.bcs.append(
                            ObstacleDirichlet(
                                bc_id=f"o{i}",
                                bc_val=oc["bc_val"],
                                bc_mask=union,
                                bc_val_opt=oc.get("bc_val_opt"),
                            )
                        )
                    else:
                        faces = []
                        for fkey, m in self.mesh.o_mask[i].items():
                            axis = d2n[fkey[0]]
                            shift = 1 if fkey[1] == "l" else -1
                            faces.append(
                                (m, axis, shift,
                                 float(self.mesh.dx_np[axis]))
                            )
                        self.bcs.append(
                            ObstacleNeumann(
                                bc_id=f"o{i}",
                                bc_val=oc["bc_val"],
                                faces=faces,
                                body_mask=(
                                    self.mesh.obstacle_body_masks[i]
                                ),
                                all_body_masks=(
                                    self.mesh.obstacle_body_masks
                                ),
                            )
                        )

    def apply_bcs(self) -> "Field":
        """Apply all BCs to the current values (pure; returns self with
        updated payload — convenience over the reference's per-BC loop).
        Streamable values (incl. time-dependent callables) resolve against
        the field's current time."""
        var = self._VAR
        for bc in self.bcs:
            vals = (
                bc.stream_values(var, self.mesh.grid, t=self.t)
                if hasattr(bc, "stream_values")
                else None
            )
            var = bc.apply(var, self.mesh.grid, vals=vals)
        self._VAR = var
        return self


def _field_flatten(f: Field):
    return (f._VAR,), (f.name, f.dim, f.mesh, id(f))


def _field_unflatten(aux, leaves):
    name, dim, mesh, _ = aux
    new = object.__new__(Field)
    new.name = name
    new.dim = dim
    new.mesh = mesh
    new.bc_config = None
    new.init_val = None
    new.object_interp = False
    new._VAR = leaves[0]
    new._VARo = leaves[0]
    new._t = 0.0
    new._dt = None
    new.bcs = []
    return new


jax.tree_util.register_pytree_node(Field, _field_flatten, _field_unflatten)
