"""Checkpoint / resume for Field state.

The reference has none — "Also need load data from file" is an open TODO
(``fields.py:61``). State is the Field payload (+ old value and time
stamp), i.e. a simple pytree; two backends:

  * ``save`` / ``load``: single-file ``.npz`` + JSON metadata — portable,
    dependency-free.
  * ``save_orbax`` / ``load_orbax``: orbax-checkpoint for async,
    multi-host-safe checkpointing of sharded arrays.
"""
from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from pyapes_tpu.variables import Field

_META = "__pyapes_meta__"


def save(path: str, fields: dict[str, Field] | list[Field]) -> None:
    """Save Fields to ``<path>.npz`` (values, old values, time state)."""
    if isinstance(fields, list):
        fields = {f.name: f for f in fields}
    arrays = {}
    meta = {}
    for name, f in fields.items():
        arrays[f"{name}__VAR"] = np.asarray(f())
        arrays[f"{name}__VARo"] = np.asarray(f.VARo)
        # BDF2 history: without VARoo/n_hist a resumed BDF2 run would
        # silently re-bootstrap as backward Euler (fields.py:107-131).
        arrays[f"{name}__VARoo"] = np.asarray(f.VARoo)
        meta[name] = {
            "dim": f.dim,
            "t": float(f._t),
            "dt": None if f._dt is None else float(f._dt),
            "n_hist": int(f.n_hist),
        }
    arrays[_META] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    ).copy()
    if not path.endswith(".npz"):
        path = path + ".npz"
    np.savez(path, **arrays)


def load(path: str, fields: dict[str, Field] | list[Field]) -> None:
    """Restore Field payloads in place from ``save`` output."""
    if isinstance(fields, list):
        fields = {f.name: f for f in fields}
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    meta = json.loads(bytes(data[_META]).decode())
    for name, f in fields.items():
        if name not in meta:
            raise KeyError(f"checkpoint: field {name} not found in {path}")
        f.VAR = jnp.asarray(data[f"{name}__VAR"], dtype=f().dtype)
        f.VARo = jnp.asarray(data[f"{name}__VARo"], dtype=f().dtype)
        if f"{name}__VARoo" in data:  # absent in pre-round-2 checkpoints
            f._VARoo = jnp.asarray(data[f"{name}__VARoo"], dtype=f().dtype)
        f._n_hist = int(meta[name].get("n_hist", 0))
        f._t = meta[name]["t"]
        f._dt = meta[name]["dt"]


_ASYNC_CKPTR = None


def save_orbax(
    path: str,
    fields: dict[str, Field] | list[Field],
    block: bool = True,
) -> None:
    """Orbax backend (sharding-aware). With ``block=False`` the save runs
    asynchronously — device arrays are snapshotted and the write overlaps
    subsequent compute; call ``wait_for_checkpoints()`` (or the next
    ``save_orbax``, which serializes on the previous one) before reading
    the files back or exiting."""
    import orbax.checkpoint as ocp

    global _ASYNC_CKPTR
    if isinstance(fields, list):
        fields = {f.name: f for f in fields}
    # dt=None is encoded as NaN so a legitimate dt == 0.0 round-trips
    # (``or 0.0`` would conflate the two).
    tree = {
        name: {
            "VAR": f(),
            "VARo": f.VARo,
            "VARoo": f.VARoo,
            "t": f._t,
            "dt": float("nan") if f._dt is None else float(f._dt),
            "n_hist": float(f.n_hist),
        }
        for name, f in fields.items()
    }
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.StandardCheckpointer()
    ckptr = _ASYNC_CKPTR
    ckptr.save(os.path.abspath(path), tree, force=True)
    if block:
        ckptr.wait_until_finished()


def wait_for_checkpoints() -> None:
    """Block until all pending async ``save_orbax`` writes are durable."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def load_orbax(path: str, fields: dict[str, Field] | list[Field]) -> None:
    import orbax.checkpoint as ocp

    if isinstance(fields, list):
        fields = {f.name: f for f in fields}
    import math

    template = {
        name: {
            "VAR": f(),
            "VARo": f.VARo,
            "VARoo": f.VARoo,
            "t": 0.0,
            "dt": 0.0,
            "n_hist": 0.0,
        }
        for name, f in fields.items()
    }
    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(os.path.abspath(path), target=template)
    for name, f in fields.items():
        f.VAR = tree[name]["VAR"]
        f.VARo = tree[name]["VARo"]
        f._VARoo = tree[name]["VARoo"]
        f._n_hist = int(tree[name]["n_hist"])
        f._t = float(tree[name]["t"])
        dt = float(tree[name]["dt"])
        f._dt = None if math.isnan(dt) else dt
