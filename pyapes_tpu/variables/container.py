"""Jacobian / Hessian derivative containers (reference
``pyapes/variables/container.py:9-100``).

Fixes the reference's duplicate ``zz`` field declaration
(``container.py:91,97``) by declaring it once.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

_EMPTY = None


class Derivatives:
    """Base for ``Jac``/``Hess``: generic string indices (``x``, ``xz``, ...),
    alphabetically-sorted key lookup, iteration over populated entries only
    (``container.py:9-73``)."""

    _FIELDS: tuple[str, ...] = ()

    def __init__(self):
        self.keys = [k for k in self._FIELDS if getattr(self, k) is not None]
        self.max = len(self.keys)

    def __getitem__(self, key: str) -> jnp.ndarray:
        item = getattr(self, "".join(sorted(key.lower())))
        if item is None:
            raise KeyError(f"Derivative: key {key} not found.")
        return item

    def __len__(self) -> int:
        return self.max

    def __iter__(self):
        self._n = 0
        return self

    def __next__(self):
        if self._n < self.max:
            res = getattr(self, self.keys[self._n])
            self._n += 1
            return res
        raise StopIteration


@dataclass
class Jac(Derivatives):
    """First derivatives, keys ``x/y/z`` (Cartesian) or ``r/z`` (rz)."""

    x: jnp.ndarray | None = None
    y: jnp.ndarray | None = None
    z: jnp.ndarray | None = None
    r: jnp.ndarray | None = None

    _FIELDS = ("x", "y", "z", "r")

    def __post_init__(self):
        super().__init__()


@dataclass
class Hess(Derivatives):
    """Second derivatives, upper-triangular keys (``hess["zx"] -> hess.xz``)."""

    xx: jnp.ndarray | None = None
    xy: jnp.ndarray | None = None
    xz: jnp.ndarray | None = None
    yy: jnp.ndarray | None = None
    yz: jnp.ndarray | None = None
    zz: jnp.ndarray | None = None
    rr: jnp.ndarray | None = None
    rz: jnp.ndarray | None = None

    _FIELDS = ("xx", "xy", "xz", "yy", "yz", "zz", "rr", "rz")

    def __post_init__(self):
        super().__init__()
