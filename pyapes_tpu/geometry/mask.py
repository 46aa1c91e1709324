"""Arbitrary-shape immersed obstacles from boolean masks or implicit
functions.

The reference only supports box-shaped inner obstacles (its mask builder
raises otherwise, ``mesh/_mesh.py:352-372``) — and then cannot apply BCs
to them anyway. Here any solid shape becomes an immersed body: supply a
boolean mask on the grid, or an implicit (level-set-style) function
``phi(*grid) -> bool/real`` evaluated on the mesh (solid where
``phi > 0`` for boolean output, ``phi < 0`` for signed-distance output —
pass booleans to be explicit). Surface shells per face direction are
derived from the body mask by neighbor differencing, so the obstacle
Dirichlet/Neumann machinery (pinning, 4/3 zero-flux extrapolation,
active-set exclusion) works unchanged.

Example (cylinder of radius 0.1 at (0.5, 0.5)):

    >>> body = MaskObstacle(
    ...     lambda X, Y: (X - 0.5) ** 2 + (Y - 0.5) ** 2 < 0.1**2
    ... )
    >>> mesh = Mesh(Box[0:1, 0:1], [body], [65, 65])
"""
from __future__ import annotations

import numpy as np


class MaskObstacle:
    """Immersed obstacle of arbitrary shape.

    Args:
        mask_or_fn: boolean numpy array of the grid shape (solid = True),
            or a callable ``f(*grid) -> array`` evaluated on the mesh's
            coordinate grids (nonzero/True = solid).
    """

    def __init__(self, mask_or_fn):
        self._src = mask_or_fn

    @property
    def type(self) -> str:
        return "mask"

    def resolve(self, grid_np) -> np.ndarray:
        """Solid-body boolean mask on the given coordinate grids."""
        if callable(self._src):
            body = np.asarray(self._src(*grid_np))
        else:
            body = np.asarray(self._src)
        assert body.shape == grid_np[0].shape, (
            f"MaskObstacle: mask shape {body.shape} != grid "
            f"{grid_np[0].shape}"
        )
        return body.astype(bool)

    @staticmethod
    def shells(body: np.ndarray) -> dict[str, np.ndarray]:
        """Per-face surface shells of a solid mask: face ``<axis>l`` holds
        the solid cells whose lower neighbor along that axis is fluid
        (``roll`` wrap is harmless — the ObstacleNeumann construction
        guards reject bodies touching the domain boundary)."""
        from pyapes_tpu.geometry.basis import DIR_TO_NUM

        names = {v: k for k, v in DIR_TO_NUM.items()}
        out: dict[str, np.ndarray] = {}
        for axis in range(body.ndim):
            c = names[axis]
            out[f"{c}l"] = body & ~np.roll(body, 1, axis)
            out[f"{c}u"] = body & ~np.roll(body, -1, axis)
        return out
