"""Cylinder (axisymmetric r-z) geometry (reference ``geometry/cylinder.py:10-95``)."""
from __future__ import annotations

from math import pi

from pyapes_tpu.geometry.basis import GeoBounder, Geometry, bound_edge_and_corner


class Cylinder(Geometry, metaclass=GeoBounder):
    """Axisymmetric 2-D (r, z) domain; always two dimensional.

    >>> Cylinder([0, 0], [1, 1])       # Option 1
    >>> Cylinder[0:1, 0:1]             # Option 2

    Note:
        Leading dimension is radius (r), second is the axis (z).
    """

    def __init__(self, lower, upper):
        assert (
            len(lower) == 2 and len(upper) == 2
        ), "Cylinder: inputs must have length 2 (axisymmetric r-z)!"
        assert lower[0] >= 0, "Cylinder: lower bound of radius must be >= 0!"

        self._lower = [float(i) for i in lower]
        self._upper = [float(i) for i in upper]

        self.ex, self.xp, self.face, self._dim = bound_edge_and_corner(
            self._lower, self._upper, "rz"
        )

        self._config: dict[int, dict] = {
            idx: {"e_x": e, "x_p": x, "face": f}
            for idx, (e, x, f) in enumerate(zip(self.ex, self.xp, self.face))
        }

    @property
    def dim(self) -> int:
        return self._dim

    @property
    def type(self) -> str:
        return self.__class__.__name__.lower()

    @property
    def size(self) -> float:
        """Volume: pi r^2 z (``cylinder.py:64-75``)."""
        return (
            pi
            * (self._upper[0] - self._lower[0]) ** 2
            * (self._upper[1] - self._lower[1])
        )

    @property
    def X(self) -> float:
        return self._lower[0]

    @property
    def Y(self) -> float:
        return self._lower[1]

    @property
    def config(self) -> dict[int, dict]:
        return self._config

    @property
    def lower(self) -> list[float]:
        return self._lower

    @property
    def upper(self) -> list[float]:
        return self._upper
