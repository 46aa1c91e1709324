"""Box geometry (reference ``pyapes/geometry/box.py:12-92``)."""
from __future__ import annotations

from pyapes_tpu.geometry.basis import GeoBounder, Geometry, bound_edge_and_corner

BOX_DIM = [1, 2, 3]


class Box(Geometry, metaclass=GeoBounder):
    """1/2/3-D rectangular domain.

    >>> Box([0, 0, 0], [1, 1, 1])       # Option 1
    >>> Box[0:1, 0:1, 0:1]              # Option 2
    """

    def __init__(self, lower, upper):
        assert len(lower) == len(upper), "Box: length of inputs has to be matched!"

        self._lower = [float(i) for i in lower]
        self._upper = [float(i) for i in upper]

        self.ex, self.xp, self.face, self._dim = bound_edge_and_corner(
            self._lower, self._upper
        )

        # Per-face configuration {idx: {"e_x": ..., "x_p": ..., "face": ...}}
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
        size = 1.0
        for lo, up in zip(self._lower, self._upper):
            size *= float(up - lo)
        return size

    @property
    def X(self) -> float:
        return self._lower[0]

    @property
    def Y(self) -> float:
        return self._lower[1]

    @property
    def Z(self) -> float:
        return self._lower[2]

    @property
    def config(self) -> dict[int, dict]:
        return self._config

    @property
    def lower(self) -> list[float]:
        return self._lower

    @property
    def upper(self) -> list[float]:
        return self._upper
