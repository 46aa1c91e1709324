"""Basis of geometries: direction/face naming and abstract geometry.

Feature-parity rebuild of reference ``pyapes/geometry/basis.py`` (pure
Python, no tensors). Face convention: ``<dir><side>`` with ``l`` lower and
``u`` upper, e.g. ``xl``, ``zu`` (``basis.py:16-19``).
"""
from __future__ import annotations

from typing import Any

DIR = ["x", "y", "z"]
DIR_TO_NUM: dict[str, int] = {"x": 0, "y": 1, "z": 2}
"""Direction to number in the xyz coordinate (``basis.py:6``)."""
NUM_TO_DIR: dict[int, str] = {0: "x", 1: "y", 2: "z"}
DIR_TO_NUM_RZ: dict[str, int] = {"r": 0, "z": 1}
NUM_TO_DIR_RZ: dict[int, str] = {0: "r", 1: "z"}
SIDE_TO_NUM: dict[str, int] = {"l": 0, "u": 1}
FDIR = ["xl", "xu", "yl", "yu", "zl", "zu"]
"""Face identifiers in the xyz coordinate."""
FDIR_RZ = ["rl", "ru", "zl", "zu"]
"""Face identifiers in the rz (axisymmetric) coordinate."""


def n2d_coord(coord: str) -> dict[int, str]:
    """Number-to-direction map for a coordinate system (``basis.py:22-30``)."""
    if coord == "xyz":
        return NUM_TO_DIR
    elif coord == "rz":
        return NUM_TO_DIR_RZ
    else:
        raise RuntimeError(f"n2d_coord: unknown coordinate system {coord}.")


class GeoTypeIdentifier(list):
    """List whose ``in`` check tests element *types* (``basis.py:33-40``)."""

    def __contains__(self, typ: type) -> bool:
        return any(isinstance(val, typ) for val in self)


class Geometry:
    """Base class of all geometries (``basis.py:43-95``)."""

    @property
    def X(self) -> float:
        raise NotImplementedError

    @property
    def Y(self) -> float:
        raise NotImplementedError

    @property
    def Z(self) -> float:
        raise NotImplementedError

    @property
    def dim(self) -> int:
        raise NotImplementedError

    @property
    def type(self) -> str:
        raise NotImplementedError

    @property
    def size(self) -> float:
        raise NotImplementedError

    @property
    def lower(self) -> list[float]:
        raise NotImplementedError

    @property
    def upper(self) -> list[float]:
        raise NotImplementedError

    @property
    def config(self) -> dict[int, dict[str, Any]]:
        raise NotImplementedError

    def __eq__(self, other: Any):
        return (self.lower == other.lower) and (self.size == other.size)

    def __hash__(self) -> int:
        return hash((self.type, tuple(self.lower), tuple(self.upper)))

    def __repr__(self) -> str:
        return (
            f"{self.__class__.__name__}(lower={self.lower}, "
            f"upper={self.upper}, size={self.size:.1e})"
        )


class GeoBounder(type):
    """Metaclass enabling slice-literal construction: ``Box[0:1, 0:2]``
    == ``Box((0, 0), (1, 2))`` (``basis.py:98-133``)."""

    def __getitem__(cls, item: tuple[slice, ...] | slice):
        if not isinstance(item, tuple | slice):
            raise IndexError("GeoBounder: bounds must be a tuple of slices")

        if isinstance(item, slice):
            item = (item,)

        lower: list[float] = []
        upper: list[float] = []
        for dim in item:
            assert isinstance(dim, slice)
            assert type(dim.start) in (float, int)
            assert type(dim.stop) in (float, int)
            assert dim.step is None, "GeoBounder: step must be None"
            lower.append(float(dim.start))
            upper.append(float(dim.stop))

        return cls(lower, upper)


def bound_edge_and_corner(
    lower: list[float], upper: list[float], coord: str = "xyz"
) -> tuple[list[list[float]], list[list[float]], list[str], int]:
    """Per-face origin ``x_p`` + extent ``e_x`` + face-name tables, ordered
    from - to + along each face normal (``basis.py:136-201``).

    Returns ``(ex, xp, face, dim)``.
    """
    dim = len(lower)
    assert 0 < dim < 4, "Dimensions must be 1, 2 and 3!"
    assert coord in ("xyz", "rz"), "Coordinate must be either xyz or rz!"

    if dim == 1:
        xp = [[lower[0]], [upper[0]]]
        ex = [[0.0], [0.0]]
        face = ["xl", "xu"]
    elif dim == 2:
        xp = [
            [lower[0], lower[1]],
            [lower[0], upper[1]],
            [lower[0], lower[1]],
            [upper[0], lower[1]],
        ]
        ex = [
            [upper[0] - lower[0], 0.0],
            [upper[0] - lower[0], 0.0],
            [0.0, upper[1] - lower[1]],
            [0.0, upper[1] - lower[1]],
        ]
        face = ["yl", "yu", "xl", "xu"] if coord == "xyz" else ["zl", "zu", "rl", "ru"]
    else:
        xp = [
            [lower[0], lower[1], lower[2]],
            [upper[0], lower[1], lower[2]],
            [lower[0], lower[1], lower[2]],
            [lower[0], upper[1], lower[2]],
            [lower[0], lower[1], lower[2]],
            [lower[0], lower[1], upper[2]],
        ]
        span = [upper[i] - lower[i] for i in range(3)]
        ex = [
            [0.0, span[1], span[2]],
            [0.0, span[1], span[2]],
            [span[0], 0.0, span[2]],
            [span[0], 0.0, span[2]],
            [span[0], span[1], 0.0],
            [span[0], span[1], 0.0],
        ]
        face = ["xl", "xu", "yl", "yu", "zl", "zu"]

    return ex, xp, face, dim
