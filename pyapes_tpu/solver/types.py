"""Types used in the solver module (reference ``pyapes/solver/types.py``)."""
from __future__ import annotations

from typing import Any, Callable, TypedDict


class DivConfigType(TypedDict, total=False):
    limiter: str
    edge: bool


class LaplacianConfigType(TypedDict, total=False):
    edge: bool


class GradConfigType(TypedDict, total=False):
    edge: bool


class DiffFluxConfigType(TypedDict, total=False):
    edge: bool


class DdtConfigType(TypedDict, total=False):
    scheme: str


class DiscretizerConfigType(TypedDict, total=False):
    div: DivConfigType
    laplacian: LaplacianConfigType
    grad: GradConfigType
    diffFlux: DiffFluxConfigType
    ddt: DdtConfigType


class OPStype(TypedDict, total=False):
    """Equation-term record (reference ``types.py:44-70``), extended with the
    TPU fast-path fields."""

    name: str
    Aop: Callable
    target: Any
    param: tuple
    sign: float | int
    other: dict | None
    A_coeffs: list | None
    adjust_rhs: Callable | None
    # TPU extensions:
    axis_coeffs: tuple | None
    """Per-axis 1-D (ap, ac, am) stencil vectors (hot path)."""
    adv: Any
    """Frozen advecting-field array for nonlinear Div."""
    limiter: str | None
    dt: float | None
    """Time-step for Ddt."""
