"""Numerical-health checks (SURVEY §5.2: the reference's nearest analogue
is scattered asserts and nan guards).

``checkify``-based validation for jitted code and host-side field checks.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.experimental import checkify


def validate_field(var, name: str | None = None) -> None:
    """Host-side: raise if a Field (or array) contains NaN/Inf."""
    arr = np.asarray(var() if hasattr(var, "bcs") else var)
    label = name or getattr(var, "name", "array")
    if not np.all(np.isfinite(arr)):
        n_bad = int((~np.isfinite(arr)).sum())
        raise FloatingPointError(
            f"validate_field: {label} has {n_bad} non-finite values"
        )


def checked(fn):
    """Wrap a jittable function with checkify NaN/div checks.

    Returns ``(err, out)``-style callable that raises on error:

        >>> safe_solve = checked(solve_fn)
        >>> out = safe_solve(x, rhs)   # raises on internal NaN
    """
    cfn = checkify.checkify(
        fn, errors=checkify.float_checks | checkify.nan_checks
    )

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def divergence_guard(report: dict, context: str = "solve") -> None:
    """Raise when a solver report signals divergence (mirrors the
    reference's RuntimeError on invalid tolerance, ``linalg.py:334-336``)."""
    if not np.isfinite(report.get("tol", np.nan)):
        raise RuntimeError(f"{context}: diverged (tol={report.get('tol')})")
