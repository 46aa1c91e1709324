"""Solver tools: configuration types and default coefficient banks
(reference ``pyapes/solver/tools.py``).

The full-grid 5-bank layout ``[App, Ap, Ac, Am, Amm]`` is kept for the
*explicit* FDC path and parity tests (it makes BC surgery local and
testable, ``tools.py:29-112``); the implicit solver hot path uses the
per-axis vectors in ``pyapes_tpu.ops.stencil`` instead.
"""
from __future__ import annotations

from typing import TypedDict

import jax.numpy as jnp

from pyapes_tpu.variables import Field


class FDMSolverConfig(TypedDict, total=False):
    method: str
    """"cg" / "bicgstab" (Krylov), or "fastdiag" (direct
    fast-diagonalization solve for separable laplacian+ddt operators,
    ``solver/fastdiag.py``)."""
    tol: float
    max_it: int
    report: bool
    criterion: str
    """Convergence criterion: "delta" (reference behavior,
    ``linalg.py:321-338``) or "residual" (true relative residual norm)."""
    precond: str
    """"mg" enables the geometric-multigrid preconditioner
    (``solver/multigrid.py``); "fd" the fast-diagonalization
    preconditioner (one dense MXU eigen-solve per Krylov iteration,
    ``solver/fastdiag.py``). "fd" preconditions NON-separable equations
    with their separable part: several constant-coefficient axis terms
    are summed with build-time-frozen weights (constant-velocity
    advection-diffusion becomes near-direct), per-point advection /
    custom terms are left out (frozen diffusion+dt preconditioner)."""
    fd_opts: dict
    """Fast-diagonalization options (method "fastdiag" / precond "fd"):
    {"precision": "highest" (default, true-f32 MXU passes, ~1e-6/pass)
    | "default" (bf16 MXU passes, ~1e-2/pass, ~3x matmul rate),
    "dtype": e.g. "bfloat16" transform factors}."""
    fd_fallback: str
    """With method "fastdiag": Krylov method to use silently when the
    equation is NOT separable (models default to fastdiag for equations
    they own; a user may append obstacle BCs or stream a viscosity field
    afterwards). Without it, an unsupported equation raises."""
    mg_opts: dict
    """Multigrid options forwarded to ``MGSpec`` (dtype/n_pre/n_post/
    omega/fmg/fuse_rz/smoother/...)."""
    nullspace: str
    """"mean" solves singular all-Neumann systems on the zero-mean
    quotient space (compatibility-projected RHS)."""
    picard: int
    """Picard sweeps for nonlinear (advection) equations."""
    kernel: str
    """Stencil kernel tier override: "pallas" | "jnp" | "auto"."""
    decomp: dict
    """Domain decomposition: ``{"axes": (...), "devices": ...}`` — shards
    the solve over a ``jax.sharding.Mesh`` with halo exchange."""
    debug: str
    """"nan" instruments the compiled loop with checkify NaN/div checks."""
    history: bool
    """Record the per-iteration convergence measure in the report."""
    sync: bool
    """Default True. False skips the post-solve device->host scalar
    fetch: the report carries DEVICE scalars and the solve enqueues
    asynchronously (a transient model can queue a whole step — e.g. 3
    momentum + 1 pressure solve — without the host blocking; each fetch
    is a full RTT on a tunneled/remote backend). NaN detection is
    deferred to whoever fetches the result."""


class SolverConfig(TypedDict, total=False):
    fdm: FDMSolverConfig


def default_A_ops(var: Field, ops: str) -> list[list[jnp.ndarray]]:
    """Construct second-order central-difference coefficient banks
    (reference ``tools.py:29-112``).

    Returns five banks ``[App, Ap, Ac, Am, Amm]`` for offsets
    ``i+2, i+1, i, i-1, i-2``; each bank is a list over ``mesh.dim`` of
    arrays shaped ``(var.dim, *mesh.nx)``.
    """
    mesh = var.mesh
    md = mesh.dim
    shape = (var.dim, *mesh.nx)
    dtype = mesh.dtype.float

    ones = jnp.ones(shape, dtype=dtype)
    zeros = jnp.zeros(shape, dtype=dtype)

    op = ops.lower()
    if op == "grad":
        App = [zeros for _ in range(md)]
        Ap = [ones for _ in range(md)]
        Ac = [zeros for _ in range(md)]
        Am = [-ones for _ in range(md)]
        Amm = [zeros for _ in range(md)]
    elif op == "div":
        if mesh.coord_sys == "xyz":
            App = [zeros for _ in range(md)]
            Ap = [ones for _ in range(md)]
            Ac = [zeros for _ in range(md)]
            Am = [-ones for _ in range(md)]
            Amm = [zeros for _ in range(md)]
        else:
            r = mesh.R
            dr = mesh.dx[0]
            scale = jnp.nan_to_num(2 * dr / r, nan=0.0, posinf=0.0, neginf=0.0)
            App = [zeros for _ in range(md)]
            Ap = [ones for _ in range(md)]
            Ac = [scale * ones if i == 0 else zeros for i in range(md)]
            Am = [-ones for _ in range(md)]
            Amm = [zeros for _ in range(md)]
    elif op == "laplacian":
        if mesh.coord_sys == "xyz":
            App = [zeros for _ in range(md)]
            Ap = [ones for _ in range(md)]
            Ac = [-2.0 * ones for _ in range(md)]
            Am = [ones for _ in range(md)]
            Amm = [zeros for _ in range(md)]
        else:
            r = mesh.R
            dr = mesh.dx[0]
            scale = jnp.nan_to_num(dr / (2 * r), nan=0.0, posinf=0.0, neginf=0.0)
            App = [zeros for _ in range(md)]
            Ap = [(1 + scale) * ones if i == 0 else ones for i in range(md)]
            Ac = [-2.0 * ones for _ in range(md)]
            Am = [(1 - scale) * ones if i == 0 else ones for i in range(md)]
            Amm = [zeros for _ in range(md)]
    else:
        raise RuntimeError(f"Given {ops=} should be either grad, div, or laplacian.")

    return [App, Ap, Ac, Am, Amm]
