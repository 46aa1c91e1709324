"""Differentiable (adjoint) PDE solves via implicit differentiation.

A capability the torch reference cannot offer (its solvers mutate state
eagerly and are not differentiable end-to-end): wrapping the matrix-free
CG in ``jax.lax.custom_linear_solve`` makes ``x = A^-1 b`` a first-class
differentiable operation — reverse-mode gradients of any functional of
the solution flow to the RHS *and* to the stencil coefficients through
the implicit function theorem (one adjoint solve, never by
differentiating through the Krylov iterations; cf. adjoint stencil-loop
AD, arXiv:1907.02818 — here JAX's IFT machinery replaces the
source-transformation pass).

Scope: SYMMETRIC operators (per-axis 3-vector stencils, e.g. Laplacians)
with homogeneous Dirichlet BCs — the BC application is then a symmetric
projection (zeroing boundary rows) and the solve a linear map. Neumann
and seam-style periodic BCs are rejected: the Neumann boundary-node
elimination makes the surgered rows nonsymmetric (A(1,2)=2/3 vs
A(2,1)=1) and the periodic seam extrapolation is likewise one-sided
(extend via the torus reduction if needed). Use cases: inverse problems (recover sources or
conductivities), sensitivity analysis, physics-informed optimization.

Example:
    >>> dsolve = DifferentiableSolve(mesh, var.bcs)
    >>> loss = lambda rhs: jnp.sum(dsolve(coeffs, rhs) ** 2)
    >>> g = jax.grad(loss)(rhs)          # one extra (adjoint) CG solve
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from pyapes_tpu.mesh.tools import boundary_slicer, interior_mask_device
from pyapes_tpu.ops.stencil import apply_axis_stencil
from pyapes_tpu.variables.bcs import apply_bcs_fn


class DifferentiableSolve:
    """Differentiable matrix-free CG solve ``x = A(coeffs)^-1 rhs``.

    Args:
        mesh: the mesh (static masks / grid).
        bcs: the target Field's BC list; every BC must be homogeneous
            (value 0) so BC application is linear.
        tol: relative-residual tolerance of both forward and adjoint
            solves.
        max_it: iteration cap.
    """

    def __init__(self, mesh, bcs, tol: float = 1e-8, max_it: int = 2000):
        for bc in bcs or []:
            v = getattr(bc, "bc_val", 0.0)
            homogeneous = v is None or (
                isinstance(v, (int, float)) and float(v) == 0.0
            )
            assert homogeneous, (
                "DifferentiableSolve: BCs must be homogeneous (linear); "
                f"got {bc.bc_face}={v!r}"
            )
            assert bc.bc_type == "dirichlet", (
                "DifferentiableSolve: only Dirichlet BCs keep the "
                "operator symmetric (Neumann surgery and the periodic "
                "seam extrapolation are one-sided); "
                f"got {bc.bc_type} on {bc.bc_face}"
            )
        self.tol = float(tol)
        self.max_it = int(max_it)
        slicer = boundary_slicer(mesh.dim, bcs, mesh.coord_sys)
        self._mask_args = (tuple(mesh.nx), tuple(slicer))
        self._apply_bcs = apply_bcs_fn(list(bcs or []), mesh.grid)

    def _cg(self, matvec, b):
        """Plain CG ``while_loop`` (no preconditioner — the adjoint pass
        re-uses it, so it must be a pure function of (matvec, b))."""
        tol, max_it = self.tol, self.max_it
        r = b
        d = r
        x = jnp.zeros_like(b)
        rr = jnp.sum(r * r)
        r0 = jnp.sqrt(jnp.maximum(rr, jnp.finfo(b.dtype).tiny))

        def cond(s):
            x, r, d, rr, itr = s
            return jnp.logical_and(
                jnp.sqrt(rr) / r0 > tol, itr < max_it
            )

        def body(s):
            x, r, d, rr, itr = s
            Ad = matvec(d)
            alpha = rr / jnp.sum(d * Ad)
            x = x + alpha * d
            r_new = r - alpha * Ad
            rr_new = jnp.sum(r_new * r_new)
            d = r_new + (rr_new / rr) * d
            return (x, r_new, d, rr_new, itr + 1)

        x, *_ = jax.lax.while_loop(
            cond, body, (x, r, d, rr, jnp.asarray(0, jnp.int32))
        )
        return x

    def __call__(self, coeffs, rhs: jnp.ndarray) -> jnp.ndarray:
        """Solve ``A(coeffs) x = rhs`` differentiably.

        Args:
            coeffs: per-axis ``(ap, ac, am)`` coefficient vectors (the
                operator must be symmetric on the masked interior, as a
                BC-surgered Laplacian is).
            rhs: ``(vdim, *nx)`` right-hand side.

        Returns the solution with BCs applied; gradients w.r.t. BOTH
        ``coeffs`` and ``rhs`` flow through one adjoint solve.
        """
        M = interior_mask_device(*self._mask_args, rhs.dtype)
        apply_bcs = self._apply_bcs

        def matvec(x):
            return M * apply_axis_stencil(coeffs, apply_bcs(x))

        x = jax.lax.custom_linear_solve(
            matvec,
            M * rhs,
            solve=lambda mv, b: self._cg(mv, b),
            symmetric=True,
        )
        return apply_bcs(x)
