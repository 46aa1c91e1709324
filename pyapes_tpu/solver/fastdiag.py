"""Fast-diagonalization DIRECT solver for separable implicit operators.

The implicit operators this framework solves are Kronecker sums of
per-axis tridiagonal matrices: ``A = c_ax * sum_j I (x) T_j (x) I
+ c_dt * I`` where the ``T_j`` come straight from the per-axis
``AxisCoeffs`` vectors (``ops/stencil.py`` — BC surgery edits only rows,
so each axis IS an ``n x n`` matrix) and ``c_ax``/``c_dt`` are streamed
scalars (``gamma``, ``1/dt``). The reference's CG is the only solve it
has (``/root/reference/pyapes/solver/linalg.py:74-159``); a Kronecker-sum
structure admits something strictly better on a matmul machine:

    Lynch, Rice & Thomas (1964) fast diagonalization —
    eigendecompose each ``T_j = G_j diag(lam_j) F_j`` ONCE on the host
    (n x n, trivial), then every solve is six dense ``n x n @ n^3``
    contractions plus a pointwise divide:

        x = (x)_j G_j  *  1 / (c_ax * sum_j lam_j + c_dt)  *  (x)_j F_j b

This is the ideal TPU hot loop: the transforms are MXU matmuls (the
systolic array at full tilt — the stencil kernels are HBM-bound, these
are compute-dense), there is no iteration-count dependence on
conditioning, and the streamed scalars enter only the diagonal symbol —
dt/nu changes never recompile OR re-factorize.

Per-axis eigendecomposition notes:
  * Neumann/Symmetry boundary-node elimination makes ``T_j``
    NONSYMMETRIC (``A[1,2]=2/3`` vs ``A[2,1]=1``) but a tridiagonal with
    same-sign off-diagonal pairs is always diagonally similar to a
    symmetric matrix (``d_{i+1}/d_i = sqrt(T[i+1,i]/T[i,i+1])``) — eigh
    on the symmetrized matrix gives an orthogonal basis and REAL
    eigenvalues; the similarity folds into the transform factors
    (``F = Q^T D``, ``G = D^{-1} Q``). This is the same structure the
    Krylov path exploits via ``sym_vecs`` row scaling (linalg.py).
  * Reduced periodic axes are symmetric circulant-tridiagonal
    (``ap == am`` for the Laplacian) — eigh directly.
  * Singular systems (all-Neumann / all-periodic pressure Poisson): the
    zero mode is zeroed in eigenspace (pseudo-inverse) — exactly the
    quotient-space solve the CG path implements with
    ``project_mean`` + ``null_shift``.

Accuracy (MEASURED, ``scripts/fastdiag_probe.py`` 2026-08-18): factors are
computed in float64; with f32 transforms one pass reaches relative
residual ~1e-2 (3-D 33..129: 0.7-1.0e-2; 2-D up to 513: 1-9e-2 —
condition-number amplification of factor rounding grows only mildly
with n), and bf16 transforms are only ~1.4x worse (0.8-1.4e-2 3-D) at
twice the MXU rate. The driver loop in ``linalg._build_fastdiag``
wraps the solve in iterative refinement (``x += FD(b - A x)``) with
the TRUE residual recomputed by the same ``Aop`` the Krylov path uses,
so the reported tolerance is honest; refinement contracts by the
one-pass factor per pass (>=10x), i.e. ~3-4 passes to 1e-6, with a
stagnation exit at the dtype's accuracy floor (f64 input: ~1e-13 one
pass).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def axis_matrix_np(ap, ac, am, active: slice, periodic: bool) -> np.ndarray:
    """Dense per-axis operator on the ACTIVE index set (float64).

    Args:
        ap/ac/am: per-axis coefficient vectors (+1 / 0 / -1 offsets).
        active: the axis' active-row slice (``boundary_slicer``; interior
            for Dirichlet/eliminated-Neumann faces, everything for a
            reduced periodic axis).
        periodic: reduced torus axis — the stencil wraps (circulant).
    """
    ap = np.asarray(ap, dtype=np.float64)
    ac = np.asarray(ac, dtype=np.float64)
    am = np.asarray(am, dtype=np.float64)
    idx = np.arange(ap.shape[0])[active]
    n = idx.shape[0]
    A = np.zeros((n, n))
    A[np.arange(n), np.arange(n)] = ac[idx]
    # +1 neighbor (ap), -1 neighbor (am); couplings that leave the active
    # set are dropped — their (fixed-boundary-value) contribution is in
    # the RHS via the initial residual, exactly as in the masked Krylov
    # loop (linalg._build_cg: search directions are interior-masked).
    A[np.arange(n - 1), np.arange(1, n)] = ap[idx[:-1]]
    A[np.arange(1, n), np.arange(n - 1)] = am[idx[1:]]
    if periodic:
        A[n - 1, 0] = ap[idx[-1]]
        A[0, n - 1] = am[idx[0]]
    return A


def _symmetrize_similarity(A: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Diagonal ``d`` with ``diag(d) A diag(1/d)`` symmetric, and that
    symmetric matrix. Raises ValueError if no real diagonal similarity
    exists (mixed-sign off-diagonal pairs, e.g. a pure-advection axis)."""
    if np.allclose(A, A.T, rtol=0, atol=1e-14 * max(1.0, np.abs(A).max())):
        return np.ones(A.shape[0]), (A + A.T) / 2.0
    n = A.shape[0]
    # general (corner-free) tridiagonal symmetrization
    if n > 1 and (A[0, n - 1] != 0.0 or A[n - 1, 0] != 0.0):
        raise ValueError(
            "fastdiag: nonsymmetric circulant axis operator is not "
            "diagonally symmetrizable"
        )
    d = np.ones(n)
    for i in range(n - 1):
        lo, up = A[i + 1, i], A[i, i + 1]
        if lo == 0.0 and up == 0.0:
            d[i + 1] = d[i]
            continue
        if lo * up <= 0.0:
            raise ValueError(
                "fastdiag: axis operator has a mixed-sign off-diagonal "
                "pair (not diagonally symmetrizable; e.g. an advection "
                "term) — use cg/bicgstab for this equation"
            )
        # S[i,i+1] = d_i A[i,i+1] / d_{i+1} must equal
        # S[i+1,i] = d_{i+1} A[i+1,i] / d_i  =>  (d_{i+1}/d_i)^2 = up/lo
        d[i + 1] = d[i] * np.sqrt(up / lo)
    S = d[:, None] * A / d[None, :]
    asym = np.abs(S - S.T).max()
    if asym > 1e-12 * max(1.0, np.abs(S).max()):
        raise ValueError(
            "fastdiag: diagonal similarity failed to symmetrize the axis "
            f"operator (residual asymmetry {asym:.2e}) — use cg/bicgstab"
        )
    return d, (S + S.T) / 2.0


class FastDiag:
    """Per-axis eigenfactors + the jittable Kronecker solve.

    Args:
        axis_mats: per mesh axis, the dense float64 active-set operator
            (``axis_matrix_np``).
        dtype: solution dtype (f32): diagonal-symbol math runs in it.
        transform_dtype: dtype of the dense transform factors (f32 for
            one-pass 1e-6 accuracy; bf16 halves the matmul time on the
            MXU at ~1e-2 one-pass accuracy — pair with more refinement).
    """

    def __init__(self, axis_mats, dtype, transform_dtype=None):
        tdt = transform_dtype or dtype
        self.fwd = []   # F_j = Q^T diag(d)
        self.inv = []   # G_j = diag(1/d) Q
        self.lams = []  # eigenvalues, float64 precision kept until use
        lam_np = []
        for A in axis_mats:
            d, S = _symmetrize_similarity(A)
            lam, Q = np.linalg.eigh(S)
            self.fwd.append(jnp.asarray(Q.T * d[None, :], dtype=tdt))
            self.inv.append(jnp.asarray(Q / d[:, None], dtype=tdt))
            self.lams.append(jnp.asarray(lam, dtype=dtype))
            lam_np.append(lam)
        # scale of the symbol, for the singular-mode cut
        self.lam_scale = float(sum(np.abs(l).max() for l in lam_np))
        self.ndim = len(axis_mats)

    def _transform(self, mats, x):
        # x: (vdim, *active_shape); contract mesh-axis j with mats[j].
        # tensordot puts the contracted output axis first; moveaxis
        # restores it — XLA fuses the (relabeling-only) transpose into
        # the next dot's layout. bf16 factors accumulate in f32 on the
        # MXU (preferred_element_type) and round back to bf16 between
        # stages (keeps the inter-stage traffic narrow).
        tdt = mats[0].dtype
        acc = x.dtype if x.dtype == jnp.float64 else jnp.float32
        for j, Mt in enumerate(mats):
            y = jnp.tensordot(
                Mt, x, axes=[[1], [1 + j]], preferred_element_type=acc
            )
            x = jnp.moveaxis(y, 0, 1 + j).astype(tdt)
        return x

    def solve(self, r, c_ax, c_dt=0.0, pseudo=False):
        """``(c_ax * sum_j T_j + c_dt I)^{-1} r`` on the active set.

        ``c_ax``/``c_dt`` may be traced runtime scalars (streamed gamma /
        1/dt). ``pseudo=True`` zeroes (near-)null modes of the symbol —
        the quotient-space solve for singular all-Neumann/periodic
        systems.
        """
        dt_in = r.dtype
        tdt = self.fwd[0].dtype
        y = self._transform(self.fwd, r.astype(tdt))
        lam = self.lams[0].reshape(
            (-1,) + (1,) * (self.ndim - 1)
        )
        for j in range(1, self.ndim):
            shape = [1] * self.ndim
            shape[j] = -1
            lam = lam + self.lams[j].reshape(shape)
        sym = c_ax * lam + c_dt
        if pseudo:
            cut = 1e-10 * self.lam_scale * jnp.abs(c_ax)
            inv = jnp.where(
                jnp.abs(sym) <= cut, 0.0, 1.0 / jnp.where(sym == 0, 1.0, sym)
            )
            y = y.astype(dt_in) * inv[None]
        else:
            y = y.astype(dt_in) / sym[None]
        y = self._transform(self.inv, y.astype(tdt))
        return y.astype(dt_in)
