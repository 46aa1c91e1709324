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

Accuracy (MEASURED on-chip, ``scripts/fastdiag_probe.py`` 2026-08-18):
factors are computed in float64; the decisive knob is the TPU matmul
precision. XLA's DEFAULT f32 dot runs bf16-multiply passes on the MXU:
one pass then reaches only ~1e-2 relative residual (3-D) because the
eigen-basis loses orthogonality at bf16 and the error is amplified by
``lam_max/lam_min``. With ``precision="highest"`` (true f32 multiplies,
the default here) one pass reaches 2.5e-7..4.8e-7 at 3-D 65..258 and
2.1e-6..1.6e-5 at 2-D 129..1025 — a genuine direct solve. The driver
loop in ``linalg._build_fastdiag`` wraps it in iterative refinement
(``x += FD(b - A x)``) with the TRUE residual recomputed by the same
``Aop`` the Krylov path uses, so the reported tolerance is honest, and
a stagnation exit stops at the dtype's accuracy floor (f64 input:
~1e-13 one pass).
"""
from __future__ import annotations

import numpy as np
import jax
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
        transform_dtype: dtype of the dense transform factors. With
            explicit bf16 factors the dots run single-pass bf16 —
            equivalent to ``precision="default"`` f32 (~1e-2/pass);
            prefer steering accuracy/speed via ``precision``.
        precision: jax dot precision for the transforms ("highest" =
            true f32, ~1e-6 per pass, the default; "default" = bf16
            MXU passes, ~1e-2 per pass at ~3x the matmul rate).
    """

    def __init__(self, axis_mats, dtype, transform_dtype=None,
                 precision="highest"):
        tdt = transform_dtype or dtype
        # TPU matmul precision is THE accuracy lever: XLA's DEFAULT f32
        # dot runs bf16-multiply passes on the MXU, which costs the
        # eigen-solve ~4 orders of one-pass accuracy (measured 1e-2 vs
        # 2e-6..5e-7 at 2-D 513 / 3-D 258 with "highest" = true f32).
        # "highest" makes this a ~1e-6-per-pass DIRECT solver at any
        # size here; "default" remains available as a cheap first-pass /
        # preconditioner mode via fd_opts={"precision": "default"}.
        self.precision = precision
        # Factors stay HOST numpy: FastDiag can be constructed while an
        # outer trace is live (fused-step capture with a solver-cache
        # miss) — jnp arrays created there would be tracers and LEAK
        # into the cached closure, crashing later eager solves. As numpy
        # constants they fold into each jitted consumer identically.
        self.fwd = []   # F_j = Q^T diag(d)
        self.inv = []   # G_j = diag(1/d) Q
        self.lams = []  # eigenvalues, float64 precision kept until use
        lam_np = []
        for A in axis_mats:
            d, S = _symmetrize_similarity(A)
            lam, Q = np.linalg.eigh(S)
            self.fwd.append(np.asarray(Q.T * d[None, :], dtype=tdt))
            self.inv.append(np.asarray(Q / d[:, None], dtype=tdt))
            self.lams.append(np.asarray(lam, dtype=dtype))
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
                Mt, x, axes=[[1], [1 + j]], preferred_element_type=acc,
                precision=self.precision,
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
        # Eigen-symbol from the PER-AXIS vectors, built at RUN time. Two
        # materialization hazards, both measured (round 5): numpy
        # broadcasting here folds the full n^d symbol at TRACE time into
        # a giant HLO literal (530 MB at 512^3, 1.8 GB at 768^3 — THE
        # dominant first-compile cost and 200 MB of the 256^3 serialized
        # executable), and plain jnp constants let XLA's constant folder
        # rebuild exactly that literal at COMPILE time. The
        # optimization_barrier makes the (n-element) vectors opaque to
        # the folder, so the cube only ever exists fused into the
        # pointwise divide below — zero extra HBM traffic, KB-scale
        # program constants.
        lams = [
            jax.lax.optimization_barrier(jnp.asarray(l)) for l in self.lams
        ]
        lam = lams[0].reshape(
            (-1,) + (1,) * (self.ndim - 1)
        )
        for j in range(1, self.ndim):
            shape = [1] * self.ndim
            shape[j] = -1
            lam = lam + lams[j].reshape(shape)
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


class FDPrecond:
    """Fast-diagonalization PRECONDITIONER for the Krylov loops.

    The direct refinement form (``linalg._build_fastdiag``) is a
    stationary iteration: its worst error mode can contract slowly even
    when the bulk one-pass residual reduction is ~1e-2 (measured stall
    at true residual ~3e-4 at 256^3 f32). Wrapping the SAME eigen-solve
    as the preconditioner of CG/BiCGSTAB lets the Krylov recurrence
    accelerate those few slow modes — the standard fix, identical in
    role to the multigrid V-cycle but ~10x stronger per application and
    made of dense MXU contractions instead of HBM-bound smooths.

    The streamed equation scalars (``gamma``, ``1/dt``) are staged at
    trace time via ``set_scalars`` (the ``precond_setup`` hook in
    ``linalg._build_cg``), so dt/coefficient changes neither recompile
    nor re-factorize. The map is SPD on the (row-scaled) active set:
    the axis matrices are symmetrized by diagonal similarity and the
    eigen-symbol is sign-definite, so CG theory applies.
    """

    def __init__(self, fd: FastDiag, act_sel, pseudo: bool = False,
                 pre_scale=None):
        self.fd = fd
        self.act_sel = act_sel
        self.pseudo = pseudo
        # CG symmetrization (``linalg`` ``sym_vecs``): the Krylov loop
        # solves the row-scaled SPD system ``D A x = D b`` whose exact
        # inverse is ``A^-1 D^-1`` — so the eigen-solve must see the
        # UNSCALED residual. ``pre_scale`` is a DEFERRED builder of
        # ``1/D`` on the active set (``linalg._null_shift_builder`` —
        # composed in-trace from per-axis vectors so no full-grid
        # literal is embedded); the composition stays symmetric (it IS
        # ``(D A)^-1``).
        self.pre_scale = pre_scale
        self.c_ax = 1.0
        self.c_dt = 0.0

    def set_scalars(self, c_ax, c_dt) -> None:
        """Stage the (possibly traced) equation scalars; called by the
        ``precond_setup`` hook before the Krylov loop is traced."""
        self.c_ax = c_ax
        self.c_dt = c_dt

    def __call__(self, r):
        z = jnp.zeros_like(r)
        ra = r[self.act_sel]
        if self.pre_scale is not None:
            ra = ra * self.pre_scale()
        e = self.fd.solve(ra, self.c_ax, self.c_dt, pseudo=self.pseudo)
        return z.at[self.act_sel].set(e)
