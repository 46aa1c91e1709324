"""Matrix-free Krylov solvers as single compiled TPU programs.

Rebuild of reference ``pyapes/solver/linalg.py`` (CG ``linalg.py:74-159``,
BiCGSTAB ``linalg.py:162-279``), redesigned for XLA:

  * The entire solve — stencil applies, BC re-application, reductions,
    convergence test — is ONE jitted ``lax.while_loop``. The reference
    synced ``tol.item()`` to host every iteration (``linalg.py:338``); here
    there is a single device->host sync at the end.
  * Interior restriction (``boundary_slicer`` semantics, periodic faces stay
    active — ``linalg.py:94``) is a static 0/1 mask multiply that XLA fuses
    into the stencil apply.
  * Compiled solvers are cached by problem *structure*, so time-stepping
    loops (Burgers, NS) re-use one executable and only stream new
    coefficient/advection arrays in.

Convergence criteria:
  * ``"delta"`` (default, reference behavior ``linalg.py:321-338``):
    max over components of the L2 norm of the iterate update.
  * ``"residual"``: true residual norm relative to the initial residual.
"""
from __future__ import annotations

from typing import Callable, TypedDict

import jax
import jax.numpy as jnp
import numpy as np

from pyapes_tpu.mesh.tools import boundary_slicer, interior_mask_device
from pyapes_tpu.ops.stencil import (
    apply_axis_stencil,
    apply_conv_field,
    apply_div_field,
)
from pyapes_tpu.variables.bcs import apply_bcs_fn


class _MaskSpec:
    """Static recipe for the interior mask, materialized on device inside
    the traced solver (avoids a full-grid HLO constant). ``excluded`` is an
    optional numpy bool mask of additionally-inactive cells (obstacles)."""

    def __init__(self, nx, slicer, dtype, excluded=None, dyn_idxs=()):
        self.nx, self.slicer, self.dtype = nx, slicer, dtype
        self.excluded = excluded
        self.dyn_idxs = tuple(dyn_idxs)

    def build(self):
        m = interior_mask_device(self.nx, self.slicer, self.dtype)
        if self.excluded is not None:
            m = m * jnp.asarray(~self.excluded, dtype=self.dtype)
        return m

    def build_dynamic(self, bc_vals):
        """Active-set mask including DYNAMIC obstacle exclusions, whose
        masks arrive as runtime operands (``bc_vals`` entries)."""
        m = self.build()
        for i in self.dyn_idxs:
            if bc_vals and bc_vals[i] is not None:
                m = m * (1.0 - bc_vals[i][0].astype(m.dtype))
        return m


class ReportType(TypedDict):
    """Solver report (reference ``linalg.py:22-30``)."""

    itr: int
    tol: float
    converge: bool


def _nan0(x):
    return jnp.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0)


def _term_descriptor(rec) -> tuple:
    """Static (hashable) description of one equation term."""
    name = rec["name"].lower()
    if name == "ddt":
        kind = "ddt"
    elif name == "custom":
        kind = "custom"
    elif name == "conv":
        kind = "conv_field"
    elif rec.get("adv") is not None:
        kind = "div_field"
    elif (rec.get("other") or {}).get("var_gamma"):
        # conservative variable-coefficient Laplacian: Γ is a streamed
        # per-point operand; slot 4 carries the per-axis BC surgery and
        # slot 6 the static 1/dx² tuple (the "form" slot is unused here).
        kind = "diff_field"
    else:
        kind = "axis"
    has_field = kind in ("div_field", "conv_field")
    return (
        kind,
        name,
        float(rec["sign"]),
        rec.get("limiter"),
        rec["other"]["surgery"]
        if (has_field or kind == "diff_field")
        else None,
        (rec["param"][0] is not None and kind != "diff_field")
        if name in ("laplacian", "grad")
        else False,
        rec["other"]["form"]
        if has_field
        else (
            (rec["other"]["inv_dx2"], rec["other"]["avg"])
            if kind == "diff_field"
            # custom: the (hashable) separable fd_hint rides the "form"
            # slot — consumed only by the FD preconditioner setup
            else (
                rec["other"].get("fd_hint")
                if kind == "custom"
                else None
            )
        ),
        rec["other"]["fn"] if kind == "custom" else None,
    )


def _term_params(rec, desc) -> dict:
    kind = desc[0]
    if kind == "ddt":
        from pyapes_tpu.solver.fdm import ddt_leading_coeff

        # 1/dt (backward Euler) or 1.5/dt (active BDF2) — a runtime
        # operand, so the bootstrap BE->BDF2 switch never recompiles.
        return {"inv_dt": jnp.asarray(ddt_leading_coeff(rec) / rec["dt"])}
    if kind == "custom":
        return {"cparams": rec.get("custom_params", ())}
    if kind in ("div_field", "conv_field"):
        return {"adv": rec["adv"], "base": rec["other"]["base"]}
    if kind == "diff_field":
        return {"gamma": jnp.asarray(rec["param"][0])}
    p = {"axis": rec["axis_coeffs"]}
    if desc[5]:
        # host scalars stay host floats (NOT jnp.asarray): inside an
        # outer trace (fused-step capture) a jnp cast would return a
        # tracer, breaking the host analysis that freezes coefficient
        # weights (``float(param)`` in the FD-preconditioner setup); as
        # a jit-argument leaf a float streams exactly like a 0-d array.
        v = rec["param"][0]
        if isinstance(v, (int, float, np.floating, np.integer)):
            p["param"] = float(v)
        else:
            p["param"] = jnp.asarray(v)
    return p


def _make_Aop(
    term_descs,
    stencil_fn=apply_axis_stencil,
    advect_pallas: bool = False,
    advect_interpret: bool = False,
    sharded_advect: dict | None = None,
    diff_pallas: bool = False,
    stencil5_fn=None,
) -> Callable:
    def _div_field(x, tp, limiter, surgery, form):
        if advect_pallas and limiter in ("none", "upwind"):
            from pyapes_tpu.ops.pallas_advect import pallas_advect_pair

            adv, base = tp["adv"], tp["base"]
            vdim = x.shape[0]
            if vdim == 1:
                return pallas_advect_pair(
                    x[0], adv[0], base, (0, 1, 2), limiter, surgery, form,
                    interpret=advect_interpret,
                )[None]
            out = None
            for j in range(x.ndim - 1):
                a = adv[j] if adv.shape[0] > 1 else adv[0]
                t = pallas_advect_pair(
                    x[j], a, base, (j,), limiter, surgery, form,
                    interpret=advect_interpret,
                )
                out = t if out is None else out + t
            return out[None]
        return apply_div_field(x, tp["adv"], tp["base"], limiter, surgery, form)

    def _conv_field(x, tp, limiter, surgery):
        if advect_pallas and limiter in ("none", "upwind"):
            from pyapes_tpu.ops.pallas_advect import pallas_conv_component

            return jnp.stack([
                pallas_conv_component(
                    x[i], tp["adv"], tp["base"], limiter, surgery,
                    interpret=advect_interpret,
                )
                for i in range(x.shape[0])
            ])
        return apply_conv_field(x, tp["adv"], tp["base"], limiter, surgery)

    def Aop(x, tparams):
        out = jnp.zeros_like(x)
        for ti, (desc, tp) in enumerate(zip(term_descs, tparams)):
            kind, _, sign, limiter, surgery, has_param, form, cfn = desc
            if kind == "axis":
                if any(len(cs) != 3 for cs in tp["axis"]):
                    # 5-point (QUICK) vectors: slab-resident Pallas
                    # kernel when the shape supports it (round-4 item 5),
                    # jnp roll-sum otherwise.
                    if stencil5_fn is not None:
                        r = stencil5_fn(tp["axis"], x)
                    else:
                        r = apply_axis_stencil(tp["axis"], x)
                else:
                    r = stencil_fn(tp["axis"], x)
                if has_param:
                    r = r * tp["param"]
            elif kind == "div_field":
                if sharded_advect and ti in sharded_advect:
                    r = sharded_advect[ti](x, tp["adv"], tp["base"])
                else:
                    r = _div_field(x, tp, limiter, surgery, form)
            elif kind == "conv_field":
                if sharded_advect and ti in sharded_advect:
                    r = sharded_advect[ti](x, tp["adv"], tp["base"])
                else:
                    r = _conv_field(x, tp, limiter, surgery)
            elif kind == "diff_field":
                if (
                    diff_pallas
                    and x.shape[0] == 1
                    and tp["gamma"].ndim == x.ndim - 1
                ):
                    from pyapes_tpu.ops.pallas_advect import (
                        pallas_diff_field,
                    )

                    r = pallas_diff_field(
                        x[0], tp["gamma"], form[0], surgery,
                        avg=form[1], interpret=advect_interpret,
                    )[None]
                else:
                    from pyapes_tpu.ops.stencil import apply_diff_field

                    r = apply_diff_field(
                        x, tp["gamma"], form[0], surgery, avg=form[1]
                    )
            elif kind == "custom":
                r = cfn(x, *tp["cparams"])
            else:  # ddt
                r = x * tp["inv_dt"]
            out = out + sign * r
        return out

    return Aop


def _l2_per_dim(x: jnp.ndarray) -> jnp.ndarray:
    axes = tuple(range(1, x.ndim))
    return jnp.sqrt(jnp.sum(x * x, axis=axes))


def _vsum(x: jnp.ndarray) -> jnp.ndarray:
    """Per-component reduction over mesh axes, keepdims for broadcasting
    (reference ``torch.sum(..., dim=var.mesh_axis)``, ``linalg.py:118-120``)."""
    axes = tuple(range(1, x.ndim))
    return jnp.sum(x, axis=axes, keepdims=True)


# Cache of compiled solver functions keyed by problem structure (bounded
# LRU — value-keyed entries used to grow without bound when a baked value
# changed per step; structure keys plus the cap make that impossible).
from collections import OrderedDict

_SOLVER_CACHE: OrderedDict = OrderedDict()
_SOLVER_CACHE_MAX = 64


def clear_cache() -> None:
    _SOLVER_CACHE.clear()


def _content_token(val, _seen=None):
    """Stable, content-based hash token for a BC value.

    The compiled solver closes over the BC objects, so the cache key must
    change whenever the *traced computation* would: ``id()`` is unsafe (a
    GC'd callable's id can be reused by a different one — advisor finding
    r1). Callables are keyed by bytecode + constants + closure contents
    (recursively, with a cycle guard for self-referential closures;
    callable *objects* by their ``__call__`` code + instance ``__dict__``),
    arrays by shape/dtype/bytes; as a result two freshly constructed but
    identical lambdas share one compiled solver, while changing a
    closed-over value forces a recompile.
    """
    if isinstance(val, (int, float, str, bool)) or val is None:
        return ("scalar", val)
    if _seen is None:
        _seen = set()
    if id(val) in _seen:
        return ("cycle",)
    _seen = _seen | {id(val)}
    if isinstance(val, (list, tuple)):
        return ("seq", tuple(_content_token(v, _seen) for v in val))
    if isinstance(val, dict):
        return (
            "dict",
            tuple(sorted(
                (str(k), _content_token(v, _seen)) for k, v in val.items()
            )),
        )
    if callable(val):
        import functools
        import inspect

        if isinstance(val, functools.partial):
            return (
                "partial",
                _content_token(val.func, _seen),
                _content_token(val.args, _seen),
                _content_token(val.keywords, _seen),
            )
        code = getattr(val, "__code__", None)
        if code is None:
            # bound methods / callable objects: key by the __call__ code
            # plus the instance state (id() would reintroduce the
            # GC'd-id-reuse staleness this function exists to prevent)
            call = getattr(val, "__call__", None)
            fn = getattr(call, "__func__", None)
            if fn is not None and getattr(fn, "__code__", None) is not None:
                state = getattr(val, "__dict__", None)
                return (
                    "callable_obj",
                    type(val).__qualname__,
                    fn.__code__.co_code,
                    _content_token(state, _seen) if state else (),
                )
            if inspect.isbuiltin(val) or inspect.isclass(val):
                mod = getattr(val, "__module__", "")
                return ("callable_named", mod, getattr(
                    val, "__qualname__", repr(type(val))
                ))
            return ("callable_opaque", type(val).__qualname__, id(val))
        cells = ()
        if getattr(val, "__closure__", None):
            cells = tuple(
                _content_token(c.cell_contents, _seen)
                for c in val.__closure__
            )
        consts = tuple(
            c.co_code if hasattr(c, "co_code") else _content_token(c, _seen)
            for c in (code.co_consts or ())
        )
        defaults = tuple(
            _content_token(d, _seen)
            for d in (getattr(val, "__defaults__", None) or ())
        )
        return ("callable", code.co_code, consts, cells, defaults)
    try:
        arr = np.asarray(val)
        return ("array", arr.shape, str(arr.dtype), hash(arr.tobytes()))
    except Exception:
        return ("opaque", type(val).__qualname__, id(val))


def _bc_signature(bcs) -> tuple:
    sig = []
    for bc in bcs or []:
        if getattr(bc, "streamable", False):
            # Streamed BC values are runtime operands of the compiled
            # solver (VERDICT r2 item 2): the cache keys only the
            # STRUCTURE; value changes (oscillating lid, pulsed inflow)
            # re-use the executable. jit itself retraces if the resolved
            # operand's shape/dtype changes.
            vkey = ("stream",)
            okey = ("stream",)
        else:
            vkey = _content_token(bc.bc_val)
            okey = _content_token(getattr(bc, "bc_val_opt", None))
        mkey = ()
        if bc.bc_type in ("obstacle_dirichlet", "obstacle_neumann"):
            # Obstacle masks are part of the operator (active-set mask) —
            # except DYNAMIC (moving-body) obstacles, whose mask streams
            # as a runtime operand (structure-keyed; round-3 item 10).
            if getattr(bc, "dynamic", False):
                mkey = ("stream-mask", bc.bc_mask.shape)
            else:
                mkey = (hash(bc.bc_mask.tobytes()),)
        sig.append((bc.bc_type, bc.bc_face, vkey, okey) + mkey)
    return tuple(sig)


def _seam_check(mask, paxes, dim: int) -> None:
    """The torus reduction drops the duplicate seam plane; a body
    intersecting it would silently lose solid cells."""
    for j in paxes:
        seam = tuple(-1 if k == j else slice(None) for k in range(dim))
        if mask[seam].any():
            raise NotImplementedError(
                "obstacle touches the periodic seam plane of "
                f"axis {j}; place bodies off the duplicate "
                "endpoint plane"
            )


def _periodic_axes(bcs, mesh_dim: int) -> tuple[int, ...]:
    """Axes whose BOTH faces are periodic."""
    count = [0] * mesh_dim
    for bc in bcs or []:
        if bc.bc_type == "periodic":
            count[bc.bc_face_dim] += 1
    return tuple(j for j in range(mesh_dim) if count[j] == 2)


def _reduce_periodic(terms, term_descs, tparams, x0, rhs, bcs, mesh):
    """De-duplicate periodic axes for the compiled solve.

    The reference grid stores both endpoints of a periodic axis
    (``linspace``, ``_mesh.py:84-96``) and patches the seam each iteration
    with an extrapolation BC (``bcs.py:265-280``) — only approximately
    enforcing the PDE at the seam. On the torus with the duplicate node
    dropped, ``jnp.roll`` IS the exact periodic stencil, so the solve runs
    on ``x[..., :-1]`` along periodic axes with pure central coefficients
    and no seam BC at all; the duplicate node is re-filled afterwards.
    """
    paxes = _periodic_axes(bcs, mesh.dim)
    if not paxes:
        return tparams, x0, rhs, list(bcs or []), None

    if any(d[0] == "custom" for d in term_descs):
        raise NotImplementedError(
            "custom operators + periodic axes: the torus reduction cannot "
            "transform an opaque operator; use non-periodic BCs or handle "
            "wrap inside the custom fn."
        )

    red = tuple(
        slice(None, -1) if (j - 1) in paxes else slice(None)
        for j in range(x0.ndim)
    )

    def reduce_full(a):
        return a[red]

    def fix_vec(vecs, j):
        """Reduce a per-axis coefficient tuple (3- or 5-vector): drop the
        duplicate entry on periodic axes and undo the seam surgery
        (coefficients are constant along a periodic axis, so fill with the
        mid value). Stays in HOST numpy — axis vectors are static
        metadata the solver's host analysis (fastdiag probe, sym_vecs,
        FD setup) must be able to read even when ``solve`` runs inside an
        outer trace (the fused whole-step capture), where any jnp op
        would return a tracer."""
        out = []
        for ax, cs in enumerate(vecs):
            if ax in paxes:
                n = cs[0].shape[0] - 1
                mid = n // 2
                out.append(
                    tuple(
                        np.full((n,), c[mid], dtype=c.dtype)
                        if isinstance(c, np.ndarray)
                        else jnp.full((n,), c[mid], dtype=c.dtype)
                        for c in cs
                    )
                )
            else:
                out.append(tuple(cs))
        return tuple(out)

    new_tparams = []
    for desc, tp in zip(term_descs, tparams):
        kind = desc[0]
        tp = dict(tp)
        if kind == "axis":
            tp["axis"] = fix_vec(tp["axis"], None)
        elif kind in ("div_field", "conv_field"):
            tp["adv"] = reduce_full(tp["adv"])
            tp["base"] = fix_vec(tp["base"], None)
        elif kind == "diff_field":
            # drop the duplicate seam nodes (anisotropic Γ keeps its
            # leading stack axis; isotropic has no leading axis at all)
            g = tp["gamma"]
            sel = red[1:] if g.ndim == len(red) - 1 else (
                (slice(None),) + tuple(red[1:])
            )
            tp["gamma"] = g[sel]
        new_tparams.append(tp)

    x0r = reduce_full(x0)
    rhsr = reduce_full(rhs)
    bcs_kept = [
        bc
        for bc in (bcs or [])
        if not (bc.bc_type == "periodic" and bc.bc_face_dim in paxes)
    ]
    return tuple(new_tparams), x0r, rhsr, bcs_kept, paxes


def _restore_periodic(x, paxes) -> jnp.ndarray:
    """Re-append the duplicate seam nodes after a reduced periodic solve."""
    for j in paxes:
        axis = 1 + j
        seam = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
        x = jnp.concatenate([x, seam], axis=axis)
    return x


def _neumann_row_scale_vecs(mesh, x0_shape, bcs_kept, paxes):
    """Per-axis row-scale vectors for the Neumann/Symmetry
    boundary-elimination asymmetry (``A[1,2]=2/3`` vs ``A[2,1]=1`` —
    scaling the surgered rows by 3/2 per axis restores exact symmetry;
    see the sym_vecs derivation in ``_build_solver``). Returns
    ``(dvs, any_scale)`` with ``dvs`` a list of 1-D numpy vectors, one
    per mesh axis (HOST numpy: this can run inside an outer trace)."""
    dvs = []
    any_scale = False
    for j in range(mesh.dim):
        n = x0_shape[1 + j]
        dv = np.ones(n)
        if not (paxes and j in paxes):
            for bc in bcs_kept:
                if (
                    getattr(bc, "bc_type", "") in ("neumann", "symmetry")
                    and bc.bc_face_dim == j
                ):
                    dv[1 if bc.bc_n_dir < 0 else n - 2] = 1.5
                    any_scale = True
        dvs.append(dv)
    return dvs, any_scale


def _null_shift_builder(vecs):
    """Deferred null-vector field: a callable the solver BUILDERS invoke
    inside their trace, composing the full ``(1, *nx)`` row-scale field
    from the per-axis vectors at RUN time. Materializing the outer
    product here (numpy at trace time, or a jnp closure constant XLA's
    folder collapses right back) embeds a full-grid literal in the
    program — measured round 5 as the dominant first-compile cost at
    bench sizes (a 512^3 literal is 530 MB). Behind the
    optimization_barrier the folder sees opaque n-vectors and the cube
    exists only fused into its consumers."""
    vecs = tuple(vecs)

    def build():
        ns = None
        for v in vecs:
            d = jax.lax.optimization_barrier(jnp.asarray(v))[None]
            ns = d if ns is None else ns * d
        return ns

    return build


def _torus_grid_and_dynamic_bcs(mesh, paxes, bcs_kept):
    """Per-call torus-reduction stage: the (lazy) reduced coordinate
    grid for BC callables, and per-call reduction + seam-checking of
    DYNAMIC (moving-body) obstacle masks. Dynamic masks must be reduced
    on EVERY solve — the body moves between cached solves, so a
    compile-miss-only reduction would stream full-grid masks into a
    reduced-shape executable (and a miss-only seam check would silently
    drop solid cells once the body walks onto the seam plane)."""
    grid_r = mesh.grid
    if not paxes:
        return grid_r, bcs_kept
    red = tuple(
        slice(None, -1) if j in paxes else slice(None)
        for j in range(mesh.dim)
    )
    # lazy reduced grid: coordinate cubes materialize only if a BC
    # callable actually reads them (a full cube per axis is real HBM)
    from pyapes_tpu.mesh._mesh import LazyGrid

    grid_r = LazyGrid(mesh, red)
    if any(getattr(bc, "dynamic", False) for bc in bcs_kept):
        import copy as _copy

        per_call = []
        for bc in bcs_kept:
            if getattr(bc, "dynamic", False):
                _seam_check(bc.bc_mask, paxes, mesh.dim)
                b2 = _copy.copy(bc)
                b2.bc_mask = bc.bc_mask[red]
                per_call.append(b2)
            else:
                per_call.append(bc)
        bcs_kept = per_call
    return grid_r, bcs_kept


def _commit_to_decomp(decomp, x0, rhs_r, tparams, mesh):
    """GSPMD tier: commit solve inputs to the domain decomposition — the
    jitted while_loop then partitions rolls into collective-permutes and
    dot products into all-reduces over the device mesh. Streamed
    per-point operands (advection fields, Γ) shard with the grid;
    everything else replicates."""
    for j, nd in enumerate(decomp.mesh_shape):
        if nd > 1 and x0.shape[1 + j] % nd != 0:
            raise ValueError(
                f"DomainDecomposition: grid axis {j} has "
                f"{x0.shape[1 + j]} active nodes (after periodic "
                f"de-duplication), not divisible by {nd} devices. "
                "Choose node counts divisible by the device count "
                "(periodic axes: 2^k + 1 nodes reduce to 2^k)."
            )
    shard = decomp.sharding(x0.ndim)
    x0 = jax.device_put(x0, shard)
    rhs_r = jax.device_put(rhs_r, shard)
    repl = decomp.replicated()
    tparams = tuple(
        {
            k: (
                jax.device_put(
                    v,
                    decomp.sharding(v.ndim, leading=v.ndim - mesh.dim)
                    if k == "gamma"
                    else shard,
                )
                if k in ("adv", "gamma")
                else jax.tree_util.tree_map(
                    lambda a: jax.device_put(a, repl), v
                )
            )
            for k, v in tp.items()
        }
        for tp in tparams
    )
    return x0, rhs_r, tparams


def _make_mg_spec(config, x0, var, mesh, paxes, term_descs, decomp, kernel):
    """The multigrid-preconditioner spec for ``precond: "mg"``: BC-aware
    level operators (Neumann/Symmetry faces get boundary-node elimination
    at every V-cycle level, matching the fine operator's rows — VERDICT
    r2 item 1), optional heterogeneous-Γ hierarchy, and the kernel-tier
    routing for the level smoothers. Tuning knobs ride ``mg_opts``
    ({"n_pre", "n_post", "n_coarse", "omega", "dtype", ...} — e.g.
    {"dtype": "bfloat16"} runs the V-cycle in bf16; the outer Krylov
    stays full precision)."""
    from pyapes_tpu.solver.multigrid import MGSpec

    mg_opts = dict(config.get("mg_opts") or {})
    cycle_dtype = mg_opts.pop("dtype", None)
    fk = [["dirichlet", "dirichlet"] for _ in range(mesh.dim)]
    for bc in var.bcs or []:
        if getattr(bc, "bc_type", "") in ("neumann", "symmetry"):
            fk[bc.bc_face_dim][0 if bc.bc_n_dir < 0 else 1] = "neumann"
    # Heterogeneous-diffusivity equations get Γ-aware level operators
    # (Γ restricted through the hierarchy, per-point Jacobi diagonals;
    # ``MGSpec.set_gamma``); Γ streams in via the precond_setup hook,
    # so Γ updates never recompile the preconditioned solver.
    vg_ids = [i for i, d in enumerate(term_descs) if d[0] == "diff_field"]
    return MGSpec(
        x0.shape[1:],
        [float(l) for l in np.asarray(mesh._lx_np)],
        paxes=paxes or (),
        dtype=x0.dtype,
        use_pallas=(
            decomp is None
            and (
                jax.default_backend() == "tpu"
                # kernel="pallas" forces the Pallas tiers on CPU
                # (interpret mode) so tests exercise the MG kernel
                # wiring end-to-end
                or kernel == "pallas"
            )
        ),
        rz=(mesh.coord_sys == "rz"),
        r_lower=float(mesh._lower_np[0]),
        cycle_dtype=cycle_dtype,
        # under a decomposition the finest V-cycle levels ride the
        # shard_map+Pallas operator (coarse levels: GSPMD jnp)
        decomp=(
            decomp
            if (
                decomp is not None
                and kernel in ("auto", "pallas")
                and (kernel == "pallas" or jax.default_backend() == "tpu")
            )
            else None
        ),
        face_kinds=tuple(tuple(p) for p in fk),
        var_gamma=bool(vg_ids),
        vg_avg=(term_descs[vg_ids[0]][6][1] if vg_ids else "arithmetic"),
        **mg_opts,
    )


def _fd_fallback_method(config, term_descs, tparams, bcs_kept, paxes, mesh):
    """Resolve ``method: "fastdiag"`` + ``fd_fallback``: return
    ``"fastdiag"`` when the equation is exactly separable (one
    constant-coefficient 3-point axis term + ddt terms, product active
    set, every axis diagonally symmetrizable — cheap O(n) host probe, no
    eigendecomposition), else the configured fallback Krylov method."""
    _ax = [i for i, d in enumerate(term_descs) if d[0] == "axis"]
    _dd = [i for i, d in enumerate(term_descs) if d[0] == "ddt"]
    fd_ok = (
        not mesh.obstacle
        and not any(
            getattr(bc, "bc_mask", None) is not None
            for bc in (bcs_kept or [])
        )
        and len(_ax) == 1
        and len(_ax) + len(_dd) == len(term_descs)
        and all(len(cs) == 3 for cs in tparams[_ax[0]]["axis"])
        and np.ndim(tparams[_ax[0]].get("param", 0.0)) == 0
    )
    if fd_ok:
        # an rz r-axis or an advection-carrying axis may not be
        # diagonally symmetrizable
        from pyapes_tpu.solver.fastdiag import (
            _symmetrize_similarity,
            axis_matrix_np,
        )

        _sl = list(boundary_slicer(mesh.dim, bcs_kept, mesh.coord_sys))
        if paxes:
            for j in paxes:
                _sl[j] = slice(None)
        try:
            for j in range(mesh.dim):
                _symmetrize_similarity(
                    axis_matrix_np(
                        *tparams[_ax[0]]["axis"][j],
                        active=_sl[j],
                        periodic=bool(paxes and j in paxes),
                    )
                )
        except ValueError:
            fd_ok = False
    return "fastdiag" if fd_ok else str(config["fd_fallback"]).lower()


def _select_kernel_tiers(config, x0, term_descs, tparams, paxes, decomp):
    """Which compute tier each operator family rides, from the config's
    ``kernel`` knob ("auto" | "pallas" | "jnp"), the shape/dtype support
    predicates, and the backend. Returns ``(kernel, use_pallas,
    use_sharded_pallas, advect_pallas, diff_pallas)``.

    * ``use_pallas`` — the fused axis-stencil Pallas kernel (TPU hot
      path); the jnp roll-sum is the portable fallback.
    * ``use_sharded_pallas`` — shard_map + ppermute halo exchange feeding
      the fused kernel per shard, under a domain decomposition.
    * ``advect_pallas`` / ``diff_pallas`` — the fused varying-advection
      and variable-Γ diffusion single-pass kernels.
    """
    from pyapes_tpu.ops.pallas_stencil import (
        pallas_padded_supported,
        pallas_supported,
    )

    kernel = config.get("kernel", "auto")
    if kernel == "pallas":
        # forced: unaligned grids ride the kernel via zero pad-and-crop
        # (exact, but measured SLOWER than the jnp rolls when the lane dim
        # pads far — e.g. 129 -> 256 — so "auto" never picks it)
        shape_ok = pallas_padded_supported(
            x0.shape[1:], x0.dtype, paxes or ()
        )
    elif kernel == "auto":
        shape_ok = pallas_supported(x0.shape[1:], x0.dtype)
    else:
        shape_ok = False
    use_pallas = (kernel == "pallas" and shape_ok) or (
        kernel == "auto"
        and shape_ok
        and decomp is None
        and jax.default_backend() == "tpu"
    )

    advect_pallas = False
    if (
        decomp is None
        and x0.ndim - 1 == 3
        and kernel in ("auto", "pallas")
        and any(d[0] in ("div_field", "conv_field") for d in term_descs)
    ):
        from pyapes_tpu.ops.pallas_advect import pallas_advect_supported

        advect_pallas = pallas_advect_supported(
            x0.shape[1:], x0.dtype
        ) and (kernel == "pallas" or jax.default_backend() == "tpu")

    diff_pallas = False
    if (
        decomp is None
        and x0.ndim - 1 == 3
        and x0.shape[0] == 1
        and kernel in ("auto", "pallas")
        and any(d[0] == "diff_field" for d in term_descs)
        and all(
            tp["gamma"].ndim == x0.ndim - 1
            for d, tp in zip(term_descs, tparams)
            if d[0] == "diff_field"
        )
    ):
        from pyapes_tpu.ops.pallas_advect import pallas_diff_supported

        diff_pallas = pallas_diff_supported(
            x0.shape[1:], x0.dtype
        ) and (kernel == "pallas" or jax.default_backend() == "tpu")

    use_sharded_pallas = False
    if decomp is not None and x0.ndim - 1 in (2, 3) and kernel in (
        "auto", "pallas"
    ):
        from pyapes_tpu.parallel.halo import sharded_pallas_supported

        use_sharded_pallas = sharded_pallas_supported(
            decomp, x0.shape[1:], x0.dtype
        ) and (kernel == "pallas" or jax.default_backend() == "tpu")

    return kernel, use_pallas, use_sharded_pallas, advect_pallas, diff_pallas


def _build_solver(
    method, criterion, tol, max_it, config, mesh, x0, grid_r,
    term_descs, tparams, bcs_kept, paxes, decomp, kernel,
    use_pallas, use_sharded_pallas, advect_pallas, diff_pallas,
    mg_spec, precond_kind, precond_setup,
):
    """Build one compiled solver for a problem STRUCTURE (cache miss
    path of ``solve``): static masks + BC reductions, operator assembly
    over the selected kernel tiers, symmetrization row scaling, fused
    operator+dot tiers, fast-diagonalization setup, and the method
    builder (``_build_cg`` / ``_build_bicgstab`` / ``_build_fastdiag``).
    Returns ``(compiled_fn, rhs_shift, sym_vecs)`` — the solver-cache
    entry. Pure function of its arguments; never touches the cache."""
    slicer = list(boundary_slicer(mesh.dim, bcs_kept, mesh.coord_sys))
    red_nx = list(mesh.nx)
    if paxes:
        for j in paxes:
            slicer[j] = slice(None)  # every torus node is active
            red_nx[j] -= 1
    red_nx_t, slicer_t, xdtype = tuple(red_nx), tuple(slicer), x0.dtype
    # Obstacle cells are pinned (Dirichlet) or dependent (Neumann
    # neighbor copies) and leave the active set. Under a torus
    # reduction the duplicate seam plane is dropped from the masks too
    # (bodies sit in the interior, so only non-body planes go; wrap
    # across the seam is the physical periodic neighbor).
    if paxes:
        import copy as _copy

        red_np = tuple(
            slice(None, -1) if j in paxes else slice(None)
            for j in range(mesh.dim)
        )
        reduced = []
        for bc in bcs_kept:
            kind = getattr(bc, "bc_type", "")
            if getattr(bc, "dynamic", False):
                # already reduced + seam-checked per call above
                reduced.append(bc)
            elif kind == "obstacle_dirichlet":
                _seam_check(bc.bc_mask, paxes, mesh.dim)
                b2 = _copy.copy(bc)
                b2.bc_mask = bc.bc_mask[red_np]
                reduced.append(b2)
            elif kind == "obstacle_neumann":
                _seam_check(bc.bc_mask, paxes, mesh.dim)
                b2 = _copy.copy(bc)
                b2.bc_mask = bc.bc_mask[red_np]
                b2.faces = [
                    (m[red_np], ax, sh, fdx)
                    for (m, ax, sh, fdx) in bc.faces
                ]
                reduced.append(b2)
            else:
                reduced.append(bc)
        bcs_kept = reduced
    excluded = None
    dyn_idxs = []
    for bi, bc in enumerate(bcs_kept):
        if getattr(bc, "bc_type", "") in (
            "obstacle_dirichlet", "obstacle_neumann"
        ):
            if getattr(bc, "dynamic", False):
                # Dynamic + periodic composes: the per-call block
                # above re-slices the CURRENT host mask every solve
                # (live mutation visible, seam-checked), so
                # ``stream_values`` streams a reduced-shape mask
                # into the reduced-shape executable.
                dyn_idxs.append(bi)
            else:
                excluded = (
                    bc.bc_mask
                    if excluded is None
                    else (excluded | bc.bc_mask)
                )
    M = _MaskSpec(red_nx_t, slicer_t, xdtype, excluded, dyn_idxs)
    apply_bcs = apply_bcs_fn(bcs_kept, grid_r)
    if use_pallas:
        from functools import partial

        from pyapes_tpu.ops.pallas_stencil import (
            pallas_axis_stencil_padded,
        )

        # kernel="pallas" forced on CPU (tests/debug) -> interpret mode
        interp = jax.default_backend() != "tpu"
        from pyapes_tpu.ops.pallas_stencil_v3 import (
            pallas_axis_stencil_v5,
            v5_supported,
        )

        stencil5_fn = (
            partial(pallas_axis_stencil_v5, interpret=interp)
            if (
                len(x0.shape) - 1 == 3
                and v5_supported(x0.shape[1:], x0.dtype)
            )
            else None
        )
        Aop = _make_Aop(
            term_descs,
            partial(
                pallas_axis_stencil_padded,
                paxes=paxes or (),
                interpret=interp,
            ),
            advect_pallas=advect_pallas,
            advect_interpret=interp,
            diff_pallas=diff_pallas,
            stencil5_fn=stencil5_fn,
        )
    elif use_sharded_pallas:
        from pyapes_tpu.parallel.halo import (
            make_sharded_advect_apply,
            make_sharded_pallas_apply,
            sharded_advect_supported,
        )

        interp = jax.default_backend() != "tpu"
        sp_apply = make_sharded_pallas_apply(
            decomp, mesh.dim, interpret=interp,
        )
        # nonlinear Div/Conv ride shard_map + ppermute too (halo
        # overlap + per-shard fused kernels where the block fits)
        sadv: dict = {}
        for ti, desc in enumerate(term_descs):
            if desc[0] in ("div_field", "conv_field"):
                if sharded_advect_supported(
                    decomp, x0.shape[1:], x0.dtype, desc[3]
                ):
                    sadv[ti] = make_sharded_advect_apply(
                        decomp,
                        "div" if desc[0] == "div_field" else "conv",
                        x0.shape[0],
                        desc[3],
                        desc[4],
                        desc[6],
                        interpret=interp,
                    )
        Aop = _make_Aop(term_descs, sp_apply, sharded_advect=sadv)
    else:
        Aop = _make_Aop(
            term_descs,
            advect_pallas=advect_pallas,
            advect_interpret=jax.default_backend() != "tpu",
            diff_pallas=diff_pallas,
        )
    # Neumann-obstacle shells are affine functions of their fluid
    # neighbors; fold the LINEAR (zero-flux) part into the operator so
    # search-direction products see the same reduced system as the
    # residual map. A nonzero flux contributes a constant shell shift
    # ``e``, eliminated below by ``rhs -= A_raw(e)`` — the iterate's
    # full affine BC application then makes the computed residual the
    # true one.
    obn = tuple(
        bc for bc in bcs_kept
        if getattr(bc, "bc_type", "") == "obstacle_neumann"
    )
    raw_Aop = Aop
    if obn:
        base_Aop = Aop

        def Aop(v, tp, _A=base_Aop, _obn=obn):
            for bc in _obn:
                v = bc.apply_linear(v, None)
            return _A(v, tp)
    # Symmetrization row scaling (CG + Neumann/Symmetry faces): the
    # boundary-node elimination makes the surgered rows nonsymmetric
    # (``A[1,2] = 2/3`` vs ``A[2,1] = 1``); scaling those rows by 3/2
    # per axis (a separable field ``D = kron_j D_j``) restores exact
    # symmetry, so CG on ``D A x = D b`` is rigorous — and matches the
    # symmetrized V-cycle preconditioner (``multigrid._dvec_np``).
    # Only pure diffusion/transient equations qualify (advection terms
    # are genuinely nonsymmetric; they go to BiCGSTAB anyway).
    sym_vecs = None
    if (
        method == "cg"
        and mesh.coord_sys == "xyz"
        and all(d[1] in ("laplacian", "ddt") for d in term_descs)
        # variable-Γ terms excluded: their surgered-row asymmetry is
        # Γ-dependent, not the fixed 2/3-vs-1 the 3/2 scale repairs
        and all(d[0] in ("axis", "ddt") for d in term_descs)
        and all(
            np.ndim(tp.get("param", 0.0)) == 0 for tp in tparams
        )
    ):
        dvs, any_scale = _neumann_row_scale_vecs(
            mesh, x0.shape, bcs_kept, paxes
        )
        if any_scale:
            # HOST numpy (not jnp): this block can run inside an
            # outer trace (fused-step capture with a cache miss);
            # jnp-created scales would be tracers and LEAK into the
            # cached closure, crashing later eager solves. Numpy
            # constants fold into the jitted program identically.
            sym_vecs = tuple(
                np.asarray(
                    dv.reshape(
                        tuple(
                            -1 if k == j else 1
                            for k in range(mesh.dim)
                        )
                    ),
                    dtype=x0.dtype,
                )
                for j, dv in enumerate(dvs)
            )
            sym_Aop = Aop

            def Aop(v, tp, _A=sym_Aop, _dv=sym_vecs):
                out = _A(v, tp)
                for d in _dv:
                    out = out * d[None]
                return out

    # Fused operator+dot: the CG alpha-dot rides inside the stencil
    # kernel (both tiles are register-resident — saves re-reading d
    # and A d). Round 3 generalizes beyond the single-term case to
    # EVERY {one axis term + any number of ddt terms} equation — the
    # transient heat/NS hot loop — by folding the ddt identity
    # ``c1 x`` into the axis-0 CENTER coefficient vector at runtime
    # (``c1 x + c2 A x`` IS an axis stencil; the merge is a tiny
    # traced vector op on streamed operands, so BDF2 bootstrap still
    # never recompiles).
    from pyapes_tpu.ops.pallas_stencil import pallas_supported

    Aop_dot = None
    ax_ids = [i for i, d in enumerate(term_descs) if d[0] == "axis"]
    ddt_ids = [i for i, d in enumerate(term_descs) if d[0] == "ddt"]
    if (
        method == "cg"
        and use_pallas
        and sym_vecs is None
        and not obn
        and len(ax_ids) == 1
        and len(ax_ids) + len(ddt_ids) == len(term_descs)
        and x0.ndim - 1 == 3
        # the dot kernel needs the exact (unpadded) shape
        and pallas_supported(x0.shape[1:], x0.dtype)
        and all(len(cs) == 3 for cs in tparams[ax_ids[0]]["axis"])
        and np.ndim(tparams[ax_ids[0]].get("param", 0.0)) == 0
    ):
        # (A BiCGSTAB analogue — a y-dot kernel fusing dot(r0, A p̂) /
        # dot(s, A ŝ) into the operator pass — was built in round 4 and
        # REMOVED in round 5: its only engagement window is a 3-D
        # {laplacian + ddt} BiCGSTAB solve, where CG/fastdiag are the
        # right solvers anyway, and it measured 1.08x there; the rz
        # implicit-RFP hot path that motivated it is 2-D and can never
        # ride a slab-resident 3-D kernel.)
        from pyapes_tpu.ops.pallas_stencil_db import (
            pallas_axis_stencil_dot,
        )

        i_ax = ax_ids[0]
        sign0 = term_descs[i_ax][2]
        has_p0 = term_descs[i_ax][5]
        ddt_signs = tuple(term_descs[i][2] for i in ddt_ids)

        _interp = jax.default_backend() != "tpu"

        def _merged_coeffs(tp):
            scale = sign0 * (tp[i_ax]["param"] if has_p0 else 1.0)
            coeffs = tuple(
                tuple(c * scale for c in cs) for cs in tp[i_ax]["axis"]
            )
            if ddt_ids:
                c1 = sum(
                    s * tp[i]["inv_dt"]
                    for s, i in zip(ddt_signs, ddt_ids)
                )
                ap0, ac0, am0 = coeffs[0]
                coeffs = ((ap0, ac0 + c1, am0),) + coeffs[1:]
            return coeffs

        def Aop_dot(v, tp):
            return pallas_axis_stencil_dot(
                _merged_coeffs(tp), v, interpret=_interp
            )

    def _fd_setup(why: str, for_precond: bool = False):
        # Shared setup for the fast-diagonalization DIRECT solve and
        # the FD PRECONDITIONER (solver/fastdiag.py). The DIRECT
        # solve demands an exactly-separable Kronecker sum: one
        # constant-coefficient 3-point axis term plus any number of
        # ddt (identity-shift) terms on a product active set. The
        # PRECONDITIONER relaxes this: multiple axis terms are
        # SUMMED (weights frozen at build time) and non-separable
        # terms (per-point advection, custom operators) are simply
        # left out — frozen-coefficient / operator-splitting
        # preconditioning, exact for the separable part.
        if obn or excluded is not None or dyn_idxs:
            raise ValueError(
                f"{why}: obstacles break the product structure of "
                "the active set — use cg/bicgstab with precond 'mg'"
            )
        exact_ax = (
            len(ax_ids) == 1
            and len(ax_ids) + len(ddt_ids) == len(term_descs)
        )
        # custom terms carrying a separable fd_hint (desc slot 6)
        # contribute frozen axis matrices to the PRECONDITIONER —
        # the implicit-RFP / operator-splitting case
        hint_ids = (
            [
                i
                for i, d in enumerate(term_descs)
                if d[0] == "custom" and d[6] is not None
            ]
            if for_precond
            else []
        )
        ok = (
            (len(ax_ids) >= 1 or hint_ids)
            and (exact_ax or for_precond)
            and all(
                len(cs) == 3
                for i in ax_ids
                for cs in tparams[i]["axis"]
            )
            and all(
                np.ndim(tparams[i].get("param", 0.0)) == 0
                for i in ax_ids
            )
        )
        if not ok:
            raise ValueError(
                f"{why}: equation must be one 3-point axis term "
                "(laplacian) plus ddt terms with scalar coefficients"
                + (
                    " (precond 'fd' also accepts extra terms, which"
                    " it ignores unless they carry an fd_hint)"
                    if for_precond else ""
                )
            )
        from pyapes_tpu.solver.fastdiag import FastDiag, axis_matrix_np

        def _axis_mats(i):
            return [
                axis_matrix_np(
                    *tparams[i]["axis"][j],
                    active=slicer_t[j],
                    periodic=bool(paxes and j in paxes),
                )
                for j in range(mesh.dim)
            ]

        i_ax = ax_ids[0] if ax_ids else None
        stream_ax = (
            (exact_ax or len(ax_ids) == 1) and not hint_ids
        )
        if stream_ax:
            # exactly one axis term: its scalar coefficient streams
            # through the diagonal symbol at run time
            mats = _axis_mats(i_ax)
        else:
            # several axis terms (e.g. constant-velocity advection +
            # diffusion) and/or hinted custom terms: sum the per-axis
            # matrices with the CURRENT sign*param weights baked in —
            # a frozen-coefficient preconditioner (c_ax pins to 1;
            # c_dt still streams)
            mats = None
            for i in ax_ids:
                w = float(term_descs[i][2]) * float(
                    tparams[i].get("param", 1.0)
                    if term_descs[i][5]
                    else 1.0
                )
                mi = _axis_mats(i)
                mats = (
                    [w * m for m in mi]
                    if mats is None
                    else [a + w * m for a, m in zip(mats, mi)]
                )
            for i in hint_ids:
                w = float(term_descs[i][2])
                mi = [
                    axis_matrix_np(
                        *term_descs[i][6][j],
                        active=slicer_t[j],
                        periodic=bool(paxes and j in paxes),
                    )
                    for j in range(mesh.dim)
                ]
                mats = (
                    [w * m for m in mi]
                    if mats is None
                    else [a + w * m for a, m in zip(mats, mi)]
                )
        fd_o = config.get("fd_opts") or {}
        fd = FastDiag(
            mats,
            dtype=x0.dtype,
            transform_dtype=fd_o.get("dtype"),
            precision=fd_o.get("precision", "highest"),
        )
        return fd, (i_ax if stream_ax else None)

    def _fd_scalars_fn(i_ax):
        # (c_ax, c_dt) of the diagonal symbol from the streamed
        # per-call term params — shared by the direct solve and the
        # preconditioner's trace-time setup hook. ``i_ax=None``
        # pins c_ax=1 (weights already baked into the matrices).
        if i_ax is not None:
            sign0 = term_descs[i_ax][2]
            has_p0 = term_descs[i_ax][5]
        dd = tuple(ddt_ids)
        ds = tuple(term_descs[i][2] for i in ddt_ids)

        def scalars(tp):
            if i_ax is None:
                c_ax = jnp.asarray(1.0, x0.dtype)
            else:
                c_ax = sign0 * (
                    tp[i_ax]["param"]
                    if has_p0
                    else jnp.asarray(1.0, x0.dtype)
                )
            c_dt = jnp.asarray(0.0, x0.dtype)
            for s, i in zip(ds, dd):
                c_dt = c_dt + s * tp[i]["inv_dt"]
            return c_ax, c_dt

        return scalars

    def _make_fd_precond(why):
        # FD preconditioner + its trace-time scalar hook. With
        # ``fd_fallback`` configured, a non-separable system (e.g.
        # obstacle BCs appended after model construction) silently
        # degrades to an unpreconditioned solve instead of raising.
        from pyapes_tpu.solver.fastdiag import FDPrecond

        try:
            fd, i_ax = _fd_setup(why, for_precond=True)
        except ValueError:
            if config.get("fd_fallback"):
                return None, None
            raise
        pre_scale = None
        if sym_vecs is not None:
            # the CG loop solves the row-scaled SPD system D A; the
            # eigen-solve inverts A, so feed it D^-1 r (the
            # composition is (D A)^-1 — exact and symmetric). DEFERRED
            # per-axis composition (same full-grid-literal hazard as
            # null_shift — see _null_shift_builder): each vector is
            # inverted and active-sliced on ITS axis on the host, the
            # outer product happens in-trace behind the barrier.
            pre_scale = _null_shift_builder(
                1.0
                / np.asarray(v)[
                    tuple(
                        slicer_t[j] if k == j else slice(None)
                        for k in range(mesh.dim)
                    )
                ]
                for j, v in enumerate(sym_vecs)
            )
        p = FDPrecond(
            fd,
            act_sel=(slice(None),) + tuple(slicer_t),
            pseudo=bool(config.get("nullspace") == "mean"),
            pre_scale=pre_scale,
        )
        _sc = _fd_scalars_fn(i_ax)

        def setup(tp, _p=p, _s=_sc):
            _p.set_scalars(*_s(tp))

        return p, setup

    if method == "fastdiag":
        fd, i_ax = _fd_setup("fastdiag")
        # compatibility weights for singular eliminated-Neumann
        # systems: the LEFT null vector is the separable row-scale
        # field (see _build_cg's null_shift derivation)
        null_shift = None
        if config.get("nullspace") == "mean":
            dvs, any_scale = _neumann_row_scale_vecs(
                mesh, x0.shape, bcs_kept, paxes
            )
            if any_scale:
                null_shift = _null_shift_builder(
                    np.asarray(dv, dtype=x0.dtype).reshape(
                        tuple(
                            -1 if k == j else 1 for k in range(mesh.dim)
                        )
                    )
                    for j, dv in enumerate(dvs)
                )
        fn = _build_fastdiag(
            Aop, apply_bcs, M, tol, max_it, fd,
            act_sel=(slice(None),) + tuple(slicer_t),
            scalars=_fd_scalars_fn(i_ax),
            project_mean=bool(config.get("nullspace") == "mean"),
            null_shift=null_shift,
        )
    elif method == "cg":
        if precond_kind in ("fd", "fastdiag"):
            precond, ps_fn = _make_fd_precond("precond 'fd'")
            if ps_fn is not None:
                precond_setup = ps_fn
        else:
            precond = (
                mg_spec.preconditioner() if mg_spec is not None else None
            )
        # fused dot(r, z): only when the interior mask is exactly the
        # MG mask (no obstacles, no torus reduction) so the in-kernel
        # dot equals vsum(r * z * M)
        precond_dot = None
        if (
            mg_spec is not None
            and mg_spec.can_fuse_rz()
            and excluded is None
            and not dyn_idxs
            and not paxes
            and not obn
        ):
            precond_dot = mg_spec.preconditioner_dot()
        fmg_init = (
            mg_spec.fmg_initializer()
            if (mg_spec is not None and mg_spec.fmg_init)
            else None
        )
        null_shift = None
        if sym_vecs is not None:
            # deferred: composed in-trace from the per-axis vectors (a
            # numpy outer product here would embed a full-grid literal)
            null_shift = _null_shift_builder(sym_vecs)
        fn = _build_cg(
            Aop, apply_bcs, M, tol, max_it, criterion, precond,
            project_mean=bool(config.get("nullspace") == "mean"),
            Aop_dot=Aop_dot, fmg_init=fmg_init,
            precond_dot=precond_dot, null_shift=null_shift,
            precond_setup=precond_setup,
        )
    else:
        if precond_kind in ("fd", "fastdiag"):
            precond, ps_fn = _make_fd_precond("precond 'fd'")
            if ps_fn is not None:
                precond_setup = ps_fn
        else:
            precond = (
                mg_spec.preconditioner() if mg_spec is not None else None
            )
        fmg_init = (
            mg_spec.fmg_initializer()
            if (mg_spec is not None and mg_spec.fmg_init)
            else None
        )
        fn = _build_bicgstab(
            Aop, apply_bcs, M, tol, max_it, criterion, precond,
            fmg_init=fmg_init, precond_setup=precond_setup,
        )
    # Nonzero-flux obstacle Neumann: eliminate the affine shell shift
    # ``e`` into the RHS (computed per call — the flux scale is static
    # but the raw operator may stream per-call coefficients).
    affine_obn = tuple(
        bc for bc in obn if getattr(bc, "bc_val", 0.0) != 0.0
    )
    if affine_obn:
        @jax.jit
        def rhs_shift(tp, _raw=raw_Aop, _bcs=affine_obn,
                      _shape=x0.shape, _dtype=x0.dtype):
            e = jnp.zeros(_shape, _dtype)
            for bc in _bcs:
                e = e + bc.affine_field(_shape, _dtype)
            return _raw(e, tp)
    else:
        rhs_shift = None
    if config.get("debug") == "nan":
        # In-loop NaN/div checking (SURVEY §5.2): checkify instruments
        # every float op INSIDE the compiled while_loop — opt-in (it
        # costs throughput) but pinpoints the first bad operation
        # instead of the post-solve "Invalid tolerance" symptom.
        from jax.experimental import checkify

        cfn = jax.jit(
            checkify.checkify(
                fn,
                errors=checkify.float_checks | checkify.nan_checks,
            )
        )

        def fn_checked(x0_, rhs_, tp_, bv_, _cfn=cfn):
            err, out = _cfn(x0_, rhs_, tp_, bv_)
            err.throw()
            return out

        return fn_checked, rhs_shift, sym_vecs
    else:
        # config {"donate": True}: donate the initial-guess buffer so
        # XLA aliases it with the while-loop state / solution output
        # — one full grid of HBM headroom (the difference between
        # fitting 768^3 on a 16 GB chip and RESOURCE_EXHAUSTED).
        # OPT-IN because donation invalidates the caller's x0 array:
        # a transient field whose ``save_old`` history still aliases
        # the passed tensor (VARo is the pre-solve VAR) must not
        # donate.
        donate = (0,) if config.get("donate") else ()
        return jax.jit(fn, donate_argnums=donate), rhs_shift, sym_vecs


def solve(var, rhs, eqs: dict, config, mesh) -> ReportType:
    """Dispatch to CG / BiCGSTAB (reference ``linalg.py:33-71``).

    Args:
        var: target ``Field`` (solution is written back to ``var``).
        rhs: right-hand side array (BC adjustments already folded in).
        eqs: equation-term records from ``Solver.set_eq``.
        config: ``FDMSolverConfig``. Optional ``{"donate": True}`` donates
            the initial-guess buffer into the compiled solve so XLA
            aliases it with the loop state/output — one full grid of HBM
            headroom (what fits 768^3 on a 16 GB chip). Opt-in: donation
            invalidates the caller's ``var()`` array, so any history that
            still aliases it (``VARo`` right after ``save_old``) must not
            donate.
        mesh: the mesh.
    """
    method = config["method"].lower()
    if method not in ("cg", "bicgstab", "fastdiag"):
        raise RuntimeError(
            "Linalg: solver supports CG, BICGSTAB and FASTDIAG. "
            f"{method=} is not supported."
        )
    assert min(mesh.nx) >= 3, "Linalg: minimum grid size is 3 per direction"

    tol = float(config.get("tol", 1e-6))
    max_it = int(config.get("max_it", 1000))
    report = bool(config.get("report", False))
    criterion = config.get("criterion", "delta")

    terms = [eqs[k] for k in sorted(eqs)]
    term_descs = tuple(_term_descriptor(rec) for rec in terms)
    tparams = tuple(_term_params(rec, d) for rec, d in zip(terms, term_descs))

    x0_full = var()
    tparams, x0, rhs_r, bcs_kept, paxes = _reduce_periodic(
        terms, term_descs, tparams, x0_full, rhs, var.bcs, mesh
    )
    if paxes:
        # On the torus no seam surgery is needed for spatially-varying
        # advection either — drop periodic kinds on reduced axes.
        term_descs = tuple(
            desc[:4]
            + (
                tuple(
                    ("none", "none") if j in paxes else desc[4][j]
                    for j in range(len(desc[4]))
                )
                if desc[0] in ("div_field", "conv_field", "diff_field")
                else desc[4],
            )
            + desc[5:]
            for desc in term_descs
        )

    decomp = config.get("decomp")
    if decomp is not None:
        x0, rhs_r, tparams = _commit_to_decomp(
            decomp, x0, rhs_r, tparams, mesh
        )

    kernel, use_pallas, use_sharded_pallas, advect_pallas, diff_pallas = (
        _select_kernel_tiers(config, x0, term_descs, tparams, paxes, decomp)
    )

    # Model-auto fastdiag with graceful fallback: models default to the
    # direct solver for the separable equations they OWN, but a user can
    # mutate fields afterwards (append dynamic-obstacle BCs, stream a
    # viscosity field). ``fd_fallback: "<method>"`` keeps those workflows
    # working: if the equation is not separable, the solve silently uses
    # the named Krylov method instead (with whatever ``precond`` the
    # config carries — fastdiag itself ignores it). An explicit
    # ``method: "fastdiag"`` WITHOUT fd_fallback still raises loudly.
    if method == "fastdiag" and config.get("fd_fallback"):
        method = _fd_fallback_method(
            config, term_descs, tparams, bcs_kept, paxes, mesh
        )

    # Multigrid-preconditioned CG: the reference has no preconditioner;
    # for Poisson-class problems this cuts O(N) CG iterations to O(10).
    precond_kind = config.get("precond")
    if method == "fastdiag":
        # the direct solver needs no preconditioner (a model's default
        # "mg" setting is simply ignored)
        precond_kind = None
    mg_spec = (
        _make_mg_spec(config, x0, var, mesh, paxes, term_descs, decomp,
                      kernel)
        if precond_kind == "mg"
        else None
    )

    # Trace-time hook: stream the (first) diff_field term's G into the
    # V-cycle hierarchy before the Krylov loop (loop-invariant level
    # fields; G stays a runtime operand).
    precond_setup = None
    if mg_spec is not None and mg_spec.var_gamma:
        i_vg = next(
            i for i, d in enumerate(term_descs) if d[0] == "diff_field"
        )

        def precond_setup(tp, _s=mg_spec, _i=i_vg):
            _s.set_gamma(tp[_i]["gamma"])

    # Content-based mesh signature (id() could alias after GC).
    mesh_sig = (
        mesh.nx,
        tuple(float(d) for d in mesh.dx_np),
        mesh.coord_sys,
        tuple(float(l) for l in np.asarray(mesh._lower_np)),
    )

    # ``fdm.custom`` fns key by CONTENT (bytecode + closure), not identity
    # (VERDICT r2 item: a per-step fresh closure used to recompile every
    # implicit RFP step); the raw fn object stays in term_descs for tracing.
    key_descs = tuple(
        d[:7] + (_content_token(d[7]),) if d[0] == "custom" else d
        for d in term_descs
    )

    key = (
        method,
        criterion,
        tol,
        max_it,
        x0.shape,
        str(x0.dtype),
        mesh_sig,
        _bc_signature(var.bcs),
        key_descs,
        paxes,
        decomp,
        use_pallas,
        use_sharded_pallas,
        advect_pallas,
        diff_pallas,
        mg_spec,
        precond_kind,
        config.get("nullspace"),
        config.get("debug"),
        tuple(sorted((config.get("fd_opts") or {}).items())),
        bool(config.get("donate")),
    )

    grid_r, bcs_kept = _torus_grid_and_dynamic_bcs(mesh, paxes, bcs_kept)

    if key not in _SOLVER_CACHE:
        _SOLVER_CACHE[key] = _build_solver(
            method, criterion, tol, max_it, config, mesh, x0, grid_r,
            term_descs, tparams, bcs_kept, paxes, decomp, kernel,
            use_pallas, use_sharded_pallas, advect_pallas, diff_pallas,
            mg_spec, precond_kind, precond_setup,
        )
        while len(_SOLVER_CACHE) > _SOLVER_CACHE_MAX:
            _SOLVER_CACHE.popitem(last=False)

    _SOLVER_CACHE.move_to_end(key)
    fn_c, rhs_shift, sym_vecs_c = _SOLVER_CACHE[key]
    # Runtime-streamed BC value operands (resolved once per solve call;
    # callables see the entry iterate and the field's current time).
    bc_vals = tuple(
        bc.stream_values(x0, grid_r, t=getattr(var, "t", None))
        if hasattr(bc, "stream_values")
        else None
        for bc in bcs_kept
    )
    if rhs_shift is not None:
        rhs_r = rhs_r - rhs_shift(tparams)
    if sym_vecs_c is not None:
        # the operator is row-scaled to symmetric; scale b identically
        for d in sym_vecs_c:
            rhs_r = rhs_r * d[None]
    x_final, itr, tol_final, hist = fn_c(x0, rhs_r, tparams, bc_vals)
    if paxes:
        x_final = _restore_periodic(x_final, paxes)

    if not config.get("sync", True):
        # Asynchronous solve: skip the device->host scalar fetch entirely.
        # Every fetch is a host sync — one full RTT (~35 ms) through a
        # tunneled backend, and a pipeline bubble even on local hardware.
        # A transient model stepping many solves per step (NS: dim
        # momentum + 1 pressure) can enqueue the WHOLE step without the
        # host ever blocking; the caller inspects convergence by fetching
        # the returned device scalars (or any dependent value) when it
        # actually needs them. NaN detection is deferred to that fetch.
        var.VAR = x_final
        out_async: ReportType = {
            "itr": itr, "tol": tol_final, "converge": True,
        }
        if config.get("history"):
            out_async["history"] = hist  # device array, NaN-padded
        return out_async

    # ONE device->host transfer for both scalars: on a tunneled backend
    # each fetch costs a full RTT (~35 ms on axon), so fetching ``itr``
    # and ``tol`` separately used to add a second RTT to every solve.
    itr_np, tol_np = jax.device_get((itr, tol_final))
    itr = int(itr_np)
    tol_final = float(tol_np)
    if np.isnan(tol_final) or np.isinf(tol_final):
        raise RuntimeError(f"Invalid tolerance detected! tol: {tol_final}")

    var.VAR = x_final

    converge = itr < max_it
    if method == "fastdiag":
        # the refinement's stagnation exit can stop before max_it at the
        # dtype's accuracy floor: converged means the tolerance was MET
        converge = tol_final <= tol
    if report:
        _solution_report(itr, tol_final, method.upper())
    out: ReportType = {"itr": itr, "tol": tol_final, "converge": converge}
    if config.get("history"):
        # per-iteration convergence measure (observability beyond the
        # reference's final-tol-only report, SURVEY §5.5)
        out["history"] = np.asarray(hist[:itr])
    return out


def _build_cg(
    Aop, apply_bcs, M, tolerance, max_it, criterion, precond=None,
    project_mean=False, Aop_dot=None, fmg_init=None, precond_dot=None,
    null_shift=None, precond_setup=None,
):
    """(Preconditioned) conjugate gradient as a ``lax.while_loop``
    (reference ``linalg.py:74-159``; the reference has no preconditioning).

    With ``precond`` (e.g. the multigrid V-cycle, ``solver/multigrid.py``)
    this is standard PCG: search directions come from ``z = P(r)``.

    ``project_mean`` solves on the zero-mean quotient space — required for
    singular all-Neumann (pressure) Poisson systems, where the constant
    null-space component otherwise grows without bound.
    """

    def cg_fn(x0, rhs, tparams, bc_vals=()):
        if precond_setup is not None:
            # stream runtime operands (e.g. a diff_field term's G) into
            # the preconditioner hierarchy — traced BEFORE the loop, so
            # the derived level fields are loop-invariant
            precond_setup(tparams)
        M_ = M.build_dynamic(bc_vals)

        def apply_bcs_(v):
            return apply_bcs(v, bc_vals if bc_vals else None)

        def demean(v):
            if not project_mean:
                return v
            return v - (_vsum(v * M_) / jnp.sum(M_)) * M_

        # Compatibility shift of the RHS. The eliminated Neumann operator's
        # left null vector is ``w = D 1`` (the row-scale field), NOT the
        # plain constant — so a mean-removed user rhs is genuinely
        # INCOMPATIBLE by ``c = sum(D b) != 0`` and the "solution" picks up
        # a spurious smooth component localized by ``D^-1`` (surgered
        # rows; caught by the quasi-2-D cavity reduction test). The
        # physically-right correction subtracts a CONSTANT from the
        # unscaled rhs until ``w``-compatible: on the scaled rhs that is
        # ``rhs -= (sum(rhs M) / sum(D M)) * D M``. Without row scaling
        # ``D = 1`` and this is the plain demean (a no-op for an already
        # mean-free rhs).
        if project_mean:
            if null_shift is not None:
                w = null_shift() * M_
                rhs = rhs * M_ - (_vsum(rhs * M_) / jnp.sum(w)) * w
            else:
                rhs = demean(rhs * M_)

        x = apply_bcs_(x0)
        if fmg_init is not None:
            # Full-multigrid initial guess: one extra operator apply + a
            # ~1.15-cycle FMG pass, typically worth several PCG iterations.
            # The relative-residual normalization keeps the PRE-FMG scale,
            # so the FMG reduction counts toward the tolerance.
            r_pre = (rhs - Aop(x, tparams)) * M_
            r0n = jnp.maximum(
                jnp.max(_l2_per_dim(r_pre)), jnp.finfo(x.dtype).tiny
            )
            x = apply_bcs_(x + fmg_init(r_pre) * M_)
            r = demean((rhs - Aop(x, tparams)) * M_)
        else:
            r = demean((rhs - Aop(x, tparams)) * M_)
            r0n = jnp.maximum(
                jnp.max(_l2_per_dim(r)), jnp.finfo(x.dtype).tiny
            )
        if precond_dot is not None:
            # the V-cycle output is already interior-masked and the final
            # post-smooth kernel emits sum(r * z) from register-resident
            # tiles (saves re-reading r and z every iteration)
            z, rz = precond_dot(r)
        else:
            z = precond(r) * M_ if precond is not None else r
            rz = _vsum(r * z)
        d = z

        def cond(s):
            x, r, d, rz, tol, itr, hist = s
            return jnp.logical_and(tol > tolerance, itr < max_it)

        def body(s):
            x, r, d, rz, tol, itr, hist = s
            if Aop_dot is not None:
                # d is active-set-masked, so the in-kernel dot over the
                # unmasked A d equals dot(d, M A d) exactly.
                Ad, dAd = Aop_dot(d, tparams)
                Ad = Ad * M_
            else:
                Ad = Aop(d, tparams) * M_
                dAd = _vsum(d * Ad)
            alpha = _nan0(rz / dAd)
            # No per-iteration BC application: every search direction is
            # interior-masked (z is masked by the preconditioner shell, d
            # inductively), so the iterate's boundary/shell values are
            # INVARIANT inside the loop — and nothing in the loop reads
            # them (the operator only ever applies to d; r updates
            # incrementally). BCs are applied once on entry and once at
            # exit. Dropping the six per-face dynamic-update-slices from
            # the hot loop saves their serialized kernel launches.
            x_new = x + alpha * d
            if project_mean:
                x_new = x_new - _vsum(x_new * M_) / jnp.sum(M_)
            r_new = demean(r - alpha * Ad)
            if criterion == "delta":
                tol_new = jnp.max(_l2_per_dim(x_new - x))
            else:
                tol_new = jnp.max(_l2_per_dim(r_new)) / r0n
            if precond_dot is not None:
                z_new, rz_new = precond_dot(r_new)
            else:
                z_new = precond(r_new) * M_ if precond is not None else r_new
                rz_new = _vsum(r_new * z_new)
            beta = _nan0(rz_new / rz)
            d_new = z_new + beta * d
            hist = hist.at[itr].set(tol_new.astype(jnp.float32))
            return (x_new, r_new, d_new, rz_new, tol_new, itr + 1, hist)

        tol0 = jnp.asarray(1.0, dtype=x.dtype)
        hist0 = jnp.full((max_it,), jnp.nan, dtype=jnp.float32)
        state = (x, r, d, rz, tol0, jnp.asarray(0, dtype=jnp.int32), hist0)
        x, r, d, rz, tol, itr, hist = jax.lax.while_loop(cond, body, state)
        # Exit-time BC application (boundary + obstacle-shell values were
        # loop-invariant; reconstruct the affine shells from the final
        # interior iterate here).
        return apply_bcs_(x), itr, tol, hist

    return cg_fn


def _build_fastdiag(
    Aop, apply_bcs, M, tolerance, max_it, fd, act_sel, scalars,
    project_mean=False, null_shift=None,
):
    """Fast-diagonalization direct solve wrapped in iterative refinement.

    Each "iteration" is ``x += FD(b - A x)`` — one operator apply (the
    same ``Aop`` the Krylov loop uses, so the reported tolerance is the
    TRUE relative residual) plus one Kronecker eigen-solve (six dense
    MXU contractions at 3-D). The refinement contracts by the one-pass
    transform accuracy per pass (measured ~1e-2 for f32 AND bf16
    factors, mildly size-dependent — see fastdiag.py), so ~3-4 passes
    reach 1e-6 where MG-PCG needs 5+ full V-cycles, and each pass is
    dense MXU work instead of HBM-bound stencils. The streamed scalars
    (``gamma``, ``1/dt``) enter only the diagonal symbol —
    dt/coefficient changes never recompile or re-factorize.

    The reported criterion is always the relative residual (a direct
    solver has no meaningful per-iteration delta).
    """

    def fd_fn(x0, rhs, tparams, bc_vals=()):
        M_ = M.build_dynamic(bc_vals)

        def apply_bcs_(v):
            return apply_bcs(v, bc_vals if bc_vals else None)

        def demean(v):
            if not project_mean:
                return v
            return v - (_vsum(v * M_) / jnp.sum(M_)) * M_

        if project_mean:
            # compatibility shift — equivalent to _build_cg's (which
            # works on the row-SCALED rhs): subtract the CONSTANT
            # ``c = <w, b> / <w, 1>`` that makes the UNSCALED rhs
            # orthogonal to the left null vector ``w`` (the separable
            # row-scale field for eliminated-Neumann systems; the plain
            # constant otherwise). After this the eigenspace zero-mode
            # component is numerically nil — the pseudo-inverse then
            # matches CG's quotient solve up to a constant.
            if null_shift is not None:
                w = null_shift() * M_
                rhs = rhs * M_ - (_vsum(rhs * w) / jnp.sum(w)) * M_
            else:
                rhs = demean(rhs * M_)

        c_ax, c_dt = scalars(tparams)

        x = apply_bcs_(x0)
        r = demean((rhs - Aop(x, tparams)) * M_)
        r0n = jnp.maximum(jnp.max(_l2_per_dim(r)), jnp.finfo(x.dtype).tiny)

        def cond(s):
            x, r, tol, itr, hist, stall = s
            return jnp.logical_and(
                jnp.logical_and(tol > tolerance, itr < max_it),
                jnp.logical_not(stall),
            )

        def body(s):
            x, r, tol, itr, hist, stall = s
            e = fd.solve(r[act_sel], c_ax, c_dt, pseudo=project_mean)
            x = x.at[act_sel].add(e)
            if project_mean:
                x = x - _vsum(x * M_) / jnp.sum(M_)
            r = demean((rhs - Aop(x, tparams)) * M_)
            tol_new = jnp.max(_l2_per_dim(r)) / r0n
            # A refinement pass contracts at the one-pass transform
            # accuracy (>=10x/pass in practice); <2x means the dtype's
            # accuracy floor is reached — stop instead of spinning to
            # max_it at an unreachable tolerance.
            stall = tol_new > 0.5 * tol
            hist = hist.at[itr].set(tol_new.astype(jnp.float32))
            return (x, r, tol_new, itr + 1, hist, stall)

        tol0 = jnp.asarray(1.0, dtype=x.dtype)
        hist0 = jnp.full((max_it,), jnp.nan, dtype=jnp.float32)
        state = (
            x, r, tol0, jnp.asarray(0, dtype=jnp.int32), hist0,
            jnp.asarray(False),
        )
        x, r, tol, itr, hist, _ = jax.lax.while_loop(cond, body, state)
        return apply_bcs_(x), itr, tol, hist

    return fd_fn


def _build_bicgstab(
    Aop, apply_bcs, M, tolerance, max_it, criterion, precond=None,
    fmg_init=None, precond_setup=None,
):
    """BiCGSTAB as a ``lax.while_loop`` (reference ``linalg.py:162-279``,
    after pykrylov). The reference's mid-loop early exit
    (``linalg.py:235-240``) becomes a ``lax.cond`` branch.

    With ``precond`` this is right-preconditioned BiCGSTAB: search vectors
    pass through ``P`` before the operator (useful for advection-dominated
    nonsymmetric systems, where CG does not apply).

    Robustness beyond the reference: BiCGSTAB breaks down once the
    residual reaches its attainable accuracy (rho -> 0, then the iterates
    explode); the loop detects residual blow-up past the best tol seen and
    exits, returning the BEST iterate rather than the last.
    """

    def bicg_fn(x0, rhs, tparams, bc_vals=()):
        if precond_setup is not None:
            precond_setup(tparams)
        M_ = M.build_dynamic(bc_vals)

        def apply_bcs_(v):
            return apply_bcs(v, bc_vals if bc_vals else None)

        x = apply_bcs_(x0)
        r0n_pre = None
        if fmg_init is not None:
            # Full-multigrid initial guess (parity with the CG builder):
            # one extra operator apply + a ~1.15-cycle FMG pass. The
            # relative-residual normalization keeps the PRE-FMG scale so
            # the FMG reduction counts toward the tolerance.
            r_pre = (rhs - Aop(x, tparams)) * M_
            r0n_pre = jnp.maximum(
                jnp.max(_l2_per_dim(r_pre)), jnp.finfo(x.dtype).tiny
            )
            x = apply_bcs_(x + fmg_init(r_pre) * M_)
        r0 = (rhs - Aop(x, tparams)) * M_
        r = r0
        p = jnp.zeros_like(r)
        v = jnp.zeros_like(r)
        one = jnp.ones((r.shape[0],) + (1,) * (r.ndim - 1), dtype=r.dtype)
        rho = one
        alpha = one
        omega = one
        rho_next = _vsum(r0 * r0)
        r0n = (
            r0n_pre
            if r0n_pre is not None
            else jnp.maximum(
                jnp.max(_l2_per_dim(r0)), jnp.finfo(x.dtype).tiny
            )
        )
        tol0 = jnp.sqrt(jnp.max(rho_next))

        def tol_of(vec):
            if criterion == "delta":
                return jnp.max(_l2_per_dim(vec))
            return jnp.max(_l2_per_dim(vec)) / r0n

        def cond(s):
            return jnp.logical_and(
                jnp.logical_not(s["finished"]), s["itr"] < max_it
            )

        def body(s):
            beta = _nan0(s["rho_next"] / s["rho"] * s["alpha"] / s["omega"])
            rho = s["rho_next"]
            p = s["r"] + beta * (s["p"] - s["omega"] * s["v"])
            p_hat = precond(p) * M_ if precond is not None else p
            v = Aop(p_hat, tparams) * M_
            r0v = _vsum(r0 * v)
            itr = s["itr"] + 1
            alpha = _nan0(rho / r0v)
            s_vec = s["r"] - alpha * v
            tol1 = tol_of(s_vec)
            early = tol1 <= tolerance

            def track_best(st):
                better = st["tol"] < st["best_tol"]
                st["best_x"] = jnp.where(better, st["x"], st["best_x"])
                st["best_tol"] = jnp.minimum(st["tol"], st["best_tol"])
                st["hist"] = s["hist"].at[s["itr"]].set(
                    st["tol"].astype(jnp.float32)
                )
                return st

            def do_early(_):
                # BCs are applied at loop exit (see the CG builder: search
                # vectors are interior-masked, so boundary values are
                # loop-invariant and unread inside the loop).
                x_new = s["x"] + alpha * p_hat
                return track_best({
                    "x": x_new,
                    "r": s_vec,
                    "p": p,
                    "v": v,
                    "rho": rho,
                    "rho_next": rho,
                    "alpha": alpha,
                    "omega": s["omega"],
                    "tol": tol1,
                    "itr": itr,
                    "finished": jnp.asarray(True),
                    "best_x": s["best_x"],
                    "best_tol": s["best_tol"],
                    "hist": s["hist"],
                })

            def do_full(_):
                s_hat = precond(s_vec) * M_ if precond is not None else s_vec
                t = Aop(s_hat, tparams) * M_
                ts = _vsum(t * s_vec)
                omega = _nan0(ts / _vsum(t * t))
                rho_next = -omega * _vsum(r0 * t)
                x_new = s["x"] + alpha * p_hat + omega * s_hat
                r_new = s_vec - omega * t
                tol2 = tol_of(r_new)
                # Stagnation == attainable accuracy passed; once BiCGSTAB
                # breaks down the residual explodes fast, so a growth of
                # 1e3x over the best tol seen is a reliable exit signal
                # (the best iterate is returned).
                breakdown = tol2 > 1e3 * jnp.minimum(s["best_tol"], tol2)
                return track_best({
                    "x": x_new,
                    "r": r_new,
                    "p": p,
                    "v": v,
                    "rho": rho,
                    "rho_next": rho_next,
                    "alpha": alpha,
                    "omega": omega,
                    "tol": tol2,
                    "itr": itr,
                    "finished": (tol2 <= tolerance) | breakdown,
                    "best_x": s["best_x"],
                    "best_tol": s["best_tol"],
                    "hist": s["hist"],
                })

            return jax.lax.cond(early, do_early, do_full, None)

        state = {
            "x": x,
            "r": r,
            "p": p,
            "v": v,
            "rho": rho,
            "rho_next": rho_next,
            "alpha": alpha,
            "omega": omega,
            "tol": tol0.astype(x.dtype),
            "itr": jnp.asarray(0, dtype=jnp.int32),
            "finished": jnp.asarray(False),
            "best_x": x,
            "best_tol": jnp.asarray(jnp.inf, dtype=x.dtype),
            "hist": jnp.full((max_it,), jnp.nan, dtype=jnp.float32),
        }
        out = jax.lax.while_loop(cond, body, state)
        # Return the best iterate seen (last == best in healthy runs),
        # with the loop-deferred BC application at exit.
        use_best = out["best_tol"] < out["tol"]
        x_out = jnp.where(use_best, out["best_x"], out["x"])
        tol_out = jnp.minimum(out["best_tol"], out["tol"])
        return apply_bcs_(x_out), out["itr"], tol_out, out["hist"]

    return bicg_fn


def _solution_report(itr: int, tol: float, method: str) -> None:
    print(f"\n{method}: The solution converged after {itr} iteration.")
    print(f"\ttolerance: {tol}")


def _write_report(itr: int, tol: float, converge: bool) -> ReportType:
    return {"itr": itr, "tol": tol, "converge": converge}
