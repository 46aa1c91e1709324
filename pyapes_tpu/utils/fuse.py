"""Whole-step fusion for transient models: ONE XLA program per step.

Why this exists (measured, round 3): a 128^3 lid-driven-cavity step spends
~20 ms in the four implicit solves but ~1.6 s in the *glue between them* —
the explicit advection/gradient/projection arithmetic runs eagerly, one XLA
executable per jnp primitive (~3,000 dispatches/step, cProfile:
``jax/_src/dispatch.py:apply_primitive`` dominates). The reference has the
same structure (eager torch ops between solver calls,
``/root/reference/pyapes/solver/ops.py:92-111``) — on TPU the fix is the
XLA-native one: trace the ENTIRE step (glue + the cached compiled solves,
which inline) into one jitted program, so a step is ONE dispatch and XLA
fuses every elementwise op between the solves.

Mechanics — state-swap capture: models mutate their ``Field`` objects in
place, so ``FusedStepRunner`` jits a wrapper that (1) swaps traced state
arrays into the live fields, (2) runs the model's unmodified Python
``step``, (3) returns the fields' new arrays as outputs, and (4) restores
the concrete pre-trace state in a ``finally`` so tracing never corrupts the
model. The per-step state is exactly what ``Field`` history carries
(``_VAR``/``_VARo``/``_VARoo``, fields.py:107-131) and the clocks; dt and t
stream as runtime operands, so adaptive dt and time-varying (streamed) BC
callables ride the SAME compiled step.

Structure is baked at capture time: BDF2's bootstrap coefficient
(``fdm.ddt_leading_coeff``, 1.0 until two history levels exist) is a
Python value, so warm eager steps run first (``model.run`` handles this)
and the fused program bakes the steady BDF2 form. Anything not traceable
(a BC callable that host-coerces a traced ``t``) raises ``JAXTypeError``
at capture with the model state untouched; ``model.run(fused=True)``
catches that and falls back to eager stepping.

Solver ``sync`` flags are forced off only for the DURATION of a fused
``step()`` call (a traced solve cannot host-fetch its convergence
scalars) and restored afterwards, so eager steps keep their synchronous
NaN/Inf tolerance guard. Host clocks after a fused step advance only for
the fields the eager step actually advances — capture records which
fields saw ``save_old``/``update_time`` inside the trace — so fused and
eager runs produce identical field metadata (checkpoint parity).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _solvers_of(model) -> list:
    """Every Solver instance hanging off the model (reports carry traced
    scalars after a capture and must be cleared so nothing host-reads a
    leaked tracer later)."""
    from pyapes_tpu.solver.ops import Solver

    return [v for v in vars(model).values() if isinstance(v, Solver)]


class FusedStepRunner:
    """Compile ``model.step(dt)`` — glue and solves — into one program.

    Args:
        model: a transient model exposing ``step(dt)`` and
            ``state_fields()`` (the Fields whose values/history evolve
            across steps). ``model.t`` is kept as a host float.
    """

    def __init__(self, model, fields=None, donate: bool = False):
        self.model = model
        self.fields = list(
            fields if fields is not None else model.state_fields()
        )
        # compiled lax.scan batches keyed by (length, diag_fn id)
        self._scan_cache: dict = {}
        # donate=True donates the state pytree into the compiled step so
        # XLA aliases each field's input buffer with its output (in-place
        # stepping: halves the state's HBM high-water across the program
        # boundary). OPT-IN: donation invalidates the PRE-step arrays, so
        # user code holding a reference across a step (``u0 = model.u()``
        # before, read after) would see a deleted buffer. The runner
        # itself never reads pre-step state after the call (``_unpack``
        # replaces every field array before returning).
        self._donate = bool(donate)
        self._compiled = None
        # per-field flags recorded during capture: did the eager step call
        # save_old (history shift) / update_time (clock advance) on this
        # field? Until capture runs, assume all do.
        self._hist_advanced = [True] * len(self.fields)
        self._t_advanced = [True] * len(self.fields)

    def _sync_off(self):
        """Force async solves (a traced solve cannot host-fetch its
        convergence scalars); returns the saved flags for restore."""
        saved = []
        for s in _solvers_of(self.model):
            if s.config is not None and "fdm" in s.config:
                saved.append((s, s.config["fdm"].get("sync", None)))
                s.config["fdm"]["sync"] = False
        return saved

    @staticmethod
    def _sync_restore(saved) -> None:
        for s, flag in saved:
            if flag is None:
                s.config["fdm"].pop("sync", None)
            else:
                s.config["fdm"]["sync"] = flag

    def _break_aliases(self) -> None:
        """Donation requires every donated leaf to own a distinct buffer,
        but eager init/stepping shares arrays freely (e.g. ``p._VARo``
        and ``dp._VARo`` both hold the init-time zeros). Copy the later
        duplicates — only when donating, only the aliased leaves, and in
        steady state never (the compiled step aliases each donated input
        to its own output, keeping buffers distinct)."""
        seen: set[int] = set()
        for f in self.fields:
            for tag in ("_VAR", "_VARo", "_VARoo"):
                a = getattr(f, tag, None)
                if a is None:
                    continue
                try:
                    p = a.unsafe_buffer_pointer()
                except Exception:
                    p = id(a)
                if p in seen:
                    setattr(f, tag, jnp.copy(a))
                else:
                    seen.add(p)

    # -- field state (traced leaves) ------------------------------------
    def _pack(self):
        return tuple(
            (f._VAR, f._VARo, getattr(f, "_VARoo", None))
            for f in self.fields
        )

    def _unpack(self, state) -> None:
        for f, (v, vo, voo) in zip(self.fields, state):
            f._VAR = v
            f._VARo = vo
            if voo is not None:
                f._VARoo = voo

    # -- python-side state the traced step mutates ----------------------
    def _save_host(self):
        return (
            self.model.t,
            [(f._t, f._dt, getattr(f, "_n_hist", 0)) for f in self.fields],
        )

    def _restore_host(self, saved) -> None:
        t, per_field = saved
        self.model.t = t
        for f, (ft, fdt, nh) in zip(self.fields, per_field):
            f._t = ft
            f._dt = fdt
            f._n_hist = nh

    def _make_core(self, diag_fn=None):
        """The pure per-step function ``(state, dt, t) -> (state', diag)``
        the jitted step and the scanned batch both trace. ``diag_fn``
        (optional) is called with the model while the traced post-step
        state is still swapped in — it must be pure jnp (device scalars/
        arrays out) and is how per-step diagnostics (body forces, probe
        values) accumulate ON DEVICE instead of as per-batch host fetches
        (round-4 finding: 3 host fetches per 25-step batch made the 2-D
        Schaefer-Turek run RTT-bound at ~35 ms/fetch)."""
        model = self.model
        runner = self

        def core(state, dt, t):
            saved_state = runner._pack()
            saved_host = runner._save_host()
            # the step may write traced intermediates into model attrs
            # (e.g. ``_nu_field``, ``_buoyancy``); restore a shallow
            # snapshot so no tracer survives the capture
            saved_attrs = dict(vars(model))
            try:
                runner._unpack(state)
                # stream the clock: time-varying streamed BC callables
                # (bcs.stream_values(..., t=...)) see a traced t and stay
                # inside the one compiled step
                model.t = t
                for f in runner.fields:
                    f._t = t
                model.step(dt)
                # record which fields the step actually advanced, so the
                # host-side clock advance after each fused step mirrors
                # the eager step exactly (p/dp carry no history there)
                runner._hist_advanced = [
                    getattr(f, "_n_hist", 0) > nh
                    for f, (_, _, nh) in zip(runner.fields, saved_host[1])
                ]
                runner._t_advanced = [
                    f._t is not t for f in runner.fields
                ]
                diag = diag_fn(model) if diag_fn is not None else None
                return runner._pack(), diag
            finally:
                runner._unpack(saved_state)
                runner._restore_host(saved_host)
                vars(model).clear()
                vars(model).update(saved_attrs)
                for s in _solvers_of(model):
                    # set_eq/solve left traced arrays behind; clear to
                    # "no equation set" so nothing host-reads a tracer
                    s.report = None
                    s.var = None
                    s.eqs = None
                    s.rhs = None

        return core

    def _capture(self):
        core = self._make_core(None)

        def step1(state, dt, t):
            new_state, _ = core(state, dt, t)
            return new_state

        return jax.jit(
            step1, donate_argnums=(0,) if self._donate else ()
        )

    def step(self, dt: float) -> None:
        saved_sync = self._sync_off()
        try:
            if self._compiled is None:
                self._compiled = self._capture()
            if self._donate:
                self._break_aliases()
            dtype = self.fields[0]._VAR.dtype
            new_state = self._compiled(
                self._pack(),
                jnp.asarray(dt, dtype=dtype),
                jnp.asarray(self.model.t, dtype=dtype),
            )
        finally:
            self._sync_restore(saved_sync)
        self._unpack(new_state)
        # advance the host clocks the traced step could not — only for
        # the fields the eager step advances (recorded at capture)
        self.model.t += dt
        for f, hist, tadv in zip(
            self.fields, self._hist_advanced, self._t_advanced
        ):
            if tadv:
                f._t += dt
            if hist:
                f._dt = dt
                f._n_hist = getattr(f, "_n_hist", 0) + 1

    def run(self, dt: float, n_steps: int) -> None:
        for _ in range(n_steps):
            self.step(dt)

    def run_batched(self, dt: float, n_steps: int, diag_fn=None):
        """``n_steps`` fused steps in ONE device dispatch (``lax.scan``
        over the captured step), with optional per-step on-device
        diagnostics.

        Why: on the tunneled backend even async per-step dispatch costs
        ~1 host RTT (~35 ms), which dominates small-grid (2-D) transient
        runs — the round-4 Schaefer-Turek anchor ran at 946 K
        cell-steps/s with ~39 ms/step of dispatch+fetch for ~ms of
        compute. Scanning the step makes a whole batch one dispatch and
        keeps the diagnostic time series on device.

        Args:
            dt: fixed step size for the batch (streams as an operand —
                different batches may use different dt without
                recompiling; a CHANGED ``n_steps`` compiles a new scan).
            n_steps: steps in this batch (static scan length).
            diag_fn: optional pure function ``model -> pytree of jnp``
                evaluated after each step on the traced post-step state
                (e.g. body forces, probe pressures). The batch returns
                the stacked pytree (leading axis ``n_steps``) as DEVICE
                arrays — fetch once per run, not per batch.

        Returns the stacked diagnostics pytree, or None without
        ``diag_fn``.
        """
        saved_sync = self._sync_off()
        try:
            key = (int(n_steps), id(diag_fn))
            compiled = self._scan_cache.get(key)
            if compiled is None:
                core = self._make_core(diag_fn)

                def scan_fn(state, dt_, t0):
                    def body(carry, _):
                        st, t = carry
                        st, diag = core(st, dt_, t)
                        return (st, t + dt_), diag

                    (st, _), diags = jax.lax.scan(
                        body, (state, t0), None, length=int(n_steps)
                    )
                    return st, diags

                compiled = jax.jit(
                    scan_fn, donate_argnums=(0,) if self._donate else ()
                )
                self._scan_cache[key] = compiled
            if self._donate:
                self._break_aliases()
            dtype = self.fields[0]._VAR.dtype
            new_state, diags = compiled(
                self._pack(),
                jnp.asarray(dt, dtype=dtype),
                jnp.asarray(self.model.t, dtype=dtype),
            )
        finally:
            self._sync_restore(saved_sync)
        self._unpack(new_state)
        self.model.t += dt * n_steps
        for f, hist, tadv in zip(
            self.fields, self._hist_advanced, self._t_advanced
        ):
            if tadv:
                f._t += dt * n_steps
            if hist:
                f._dt = dt
                f._n_hist = getattr(f, "_n_hist", 0) + n_steps
        return diags
