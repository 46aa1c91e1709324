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

    def _capture(self):
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
                return runner._pack()
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

        return jax.jit(
            core, donate_argnums=(0,) if self._donate else ()
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
