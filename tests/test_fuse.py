"""Fused whole-step runner (utils/fuse.py): the correctness-sensitive
fast path that compiles an entire transient NS step — explicit glue and
implicit solves — into ONE XLA program.

Covers (round-4 VERDICT item 1 + ADVICE r3): fused == eager state
equality for LidDrivenCavity and NaturalConvection, a post-fused eager
step (no leaked tracers), time-varying streamed lid BCs riding the
compiled step with a traced t, the eager fallback when a BC callable is
not traceable, solver ``sync`` flag restoration, and field-clock
metadata parity between the two paths (checkpoint consistency).
"""
import warnings

import numpy as np
import jax.numpy as jnp
import pytest

from pyapes_tpu.geometry import Box
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.models.navier_stokes import LidDrivenCavity


def _cavity(lid=1.0, sync=True):
    mesh = Mesh(Box[0:1, 0:1], None, [17, 17], dtype="double")
    return LidDrivenCavity(
        mesh, nu=0.05, lid_velocity=lid, config={"sync": sync}
    )


def _assert_state_close(m1, m2, atol=1e-9):
    for j in range(m1.mesh.dim):
        a, b = np.asarray(m1.vel[j]()), np.asarray(m2.vel[j]())
        np.testing.assert_allclose(a, b, atol=atol, err_msg=f"u{j}")
    np.testing.assert_allclose(
        np.asarray(m1.p()), np.asarray(m2.p()), atol=atol, err_msg="p"
    )


def test_fused_matches_eager_cavity():
    dt = 0.01
    m1 = _cavity()
    m2 = _cavity()
    m1.run(dt, 8)
    m2.run(dt, 8, fused=True)
    _assert_state_close(m1, m2)
    # a further eager step after fused stepping must still work (no
    # leaked tracers in solver/model state) and stay in lockstep
    m1.run(dt, 1)
    m2.run(dt, 1)
    _assert_state_close(m1, m2)


def test_fused_streamed_lid_callable():
    """A time-varying lid U(t) is evaluated with a TRACED t inside the
    fused capture (bcs.stream_values) — it must ride the one compiled
    step without recompiling or crashing (ADVICE r3, medium #1)."""
    dt = 0.01

    def lid(t):
        return 1.0 + 0.5 * jnp.sin(3.0 * t)

    m1 = _cavity(lid=lid)
    m2 = _cavity(lid=lid)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any eager fallback fails the test
        m2.run(dt, 8, fused=True)
    m1.run(dt, 8)
    _assert_state_close(m1, m2)
    # the fused program was captured (not fallen back) exactly once
    assert m2._fused is not None and m2._fused._compiled is not None


def test_fused_fallback_to_eager_on_untraceable_bc():
    """A BC callable that host-coerces the traced t cannot be captured;
    run(fused=True) must warn and fall back to eager with state intact
    (the docstring-promised behavior, ADVICE r3 medium #1)."""
    dt = 0.01

    def lid(t):
        return float(t) * 0.0 + 1.0  # float() on a tracer -> JAXTypeError

    m1 = _cavity(lid=lid)
    m2 = _cavity(lid=lid)
    m1.run(dt, 8)
    with pytest.warns(UserWarning, match="falling back to eager"):
        m2.run(dt, 8, fused=True)
    _assert_state_close(m1, m2, atol=1e-12)


def test_fused_restores_sync_flags():
    """Fused stepping forces async solves only for the DURATION of a
    fused step; eager steps afterwards keep their synchronous NaN/Inf
    tolerance guard (ADVICE r3, low #1)."""
    from pyapes_tpu.solver.ops import Solver

    m = _cavity(sync=True)
    solvers = [v for v in vars(m).values() if isinstance(v, Solver)]
    assert solvers, "model exposes no Solver attrs?"
    before = [s.config["fdm"].get("sync", None) for s in solvers]
    m.run(0.01, 5, fused=True)
    after = [s.config["fdm"].get("sync", None) for s in solvers]
    assert before == after, (before, after)


def test_fused_clock_metadata_parity():
    """Fused and eager runs must produce identical field metadata
    (t/dt/n_hist feed checkpoints, utils/checkpoint.py) — the fused
    clock advance touches only fields the eager step advances
    (ADVICE r3, low #2)."""
    dt = 0.01
    m1 = _cavity()
    m2 = _cavity()
    m1.run(dt, 6)
    m2.run(dt, 6, fused=True)
    for f1, f2 in zip(m1.state_fields(), m2.state_fields()):
        assert f1.n_hist == f2.n_hist, f1.name
        assert f1._dt == f2._dt, f1.name
        t1 = f1._t if f1._t is not None else None
        t2 = f2._t if f2._t is not None else None
        if t1 is None or t2 is None:
            assert t1 is t2, f1.name
        else:
            assert abs(float(t1) - float(t2)) < 1e-12, f1.name
    assert abs(m1.t - m2.t) < 1e-12


def test_fused_streams_dt_without_recompile():
    """dt is a runtime operand of the fused program: changing it between
    steps must not recompile and must match the eager dt sequence."""
    m1 = _cavity()
    m2 = _cavity()
    seq = [0.01, 0.01, 0.02, 0.005, 0.01, 0.02]
    for dt in seq:
        m1.step(dt)
    # warm the BDF2 bootstrap the same way run(fused=True) does
    m2.step(seq[0])
    m2.step(seq[1])
    runner = m2.fused_runner()
    for dt in seq[2:]:
        runner.step(dt)
    compiled = runner._compiled
    runner.step(0.01)  # one more, different dt again
    m1.step(0.01)
    assert runner._compiled is compiled  # same program object
    _assert_state_close(m1, m2)


def test_fused_natural_convection():
    """Buoyancy-coupled model (adds the T transport solve + T in the
    state): fused == eager including the temperature field."""
    from pyapes_tpu.models import NaturalConvection

    mesh = Mesh(Box[0:1, 0:1], None, [17, 17], dtype="double")
    dt = 0.0125

    def make():
        return NaturalConvection(mesh, ra=1e3, pr=0.71)

    m1, m2 = make(), make()
    m1.run(dt, 8)
    m2.run(dt, 8, fused=True)
    _assert_state_close(m1, m2)
    np.testing.assert_allclose(
        np.asarray(m1.T()), np.asarray(m2.T()), atol=1e-9, err_msg="T"
    )
    # post-fused eager step
    m1.run(dt, 1)
    m2.run(dt, 1)
    np.testing.assert_allclose(
        np.asarray(m1.T()), np.asarray(m2.T()), atol=1e-9
    )


def test_fused_donated_state_matches_eager():
    """``fused_runner(donate=True)`` donates the state pytree into the
    compiled step (in-place stepping, half the state HBM high-water) —
    must stay in lockstep with eager, survive many steps through the one
    executable, and leave the model usable for a further eager step."""
    dt = 0.01
    m1 = _cavity()
    m2 = _cavity()
    m1.run(dt, 8)
    # warm the BDF2 bootstrap eagerly (as run(fused=True) does), then
    # step through the donating runner directly
    while min(v.n_hist for v in m2.vel) < 2:
        m2.step(dt)
    r = m2.fused_runner(donate=True)
    assert r._donate is True
    r.run(dt, 8 - 2)
    _assert_state_close(m1, m2)
    # post-donation eager step: fields must hold live (undonated) buffers
    m1.run(dt, 1)
    m2.run(dt, 1)
    _assert_state_close(m1, m2)


def test_fused_periodic_flow_les():
    """PeriodicFlow (all-periodic torus NS) + Smagorinsky LES under the
    fused whole-step capture. Regression for the round-4 fix that made
    the solver's host analysis trace-safe: per-axis coefficient vectors,
    ``sym_vecs``, and FastDiag factors are HOST numpy, so the fastdiag
    ``fd_fallback`` probe (``linalg.solve``) and compile-path setup can
    run inside the capture — previously the periodic torus reduction
    handed the probe traced vectors and the capture ALWAYS fell back to
    eager stepping (TracerArrayConversionError)."""
    from math import pi

    from pyapes_tpu.models import PeriodicFlow
    from pyapes_tpu.models.navier_stokes import smagorinsky_viscosity

    n, L = 16, 2 * pi
    mesh = Mesh(Box[0:L, 0:L, 0:L], None, [n, n, n], dtype="double")

    def mk():
        m = PeriodicFlow(
            mesh, nu=1.0 / 1600.0,
            mu_strain_fn=smagorinsky_viscosity(1.0 / 1600.0, mesh, cs=0.17),
        )
        X, Y, Z = mesh.X, mesh.Y, mesh.Z
        m.set_velocity(
            jnp.sin(X) * jnp.cos(Y) * jnp.cos(Z),
            -jnp.cos(X) * jnp.sin(Y) * jnp.cos(Z),
            jnp.zeros_like(X),
        )
        return m

    dt = 0.05
    m1, m2 = mk(), mk()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        m2.run(dt, 4, fused=True)
        fellback = [x for x in w if "falling back" in str(x.message)]
    assert not fellback, f"fused capture fell back to eager: {fellback[0]}"
    assert m2._fused is not None and m2._fused._compiled is not None
    m1.run(dt, 4)
    _assert_state_close(m1, m2, atol=1e-9)
    # post-fused eager step: no leaked tracers in the solver cache
    # (numpy-vector regression guard), lockstep continues
    m1.run(dt, 1)
    m2.run(dt, 1)
    _assert_state_close(m1, m2, atol=1e-9)


def test_run_batched_matches_stepped():
    """ONE-dispatch scanned batch (``run_batched``) == per-step fused
    stepping: identical final state, correct clock advance, and the
    per-step on-device diagnostics series matches values computed by
    per-step host reads."""
    dt = 0.01
    m1 = _cavity()
    m2 = _cavity()

    # reference: per-step fused stepping with host-read diagnostics
    m1.run(dt, 2)  # BDF2 bootstrap
    ref_diag = []
    for _ in range(6):
        m1.run(dt, 1, fused=True)
        ref_diag.append(
            (float(jnp.mean(m1.vel[0]())), float(m1.p()[0][8, 8]))
        )

    def diag(model):
        return jnp.mean(model.vel[0]()), model.p()[0][8, 8]

    d = m2.run_batched(dt, 8, diag_fn=diag)
    _assert_state_close(m1, m2)
    assert m2.t == pytest.approx(m1.t)
    assert m2.vel[0].n_hist == m1.vel[0].n_hist
    # 2 bootstrap steps were eager -> 6 scanned steps of diagnostics
    um, pc = np.asarray(d[0]), np.asarray(d[1])
    assert um.shape == (6,) and pc.shape == (6,)
    ref = np.asarray(ref_diag)
    np.testing.assert_allclose(um, ref[:, 0], atol=1e-9)
    np.testing.assert_allclose(pc, ref[:, 1], atol=1e-9)

    # a further eager step must still work (no leaked tracers)
    m1.run(dt, 1)
    m2.run(dt, 1)
    _assert_state_close(m1, m2)


def test_run_batched_obstacle_force_series():
    """Scanned-batch diagnostics with the traced body forces: the last
    entry of the on-device series equals the host force evaluated on the
    final state."""
    from pyapes_tpu.geometry import MaskObstacle
    from pyapes_tpu.models import ChannelFlow

    body_fn = lambda X, Y: (X - 0.7) ** 2 + (Y - 0.5) ** 2 < 0.14**2
    mesh = Mesh(Box[0:2, 0:1], [MaskObstacle(body_fn)], [49, 25],
                dtype="double")
    model = ChannelFlow(mesh, nu=0.05, u_in=1.0)
    dt = 0.005

    def diag(m):
        return m.body_force_device(), m.body_force_cv_device(margin=3)

    d = model.run_batched(dt, 10, diag_fn=diag)
    F_st = np.asarray(d[0])
    F_cv = np.asarray(d[1])
    assert F_st.shape == (8, 2) and F_cv.shape == (8, 2)
    np.testing.assert_allclose(
        F_st[-1], model.body_force(), atol=1e-9
    )
    np.testing.assert_allclose(
        F_cv[-1], model.body_force_cv(margin=3), atol=1e-9
    )
