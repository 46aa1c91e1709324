"""Checkpoint / profiling / runner tests."""
import json
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from pyapes_tpu.geometry import Box
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.utils import checkpoint
from pyapes_tpu.variables import Field


def test_checkpoint_roundtrip(tmp_path) -> None:
    mesh = Mesh(Box[0:1, 0:1], None, [9, 9])
    var = Field("u", 1, mesh, None, init_val="random")
    var.set_time(0.01, 0.5)
    var.save_old()
    var.VAR = var() * 2.0

    path = str(tmp_path / "ckpt")
    checkpoint.save(path, [var])

    var2 = Field("u", 1, mesh, None, init_val=0.0)
    checkpoint.load(path, [var2])

    assert_allclose(np.asarray(var2()), np.asarray(var()))
    assert_allclose(np.asarray(var2.VARo), np.asarray(var.VARo))
    assert var2._t == 0.5
    assert var2._dt == 0.01


def test_checkpoint_orbax_roundtrip(tmp_path) -> None:
    mesh = Mesh(Box[0:1], None, [9])
    var = Field("u", 1, mesh, None, init_val="random")
    var.set_time(0.1, 1.5)
    var.save_old()

    path = str(tmp_path / "orbax_ckpt")
    checkpoint.save_orbax(path, [var])

    var2 = Field("u", 1, mesh, None, init_val=0.0)
    checkpoint.load_orbax(path, [var2])
    assert_allclose(np.asarray(var2()), np.asarray(var()))
    assert var2._t == 1.5


def test_checkpoint_orbax_async(tmp_path) -> None:
    """Non-blocking save: wait_for_checkpoints makes it durable; the
    payload snapshot is taken at save time (later mutation is not
    captured)."""
    mesh = Mesh(Box[0:1], None, [9])
    var = Field("u", 1, mesh, None, init_val="random")
    var.set_time(0.1, 2.5)
    snap = np.asarray(var()).copy()

    path = str(tmp_path / "orbax_async")
    checkpoint.save_orbax(path, [var], block=False)
    # mutate after the async save started
    var.set_var_tensor(var() * 0.0)
    checkpoint.wait_for_checkpoints()

    var2 = Field("u", 1, mesh, None, init_val=0.0)
    checkpoint.load_orbax(path, [var2])
    assert_allclose(np.asarray(var2()), snap)
    assert var2._t == 2.5


def test_runner_poisson_cli() -> None:
    out = subprocess.run(
        [
            sys.executable, "-m", "pyapes_tpu.runner",
            "poisson", "--n", "33", "--dim", "2", "--dtype", "double",
            "--platform", "cpu",
        ],
        capture_output=True,
        text=True,
        env={
            **__import__("os").environ,
            "JAX_PLATFORMS": "cpu",
        },
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-800:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["report"]["converge"]


def test_runner_rfp_cli_with_vtk(tmp_path) -> None:
    vtk_prefix = str(tmp_path / "rfp")
    out = subprocess.run(
        [
            sys.executable, "-m", "pyapes_tpu.runner",
            "rfp", "--n", "24", "--steps", "10", "--refresh", "5",
            "--platform", "cpu", "--vtk", vtk_prefix,
        ],
        capture_output=True,
        text=True,
        env={
            **__import__("os").environ,
            "JAX_PLATFORMS": "cpu",
        },
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-800:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["density_drift"] < 1e-2
    from pyapes_tpu.utils.io import read_vtk

    back = read_vtk(res["vtk"])
    assert "pdf" in back["fields"]
    assert np.all(np.isfinite(back["fields"]["pdf"]))


def test_debug_validate_field() -> None:
    import pytest as _pytest

    from pyapes_tpu.utils.debug import divergence_guard, validate_field

    mesh = Mesh(Box[0:1], None, [9])
    var = Field("u", 1, mesh, None, init_val=1.0)
    validate_field(var)  # finite: ok

    var.VAR = var() * jnp.nan
    with _pytest.raises(FloatingPointError):
        validate_field(var)

    divergence_guard({"itr": 3, "tol": 1e-7, "converge": True})
    with _pytest.raises(RuntimeError):
        divergence_guard({"itr": 3, "tol": float("inf"), "converge": False})


def test_checkpoint_bdf2_state_roundtrip(tmp_path) -> None:
    """BDF2 history (VARoo, n_hist) survives save/load on both backends,
    and a resumed BDF2 run bit-matches the uninterrupted one (round-1 gap:
    a resume silently re-bootstrapped as backward Euler)."""
    from math import pi

    from pyapes_tpu.solver.fdm import FDM
    from pyapes_tpu.solver.ops import Solver
    from pyapes_tpu.variables.bcs import homogeneous_bcs

    mesh = Mesh(Box[0:1], None, [33])

    def make_var():
        v = Field(
            "u", 1, mesh,
            {"domain": homogeneous_bcs(1, 0.0, "dirichlet"),
             "obstacle": None},
        )
        v.set_var_tensor(jnp.sin(pi * mesh.X)[None])
        v.set_time(0.01, 0.0)
        return v

    solver = Solver(
        {"fdm": {"method": "cg", "tol": 1e-13, "max_it": 2000,
                 "report": False, "criterion": "residual"}}
    )
    fdm = FDM()

    def step(v, n):
        for _ in range(n):
            v.save_old()
            solver.set_eq(
                fdm.ddt(v, scheme="bdf2") - fdm.laplacian(0.5, v) == 0.0
            )
            solver.solve()
            v.update_time()

    # Uninterrupted: 6 BDF2 steps
    v1 = make_var()
    step(v1, 6)

    # Interrupted at 3 + checkpoint + resume into a fresh Field
    v2 = make_var()
    step(v2, 3)
    checkpoint.save(str(tmp_path / "bdf2"), [v2])

    v3 = make_var()
    checkpoint.load(str(tmp_path / "bdf2"), [v3])
    assert v3.n_hist == v2.n_hist
    assert_allclose(np.asarray(v3.VARoo), np.asarray(v2.VARoo))
    step(v3, 3)
    assert_allclose(np.asarray(v3()), np.asarray(v1()), atol=1e-14)

    # Orbax backend: same state round-trip + dt=0.0 sentinel behavior
    v2.set_time(0.0, v2.t)  # legitimately-zero dt must round-trip
    checkpoint.save_orbax(str(tmp_path / "bdf2_orbax"), [v2])
    v4 = make_var()
    checkpoint.load_orbax(str(tmp_path / "bdf2_orbax"), [v4])
    assert v4.n_hist == v2.n_hist
    assert v4._dt == 0.0
    assert_allclose(np.asarray(v4.VARoo), np.asarray(v2.VARoo))


def test_checkpoint_resume_transient(tmp_path) -> None:
    """Resume from a checkpoint reproduces the uninterrupted run exactly."""
    from math import pi

    from pyapes_tpu.models import Burgers1D

    mesh = Mesh(Box[0 : 2 * pi], None, [65])

    # Uninterrupted: 10 steps
    m1 = Burgers1D(mesh, nu=0.1)
    for _ in range(10):
        m1.step(0.01)

    # Interrupted at 5, checkpointed, resumed in a fresh model
    m2 = Burgers1D(mesh, nu=0.1)
    for _ in range(5):
        m2.step(0.01)
    checkpoint.save(str(tmp_path / "burgers"), [m2.var])

    m3 = Burgers1D(mesh, nu=0.1)
    checkpoint.load(str(tmp_path / "burgers"), [m3.var])
    assert m3.var.t == m2.var.t
    for _ in range(5):
        m3.step(0.01)

    assert_allclose(np.asarray(m3.var()), np.asarray(m1.var()), atol=1e-12)
