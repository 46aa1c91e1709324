"""Simulation runner / CLI.

The reference's ``runner.py`` is an empty 2-line stub (``runner.py:1-2``);
this one actually runs the model templates from the command line:

    python -m pyapes_tpu.runner poisson --n 129 --dim 2
    python -m pyapes_tpu.runner cavity --n 65 --re 100 --steps 500
    python -m pyapes_tpu.runner burgers --steps 100
    python -m pyapes_tpu.runner rfp --n 40 --steps 200 --refresh 20

``--vtk PREFIX`` writes the final fields as a legacy-VTK file
(``utils/io.py``) for ParaView.
"""
from __future__ import annotations

import argparse
import json
import time


def _maybe_resume(args, model, fields) -> None:
    if getattr(args, "resume", None):
        from pyapes_tpu.utils.checkpoint import load

        load(args.resume, fields)
        # continue from the checkpointed simulation time
        model.t = max(float(f._t) for f in fields)


def _maybe_save(args, fields) -> None:
    if getattr(args, "save", None):
        from pyapes_tpu.utils.checkpoint import save

        save(args.save, fields)


def _maybe_vtk(args, mesh, fields: dict) -> dict:
    if not getattr(args, "vtk", None):
        return {}
    from pyapes_tpu.utils.io import write_vtk

    return {"vtk": write_vtk(args.vtk, mesh, fields)}


def _run_poisson(args) -> dict:
    from pyapes_tpu.geometry import Box
    from pyapes_tpu.mesh import Mesh
    from pyapes_tpu.models import PoissonSolver
    from pyapes_tpu.testing.poisson import poisson_bcs, poisson_rhs_nd

    box = Box[tuple(slice(0, 1) for _ in range(args.dim))]
    mesh = Mesh(box, None, [args.n] * args.dim, dtype=args.dtype)
    cfg = {"tol": args.tol, "max_it": args.max_it}
    if args.mg:
        cfg["precond"] = "mg"
    model = PoissonSolver(mesh, poisson_bcs(args.dim), config=cfg)
    tic = time.perf_counter()
    model.solve(poisson_rhs_nd(mesh, model.var))
    wall = time.perf_counter() - tic
    out = {"report": dict(model.report), "wall_s": wall, "n": args.n}
    out.update(_maybe_vtk(args, mesh, {"p": model.var()[0]}))
    return out


def _run_cavity(args) -> dict:
    from pyapes_tpu.geometry import Box
    from pyapes_tpu.mesh import Mesh
    from pyapes_tpu.models import LidDrivenCavity

    dim = getattr(args, "dim", 2)
    box = Box[tuple(slice(0, 1) for _ in range(dim))]
    mesh = Mesh(box, None, [args.n] * dim, dtype=args.dtype)
    nu = 1.0 / args.re
    model = LidDrivenCavity(
        mesh, nu=nu, lid_velocity=1.0,
        implicit_advection=getattr(args, "implicit_advection", False),
    )
    _maybe_resume(args, model, model.vel + [model.p])
    cfl = getattr(args, "adaptive_cfl", None)
    tic = time.perf_counter()
    if cfl:
        n_steps = model.run_adaptive(cfl, t_end=args.dt * args.steps)
    else:
        n_steps = args.steps
        model.run(dt=args.dt, n_steps=args.steps,
                  fused=getattr(args, "fused", False))
    wall = time.perf_counter() - tic
    _maybe_save(args, model.vel + [model.p])
    import numpy as np

    u = np.asarray(model.u()[0])
    mid = (u.shape[0] // 2,) * (dim - 1)
    out = {
        "wall_s": wall,
        "steps": n_steps,
        "u_centerline_min": float(u[mid].min()),
        "t": model.t,
    }
    fields = {v.name: v()[0] for v in model.vel}
    fields["p"] = model.p()[0]
    out.update(_maybe_vtk(args, mesh, fields))
    return out


def _run_burgers(args) -> dict:
    from math import pi

    from pyapes_tpu.geometry import Box
    from pyapes_tpu.mesh import Mesh
    from pyapes_tpu.models import Burgers1D

    mesh = Mesh(Box[0 : 2 * pi], None, [args.n], dtype=args.dtype)
    model = Burgers1D(mesh, nu=0.1)
    tic = time.perf_counter()
    for _ in range(args.steps):
        model.step(args.dt)
    wall = time.perf_counter() - tic
    out = {"wall_s": wall, "steps": args.steps, "t": model.var.t}
    out.update(_maybe_vtk(args, mesh, {"u": model.var()[0]}))
    return out


def _run_channel(args) -> dict:
    """Inflow/outflow channel, optionally with an immersed square body."""
    import numpy as np

    from pyapes_tpu.geometry import Box
    from pyapes_tpu.mesh import Mesh
    from pyapes_tpu.models import ChannelFlow

    obs = [Box[0.9:1.2, 0.35:0.65]] if args.obstacle else None
    mesh = Mesh(Box[0:3, 0:1], obs, [args.n, (args.n * 2) // 3 + 1],
                dtype=args.dtype)
    model = ChannelFlow(mesh, nu=args.nu, u_in=1.0)
    _maybe_resume(args, model, model.vel + [model.p])
    tic = time.perf_counter()
    model.run(dt=args.dt, n_steps=args.steps)
    wall = time.perf_counter() - tic
    _maybe_save(args, model.vel + [model.p])
    u = np.asarray(model.u()[0])
    out = {
        "wall_s": wall,
        "steps": args.steps,
        "flux_in": model.flux(1),
        "flux_out": model.flux(u.shape[0] - 2),
        "u_max": float(np.abs(u).max()),
    }
    if args.obstacle:
        drag, lift = model.body_force()
        out["drag"] = float(drag)
        out["lift"] = float(lift)
    out.update(
        _maybe_vtk(
            args, mesh,
            {"u": model.u()[0], "v": model.v()[0], "p": model.p()[0]},
        )
    )
    return out


def _run_convection(args) -> dict:
    """Boussinesq natural convection (de Vahl Davis benchmark cavity)."""
    from pyapes_tpu.geometry import Box
    from pyapes_tpu.mesh import Mesh
    from pyapes_tpu.models import NaturalConvection

    mesh = Mesh(Box[0:1, 0:1], None, [args.n, args.n], dtype=args.dtype)
    model = NaturalConvection(mesh, ra=args.ra, pr=args.pr)
    _maybe_resume(args, model, model.vel + [model.p, model.T])
    tic = time.perf_counter()
    model.run(dt=args.dt, n_steps=args.steps,
              fused=getattr(args, "fused", False))
    wall = time.perf_counter() - tic
    _maybe_save(args, model.vel + [model.p, model.T])
    out = {
        "wall_s": wall,
        "steps": args.steps,
        "t": model.t,
        "nusselt_hot_wall": model.nusselt_hot_wall(),
    }
    fields = {v.name: v()[0] for v in model.vel}
    fields["p"] = model.p()[0]
    fields["T"] = model.T()[0]
    out.update(_maybe_vtk(args, mesh, fields))
    return out


def _run_rfp(args) -> dict:
    """Self-consistent Rosenbluth-Fokker-Planck relaxation of an
    anisotropic Maxwellian (see ``models/rosenbluth.py``)."""
    import jax.numpy as jnp
    import numpy as np

    from pyapes_tpu.geometry import Cylinder
    from pyapes_tpu.mesh import Mesh
    from pyapes_tpu.models import RFPEvolution
    from pyapes_tpu.variables import Field

    L = args.vmax
    mesh = Mesh(
        Cylinder[0:L, -L:L], None, [args.n, 2 * args.n], dtype=args.dtype
    )
    R, Z = np.asarray(mesh._grid_np[0]), np.asarray(mesh._grid_np[1])
    f0 = np.exp(-(R**2) / (2 * args.t_perp) - Z**2 / (2 * args.t_par))
    f = Field("pdf", 1, mesh, None)
    f.set_var_tensor(jnp.asarray(f0))
    den0 = float(f.volume_integral()[0])

    model = RFPEvolution(mesh)
    tic = time.perf_counter()
    f = model.run_selfconsistent(
        f, dt=args.dt, n_steps=args.steps, refresh_every=args.refresh
    )
    wall = time.perf_counter() - tic
    den1 = float(f.volume_integral()[0])
    out = {
        "wall_s": wall,
        "steps": args.steps,
        "density_drift": abs(den1 - den0) / den0,
    }
    out.update(_maybe_vtk(args, mesh, {"pdf": f()[0]}))
    return out


def _run_darcy(args) -> dict:
    """Heterogeneous-permeability Darcy pressure solve (the conservative
    variable-coefficient Laplacian with K-aware MG-BiCGSTAB): reports
    inlet/outlet flux balance and the effective permeability vs the
    Wiener (harmonic/arithmetic mean) bounds."""
    import jax.numpy as jnp
    import numpy as np

    from pyapes_tpu.geometry import Box
    from pyapes_tpu.mesh import Mesh
    from pyapes_tpu.solver.fdm import FDM
    from pyapes_tpu.solver.ops import Solver
    from pyapes_tpu.variables import Field
    from pyapes_tpu.variables.bcs import mixed_bcs

    from pyapes_tpu.testing.darcy import (
        inlet_outlet_flux,
        log_normal_permeability,
    )

    n = args.n
    mesh = Mesh(Box[0:1, 0:1], None, [n, n], dtype=args.dtype)
    K = log_normal_permeability(mesh, seed=args.seed, contrast=args.contrast)

    bcs = mixed_bcs(
        [1.0, 0.0, 0.0, 0.0],
        ["dirichlet", "dirichlet", "neumann", "neumann"],
    )
    pf = Field("p", 1, mesh, {"domain": bcs}, init_val=0.0)
    solver = Solver(
        {
            "fdm": {
                "method": "bicgstab",
                "tol": args.tol,
                "max_it": args.max_it,
                "report": False,
                "criterion": "residual",
                "precond": "mg",
            }
        }
    )
    fdm = FDM()
    tic = time.perf_counter()
    solver.set_eq(
        fdm.laplacian(jnp.asarray(K), pf, avg=args.avg)
        == jnp.zeros((1, n, n))
    )
    rep = solver.solve()
    wall = time.perf_counter() - tic

    ph = np.asarray(pf()[0])
    Q_in, Q_out = inlet_outlet_flux(K, ph, mesh)
    out = {
        "report": dict(rep),
        "wall_s": wall,
        "n": n,
        "flux_in": Q_in,
        "flux_out": Q_out,
        "k_eff": 0.5 * (Q_in + Q_out),
        "k_harmonic": float(1.0 / np.mean(1.0 / K)),
        "k_arithmetic": float(np.mean(K)),
    }
    out.update(_maybe_vtk(args, mesh, {"p": ph, "K": K}))
    _maybe_save(args, [pf])
    return out


def main(argv=None) -> None:
    from pyapes_tpu.backend import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(prog="pyapes_tpu.runner")
    sub = p.add_subparsers(dest="case", required=True)

    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--n", type=int, default=65)
    common.add_argument("--dtype", default="single")
    common.add_argument("--tol", type=float, default=1e-6)
    common.add_argument("--max-it", type=int, default=2000)
    common.add_argument(
        "--platform", default=None, help="force jax platform (cpu/tpu)"
    )
    common.add_argument(
        "--vtk", default=None, metavar="PREFIX",
        help="write final fields as legacy VTK (ParaView)",
    )
    common.add_argument(
        "--save", default=None, metavar="PATH",
        help="checkpoint final field state to PATH.npz",
    )
    common.add_argument(
        "--resume", default=None, metavar="PATH",
        help="restore field state from PATH.npz before stepping",
    )

    sp = sub.add_parser("poisson", parents=[common])
    sp.add_argument("--dim", type=int, default=2, choices=[1, 2, 3])
    sp.add_argument("--mg", action="store_true", help="multigrid PCG")

    sc = sub.add_parser("cavity", parents=[common])
    sc.add_argument("--re", type=float, default=100.0)
    sc.add_argument("--dt", type=float, default=0.01)
    sc.add_argument("--steps", type=int, default=500)
    sc.add_argument("--dim", type=int, default=2, choices=[2, 3])
    sc.add_argument("--implicit-advection", action="store_true")
    sc.add_argument(
        "--adaptive-cfl", type=float, default=None, metavar="CFL",
        help="CFL-adaptive dt (integrates to t_end = dt * steps; "
        "dt streams as a runtime operand, so dt changes never recompile)",
    )
    sc.add_argument(
        "--fused", action="store_true",
        help="whole-step fusion (utils/fuse.py): compile the entire NS "
        "step — glue and solves — into ONE XLA program per step",
    )

    sb = sub.add_parser("burgers", parents=[common])
    sb.add_argument("--dt", type=float, default=0.01)
    sb.add_argument("--steps", type=int, default=100)

    sch = sub.add_parser("channel", parents=[common])
    sch.add_argument("--nu", type=float, default=0.05)
    sch.add_argument("--dt", type=float, default=0.005)
    sch.add_argument("--steps", type=int, default=400)
    sch.add_argument("--obstacle", action="store_true",
                     help="immersed square body in the channel")

    sv = sub.add_parser("convection", parents=[common])
    sv.add_argument("--ra", type=float, default=1e3)
    sv.add_argument("--pr", type=float, default=0.71)
    sv.add_argument("--dt", type=float, default=0.01)
    sv.add_argument("--steps", type=int, default=100)
    sv.add_argument("--fused", action="store_true",
                    help="whole-step fusion (one XLA program per step)")

    sd = sub.add_parser("darcy", parents=[common])
    sd.add_argument("--seed", type=int, default=7)
    sd.add_argument("--contrast", type=float, default=-2.5,
                    help="log-permeability of the inclusions")
    sd.add_argument("--avg", default="arithmetic",
                    choices=["arithmetic", "harmonic"],
                    help="face-transmissibility rule")

    sr = sub.add_parser("rfp", parents=[common])
    sr.add_argument("--dt", type=float, default=2e-4)
    sr.add_argument("--steps", type=int, default=100)
    sr.add_argument("--refresh", type=int, default=20)
    sr.add_argument("--vmax", type=float, default=4.5)
    sr.add_argument("--t-perp", type=float, default=0.36)
    sr.add_argument("--t-par", type=float, default=1.0)

    args = p.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.case == "poisson":
        out = _run_poisson(args)
    elif args.case == "cavity":
        out = _run_cavity(args)
    elif args.case == "channel":
        out = _run_channel(args)
    elif args.case == "rfp":
        out = _run_rfp(args)
    elif args.case == "convection":
        out = _run_convection(args)
    elif args.case == "darcy":
        out = _run_darcy(args)
    else:
        out = _run_burgers(args)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
