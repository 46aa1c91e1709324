"""Rosenbluth-Fokker-Planck time evolution (rz velocity space).

Explicit stepping of ``df/dt = -div(f grad H) + div(hess(G) . grad f)``
using the conservative RFP operators (``solver/rfp.py``). The whole
multi-step evolution compiles to one ``lax.scan``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from pyapes_tpu.mesh import Mesh
from pyapes_tpu.solver.fdc import hessian, jacobian
from pyapes_tpu.solver.rfp import RFP
from pyapes_tpu.variables import Field


class RFPEvolution:
    """Explicit RFP stepper with frozen or self-consistent potentials.

    Args:
        mesh: rz (Cylinder) mesh.
        H: friction potential values (*nx); omit for self-consistent use
            (``run_selfconsistent`` solves them from f).
        G: diffusion potential values (*nx).
    """

    def __init__(self, mesh: Mesh, H=None, G=None, scheme: str = "central"):
        assert mesh.coord_sys == "rz"
        assert scheme in ("central", "muscl", "minmod")
        self.mesh = mesh
        self.jacH = None
        self.hessG = None
        if H is not None:
            self.set_potentials(H, G)
        self.rfp = RFP()
        # drift discretization for the EXPLICIT paths: "central"
        # (reference parity, friction_apply) or "muscl"/"minmod" (TVD
        # limited reconstruction, solver/rfp.py::friction_apply_muscl —
        # positivity-preserving for sharp distributions)
        self.scheme = scheme
        self._runner = None

    def _friction(self, Hr, Hz, pdf):
        from pyapes_tpu.solver.rfp import (
            friction_apply,
            friction_apply_muscl,
        )

        if self.scheme == "central":
            return friction_apply(Hr, Hz, pdf, self.mesh)
        lim = "mc" if self.scheme == "muscl" else "minmod"
        return friction_apply_muscl(Hr, Hz, pdf, self.mesh, limiter=lim)

    def set_potentials(self, H, G) -> None:
        """(Re)compute the potential derivatives used by the operators."""
        hp = Field("H", 1, self.mesh, None)
        gp = Field("G", 1, self.mesh, None)
        self.jacH = jacobian(hp.set_var_tensor(jnp.asarray(H)))
        self.hessG = hessian(gp.set_var_tensor(jnp.asarray(G)))

    def rhs(self, f: Field) -> jnp.ndarray:
        friction = self.rfp.friction(self.jacH, f)
        diffusion = self.rfp.diffusion(self.hessG, f)
        return -friction + diffusion

    def step_implicit(self, f: Field, dt: float, config=None) -> Field:
        """One backward-Euler step: ``(I/dt + Fr - Di) f_new = f/dt``,
        solved matrix-free via the ``fdm.custom`` operator hook (the RFP
        operator is linear in f with frozen potentials). Stable far beyond
        the explicit dt limit.

        Preconditioning (default): the frozen separable diagonal-diffusion
        surrogate of the operator (``rfp.rfp_fd_hint``) feeds the
        fast-diagonalization preconditioner — a direct eigen-solve of
        ``(I/dt - D̄_sep)`` per BiCGSTAB iteration made of dense MXU
        contractions. Disable with ``config={"precond": "none"}``."""
        from pyapes_tpu.solver.fdm import FDM
        from pyapes_tpu.solver.ops import Solver
        from pyapes_tpu.solver.rfp import (
            diffusion_apply,
            friction_apply,
            rfp_fd_hint,
        )

        mesh = self.mesh
        jacH, hessG = self.jacH, self.hessG

        def rfp_op(x, Hr, Hz, Drr, Drz, Dzz):
            return (
                friction_apply(Hr, Hz, x[0], mesh)
                - diffusion_apply(Drr, Drz, Dzz, x[0], mesh)
            )[None]

        cfg = {"method": "bicgstab", "tol": 1e-9, "max_it": 2000,
               "report": False, "precond": "fd", "fd_fallback": True}
        cfg.update(config or {})
        solver = Solver({"fdm": cfg})
        fdm = FDM()

        if f._dt is None:
            f.set_time(dt, 0.0)
        f.save_old()
        params = (jacH.r, jacH.z, hessG.rr, hessG.rz, hessG.zz)
        hint = (
            rfp_fd_hint(hessG.rr, hessG.zz, mesh)
            if cfg.get("precond") in ("fd", "fastdiag")
            else None
        )
        solver.set_eq(
            fdm.ddt(f)
            + fdm.custom(rfp_op, f, params=params, fd_hint=hint)
            == jnp.zeros_like(f())
        )
        solver.solve()
        f.update_time(dt)
        return f

    def run(self, f: Field, dt: float, n_steps: int) -> Field:
        """Advance ``n_steps`` with forward Euler inside one lax.scan."""
        from pyapes_tpu.solver.rfp import diffusion_apply

        jacH, hessG = self.jacH, self.hessG

        def step(pdf, _):
            upd = -self._friction(jacH.r, jacH.z, pdf[0]) + diffusion_apply(
                hessG.rr, hessG.rz, hessG.zz, pdf[0], self.mesh
            )
            return pdf + dt * upd[None], None

        pdf_final, _ = jax.lax.scan(step, f(), None, length=n_steps)
        f.set_var_tensor(pdf_final)
        return f

    # -- self-consistent evolution ---------------------------------------
    def _make_runner(self):
        """Jitted k-step explicit scan with the potential derivatives as
        runtime operands — compiled once, reused across refreshes."""
        from pyapes_tpu.solver.rfp import diffusion_apply

        mesh = self.mesh
        friction = self._friction

        def run_k(pdf, hr, hz, grr, grz, gzz, dt, k):
            def step(p, _):
                upd = (
                    -friction(hr, hz, p[0])
                    + diffusion_apply(grr, grz, gzz, p[0], mesh)
                )
                return p + dt * upd[None], None

            out, _ = jax.lax.scan(step, pdf, None, length=k)
            return out

        return jax.jit(run_k, static_argnums=(7,))

    def run_selfconsistent(
        self,
        f: Field,
        dt: float,
        n_steps: int,
        refresh_every: int = 1,
        pots=None,
        config: dict | None = None,
    ) -> Field:
        """Advance with potentials re-solved from f every ``refresh_every``
        steps (``RosenbluthPotentials``; the reference has no in-framework
        potential solve). The Poisson solves and the k-step scan are each
        compiled once; refreshes stream new operands only."""
        import numpy as np

        from pyapes_tpu.models.rosenbluth import RosenbluthPotentials

        if pots is None:
            pots = RosenbluthPotentials(
                self.mesh, np.asarray(f()[0]), config
            )
        if self._runner is None:
            self._runner = self._make_runner()

        pdf = f()
        done = 0
        warned = False
        while done < n_steps:
            k = min(refresh_every, n_steps - done)
            H, G = pots.solve(pdf[0])
            self.set_potentials(H, G)
            if not warned:
                # Forward-Euler diffusion stability estimate from the
                # actual diffusion tensor (hess G).
                warned = True
                D = float(
                    jnp.maximum(
                        jnp.abs(self.hessG.rr).max(),
                        jnp.abs(self.hessG.zz).max(),
                    )
                )
                h2 = float(min(self.mesh.dx_np)) ** 2
                dt_lim = 0.25 * h2 / max(D, 1e-30)
                if dt > dt_lim:
                    import warnings

                    warnings.warn(
                        f"explicit RFP step dt={dt:.2e} exceeds the "
                        f"diffusion stability estimate ~{dt_lim:.2e}; "
                        "expect divergence — reduce dt or use "
                        "step_implicit",
                        stacklevel=2,
                    )
            pdf = self._runner(
                pdf,
                self.jacH.r, self.jacH.z,
                self.hessG.rr, self.hessG.rz, self.hessG.zz,
                jnp.asarray(dt), k,
            )
            done += k
        f.set_var_tensor(pdf)
        return f
