"""OpenFOAM-inspired FDM solver driver (reference ``pyapes/solver/ops.py``).

Usage (identical surface to the reference, ``ops.py:30-38``):

    >>> fdm = FDM(config)
    >>> solver = Solver({"fdm": {"method": "cg", "tol": 1e-6, "max_it": 1000,
    ...                          "report": True}})
    >>> solver.set_eq(fdm.laplacian(1.0, var) == rhs)
    >>> solver.solve()
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from pyapes_tpu.solver import linalg
from pyapes_tpu.solver.linalg import ReportType
from pyapes_tpu.solver.fdm import Operators
from pyapes_tpu.solver.tools import SolverConfig
from pyapes_tpu.variables import Field


@dataclass(repr=False)
class Solver:
    """Finite-difference solver (reference ``ops.py:25-119``).

    Extensions over the reference:
      * ``config["fdm"]["criterion"]``: "delta" (reference behavior) or
        "residual" (true residual norm).
      * ``config["fdm"]["picard"]``: outer Picard sweeps for nonlinear Div
        terms (advecting field == solution field). The reference instead
        mutated the operator inside CG (``fdm.py:295-312``).
    """

    config: None | SolverConfig = None

    def set_eq(self, eq: Operators) -> None:
        """Capture the assembled equation: target var, term records, RHS;
        fold per-term RHS adjustments in (reference ``ops.py:47-81``).

        Unlike the reference, each adjustment is multiplied by the term's
        sign (the reference adds it unsigned, which would corrupt
        ``-fdm.laplacian(...)`` equations with Neumann BCs; that path is
        unexercised in its tests).
        """
        self.var = eq.var
        self.eqs = dict(eq.ops)
        self.rhs = eq.rhs

        if self.rhs is not None:
            for e in self.eqs:
                rec = self.eqs[e]
                sign = rec["sign"]
                if rec["name"] == "Ddt":
                    # History terms go to the RHS. Backward Euler:
                    # var_old/dt (semantics pinned by
                    # tests/test_fdm.py:292-294); active BDF2:
                    # (2 var_old - 0.5 var_oold)/dt.
                    from pyapes_tpu.solver.fdm import ddt_leading_coeff

                    tgt = rec["target"]
                    if ddt_leading_coeff(rec) > 1.0:
                        hist = 2.0 * tgt.VARo - 0.5 * tgt.VARoo
                    else:
                        hist = tgt.VARo
                    self.rhs = self.rhs + sign * hist / rec["dt"]
                elif rec["adjust_rhs"] is not None:
                    self.rhs = self.rhs + sign * rec["adjust_rhs"]()

        # Reset the shared operator state (reference ``ops.py:79-81``).
        eq.ops = {}
        eq.rhs = None

    def Aop(self, var: Field) -> jnp.ndarray:
        """Debug interface: apply the assembled (affine) operator to ``var``
        (reference ``ops.py:83-90``). For Ddt terms this includes the
        ``-var_old/dt`` constant, matching ``tests/test_fdm.py:292-294``."""
        assert self.eqs is not None, (
            "Solver: equation is missing. Did you forget to set_eq?"
        )
        return _Aop(var, self.eqs)

    def solve(self) -> ReportType:
        """Solve the captured linear system (reference ``ops.py:92-111``)."""
        assert self.var is not None and self.rhs is not None, (
            "Solver: target variable or rhs is missing. "
            "Didn't you forget to set equation?"
        )
        assert self.config is not None, "Solver: config is missing!"

        cfg = self.config["fdm"]
        n_picard = int(cfg.get("picard", 1))

        nonlinear = [
            e
            for e in self.eqs
            if self.eqs[e].get("adv") is not None
            and self.eqs[e]["param"][0] is self.var
        ]

        for sweep in range(max(1, n_picard)):
            self.report = linalg.solve(
                self.var, self.rhs, self.eqs, cfg, self.var.mesh
            )
            if not nonlinear or sweep == n_picard - 1:
                break
            # Refresh frozen advection from the new iterate.
            for e in nonlinear:
                self.eqs[e]["adv"] = self.var()

        return self.report

    def __repr__(self) -> str:
        desc = ""
        for op in self.eqs:
            desc += (
                f"{op} - {self.eqs[op]['name']}, "
                f"target: {self.eqs[op]['target']}, "
                f"param: {self.eqs[op]['param']}\n"
            )
        desc += f"{len(self.eqs) + 1} - RHS, input: {self.rhs}\n"
        return desc


def _Aop(target: Field, eqs: dict) -> jnp.ndarray:
    """Affine operator application for debugging/tests
    (reference ``ops.py:122-154``)."""
    x = target()
    res = jnp.zeros_like(x)
    for op in eqs:
        rec = eqs[op]
        if rec["name"] == "Ddt":
            from pyapes_tpu.solver.fdm import ddt_leading_coeff

            tgt = rec["target"]
            if ddt_leading_coeff(rec) > 1.0:
                res = res + rec["sign"] * (
                    1.5 * x - 2.0 * tgt.VARo + 0.5 * tgt.VARoo
                ) / rec["dt"]
            else:
                res = res + rec["sign"] * (x - tgt.VARo) / rec["dt"]
        else:
            res = res + rec["sign"] * rec["Aop"](rec, x)
    return res
