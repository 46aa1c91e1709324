#!/usr/bin/env python3
"""Demo: Darcy flow through a heterogeneous porous medium.

Pressure solve  ∇·(K(x) ∇p) = 0  with the conservative
variable-coefficient Laplacian (``fdm.laplacian(K_array, p)``), a
log-normal permeability field with low-K inclusions, pressure-driven
left→right flow (Dirichlet inlet/outlet, no-flux walls). Prints the
inlet/outlet Darcy flux balance (discrete conservation check) and the
effective permeability vs the arithmetic/harmonic mean bounds (Wiener
bounds — any admissible K_eff must fall between them).

The reference's implicit Laplacian takes only a SCALAR coefficient
(``/root/reference/pyapes/solver/fdm.py:108-169``); heterogeneous K is
beyond it.

Run:  python demos/darcy_heterogeneous.py [--n 129]
"""
import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), ".."))
)

import argparse

import jax.numpy as jnp
import numpy as np

from pyapes_tpu.geometry import Box
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.solver.fdm import FDM
from pyapes_tpu.solver.ops import Solver
from pyapes_tpu.variables import Field
from pyapes_tpu.variables.bcs import mixed_bcs


from pyapes_tpu.testing.darcy import (  # noqa: E402
    inlet_outlet_flux,
    log_normal_permeability,
)


def permeability(mesh, seed: int = 7) -> np.ndarray:
    """Shared case generator (``pyapes_tpu.testing.darcy``)."""
    return log_normal_permeability(mesh, seed=seed)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=129)
    args = ap.parse_args()

    n = args.n
    mesh = Mesh(Box[0:1, 0:1], None, [n, n])
    K = permeability(mesh)

    # p=1 at x=0 (inlet), p=0 at x=1 (outlet), no-flux walls
    bcs = mixed_bcs(
        [1.0, 0.0, 0.0, 0.0],
        ["dirichlet", "dirichlet", "neumann", "neumann"],
    )
    p = Field("p", 1, mesh, {"domain": bcs}, init_val=0.0)

    fdm = FDM()
    solver = Solver(
        {
            "fdm": {
                "method": "bicgstab",  # Neumann walls: K-weighted rows
                "tol": 1e-10,
                "max_it": 8000,
                "report": True,
                "criterion": "residual",
                # K-aware V-cycle (levels carry the restricted K):
                # 129^2 high-contrast case 1230 -> 11 iterations
                "precond": "mg",
            }
        }
    )
    solver.set_eq(fdm.laplacian(jnp.asarray(K), p) == jnp.zeros((1, n, n)))
    rep = solver.solve()

    ph = np.asarray(p()[0])
    Q_in, Q_out = inlet_outlet_flux(K, ph, mesh)

    k_arith = float(np.mean(K))
    k_harm = float(1.0 / np.mean(1.0 / K))
    # dp/L = 1, width 1 -> K_eff = Q
    k_eff = 0.5 * (Q_in + Q_out)

    print(
        f"converged={rep['converge']} itr={rep['itr']} "
        f"tol={float(rep['tol']):.2e}"
    )
    print(f"flux in/out: {Q_in:.6f} / {Q_out:.6f} "
          f"(imbalance {abs(Q_in - Q_out) / abs(Q_in):.2e})")
    print(f"K_eff = {k_eff:.4f}  (harmonic {k_harm:.4f} "
          f"<= K_eff <= arithmetic {k_arith:.4f})")
    assert rep["converge"]
    assert abs(Q_in - Q_out) / abs(Q_in) < 0.02, "flux imbalance"
    assert k_harm - 1e-6 <= k_eff <= k_arith + 1e-6, "Wiener bounds violated"
    print("OK")


if __name__ == "__main__":
    main()
