#!/usr/bin/env python3
"""Demo: Boussinesq natural convection in a differentially-heated cavity
(de Vahl Davis 1983 benchmark). Buoyancy-coupled NS + implicit heat
transport; prints the hot-wall Nusselt number vs the benchmark.

Run:  python demos/natural_convection.py [--ra 1e4]
"""
import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), ".."))
)

import argparse

import numpy as np

from pyapes_tpu.geometry import Box
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.models import NaturalConvection

BENCH = {1e3: 1.118, 1e4: 2.243, 1e5: 4.519}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ra", type=float, default=1e3)
    ap.add_argument("--n", type=int, default=49)
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--dt", type=float, default=0.01)
    args = ap.parse_args()

    mesh = Mesh(Box[0:1, 0:1], None, [args.n, args.n])
    model = NaturalConvection(mesh, ra=args.ra, pr=0.71)
    for k in range(args.steps // 20):
        model.run(dt=args.dt, n_steps=20)
        print(f"t={model.t:.2f}  Nu={model.nusselt_hot_wall():.4f}")
    nu = model.nusselt_hot_wall()
    ref = BENCH.get(args.ra)
    if ref:
        print(f"Nu = {nu:.4f}  (de Vahl Davis: {ref}; "
              f"diff {100 * abs(nu - ref) / ref:.1f}%)")
    u = np.asarray(model.u()[0])
    print(f"u_max = {np.abs(u).max():.3f}")


if __name__ == "__main__":
    main()
