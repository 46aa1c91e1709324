#!/usr/bin/env python3
"""Demo: domain-decomposed Poisson solve over a device mesh.

Shards the grid across 8 devices (virtual CPU devices here; real TPU
chips in a pod) and solves with the same API — the decomposition is ONE
config entry. The stencil's neighbor accesses become ICI halo exchanges
(GSPMD collective-permutes, or explicit shard_map+ppermute feeding the
fused Pallas kernel with kernel="pallas"); the Krylov dot products become
all-reduces. The reference is strictly single-device (SURVEY §2).

Run:  python demos/sharded_poisson.py
"""
import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), ".."))
)

flags = _os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    _os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pyapes_tpu.geometry import Box  # noqa: E402
from pyapes_tpu.mesh import Mesh  # noqa: E402
from pyapes_tpu.parallel import DomainDecomposition  # noqa: E402
from pyapes_tpu.solver import FDM, Solver  # noqa: E402
from pyapes_tpu.variables import Field  # noqa: E402
from pyapes_tpu.variables.bcs import homogeneous_bcs  # noqa: E402


def solve(decomp):
    mesh = Mesh(Box[0:1, 0:1, 0:1], None, [32, 32, 32], dtype="single")
    var = Field(
        "p", 1, mesh,
        {"domain": homogeneous_bcs(3, 0.0, "dirichlet"), "obstacle": None},
        init_val=0.0,
    )
    rng = np.random.default_rng(0)
    rhs = jnp.asarray(rng.standard_normal((1, 32, 32, 32)), jnp.float32)
    cfg = {"method": "cg", "tol": 1e-8, "max_it": 2000, "report": False,
           "criterion": "residual", "precond": "mg"}
    if decomp is not None:
        cfg["decomp"] = decomp
    solver = Solver({"fdm": cfg})
    fdm = FDM()
    solver.set_eq(fdm.laplacian(1.0, var) == rhs)
    rep = solver.solve()
    return np.asarray(var()[0]), rep


def main() -> None:
    print(f"devices: {len(jax.devices())}")
    ref, rep0 = solve(None)
    print(f"single device : itr={rep0['itr']} tol={rep0['tol']:.2e}")
    for shape in [(2, 2, 2), (8, 1, 1)]:
        out, rep = solve(DomainDecomposition(shape))
        err = np.abs(out - ref).max()
        print(f"decomp {shape}: itr={rep['itr']} tol={rep['tol']:.2e} "
              f"max|diff vs single|={err:.2e}")
        assert err < 1e-8
    print("OK — sharded solves reproduce the single-device solution")


if __name__ == "__main__":
    main()
