#!/usr/bin/env python3
"""1024^3 Poisson under 8-way domain decomposition (virtual devices).

The single-chip memory wall is documented in BASELINE.md: 1024^3 f32 is
a ~27 GiB live set vs 13.5-15.2 GiB usable HBM — it does NOT fit on one
v5e chip. The escape path the framework was built for is spatial domain
decomposition (``parallel/decomp.py``): shard the grid over a device
mesh, let GSPMD turn the fast-diagonalization eigen-transforms into
sharded contractions with XLA-inserted collectives.

Real multi-chip hardware is unavailable here (one tunneled chip), so
this script DEMONSTRATES the decomposed solve at the exact blocked size
on 8 virtual CPU devices (`xla_force_host_platform_device_count`): the
point is that the program compiles, the shards each hold 1/8 of every
cube (x, rhs, loop state — per-device buffer shapes are asserted), and
the solve converges to the same true-residual criterion as the
single-chip bench. Wall-clock on an emulated 1-core host is NOT a
performance number and is reported only for the record.

    python scripts/size_decomp_1024.py            # the full 1024^3
    PYAPES_DECOMP_N=256 python scripts/...        # quick validation
"""
import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax  # noqa: E402
import numpy as np  # noqa: E402

# the container's sitecustomize forces JAX_PLATFORMS=axon (the tunneled
# chip); virtual devices need the host CPU backend — config wins because
# backends initialize lazily
jax.config.update("jax_platforms", "cpu")

from pyapes_tpu.geometry import Box  # noqa: E402
from pyapes_tpu.mesh import Mesh  # noqa: E402
from pyapes_tpu.parallel import DomainDecomposition  # noqa: E402
from pyapes_tpu.solver.fdm import FDM  # noqa: E402
from pyapes_tpu.solver.ops import Solver  # noqa: E402
from pyapes_tpu.variables import Field  # noqa: E402
from pyapes_tpu.variables.bcs import homogeneous_bcs  # noqa: E402


def main() -> None:
    n = int(os.environ.get("PYAPES_DECOMP_N", "1024"))
    shape = (2, 2, 2)
    assert len(jax.devices()) == 8, jax.devices()

    mesh = Mesh(Box[0:1, 0:1, 0:1], None, [n, n, n], dtype="single")
    f_bc = homogeneous_bcs(3, 0.0, "dirichlet")
    var = Field("p", 1, mesh, {"domain": f_bc, "obstacle": None},
                init_val=0.0)
    # same fixed-seed random RHS as the single-chip bench (full spectral
    # content), generated directly in the sharded layout
    decomp = DomainDecomposition(shape)
    rhs = jax.random.normal(
        jax.random.PRNGKey(0), (1, n, n, n), dtype=var().dtype
    )

    # Method choice is memory-driven on the emulated host: the sharded
    # fast-diagonalization transforms all-gather the contracted axis
    # (each device temporarily holds full-axis slabs), which OOM-kills a
    # 125 GB host at 1024^3 — measured 2026-08-19 (the REAL multi-chip
    # fastdiag fit is per-chip HBM x n_chips with ICI all-gathers; the
    # emulation pays all 8 devices' gathers from ONE memory). The MG-PCG
    # path is communication-light (ghost-plane ppermutes + scalar psums)
    # and fits, and is the honest multi-chip recommendation anyway.
    method = os.environ.get("PYAPES_DECOMP_METHOD",
                            "cg" if n >= 512 else "fastdiag")
    cfg = {
        "method": method, "tol": 1e-6, "max_it": 40,
        "report": True, "criterion": "residual",
        "decomp": decomp, "donate": True,
    }
    if method == "cg":
        cfg["precond"] = "mg"
        cfg["mg_opts"] = {"dtype": "bfloat16", "n_pre": 2, "n_post": 2,
                          "omega": 0.857, "fmg": True}
    solver = Solver({"fdm": cfg})
    fdm = FDM()

    t0 = time.perf_counter()
    solver.set_eq(fdm.laplacian(1.0, var) == rhs)
    solver.solve()
    wall = time.perf_counter() - t0
    rep = solver.report

    # every cube is genuinely sharded: each of the 8 devices holds a
    # (1, n/2, n/2, n/2) shard, no device sees a full cube
    out = var()
    shard_shapes = {
        str(s.data.shape) for s in out.addressable_shards
    }
    per_dev_gib = (n // 2) ** 3 * 4 / 2**30

    result = {
        "phase": f"size_{n}_decomp",
        "ok": bool(rep["converge"]),
        "n": n,
        "method": method,
        "decomp": list(shape),
        "itr": int(rep["itr"]),
        "tol": float(rep["tol"]),
        "wall_s": round(wall, 1),
        "shard_shapes": sorted(shard_shapes),
        "per_device_cube_gib": round(per_dev_gib, 2),
        "note": ("8 virtual CPU devices (1-core host): correctness/"
                 "memory-layout demonstration at the single-chip-"
                 "blocked size, not a perf number"),
    }
    print(json.dumps(result))
    assert rep["converge"], rep
    assert shard_shapes == {f"(1, {n//2}, {n//2}, {n//2})"}, shard_shapes
    # the solution is real: residual criterion is the TRUE relative
    # residual by fastdiag construction; spot-check center value finite
    c = np.asarray(out[0, n // 2, n // 2, n // 2])
    assert np.isfinite(c), c


if __name__ == "__main__":
    main()
