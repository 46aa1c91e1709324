"""Pallas kernel tests (interpret mode on CPU; the same kernels compile
via Mosaic on TPU — shape/alignment gating in ``pallas_supported``).

The oracle is the jnp roll-sum stencil (``ops/stencil.py``)."""
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pyapes_tpu.ops.pallas_stencil import (
    _sublane,
    pallas_axis_stencil,
    pallas_jacobi3d,
    pallas_supported,
)
from pyapes_tpu.ops.pallas_stencil_db import (
    pallas_axis_stencil_db,
    pallas_axis_stencil_dot,
    pallas_jacobi3d_db,
)
from pyapes_tpu.ops.stencil import apply_axis_stencil


def _coeffs(shape, dtype):
    rng = np.random.default_rng(3)
    out = []
    for n in shape:
        out.append(tuple(
            jnp.asarray(rng.standard_normal(n), dtype=dtype)
            for _ in range(3)
        ))
    return tuple(out)


def _x(shape, dtype):
    rng = np.random.default_rng(7)
    return jnp.asarray(rng.standard_normal((1,) + shape), dtype=dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(8, 16, 128), (16, 32, 128)])
def test_stencil3d_interpret(dtype, shape) -> None:
    assert pallas_supported(shape, dtype)
    x = _x(shape, dtype)
    coeffs = _coeffs(shape, dtype)
    ref = apply_axis_stencil(coeffs, x.astype(jnp.float32))
    tol = 1e-6 if dtype == jnp.float32 else 0.1
    out = pallas_axis_stencil(coeffs, x, interpret=True)
    assert out.dtype == dtype
    assert_allclose(np.asarray(out, np.float64), np.asarray(ref),
                    rtol=tol, atol=tol)
    out_db = pallas_axis_stencil_db(coeffs, x, interpret=True)
    assert_allclose(np.asarray(out_db, np.float64), np.asarray(ref),
                    rtol=tol, atol=tol)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_stencil2d_interpret(dtype) -> None:
    shape = (16, 128)
    assert pallas_supported(shape, dtype)
    x = _x(shape, dtype)
    coeffs = _coeffs(shape, dtype)
    ref = apply_axis_stencil(coeffs, x.astype(jnp.float32))
    tol = 1e-6 if dtype == jnp.float32 else 0.1
    out = pallas_axis_stencil(coeffs, x, interpret=True)
    assert_allclose(np.asarray(out, np.float64), np.asarray(ref),
                    rtol=tol, atol=tol)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_jacobi3d_interpret(dtype) -> None:
    shape = (8, 16, 128)
    x = _x(shape, dtype)
    b = _x(shape, dtype) + 1.0
    inv_dx2 = (4.0, 2.0, 1.0)
    alpha, beta = 1.0, 0.1
    mask_axes = (0, 1, 2)

    xf = x.astype(jnp.float32)
    lap = jnp.zeros_like(xf)
    for j, iv in enumerate(inv_dx2):
        lap = lap + iv * (
            jnp.roll(xf, -1, 1 + j) + jnp.roll(xf, 1, 1 + j) - 2.0 * xf
        )
    upd = b.astype(jnp.float32) - lap
    mask = np.ones(shape, dtype=np.float32)
    for j in mask_axes:
        sl = [slice(None)] * 3
        for edge in (0, -1):
            sl[j] = edge
            mask[tuple(sl)] = 0.0
    ref = alpha * xf + beta * jnp.asarray(mask)[None] * upd

    tol = 1e-6 if dtype == jnp.float32 else 0.1
    out = pallas_jacobi3d(x, b, inv_dx2, alpha, beta, mask_axes,
                          interpret=True)
    assert_allclose(np.asarray(out, np.float64), np.asarray(ref),
                    rtol=tol, atol=tol)
    out_db = pallas_jacobi3d_db(x, b, inv_dx2, alpha, beta, mask_axes,
                                interpret=True)
    assert_allclose(np.asarray(out_db, np.float64), np.asarray(ref),
                    rtol=tol, atol=tol)


def test_stencil_dot_interpret() -> None:
    """Fused operator+dot: A x matches the plain apply; the partial-sum
    dot equals sum(x * A x)."""
    shape = (8, 16, 128)
    x = _x(shape, jnp.float32)
    coeffs = _coeffs(shape, jnp.float32)
    ref = apply_axis_stencil(coeffs, x)
    out, dots = pallas_axis_stencil_dot(coeffs, x, interpret=True)
    assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)
    assert dots.shape == (1, 1, 1, 1)
    want = float(jnp.sum(x * ref))
    assert_allclose(float(dots[0, 0, 0, 0]), want, rtol=1e-5)


def test_sublane_alignment_table() -> None:
    from pyapes_tpu.ops.pallas_stencil import _v2_supported

    assert _sublane(jnp.float32) == 8
    assert _sublane(jnp.bfloat16) == 16
    # v2 tiled kernel: bf16 needs 16-row sublane alignment
    assert _v2_supported((8, 8, 128), jnp.float32)
    assert not _v2_supported((8, 8, 128), jnp.bfloat16)
    assert _v2_supported((8, 16, 128), jnp.bfloat16)
    # v3 slab kernel has no y constraint, so the public gate accepts all
    assert pallas_supported((8, 8, 128), jnp.bfloat16)
    assert pallas_supported((8, 13, 128), jnp.float32)


def test_padded_stencil_matches_jnp() -> None:
    """Pad-and-crop path: unaligned (65^3-style) shapes run the fused
    kernel via zero padding; the cropped result matches the jnp stencil on
    all rows the solver keeps (interior — the pad only corrupts the
    masked boundary rows of padded axes)."""
    from pyapes_tpu.ops.pallas_stencil import (
        pallas_axis_stencil_padded,
        pallas_padded_supported,
    )

    shape = (9, 20, 100)
    assert not pallas_supported(shape, jnp.float32)
    assert pallas_padded_supported(shape, jnp.float32, paxes=())
    # a padded axis that is periodic is rejected
    assert not pallas_padded_supported(shape, jnp.float32, paxes=(2,))

    x = _x(shape, jnp.float32)
    coeffs = _coeffs(shape, jnp.float32)
    ref = np.asarray(apply_axis_stencil(coeffs, x))
    out = np.asarray(
        pallas_axis_stencil_padded(coeffs, x, paxes=(), interpret=True)
    )
    assert out.shape == ref.shape
    inner = (slice(None), slice(1, -1), slice(1, -1), slice(1, -1))
    assert_allclose(out[inner], ref[inner], rtol=1e-5, atol=1e-5)


def test_padded_solve_matches_jnp_kernel() -> None:
    """Force kernel='pallas' on an unaligned grid (pad-and-crop inside the
    compiled solve) and compare with the jnp kernel solve."""
    from pyapes_tpu.geometry import Box
    from pyapes_tpu.mesh import Mesh
    from pyapes_tpu.solver.fdm import FDM
    from pyapes_tpu.solver.ops import Solver
    from pyapes_tpu.variables import Field
    from pyapes_tpu.variables.bcs import homogeneous_bcs

    def solve(kernel):
        mesh = Mesh(Box[0:1, 0:1, 0:1], None, [9, 20, 30])
        var = Field(
            "p", 1, mesh,
            {"domain": homogeneous_bcs(3, 0.0, "dirichlet")},
            init_val=0.0,
        )
        rng = np.random.default_rng(2)
        rhs = jnp.asarray(rng.standard_normal((1, 9, 20, 30)))
        solver = Solver(
            {"fdm": {"method": "cg", "tol": 1e-10, "max_it": 500,
                     "report": False, "criterion": "residual",
                     "kernel": kernel}}
        )
        fdm = FDM()
        solver.set_eq(fdm.laplacian(1.0, var) == rhs)
        solver.solve()
        return np.asarray(var()[0]), solver.report

    ref, rep0 = solve("jnp")
    out, rep1 = solve("pallas")
    assert rep1["converge"]
    assert_allclose(out, ref, atol=1e-7)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(8, 16, 128), (12, 13, 128)])
def test_stencil3d_v3_interpret(dtype, shape) -> None:
    """Slab-resident v3 kernel vs the jnp roll-sum oracle (any ny; the
    sublane alignment constraint is gone because only dim 0 is sliced)."""
    from pyapes_tpu.ops.pallas_stencil_v3 import (
        pallas_axis_stencil_v3,
        v3_supported,
    )

    assert v3_supported(shape, dtype, streams=3)
    x = _x(shape, dtype)
    coeffs = _coeffs(shape, dtype)
    ref = apply_axis_stencil(coeffs, x.astype(jnp.float32))
    tol = 2e-5 if dtype == jnp.float32 else 0.1
    out = pallas_axis_stencil_v3(coeffs, x, interpret=True)
    assert out.dtype == dtype
    assert_allclose(np.asarray(out, np.float64), np.asarray(ref),
                    rtol=tol, atol=tol)


def test_stencil_dot_v3_interpret() -> None:
    from pyapes_tpu.ops.pallas_stencil_v3 import pallas_axis_stencil_dot_v3

    shape = (8, 16, 128)
    x = _x(shape, jnp.float32)
    coeffs = _coeffs(shape, jnp.float32)
    ref = apply_axis_stencil(coeffs, x)
    out, dots = pallas_axis_stencil_dot_v3(coeffs, x, interpret=True)
    assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
    assert dots.shape == (1, 1, 1, 1)
    want = float(jnp.sum(x * ref))
    assert_allclose(float(dots[0, 0, 0, 0]), want, rtol=1e-5)


def test_jacobi3d_v3_interpret() -> None:
    from pyapes_tpu.ops.pallas_stencil_v3 import pallas_jacobi3d_v3

    shape = (8, 16, 128)
    x = _x(shape, jnp.float32)
    b = _x(shape, jnp.float32) + 1.0
    inv_dx2 = (4.0, 2.0, 1.0)
    alpha, beta = 1.0, 0.1
    mask_axes = (0, 1, 2)

    lap = jnp.zeros_like(x)
    for j, iv in enumerate(inv_dx2):
        lap = lap + iv * (
            jnp.roll(x, -1, 1 + j) + jnp.roll(x, 1, 1 + j) - 2.0 * x
        )
    upd = b - lap
    mask = np.ones(shape, dtype=np.float32)
    for j in mask_axes:
        sl = [slice(None)] * 3
        for edge in (0, -1):
            sl[j] = edge
            mask[tuple(sl)] = 0.0
    ref = alpha * x + beta * jnp.asarray(mask)[None] * upd

    out = pallas_jacobi3d_v3(x, b, inv_dx2, alpha, beta, mask_axes,
                             interpret=True)
    assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_advect_solve_pallas_matches_jnp() -> None:
    """Implicit varying-advection solve with kernel='pallas' (fused
    advection kernel, interpret mode) == jnp-path solve (VERDICT r1 #3)."""
    from pyapes_tpu.geometry import Box
    from pyapes_tpu.mesh import Mesh
    from pyapes_tpu.solver.fdm import FDM
    from pyapes_tpu.solver.ops import Solver
    from pyapes_tpu.variables import Field
    from pyapes_tpu.variables.bcs import mixed_bcs

    def solve(kernel, limiter):
        # f64: the fused kernels are dtype-generic; interpret mode runs
        # them in double so the two solves converge to 1e-10 and any
        # operator mismatch would show far above rounding.
        mesh = Mesh(Box[0:1, 0:1, 0:1], None, [8, 16, 128], dtype="double")
        f_bc = mixed_bcs(
            [0.0, 0.0, 1.0, 0.0, 0.0, 0.0],
            ["dirichlet", "neumann", "dirichlet", "dirichlet",
             "neumann", "dirichlet"],
        )
        var = Field("p", 1, mesh, {"domain": f_bc, "obstacle": None},
                    init_val=0.0)
        adv = Field("u", 1, mesh, None, init_val=0.0)
        rng = np.random.default_rng(11)
        # deterministic advecting field (init_val="random" is unseeded)
        adv.VAR = jnp.asarray(rng.standard_normal(adv().shape))
        rng = np.random.default_rng(4)
        rhs = jnp.asarray(rng.standard_normal((1, 8, 16, 128)))
        solver = Solver(
            {"fdm": {"method": "bicgstab", "tol": 1e-10, "max_it": 900,
                     "report": False, "criterion": "residual",
                     "kernel": kernel}}
        )
        fdm = FDM({"div": {"limiter": limiter, "edge": False}})
        solver.set_eq(
            fdm.div(adv, var) - fdm.laplacian(1.0, var) == rhs
        )
        rep = solver.solve()
        assert rep["tol"] < 1e-9, rep
        return np.asarray(var()[0])

    for limiter in ("none", "upwind"):
        ref = solve("jnp", limiter)
        out = solve("pallas", limiter)
        assert_allclose(out, ref, atol=1e-7)


def test_transient_fused_dot_matches_jnp() -> None:
    """Generalized fused operator+dot (round 3): a TRANSIENT equation
    (ddt + laplacian — the NS/heat hot loop) takes the in-kernel CG
    alpha-dot path by folding the ddt identity into the axis-0 center
    coefficient vector; iterations and solution bit-match the jnp path."""
    from pyapes_tpu.geometry import Box
    from pyapes_tpu.mesh import Mesh
    from pyapes_tpu.solver.fdm import FDM
    from pyapes_tpu.solver.ops import Solver
    from pyapes_tpu.variables import Field
    from pyapes_tpu.variables.bcs import homogeneous_bcs

    def solve(kernel):
        mesh = Mesh(Box[0:1, 0:1, 0:1], None, [8, 16, 128], dtype="double")
        var = Field(
            "T", 1, mesh,
            {"domain": homogeneous_bcs(3, 0.0, "dirichlet"),
             "obstacle": None},
            init_val=0.0,
        )
        rng = np.random.default_rng(7)
        var.set_var_tensor(jnp.asarray(rng.standard_normal(var().shape)))
        var.set_time(0.05, 0.0)
        solver = Solver(
            {"fdm": {"method": "cg", "tol": 1e-11, "max_it": 500,
                     "report": False, "criterion": "residual",
                     "kernel": kernel}}
        )
        fdm = FDM()
        reps = []
        for _ in range(3):
            var.save_old()
            solver.set_eq(
                fdm.ddt(var) - fdm.laplacian(0.3, var)
                == jnp.zeros_like(var())
            )
            reps.append(solver.solve())
            var.update_time()
        return np.asarray(var()[0]), [r["itr"] for r in reps]

    out_j, it_j = solve("none")
    out_p, it_p = solve("pallas")
    assert it_p == it_j, (it_p, it_j)
    assert_allclose(out_p, out_j, rtol=1e-9, atol=1e-9)


def test_jacobi3d_x2_matches_two_sweeps() -> None:
    """Double-sweep Jacobi kernel (two smooths per memory pass, round 3):
    bit-level agreement with two single-sweep kernel calls for the plain,
    from-zero, and dot-emitting variants across mask configurations."""
    from pyapes_tpu.ops.pallas_stencil_v3 import (
        jacobi2_supported,
        pallas_jacobi3d_v3,
        pallas_jacobi3d_x2,
    )

    gs = (16, 16, 128)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1,) + gs))
    b = jnp.asarray(rng.standard_normal((1,) + gs))
    inv = (1.0, 2.0, 0.5)
    beta = -0.11
    for mask_axes in ((0, 1, 2), (0, 2), ()):
        assert jacobi2_supported(gs, x.dtype)
        y = pallas_jacobi3d_v3(x, b, inv, 1.0, beta, mask_axes,
                               interpret=True)
        z_ref = pallas_jacobi3d_v3(y, b, inv, 1.0, beta, mask_axes,
                                   interpret=True)
        z = pallas_jacobi3d_x2(x, b, inv, beta, mask_axes, interpret=True)
        assert_allclose(np.asarray(z), np.asarray(z_ref), atol=1e-12)

        mask = np.ones(gs)
        for ax in mask_axes:
            sl = [slice(None)] * 3
            sl[ax] = 0
            mask[tuple(sl)] = 0
            sl[ax] = -1
            mask[tuple(sl)] = 0
        y0 = beta * jnp.asarray(mask)[None] * b
        z0_ref = pallas_jacobi3d_v3(y0, b, inv, 1.0, beta, mask_axes,
                                    interpret=True)
        z0 = pallas_jacobi3d_x2(None, b, inv, beta, mask_axes,
                                from_zero=True, interpret=True)
        assert_allclose(np.asarray(z0), np.asarray(z0_ref), atol=1e-12)

        zd, dots = pallas_jacobi3d_x2(x, b, inv, beta, mask_axes,
                                      emit_dot=True, interpret=True)
        assert_allclose(np.asarray(zd), np.asarray(z_ref), atol=1e-12)
        assert abs(float(dots.ravel()[0]) - float(jnp.sum(b * z_ref))) < 1e-9


def test_diff_field_kernel_matches_jnp() -> None:
    """Fused variable-Γ diffusion kernel (interpret mode) == the jnp
    flux form on active rows, for both face-average rules and Neumann
    surgery."""
    from pyapes_tpu.ops.pallas_advect import (
        pallas_diff_field,
        pallas_diff_supported,
    )
    from pyapes_tpu.ops.stencil import apply_diff_field

    shape = (8, 16, 128)
    assert pallas_diff_supported(shape, jnp.float64)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1,) + shape))
    g = jnp.asarray(1.0 + rng.random(shape))
    inv_dx2 = (4.0, 9.0, 25.0)
    for surgery in (
        (("none", "none"),) * 3,
        (("neumann", "none"), ("none", "neumann"), ("neumann", "neumann")),
    ):
        for avg in ("arithmetic", "harmonic"):
            ref = np.asarray(
                apply_diff_field(x, g, inv_dx2, surgery, avg=avg)
            )[0]
            out = np.asarray(
                pallas_diff_field(
                    x[0], g, inv_dx2, surgery, avg=avg, interpret=True
                )
            )
            # rows 0 / n-1 of non-periodic axes are inactive (masked by
            # the solver); compare the active interior
            assert_allclose(
                out[1:-1, 1:-1, 1:-1], ref[1:-1, 1:-1, 1:-1],
                rtol=1e-12, atol=1e-12,
            )


def test_var_gamma_solve_pallas_matches_jnp() -> None:
    """Full heterogeneous-diffusivity MG-PCG solve with kernel='pallas'
    (fused diff-field kernel in the operator AND the Γ-aware V-cycle
    levels, interpret mode) == the jnp-path solve."""
    from pyapes_tpu.geometry import Box
    from pyapes_tpu.mesh import Mesh
    from pyapes_tpu.solver.fdm import FDM
    from pyapes_tpu.solver.ops import Solver
    from pyapes_tpu.variables import Field
    from pyapes_tpu.variables.bcs import mixed_bcs

    def solve(kernel):
        mesh = Mesh(Box[0:1, 0:1, 0:1], None, [8, 16, 128], dtype="double")
        f_bc = mixed_bcs(
            [0.0] * 6,
            ["neumann", "dirichlet", "dirichlet", "dirichlet",
             "dirichlet", "neumann"],
        )
        var = Field("p", 1, mesh, {"domain": f_bc, "obstacle": None},
                    init_val=0.0)
        X = np.asarray(mesh._grid_np[0])
        g = jnp.asarray(1.0 + 0.7 * X * X)
        rng = np.random.default_rng(9)
        rhs = jnp.asarray(rng.standard_normal((1, 8, 16, 128)))
        solver = Solver(
            {"fdm": {"method": "bicgstab", "tol": 1e-10, "max_it": 400,
                     "report": False, "criterion": "residual",
                     "kernel": kernel, "precond": "mg",
                     "mg_opts": {"n_pre": 1, "n_post": 1}}}
        )
        fdm = FDM()
        solver.set_eq(fdm.laplacian(g, var) == rhs)
        rep = solver.solve()
        assert rep["tol"] < 1e-9, rep
        return np.asarray(var()[0])

    ref = solve("jnp")
    out = solve("pallas")
    assert_allclose(out, ref, atol=1e-7)


def test_diff_jacobi_kernel_matches_jnp() -> None:
    """Fused variable-Γ Jacobi/residual kernel == the jnp composition
    ``x + ω (b - A x) mask / diag`` with the true per-point diagonal."""
    from pyapes_tpu.ops.pallas_advect import (
        pallas_diff_jacobi,
        pallas_diff_jacobi_supported,
    )
    from pyapes_tpu.ops.stencil import apply_diff_field
    from pyapes_tpu.solver.multigrid import MGSpec

    shape = (8, 16, 128)
    assert pallas_diff_jacobi_supported(shape, jnp.float64)
    fk = (("neumann", "dirichlet"), ("dirichlet", "dirichlet"),
          ("dirichlet", "neumann"))
    spec = MGSpec(shape, [1.0, 1.0, 1.0], dtype=jnp.float64,
                  face_kinds=fk, var_gamma=True, omega=0.7)
    rng = np.random.default_rng(12)
    g = jnp.asarray(1.0 + rng.random(shape))
    spec.set_gamma(g)
    x = jnp.asarray(rng.standard_normal((1,) + shape))
    b = jnp.asarray(rng.standard_normal((1,) + shape))

    inv = tuple(spec._inv_dx2(shape))
    surgery = spec._vg_surgery()
    mask = spec._mask(shape)
    diag = spec._gd_levels[0]
    for mode in ("smooth", "smooth0", "resid"):
        out = pallas_diff_jacobi(
            None if mode == "smooth0" else x[0], b[0], g, inv, surgery,
            omega=0.7, mask_axes=(0, 1, 2), mode=mode, interpret=True,
        )
        ax = apply_diff_field(x, g, inv, surgery)
        if mode == "resid":
            ref = (b - ax) * mask
        elif mode == "smooth":
            ref = x + 0.7 * (b - ax) * mask / diag
        else:
            ref = 0.7 * b * mask / diag
        # in-register diag accumulation orders differently: ~1 ulp
        assert_allclose(
            np.asarray(out), np.asarray(ref)[0], rtol=1e-10, atol=1e-10
        )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(8, 16, 128), (12, 13, 128)])
def test_stencil3d_v5_quick_interpret(dtype, shape) -> None:
    """5-point (QUICK) slab kernel vs the jnp roll-sum oracle, with a MIX
    of 5-vector and 3-vector axes (round-4 item 5: QUICK previously fell
    to the jnp path)."""
    from pyapes_tpu.ops.pallas_stencil_v3 import (
        pallas_axis_stencil_v5,
        v5_supported,
    )

    assert v5_supported(shape, dtype)
    rng = np.random.default_rng(11)
    x = _x(shape, dtype)
    # axis 0: 5-vector (QUICK bank); axis 1: 3-vector; axis 2: 5-vector
    coeffs = (
        tuple(jnp.asarray(rng.standard_normal(shape[0]), dtype=dtype)
              for _ in range(5)),
        tuple(jnp.asarray(rng.standard_normal(shape[1]), dtype=dtype)
              for _ in range(3)),
        tuple(jnp.asarray(rng.standard_normal(shape[2]), dtype=dtype)
              for _ in range(5)),
    )
    ref = apply_axis_stencil(
        tuple(tuple(c.astype(jnp.float32) for c in cs) for cs in coeffs),
        x.astype(jnp.float32),
    )
    tol = 2e-5 if dtype == jnp.float32 else 0.15
    out = pallas_axis_stencil_v5(coeffs, x, interpret=True)
    assert out.dtype == dtype
    assert_allclose(np.asarray(out, np.float64), np.asarray(ref),
                    rtol=tol, atol=tol)


def test_quick_solve_pallas_matches_jnp() -> None:
    """End-to-end: an implicit QUICK-advection transport solve with
    kernel='pallas' (v5 slab kernel, interpret mode) == the jnp-path
    solve."""
    from pyapes_tpu.geometry import Box
    from pyapes_tpu.mesh import Mesh
    from pyapes_tpu.solver.fdm import FDM
    from pyapes_tpu.solver.ops import Solver
    from pyapes_tpu.variables import Field
    from pyapes_tpu.variables.bcs import homogeneous_bcs

    mesh = Mesh(Box[0:1, 0:1, 0:1], None, [8, 16, 128], dtype="single")
    rng = np.random.default_rng(5)
    rhs = jnp.asarray(rng.standard_normal((1,) + mesh.nx), jnp.float32)

    def solve(kernel):
        var = Field(
            "c", 1, mesh,
            {"domain": homogeneous_bcs(3, 0.0, "dirichlet"),
             "obstacle": None},
            init_val=0.0,
        )
        s = Solver({"fdm": {
            "method": "bicgstab", "tol": 1e-8, "max_it": 400,
            "report": False, "criterion": "residual", "kernel": kernel,
        }})
        fdm = FDM({"div": {"limiter": "quick"}})
        var.set_time(0.05, 0.0)
        var.save_old()
        s.set_eq(
            fdm.ddt(var) + fdm.div(1.0, var)
            - fdm.laplacian(0.05, var)
            == rhs
        )
        rep = s.solve()
        return np.asarray(var()), rep

    ref, rep_j = solve("jnp")
    out, rep_p = solve("pallas")
    assert rep_j["converge"] and rep_p["converge"]
    # two independently-rounded f32 BiCGSTAB runs converged to rel
    # residual 1e-8 on an O(1) solution: agreement is bounded by the
    # iterates' rounding paths, not the kernels (atol covers XLA
    # reassociation differences, e.g. backend optimization levels)
    assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_bicgstab_pallas_solve_matches_jnp() -> None:
    """End-to-end BiCGSTAB on the Pallas stencil tier for a {ddt +
    laplacian} system == the jnp-path solve. (The round-4 y-dot fusion
    tier was removed in round 5 — its only engagement window measured
    1.08x and its motivating rz workload is 2-D — so this now pins the
    plain Pallas-operator BiCGSTAB path.)"""
    from pyapes_tpu.geometry import Box
    from pyapes_tpu.mesh import Mesh
    from pyapes_tpu.solver.fdm import FDM
    from pyapes_tpu.solver.ops import Solver
    from pyapes_tpu.variables import Field
    from pyapes_tpu.variables.bcs import homogeneous_bcs

    mesh = Mesh(Box[0:1, 0:1, 0:1], None, [8, 16, 128], dtype="single")
    rng = np.random.default_rng(6)
    rhs = jnp.asarray(rng.standard_normal((1,) + mesh.nx), jnp.float32)

    def solve(kernel):
        var = Field(
            "T", 1, mesh,
            {"domain": homogeneous_bcs(3, 0.0, "dirichlet"),
             "obstacle": None},
            init_val=0.0,
        )
        s = Solver({"fdm": {
            "method": "bicgstab", "tol": 1e-8, "max_it": 400,
            "report": False, "criterion": "residual", "kernel": kernel,
        }})
        fdm = FDM()
        var.set_time(0.05, 0.0)
        var.save_old()
        s.set_eq(fdm.ddt(var) - fdm.laplacian(0.1, var) == rhs)
        rep = s.solve()
        return np.asarray(var()), rep

    ref, rep_j = solve("jnp")
    out, rep_p = solve("pallas")
    assert rep_j["converge"] and rep_p["converge"]
    # two independently-rounded f32 BiCGSTAB runs converged to rel
    # residual 1e-8 on an O(1) solution: agreement is bounded by the
    # iterates' rounding paths, not the kernels (atol covers XLA
    # reassociation differences, e.g. backend optimization levels)
    assert_allclose(out, ref, atol=2e-5, rtol=1e-5)
