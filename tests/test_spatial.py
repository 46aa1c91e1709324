"""Jacobian/Hessian/DiffFlux tests (ported from reference
``tests/test_spatial.py``)."""
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pyapes_tpu.geometry import Box, Cylinder
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.solver.fdc import DiffFlux, hessian, jacobian
from pyapes_tpu.variables import Field
from pyapes_tpu.variables.container import Hess, Jac


def test_diff_flux() -> None:
    """DiffFlux vs analytic products (reference ``test_spatial.py:16-46``)."""
    mesh = Mesh(Box[0:1, 0:1, 0:1], None, [3, 3, 3])
    var = Field("test", 1, mesh, {"domain": None, "obstacle": None})
    var.set_var_tensor(mesh.grid[0] ** 2 + 2 * mesh.grid[2] ** 2)

    grad = np.gradient(
        np.asarray(var()[0]), *[float(d) for d in mesh.dx_np], edge_order=2
    )
    hess = hessian(var)
    flux = DiffFlux()(hess, var)

    assert_allclose(
        np.asarray(flux[0]),
        np.asarray(hess.xx) * grad[0]
        + np.asarray(hess.xy) * grad[1]
        + np.asarray(hess.xz) * grad[2],
        atol=1e-12,
    )

    # Axisymmetric: the r-component carries the r weight.
    mesh = Mesh(Cylinder[0:1, 0:1], None, [3, 3])
    var = Field("test", 1, mesh, {"domain": None, "obstacle": None})
    var.set_var_tensor(mesh.grid[0] ** 2)

    grad = np.gradient(
        np.asarray(var()[0]), *[float(d) for d in mesh.dx_np], edge_order=2
    )
    hess = hessian(var)
    flux = DiffFlux()(hess, var)

    R = np.asarray(mesh.grid[0])
    assert_allclose(
        np.asarray(flux[0]),
        R * np.asarray(hess.rr) * grad[0] + R * np.asarray(hess.rz) * grad[1],
        atol=1e-12,
    )
    assert_allclose(
        np.asarray(flux[1]),
        np.asarray(hess.rz) * grad[0] + np.asarray(hess.zz) * grad[1],
        atol=1e-12,
    )


def test_jac_and_hess() -> None:
    """Jacobian/Hessian vs analytic derivatives
    (reference ``test_spatial.py:48-78``)."""
    mesh = Mesh(Box[0:1, 0:1, 0:1], None, [3, 3, 3])
    var = Field("test", 1, mesh, {"domain": None, "obstacle": None})
    var.set_var_tensor(mesh.grid[0] ** 2 + 2 * mesh.grid[2] ** 2)

    jac = jacobian(var)
    assert_allclose(np.asarray(jac.x), 2 * np.asarray(mesh.grid[0]), atol=1e-12)
    assert_allclose(np.asarray(jac.y), np.zeros(mesh.nx), atol=1e-12)
    assert_allclose(np.asarray(jac.z), 4 * np.asarray(mesh.grid[2]), atol=1e-12)

    var.set_var_tensor((mesh.grid[0] ** 2) * (mesh.grid[2] ** 2))
    hess = hessian(var)
    assert_allclose(np.asarray(hess.xx), 2 * np.asarray(mesh.grid[2]) ** 2, atol=1e-12)
    assert_allclose(np.asarray(hess.xy), np.zeros(mesh.nx), atol=1e-12)
    assert_allclose(
        np.asarray(hess.xz),
        4 * np.asarray(mesh.grid[0]) * np.asarray(mesh.grid[2]),
        atol=1e-12,
    )

    mesh = Mesh(Box[0:1, 0:1], None, [3, 3])
    var = Field("test", 1, mesh, {"domain": None, "obstacle": None})
    var.set_var_tensor(mesh.grid[0] ** 2)

    jac = jacobian(var)
    hess = hessian(var)

    assert_allclose(np.asarray(hess.xy), np.asarray(hess["yx"]))

    with pytest.raises(KeyError):
        jac["z"]
    with pytest.raises(KeyError):
        hess["zz"]


def test_derivative_data_structure() -> None:
    """Jac/Hess container semantics (reference ``test_spatial.py:81-129``)."""
    import jax.numpy as jnp

    x = jnp.asarray(np.random.rand(10))
    y = jnp.asarray(np.random.rand(10))
    z = jnp.asarray(np.random.rand(10))

    test_jac = Jac(x=x)
    assert len(test_jac) == 1
    assert test_jac.keys == ["x"]

    test_jac = Jac(x=x, y=y, z=z)
    assert len(test_jac) == 3
    for test, target in zip(test_jac, [x, y, z]):
        assert_allclose(test, target)

    test_jac = Jac(r=x, z=y)
    assert len(test_jac) == 2
    for test, target in zip(test_jac, [y, x]):
        # declared field order is (x, y, z, r): z comes before r
        assert_allclose(test, target)

    test_hess = Hess(xx=x, yy=y)
    assert len(test_hess) == 2
    for test, target in zip(test_hess, [x, y]):
        assert_allclose(test, target)

    test_hess = Hess(xx=x, xy=x, xz=x, yy=y, yz=y, zz=z)
    for test, target in zip(test_hess, [x, x, x, y, y, z]):
        assert_allclose(test, target)

    test_hess = Hess(rr=x, zz=z)
    assert sorted(test_hess.keys) == ["rr", "zz"]
    for test, target in zip(test_hess, [z, x]):
        assert_allclose(test, target)


def test_div_hess_upwind_oracle() -> None:
    """Upwind Div with a Hessian-tensor advector (the reference raises,
    ``fdc.py:651-660``; VERDICT r1 item 7): matches a hand-rolled
    min/max-split upwind using the selected H components, on the rz mesh."""
    from pyapes_tpu.solver.fdc import FDC
    from pyapes_tpu.variables.container import Hess

    mesh = Mesh(Cylinder[0:2, -1:1], None, [16, 24])
    var = Field("f", 1, mesh, None, init_val="random")
    rng = np.random.default_rng(3)
    H = Hess(
        rr=jnp.asarray(rng.standard_normal(tuple(mesh.nx))),
        rz=jnp.asarray(rng.standard_normal(tuple(mesh.nx))),
        zz=jnp.asarray(rng.standard_normal(tuple(mesh.nx))),
    )

    fdc = FDC({"div": {"limiter": "upwind", "edge": False}})
    out = np.asarray(fdc.div(H, var)[0])

    # oracle: scalar target selects H_{r j} for axis j ('rr', 'rz')
    phi = var()[0]
    r = np.asarray(mesh._x_np[0])[:, None]
    expected = np.zeros_like(out)
    for j, key in enumerate(("rr", "rz")):
        a = H[key]
        dxj = float(mesh.dx_np[j])
        g_min = jnp.minimum(a, 0.0)
        g_max = jnp.maximum(a, 0.0)
        acb = np.zeros(tuple(mesh.nx))
        if j == 0:
            with np.errstate(divide="ignore"):
                acb = np.nan_to_num(2.0 * dxj / r, posinf=0.0) * np.ones(
                    tuple(mesh.nx)
                )
        term = (
            2.0 * g_min * jnp.roll(phi, -1, j)
            + (2.0 * (g_max - g_min) + jnp.asarray(acb) * a) * phi
            - 2.0 * g_max * jnp.roll(phi, 1, j)
        ) / (2.0 * dxj)
        expected += np.asarray(term)
    assert_allclose(out, expected, atol=1e-12)

    # QUICK with a Hess advector: builds (no raise), finite output,
    # boundary-adjacent rows equal the upwind fallback
    fdc_q = FDC({"div": {"limiter": "quick", "edge": False}})
    out_q = np.asarray(fdc_q.div(H, var)[0])
    assert np.all(np.isfinite(out_q))
    # the fallback is per-axis: only cells where BOTH axes are
    # boundary-adjacent reduce fully to upwind
    for ci in (1, -2):
        for cj in (1, -2):
            assert_allclose(out_q[ci, cj], out[ci, cj], atol=1e-12)

    # edge mode with a Hess advector no longer raises
    fdc_e = FDC({"div": {"limiter": "upwind", "edge": True}})
    out_e = np.asarray(fdc_e.div(H, var, edge=True)[0])
    assert np.all(np.isfinite(out_e))
    # interior rows agree with the non-edge apply
    assert_allclose(out_e[2:-2, 2:-2], out[2:-2, 2:-2], atol=1e-12)
