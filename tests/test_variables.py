"""Field/BC tests (ported from reference ``tests/test_variables.py``).

The Neumann sign expectation in the reference's ``test_box_field_bcs`` is
stale (it fails against the reference itself); assertions here pin the
*behavioral* convention validated by the reference's passing tests
(``test_cylinder_field_bcs``, ``test_poisson_1d_mixed_neumann``):
``p_face = 4/3 p1 - 1/3 p2 + 2/3 V dx`` on both faces (outward normal).
"""
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pyapes_tpu.geometry import Box
from pyapes_tpu.geometry.cylinder import Cylinder
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.variables import Field
from pyapes_tpu.variables.bcs import (
    BoxBoundary,
    CylinderBoundary,
    homogeneous_bcs,
)


@pytest.mark.parametrize(
    ["domain", "spacing"],
    [
        [Box[0:1], [5]],
        [Box[0:1, 0:1], [5, 5]],
        [Box[0:1, 0:1, 0:1], [5, 5, 5]],
    ],
)
def test_field_bc_mask_individual(domain, spacing) -> None:
    """Rolled-mask invariants vs np.roll oracle
    (reference ``test_variables.py:25-53``)."""
    mesh = Mesh(domain, None, spacing)

    f_bc = BoxBoundary(
        xl={"bc_type": "dirichlet", "bc_val": 0.0},
        xu={"bc_type": "dirichlet", "bc_val": 0.0},
        yl={"bc_type": "dirichlet", "bc_val": 0.0} if mesh.dim > 1 else None,
        yu={"bc_type": "dirichlet", "bc_val": 0.0} if mesh.dim > 1 else None,
        zl={"bc_type": "dirichlet", "bc_val": 0.0} if mesh.dim > 2 else None,
        zu={"bc_type": "dirichlet", "bc_val": 0.0} if mesh.dim > 2 else None,
    )

    var = Field("test", 1, mesh, {"domain": f_bc(), "obstacle": None})

    for i in range(2 * mesh.dim):
        target = var.bcs[i].bc_mask.copy()
        n_dir = -1 if i % 2 == 0 else 1
        np.testing.assert_array_equal(
            var.bcs[i].bc_mask_prev, np.roll(target, -n_dir, axis=i // 2)
        )
        np.testing.assert_array_equal(
            var.bcs[i].bc_mask_prev2, np.roll(target, -n_dir * 2, axis=i // 2)
        )
        np.testing.assert_array_equal(
            var.bcs[i].bc_mask_forward, np.roll(target, n_dir, axis=i // 2)
        )
        np.testing.assert_array_equal(
            var.bcs[i].bc_mask_forward2, np.roll(target, n_dir * 2, axis=i // 2)
        )


def test_bc_config() -> None:
    """BC-config builders round-trip (reference ``test_variables.py:56-85``)."""
    f_bc = BoxBoundary(
        xl={"bc_type": "dirichlet", "bc_val": 0.44},
        xu={"bc_type": "neumann", "bc_val": 0},
        yl={"bc_type": "periodic", "bc_val": None},
        yu={"bc_type": "symmetry", "bc_val": None},
    )
    bc_config = [
        {"bc_face": "xl", "bc_type": "dirichlet", "bc_val": 0.44, "bc_val_opt": None},
        {"bc_face": "xu", "bc_type": "neumann", "bc_val": 0, "bc_val_opt": None},
        {"bc_face": "yl", "bc_type": "periodic", "bc_val": None, "bc_val_opt": None},
        {"bc_face": "yu", "bc_type": "symmetry", "bc_val": None, "bc_val_opt": None},
    ]
    assert f_bc() == bc_config

    f_bc = CylinderBoundary(
        rl={"bc_type": "dirichlet", "bc_val": 0.44},
        ru={"bc_type": "neumann", "bc_val": 0},
        zl={"bc_type": "periodic", "bc_val": None},
        zu={"bc_type": "symmetry", "bc_val": None},
    )
    bc_config = [
        {"bc_face": "rl", "bc_type": "dirichlet", "bc_val": 0.44, "bc_val_opt": None},
        {"bc_face": "ru", "bc_type": "neumann", "bc_val": 0, "bc_val_opt": None},
        {"bc_face": "zl", "bc_type": "periodic", "bc_val": None, "bc_val_opt": None},
        {"bc_face": "zu", "bc_type": "symmetry", "bc_val": None, "bc_val_opt": None},
    ]
    assert f_bc() == bc_config


@pytest.mark.parametrize(
    ["domain", "spacing", "dim"],
    [
        [Box[0:1], [0.1], 1],
        [Box[0:1, 0:1], [0.1, 0.1], 2],
        [Box[0:1, 0:1, 0:1], [0.1, 0.1, 0.1], 3],
    ],
)
def test_fields(domain, spacing, dim) -> None:
    """Field arithmetic/copy (reference ``test_variables.py:96-129``)."""
    mesh = Mesh(domain, None, spacing, "cpu", "double")

    var = Field("any", 1, mesh, {"domain": None, "obstacle": None})

    test_tensor = jnp.asarray(
        np.random.rand(*var.size), dtype=mesh.dtype.float
    )

    var += test_tensor
    assert_allclose(var(), test_tensor)

    var /= var
    assert_allclose(var(), jnp.ones_like(test_tensor))

    var *= 10
    assert_allclose(var(), jnp.ones_like(test_tensor) * 10)

    var -= var
    assert_allclose(var(), test_tensor * 0)

    var += 2.5
    copied_var = var.copy()
    assert_allclose(copied_var(), test_tensor * 0 + 2.5)

    zeroed_copied_var = var.zeros_like()
    assert_allclose(zeroed_copied_var(), test_tensor * 0)

    copied_var_name = var.copy(name="test_copy")
    assert copied_var_name.name == "test_copy"

    zeroed_copied_var_name = var.zeros_like(name="test_zeros_like")
    assert zeroed_copied_var_name.name == "test_zeros_like"


def test_cylinder_field_bcs() -> None:
    """Numerical BC application on rz, incl. callable + bc_val_opt payloads
    (reference ``test_variables.py:132-188``)."""
    mesh = Mesh(Cylinder[0:1, 0:2], None, [5, 5])

    def ru_bc(grid, mask, *_):
        return grid[1] * 4.4  # full-grid evaluation (callable convention)

    f_bc = CylinderBoundary(
        rl={"bc_type": "neumann", "bc_val": 0},
        ru={"bc_type": "dirichlet", "bc_val": ru_bc},
        zl={"bc_type": "neumann", "bc_val": 1.3},
        zu={"bc_type": "dirichlet", "bc_val": 0.44},
    )
    var = Field("d", 1, mesh, {"domain": f_bc(), "obstacle": None}, init_val="random")

    var.apply_bcs()

    v = var()[0]
    rl_target = 4 / 3 * v[1, 1:-1] - 1 / 3 * v[2, 1:-1]
    zl_target = (
        4 / 3 * v[1:-1, 1] - 1 / 3 * v[1:-1, 2] + 2 / 3 * 1.3 * mesh.dx[1]
    )

    assert_allclose(v[-1, 1:-1], 4.4 * np.asarray(mesh.grid[1])[0][1:-1])
    assert_allclose(v[1:-1, -1], 0.44 * jnp.ones_like(v[1:-1, -1]))
    assert_allclose(v[0, 1:-1], rl_target)
    assert_allclose(v[1:-1, 0], zl_target)

    def zu_bc(grid, mask, _, opt):
        val = jnp.sum(opt["T"])
        return grid[0] * val

    f_bc = CylinderBoundary(
        rl={"bc_type": "neumann", "bc_val": 0},
        ru={"bc_type": "dirichlet", "bc_val": ru_bc},
        zl={"bc_type": "neumann", "bc_val": 1.3},
        zu={
            "bc_type": "dirichlet",
            "bc_val": zu_bc,
            "bc_val_opt": {"T": jnp.ones_like(var()[0])},
        },
    )
    var = Field("d", 1, mesh, {"domain": f_bc(), "obstacle": None}, init_val="random")
    var.apply_bcs()

    val = var()[0].size
    assert_allclose(var()[0][1:-1, -1], np.asarray(mesh.grid[0])[1:-1, -1] * val)


@pytest.mark.parametrize(
    ["domain", "spacing"],
    [
        [Box[0:1], [0.1]],
        [Box[0:1, 0:1], [0.1, 0.1]],
        [Box[0:1, 0:1, 0:1], [0.1, 0.1, 0.1]],
    ],
)
def test_box_field_bcs(domain, spacing) -> None:
    """All four BC types applied numerically
    (reference ``test_variables.py:199-261``; Neumann expectation corrected
    to the behavioral outward-normal convention — see module docstring)."""
    mesh = Mesh(domain, None, spacing, "cpu", "double")

    f_bc_d = homogeneous_bcs(mesh.dim, 0.44, "dirichlet")
    var = Field("d", 1, mesh, {"domain": f_bc_d, "obstacle": None}, init_val="random")
    var.apply_bcs()

    assert_allclose(float(var()[0][0].mean()), 0.44)
    assert_allclose(float(var()[0][-1].mean()), 0.44)

    f_bc_d = homogeneous_bcs(mesh.dim, 1.0, "neumann")
    var = Field("n", 1, mesh, {"domain": f_bc_d, "obstacle": None}, init_val="random")
    var.apply_bcs()

    v = var()[0]
    # Outward-normal convention: + 2/3 V dx on BOTH faces.
    target_l = 4 / 3 * v[1] - 1 / 3 * v[2] + 2 / 3 * 1.0 * 0.1
    target_u = 4 / 3 * v[-2] - 1 / 3 * v[-3] + 2 / 3 * 1.0 * 0.1

    assert_allclose(v[0], target_l)
    assert_allclose(v[-1], target_u)

    f_bc_d = homogeneous_bcs(mesh.dim, None, "periodic")
    var = Field("p", 1, mesh, {"domain": f_bc_d, "obstacle": None}, init_val="random")
    var.apply_bcs()

    v = var()[0]
    assert_allclose(v[0], v[-1])

    f_bc_d = homogeneous_bcs(mesh.dim, None, "symmetry")
    var = Field("s", 1, mesh, {"domain": f_bc_d, "obstacle": None}, init_val="random")

    bc_xl = var.get_bc("d-xl")
    assert bc_xl is not None
    assert bc_xl.type == "symmetry"
    assert bc_xl.bc_id == "d-xl"

    var.apply_bcs()
    v = var()[0]
    assert_allclose(v[0], v[1])
    assert_allclose(v[-1], v[-2])
