"""Mesh tests (ported from reference ``tests/test_mesh.py``)."""
import numpy as np
import pytest

from pyapes_tpu.geometry import Box, Cylinder
from pyapes_tpu.mesh import Mesh


@pytest.mark.parametrize(
    ["domain", "spacing", "dim"],
    [
        [Box[0:1], [0.2], 1],
        [Box[0:1, 0:1], [0.2, 0.2], 2],
        [Box[0:1, 0:1, 0:1], [0.2, 0.2, 0.2], 3],
    ],
)
def test_mesh_construction(domain, spacing, dim) -> None:
    mesh = Mesh(domain, None, spacing)

    assert mesh.dim == dim
    assert mesh.nx == tuple([6] * dim)
    np.testing.assert_allclose(np.asarray(mesh.dx), [0.2] * dim)
    assert mesh.coord_sys == "xyz"
    assert mesh.N == 6**dim

    # Face masks are boundary slabs.
    for face, mask in mesh.d_mask.items():
        axis = mesh.d_mask_dim(face)
        side = 0 if face[1] == "l" else -1
        sel = [slice(None)] * dim
        sel[axis] = side
        assert np.all(mask[tuple(sel)])
        assert mask.sum() == mask[tuple(sel)].size

    # t_mask marks all boundary nodes
    interior = np.zeros(mesh.nx, dtype=bool)
    inner = tuple(slice(1, -1) for _ in range(dim))
    interior[inner] = True
    assert not np.any(mesh.t_mask & interior)
    assert np.all(mesh.t_mask | interior)


def test_mesh_node_count_spacing() -> None:
    mesh = Mesh(Box[0:1, 0:2], None, [11, 21])
    assert mesh.nx == (11, 21)
    np.testing.assert_allclose(np.asarray(mesh.dx), [0.1, 0.1])


def test_mesh_rz() -> None:
    mesh = Mesh(Cylinder[0:1, 0:2], None, [5, 5])
    assert mesh.coord_sys == "rz"
    assert mesh.dim == 2
    assert set(mesh.d_mask.keys()) == {"rl", "ru", "zl", "zu"}
    # R is the first grid coordinate
    np.testing.assert_allclose(np.asarray(mesh.R[:, 0]), np.linspace(0, 1, 5))
    np.testing.assert_allclose(np.asarray(mesh.Z[0, :]), np.linspace(0, 2, 5))


def test_mesh_rz_requires_2d() -> None:
    with pytest.raises(AssertionError):
        Cylinder[0:1, 0:1, 0:1]


def test_geometry_algebra() -> None:
    assert Box[0:1, 0:1] == Box([0, 0], [1, 1])
    b = Box[0:1, 0:2, 0:3]
    assert b.size == 6.0
    c = Cylinder[0:1, 0:2]
    assert abs(c.size - np.pi * 2) < 1e-12


def test_obstacle_mask() -> None:
    mesh = Mesh(Box[0:1, 0:1], [Box[0.4:0.6, 0.4:0.6]], [11, 11])
    assert len(mesh.o_mask) == 1
    assert any(m.sum() > 0 for m in mesh.o_mask[0].values())


def test_d_mask_shift() -> None:
    mesh = Mesh(Box[0:1], None, [5])
    shifted = mesh.d_mask_shift("xl", 1)
    expected = np.zeros(5, dtype=bool)
    expected[1] = True
    np.testing.assert_array_equal(shifted, expected)

    shifted_u = mesh.d_mask_shift("xu", 1)
    expected_u = np.zeros(5, dtype=bool)
    expected_u[-2] = True
    np.testing.assert_array_equal(shifted_u, expected_u)


def test_lazy_grid_semantics() -> None:
    """mesh.grid is a LazyGrid: tuple-like (index/negative/slice/iterate/
    unpack) but materializes coordinate cubes only on access and pins
    nothing on the mesh (the eager cached_property held dim full cubes
    forever — 5.06 GiB at 768^3, the round-4 size-envelope OOM)."""
    from pyapes_tpu.mesh._mesh import LazyGrid

    mesh = Mesh(Box[0:1, 0:2, 0:3], None, [4, 5, 6])
    g = mesh.grid
    assert isinstance(g, LazyGrid)
    assert len(g) == 3
    assert g._cache == {}  # nothing materialized yet

    X, Y, Z = g  # unpacking via iteration
    assert X.shape == (4, 5, 6) and Y.shape == (4, 5, 6)
    np.testing.assert_allclose(np.asarray(X[:, 0, 0]), np.linspace(0, 1, 4))
    np.testing.assert_allclose(np.asarray(Y[0, :, 0]), np.linspace(0, 2, 5))
    np.testing.assert_allclose(np.asarray(Z[0, 0, :]), np.linspace(0, 3, 6))

    # negative index + slice, matching tuple semantics
    np.testing.assert_array_equal(np.asarray(g[-1]), np.asarray(Z))
    sl = g[1:3]
    assert isinstance(sl, tuple) and len(sl) == 2
    np.testing.assert_array_equal(np.asarray(sl[0]), np.asarray(Y))
    with pytest.raises(IndexError):
        g[3]

    # a fresh access returns a NEW LazyGrid with an empty cache: nothing
    # was pinned on the mesh by the accesses above
    assert mesh.grid._cache == {}

    # per-axis reduction slicer (the solver's periodic torus reduction)
    red = (slice(None, -1), slice(None), slice(None))
    gr = LazyGrid(mesh, red)
    assert gr[0].shape == (3, 5, 6)
    np.testing.assert_allclose(
        np.asarray(gr[0]), np.asarray(X[:-1]), atol=0
    )
