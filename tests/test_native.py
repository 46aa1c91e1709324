"""Native C++ tier tests: stencil oracle vs jnp path, snapshot IO."""
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pyapes_tpu import native
from pyapes_tpu.geometry import Box
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.ops.stencil import apply_axis_stencil, laplacian_axis_coeffs
from pyapes_tpu.variables import Field
from pyapes_tpu.variables.bcs import homogeneous_bcs

needs_native = pytest.mark.skipif(
    not native.available(), reason="g++ toolchain unavailable"
)


@needs_native
def test_native_stencil_oracle() -> None:
    """The C++ reference implementation must agree with the jnp roll-sum."""
    for dims, nx in [(2, [12, 10]), (3, [8, 6, 10])]:
        box = Box[tuple(slice(0, 1) for _ in range(dims))]
        mesh = Mesh(box, None, nx)
        f_bc = homogeneous_bcs(dims, 1.0, "neumann")
        var = Field("t", 1, mesh, {"domain": f_bc, "obstacle": None},
                    init_val="random")
        coeffs = laplacian_axis_coeffs(mesh, var.bcs)
        ref = np.asarray(apply_axis_stencil(coeffs, var()))[0]
        out = native.stencil_apply_ref(coeffs, np.asarray(var()[0]))
        assert_allclose(out, ref, atol=1e-12)


@needs_native
def test_native_snapshot_roundtrip(tmp_path) -> None:
    rng = np.random.default_rng(0)
    for dtype in (np.float32, np.float64):
        arr = rng.standard_normal((7, 9, 5)).astype(dtype)
        path = str(tmp_path / f"snap_{np.dtype(dtype).name}.bin")
        native.snapshot_write(path, arr)
        back = native.snapshot_read(path, dtype)
        assert back.shape == arr.shape
        assert_allclose(back, arr)


@needs_native
def test_native_snapshot_detects_corruption(tmp_path) -> None:
    arr = np.arange(64, dtype=np.float64).reshape(8, 8)
    path = str(tmp_path / "snap.bin")
    native.snapshot_write(path, arr)
    # Flip a payload byte.
    data = bytearray(open(path, "rb").read())
    data[50] ^= 0xFF
    open(path, "wb").write(bytes(data))
    with pytest.raises(IOError):
        native.snapshot_read(path, np.float64)


def _vtk_roundtrip(tmp_path, mesh, monkeypatch=None):
    from pyapes_tpu.utils import io as vio

    rng = np.random.default_rng(4)
    f1 = rng.standard_normal(tuple(mesh.nx)).astype(np.float32)
    f2 = rng.standard_normal((1,) + tuple(mesh.nx)).astype(np.float32)
    p = vio.write_vtk(str(tmp_path / "out"), mesh, {"a": f1, "b": f2})
    back = vio.read_vtk(p)
    want_shape = tuple(mesh.nx) + (1,) * (3 - mesh.dim)
    assert back["fields"]["a"].shape == want_shape
    assert_allclose(back["fields"]["a"].reshape(mesh.nx), f1, rtol=1e-6)
    assert_allclose(back["fields"]["b"].reshape(mesh.nx), f2[0], rtol=1e-6)
    assert_allclose(back["coords"][0], np.asarray(mesh._x_np[0], np.float32))
    return p


def test_vtk_export_roundtrip_2d(tmp_path) -> None:
    from pyapes_tpu.geometry import Box
    from pyapes_tpu.mesh import Mesh

    mesh = Mesh(Box[0:1, 0:2], None, [9, 17])
    _vtk_roundtrip(tmp_path, mesh)


def test_vtk_export_roundtrip_3d(tmp_path) -> None:
    from pyapes_tpu.geometry import Box
    from pyapes_tpu.mesh import Mesh

    mesh = Mesh(Box[0:1, 0:1, 0:1], None, [5, 7, 9])
    _vtk_roundtrip(tmp_path, mesh)


def test_vtk_python_fallback_matches_native(tmp_path, monkeypatch) -> None:
    """The numpy fallback writes byte-identical files to the C++ writer."""
    from pyapes_tpu.geometry import Box
    from pyapes_tpu.mesh import Mesh
    from pyapes_tpu.utils import io as vio

    mesh = Mesh(Box[0:1, 0:1], None, [6, 8])
    rng = np.random.default_rng(5)
    f = rng.standard_normal(tuple(mesh.nx)).astype(np.float32)

    p1 = vio.write_vtk(str(tmp_path / "nat"), mesh, {"phi": f})
    monkeypatch.setattr(native, "load", lambda: None)
    p2 = vio.write_vtk(str(tmp_path / "pyf"), mesh, {"phi": f})
    b1, b2 = open(p1, "rb").read(), open(p2, "rb").read()
    if native.available():
        assert b1 == b2
    back = vio.read_vtk(p2)
    assert_allclose(back["fields"]["phi"].reshape(mesh.nx), f, rtol=1e-6)


def test_pvd_collection(tmp_path) -> None:
    from pyapes_tpu.geometry import Box
    from pyapes_tpu.mesh import Mesh
    from pyapes_tpu.utils import io as vio

    mesh = Mesh(Box[0:1], None, [11])
    files = []
    for i in range(3):
        f = np.full(mesh.nx, float(i), dtype=np.float32)
        files.append(
            (0.1 * i, vio.write_vtk(str(tmp_path / f"s{i}"), mesh, {"u": f}))
        )
    p = vio.write_pvd(str(tmp_path / "series"), files)
    text = open(p).read()
    assert text.count("<DataSet") == 3
    assert 'timestep="0.2"' in text
