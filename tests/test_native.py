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
