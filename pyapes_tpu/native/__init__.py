"""Native (C++) host-side tier: independent stencil oracle + binary
snapshot IO with CRC32 integrity.

Compiled on demand with g++ (cached next to the source); everything has a
pure-Python fallback so the framework works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "pyapes_native.cpp")
_LIB = None
_TRIED = False


def _build_lib() -> str | None:
    cache = os.path.join(
        tempfile.gettempdir(), f"pyapes_native_{os.getuid()}.so"
    )
    if not (
        os.path.exists(cache)
        and os.path.getmtime(cache) >= os.path.getmtime(_SRC)
    ):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 _SRC, "-o", cache],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    return cache


def load() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        path = _build_lib()
        if path is not None:
            lib = ctypes.CDLL(path)
            lib.stencil_apply_ref.restype = None
            lib.snapshot_write.restype = ctypes.c_int
            lib.snapshot_read.restype = ctypes.c_int
            lib.crc32_buf.restype = ctypes.c_uint32
            lib.vtk_write_rectilinear.restype = ctypes.c_int
            _LIB = lib
    return _LIB


def available() -> bool:
    return load() is not None


def stencil_apply_ref(coeffs, x: np.ndarray) -> np.ndarray:
    """Independent C++ oracle for the per-axis (ap, ac, am) stencil
    (same semantics as ``ops.stencil.apply_axis_stencil`` for one
    component, wrap-around neighbors)."""
    lib = load()
    assert lib is not None, "native library unavailable"
    x = np.ascontiguousarray(x, dtype=np.float64)
    ndim = x.ndim
    out = np.empty_like(x)
    dims = (ctypes.c_int64 * ndim)(*x.shape)

    aps, acs, ams = [], [], []
    for (ap, ac, am) in coeffs:
        aps.append(np.ascontiguousarray(np.asarray(ap), dtype=np.float64))
        acs.append(np.ascontiguousarray(np.asarray(ac), dtype=np.float64))
        ams.append(np.ascontiguousarray(np.asarray(am), dtype=np.float64))

    def ptrs(arrs):
        arr_t = ctypes.POINTER(ctypes.c_double) * ndim
        return arr_t(
            *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) for a in arrs]
        )

    lib.stencil_apply_ref(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        dims,
        ctypes.c_int(ndim),
        ptrs(aps),
        ptrs(acs),
        ptrs(ams),
    )
    return out


def snapshot_write(path: str, arr: np.ndarray) -> None:
    lib = load()
    assert lib is not None, "native library unavailable"
    arr = np.ascontiguousarray(arr)
    assert arr.dtype.itemsize in (4, 8)
    dims = (ctypes.c_int64 * arr.ndim)(*arr.shape)
    rc = lib.snapshot_write(
        path.encode(),
        arr.ctypes.data_as(ctypes.c_void_p),
        dims,
        ctypes.c_int(arr.ndim),
        ctypes.c_int(arr.dtype.itemsize),
    )
    if rc != 0:
        raise IOError(f"snapshot_write failed: rc={rc}")


def snapshot_read(path: str, dtype) -> np.ndarray:
    lib = load()
    assert lib is not None, "native library unavailable"
    dims = (ctypes.c_int64 * 8)()
    ndim = ctypes.c_int32()
    itemsize = ctypes.c_int32()
    rc = lib.snapshot_read(
        path.encode(), None, dims, ctypes.byref(ndim), ctypes.byref(itemsize)
    )
    if rc != 0:
        raise IOError(f"snapshot_read header failed: rc={rc}")
    shape = tuple(dims[i] for i in range(ndim.value))
    dtype = np.dtype(dtype)
    assert dtype.itemsize == itemsize.value, "dtype mismatch"
    out = np.empty(shape, dtype=dtype)
    rc = lib.snapshot_read(
        path.encode(),
        out.ctypes.data_as(ctypes.c_void_p),
        dims,
        ctypes.byref(ndim),
        ctypes.byref(itemsize),
    )
    if rc != 0:
        raise IOError(f"snapshot_read failed: rc={rc} (crc/format)")
    return out
