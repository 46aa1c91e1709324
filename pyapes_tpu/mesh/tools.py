"""Mesh slicing helpers (reference ``pyapes/mesh/tools.py:7-32``)."""
from __future__ import annotations

import numpy as np

from pyapes_tpu.geometry.basis import DIR_TO_NUM, DIR_TO_NUM_RZ, SIDE_TO_NUM


def boundary_slicer(dim: int, bcs, coord_sys: str = "xyz") -> tuple[slice, ...]:
    """Interior slicer that keeps boundary nodes only on periodic faces
    (reference ``tools.py:7-20``)."""
    slice_idx: list[list[int | None]] = [[1, -1] for _ in range(dim)]
    d2n = DIR_TO_NUM if coord_sys == "xyz" else DIR_TO_NUM_RZ

    for bc in bcs or []:
        if bc.bc_type == "periodic":
            d_idx = d2n[bc.bc_face[0]]
            s_idx = SIDE_TO_NUM[bc.bc_face[1]]
            slice_idx[d_idx][s_idx] = None

    return tuple(slice(*slice_idx[i]) for i in range(dim))


def inner_slicer(dim: int, pad: int | None = 1) -> tuple[slice, ...]:
    """Interior slicer with a uniform pad (reference ``tools.py:23-32``)."""
    return tuple(
        slice(pad, -pad if isinstance(pad, int) else None) for _ in range(dim)
    )


def interior_mask(nx: tuple[int, ...], slicer: tuple[slice, ...]) -> np.ndarray:
    """0/1 float mask selecting the slicer region.

    Used by the jitted Krylov loop: the reference restricts residual updates
    via in-place slicing (``linalg.py:100-104``); the functional equivalent is
    multiplication by this static mask.
    """
    m = np.zeros(nx, dtype=np.float64)
    m[slicer] = 1.0
    return m


def interior_mask_device(nx: tuple[int, ...], slicer: tuple[slice, ...], dtype):
    """Same mask, built ON DEVICE from iota comparisons (traceable).

    A host-built full-grid mask becomes a giant HLO constant when closed
    over by jit (537 MB at 512^3) and dominates compile time; iota-based
    construction is a few scalar-compare fusions instead.
    """
    import jax.numpy as jnp

    m = jnp.ones(nx, dtype=dtype)
    for j, s in enumerate(slicer):
        n = nx[j]
        start = 0 if s.start is None else (s.start % n if s.start < 0 else s.start)
        stop = n if s.stop is None else (s.stop % n if s.stop < 0 else s.stop)
        shape = [1] * len(nx)
        shape[j] = -1
        idx = jnp.arange(n).reshape(shape)
        m = m * ((idx >= start) & (idx < stop)).astype(dtype)
    return m
