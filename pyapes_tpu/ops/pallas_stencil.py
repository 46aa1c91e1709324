"""Fused Pallas TPU stencil kernels.

The jnp fallback (``ops/stencil.py``) expresses the stencil as roll-sums;
XLA materializes each roll as a copy, so a 3-D 7-point apply moves ~6x the
necessary bytes. These kernels perform the whole apply in ONE pass: the
grid is tiled (x-slabs in 2-D; x-slabs x y-tiles in 3-D); the tile body is
a pipelined BlockSpec input (Pallas double-buffers it), ghost planes are
fetched by manual DMA with modular indexing (exact torus wrap).

TPU memref slicing must respect the (8, 128) tiling of the last two dims,
so ghost planes along a *tiled* axis are fetched as 8-row aligned blocks
and the wanted row is selected in-register with an iota compare.

``pallas_supported`` gates shapes; the solver falls back to the jnp path
otherwise.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 4 * 1024 * 1024  # per-program tile budget (bytes)
# Mosaic scoped-vmem ceiling (default 16 MB rejects large-nz tiles)
_VMEM_LIMIT = 64 * 1024 * 1024


def _sublane(dtype) -> int:
    """Minimum sublane extent for HBM memref slices of this dtype: the TPU
    tile is (8, 128) for 4-byte types, (16, 128) for 2-byte (bf16), so
    sliced sublane offsets/extents must be multiples of 32 bytes / itemsize."""
    return max(8, 32 // np.dtype(dtype).itemsize)


def _pick_tile(n: int, max_tile: int, step: int = 1) -> int:
    for t in range(min(max_tile, n), 0, -1):
        if n % t == 0 and t % step == 0:
            return t
    return 0


def _mod(i, n):
    return jax.lax.rem(i + jnp.int32(n), jnp.int32(n))


def _select_row(block8, off, axis):
    """Select one row from a sublane-aligned block (in-register; Mosaic
    cannot slice at dynamic sublane offsets)."""
    shape = [1] * block8.ndim
    shape[axis] = block8.shape[axis]
    ids = jax.lax.broadcasted_iota(jnp.int32, tuple(shape), axis)
    return jnp.sum(
        jnp.where(ids == off, block8, jnp.zeros_like(block8)),
        axis=axis,
        keepdims=True,
    )


def _stencil3d_kernel(
    x_any,
    body,
    ap0, ac0, am0, ap1, ac1, am1, ap2, ac2, am2,
    out_ref,
    xg_lo, xg_hi, yg_lo, yg_hi,
    sems,
    *,
    tx: int,
    ty: int,
    nx: int,
    ny: int,
    sub: int = 8,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    sx = i * tx
    sy = pl.multiple_of(j * ty, sub)

    gy_lo = _mod(sy - 1, ny)
    gy_hi = _mod(sy + ty, ny)
    gy_lo_blk = pl.multiple_of((gy_lo // sub) * sub, sub)
    gy_hi_blk = pl.multiple_of((gy_hi // sub) * sub, sub)

    copies = [
        pltpu.make_async_copy(
            x_any.at[pl.ds(_mod(sx - 1, nx), 1), pl.ds(sy, ty)],
            xg_lo, sems.at[0],
        ),
        pltpu.make_async_copy(
            x_any.at[pl.ds(_mod(sx + tx, nx), 1), pl.ds(sy, ty)],
            xg_hi, sems.at[1],
        ),
        pltpu.make_async_copy(
            x_any.at[pl.ds(sx, tx), pl.ds(gy_lo_blk, sub)], yg_lo, sems.at[2]
        ),
        pltpu.make_async_copy(
            x_any.at[pl.ds(sx, tx), pl.ds(gy_hi_blk, sub)], yg_hi, sems.at[3]
        ),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    # Sub-32-bit inputs (bf16): HBM traffic stays narrow, but in-register
    # math upcasts to f32 (Mosaic has no 16-bit rotate; and it keeps the
    # stencil sum accurate).
    cdt = jnp.promote_types(body.dtype, jnp.float32)
    xc = body[:, :, :].astype(cdt)
    nz = xc.shape[2]

    # x-axis: roll within the slab, boundary rows patched with ghosts.
    xids = jax.lax.broadcasted_iota(jnp.int32, (tx, 1, 1), 0)
    xm = jnp.where(xids == 0, xg_lo[:, :, :].astype(cdt), pltpu.roll(xc, 1, 0))
    xp = jnp.where(
        xids == tx - 1, xg_hi[:, :, :].astype(cdt), pltpu.roll(xc, tx - 1, 0)
    )

    out = (
        ap0[:, 0:1].astype(cdt).reshape(tx, 1, 1) * xp
        + ac0[:, 0:1].astype(cdt).reshape(tx, 1, 1) * xc
        + am0[:, 0:1].astype(cdt).reshape(tx, 1, 1) * xm
    )

    # y-axis: select ghost rows from the sublane-aligned fetches.
    g_lo = _select_row(yg_lo[:, :, :].astype(cdt), gy_lo - gy_lo_blk, 1)
    g_hi = _select_row(yg_hi[:, :, :].astype(cdt), gy_hi - gy_hi_blk, 1)
    yids = jax.lax.broadcasted_iota(jnp.int32, (1, ty, 1), 1)
    ym = jnp.where(yids == 0, g_lo, pltpu.roll(xc, 1, 1))
    yp = jnp.where(yids == ty - 1, g_hi, pltpu.roll(xc, ty - 1, 1))

    out += (
        ap1[:, 0:1].astype(cdt).reshape(1, ty, 1) * yp
        + ac1[:, 0:1].astype(cdt).reshape(1, ty, 1) * xc
        + am1[:, 0:1].astype(cdt).reshape(1, ty, 1) * ym
    )

    # z-axis: full extent in-tile; rolls are exact wraps.
    out += (
        ap2[:].astype(cdt).reshape(1, 1, nz) * pltpu.roll(xc, nz - 1, 2)
        + ac2[:].astype(cdt).reshape(1, 1, nz) * xc
        + am2[:].astype(cdt).reshape(1, 1, nz) * pltpu.roll(xc, 1, 2)
    )

    out_ref[:, :, :] = out.astype(out_ref.dtype)


def _stencil2d_kernel(
    x_any,
    body,
    ap0, ac0, am0, ap1, ac1, am1,
    out_ref,
    xg_lo, xg_hi,
    sems,
    *,
    tx: int,
    nx: int,
    sub: int = 8,
):
    i = pl.program_id(0)
    sx = pl.multiple_of(i * tx, sub)

    g_lo = _mod(sx - 1, nx)
    g_hi = _mod(sx + tx, nx)
    g_lo_blk = pl.multiple_of((g_lo // sub) * sub, sub)
    g_hi_blk = pl.multiple_of((g_hi // sub) * sub, sub)

    copies = [
        pltpu.make_async_copy(
            x_any.at[pl.ds(g_lo_blk, sub)], xg_lo, sems.at[0]
        ),
        pltpu.make_async_copy(
            x_any.at[pl.ds(g_hi_blk, sub)], xg_hi, sems.at[1]
        ),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    cdt = jnp.promote_types(body.dtype, jnp.float32)
    xc = body[:, :].astype(cdt)
    ny = xc.shape[1]

    lo = _select_row(xg_lo[:, :].astype(cdt), g_lo - g_lo_blk, 0)
    hi = _select_row(xg_hi[:, :].astype(cdt), g_hi - g_hi_blk, 0)
    xids = jax.lax.broadcasted_iota(jnp.int32, (tx, 1), 0)
    xm = jnp.where(xids == 0, lo, pltpu.roll(xc, 1, 0))
    xp = jnp.where(xids == tx - 1, hi, pltpu.roll(xc, tx - 1, 0))

    out = (
        ap0[:, 0:1].astype(cdt).reshape(tx, 1) * xp
        + ac0[:, 0:1].astype(cdt).reshape(tx, 1) * xc
        + am0[:, 0:1].astype(cdt).reshape(tx, 1) * xm
    )
    out += (
        ap1[:].astype(cdt).reshape(1, ny) * pltpu.roll(xc, ny - 1, 1)
        + ac1[:].astype(cdt).reshape(1, ny) * xc
        + am1[:].astype(cdt).reshape(1, ny) * pltpu.roll(xc, 1, 1)
    )
    out_ref[:, :] = out.astype(out_ref.dtype)


def _lane_bcast(c: jnp.ndarray) -> jnp.ndarray:
    """(n,) -> (n, 128): tile-sliced coefficient vectors ride as
    lane-broadcast 2-D arrays (Mosaic alignment)."""
    return jnp.broadcast_to(c[:, None], (c.shape[0], 128))


def _tiles_3d(gs, itemsize, sub: int = 8):
    nx, ny, nz = gs
    tx = _pick_tile(nx, 8)
    max_ty = max(
        sub,
        (_VMEM_BUDGET // max(1, (tx + 2) * nz * itemsize) // sub) * sub,
    )
    ty = _pick_tile(ny, max_ty, step=sub)
    return tx, ty


def pallas_supported(shape: tuple[int, ...], dtype=jnp.float32) -> bool:
    """Whether SOME fused kernel supports this grid shape + dtype.

    3-D grids prefer the slab-resident v3 kernels (``pallas_stencil_v3``:
    only ``nz % 128 == 0`` + a VMEM-fit condition); the v2 tiled kernels
    remain for 2-D grids and 3-D shapes whose y-z planes exceed VMEM."""
    if len(shape) == 3:
        from pyapes_tpu.ops.pallas_stencil_v3 import v3_supported

        # streams=3 guarantees the jacobi/residual kernel fits too, so one
        # gate serves the solver and the multigrid preconditioner alike.
        if v3_supported(shape, dtype, streams=3):
            return True
    return _v2_supported(shape, dtype)


def _v2_supported(shape: tuple[int, ...], dtype=jnp.float32) -> bool:
    """v2 (tiled ghost-DMA) kernel gate: the lane dim must be a 128
    multiple and sliced sublane dims aligned to the dtype tile (8 rows for
    f32, 16 for bf16)."""
    sub = _sublane(dtype)
    # In-register math runs in f32 even for bf16 blocks; budget tiles on
    # the wider temporaries.
    itemsize = max(4, np.dtype(dtype).itemsize)
    if shape[-1] % 128 != 0:
        return False
    if len(shape) == 3:
        nx, ny, nz = shape
        if ny % sub != 0:
            return False
        tx, ty = _tiles_3d(shape, itemsize, sub)
        return tx > 0 and ty >= sub
    if len(shape) == 2:
        nx, ny = shape
        return nx % sub == 0 and _pick_tile(nx, 256, step=sub) >= sub
    return False


def _pad_targets(gs, dtype):
    """Aligned shape for pad-and-crop, or None if already aligned."""
    sub = _sublane(dtype)
    tgt = list(gs)
    tgt[-1] = -(-gs[-1] // 128) * 128
    if len(gs) == 3:
        # v3 slab kernel: y is unconstrained; x only needs a reasonable
        # slab divisor (multiple of 8 gives tx=8). Minimal padding.
        from pyapes_tpu.ops.pallas_stencil_v3 import v3_supported

        tgt[0] = -(-gs[0] // 8) * 8
        if v3_supported(tuple(tgt), dtype, streams=3):
            return None if tuple(tgt) == tuple(gs) else tuple(tgt)
        # fall back to v2 tiling requirements (y sublane-aligned)
        tgt[1] = -(-gs[1] // sub) * sub
    else:
        tgt[0] = -(-gs[0] // sub) * sub
    return None if tuple(tgt) == tuple(gs) else tuple(tgt)


def pallas_padded_supported(shape, dtype=jnp.float32, paxes=()) -> bool:
    """Whether pad-and-crop makes the fused kernel usable for this shape.

    Zero-padding an axis breaks the torus wrap, so every axis that needs
    padding must be non-periodic (its real boundary rows are masked by the
    solver's interior restriction OUTSIDE the kernel, and the stencil's
    reads of the zero pad only reach masked rows)."""
    if pallas_supported(shape, dtype):
        return True
    if len(shape) not in (2, 3):
        return False
    tgt = _pad_targets(shape, dtype)
    if tgt is None or not pallas_supported(tgt, dtype):
        return False
    for j, (n, t) in enumerate(zip(shape, tgt)):
        if t != n and j in paxes:
            return False
    return True


def pallas_axis_stencil_padded(coeffs, x, paxes=(), interpret=False):
    """Fused stencil apply with zero pad-and-crop for unaligned shapes
    (65^3-style grids). Only valid when padded axes are non-periodic AND
    the caller masks boundary rows afterwards (the Krylov solvers do)."""
    gs = x.shape[1:]
    if pallas_supported(gs, x.dtype):
        return pallas_axis_stencil(coeffs, x, interpret)
    tgt = _pad_targets(gs, x.dtype)
    assert tgt is not None and pallas_padded_supported(gs, x.dtype, paxes)
    pad = [(0, 0)] + [(0, t - n) for n, t in zip(gs, tgt)]
    xp = jnp.pad(x, pad)
    cp = tuple(
        tuple(jnp.pad(c, (0, t - n)) for c in cs)
        for cs, (n, t) in zip(coeffs, zip(gs, tgt))
    )
    out = pallas_axis_stencil(cp, xp, interpret)
    crop = (slice(None),) + tuple(slice(0, n) for n in gs)
    return out[crop]


def pallas_axis_stencil(coeffs, x: jnp.ndarray, interpret: bool = False):
    """Fused per-axis stencil apply via Pallas (TPU hot path).

    Drop-in equivalent of ``ops.stencil.apply_axis_stencil`` for supported
    2-D/3-D grids (see ``pallas_supported``). ``x``: ``(vdim, *nx)``.
    """
    ndim = x.ndim - 1
    gs = x.shape[1:]
    if ndim == 3 and not _v2_supported(gs, x.dtype):
        # v3 (slab-resident) covers shapes v2 cannot (any ny, bf16 odd
        # sublanes). v2 stays the default where both apply: measured
        # 3.25 ms vs 4.12 ms at 512^3 f32 on v5e (v3's full-plane tiles
        # are VPU-bound on the wide sublane rolls).
        from pyapes_tpu.ops.pallas_stencil_v3 import (
            pallas_axis_stencil_v3,
            v3_supported,
        )

        if v3_supported(gs, x.dtype, streams=3):
            return pallas_axis_stencil_v3(coeffs, x, interpret)
    assert _v2_supported(gs, x.dtype), (
        f"pallas stencil: unsupported shape {gs} / {x.dtype}"
    )
    itemsize = max(4, np.dtype(x.dtype).itemsize)
    sub = _sublane(x.dtype)

    if ndim == 3 and not interpret:
        # Double-buffered variant: next tile's ghost DMAs overlap this
        # tile's compute (~1.3x; bit-identical). Interpret mode keeps this
        # base kernel so tests cover both.
        from pyapes_tpu.ops.pallas_stencil_db import pallas_axis_stencil_db

        return pallas_axis_stencil_db(coeffs, x)

    if ndim == 3:
        nx, ny, nz = gs
        tx, ty = _tiles_3d(gs, itemsize, sub)

        flat = [
            _lane_bcast(coeffs[0][0]), _lane_bcast(coeffs[0][1]),
            _lane_bcast(coeffs[0][2]),
            _lane_bcast(coeffs[1][0]), _lane_bcast(coeffs[1][1]),
            _lane_bcast(coeffs[1][2]),
            coeffs[2][0], coeffs[2][1], coeffs[2][2],
        ]
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (tx, ty, nz), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
        ]
        in_specs += [
            pl.BlockSpec((tx, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
        ] * 3
        in_specs += [
            pl.BlockSpec((ty, 128), lambda i, j: (j, 0), memory_space=pltpu.VMEM)
        ] * 3
        in_specs += [
            pl.BlockSpec((nz,), lambda i, j: (0,), memory_space=pltpu.VMEM)
        ] * 3
        out_spec = pl.BlockSpec(
            (tx, ty, nz), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        )
        call = pl.pallas_call(
            partial(_stencil3d_kernel, tx=tx, ty=ty, nx=nx, ny=ny, sub=sub),
            grid=(nx // tx, ny // ty),
            out_shape=jax.ShapeDtypeStruct(gs, x.dtype),
            in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((1, ty, nz), x.dtype),
                pltpu.VMEM((1, ty, nz), x.dtype),
                pltpu.VMEM((tx, sub, nz), x.dtype),
                pltpu.VMEM((tx, sub, nz), x.dtype),
                pltpu.SemaphoreType.DMA((4,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT
            ),
            interpret=interpret,
        )

        def run(comp):
            return call(comp, comp, *flat)

    else:
        nx, ny = gs
        max_tx = max(
            sub, (_VMEM_BUDGET // max(1, ny * itemsize) // sub) * sub
        )
        tx = _pick_tile(nx, min(256, max_tx), step=sub)
        flat = [
            _lane_bcast(coeffs[0][0]), _lane_bcast(coeffs[0][1]),
            _lane_bcast(coeffs[0][2]),
            coeffs[1][0], coeffs[1][1], coeffs[1][2],
        ]
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((tx, ny), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        in_specs += [
            pl.BlockSpec((tx, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ] * 3
        in_specs += [
            pl.BlockSpec((ny,), lambda i: (0,), memory_space=pltpu.VMEM)
        ] * 3
        out_spec = pl.BlockSpec(
            (tx, ny), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        call = pl.pallas_call(
            partial(_stencil2d_kernel, tx=tx, nx=nx, sub=sub),
            grid=(nx // tx,),
            out_shape=jax.ShapeDtypeStruct(gs, x.dtype),
            in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((sub, ny), x.dtype),
                pltpu.VMEM((sub, ny), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT
            ),
            interpret=interpret,
        )

        def run(comp):
            return call(comp, comp, *flat)

    outs = [run(x[d]) for d in range(x.shape[0])]
    return jnp.stack(outs)


# ---------------------------------------------------------------------------
# Fused Jacobi smoother / residual kernel for the multigrid V-cycle
# (scalar per-axis Laplacian coefficients; see solver/multigrid.py).
# Computes out = alpha * x + beta * mask * (b - A x) in ONE pass:
#   alpha=1, beta=omega/diag  -> damped-Jacobi smooth step
#   alpha=0, beta=1           -> masked residual
# ---------------------------------------------------------------------------


def _jacobi3d_kernel(
    x_any,
    body,
    b_blk,
    out_ref,
    xg_lo, xg_hi, yg_lo, yg_hi,
    sems,
    *,
    tx: int,
    ty: int,
    nx: int,
    ny: int,
    inv_dx2: tuple,
    alpha: float,
    beta: float,
    mask_axes: tuple,
    sub: int = 8,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    sx = i * tx
    sy = pl.multiple_of(j * ty, sub)

    gy_lo = _mod(sy - 1, ny)
    gy_hi = _mod(sy + ty, ny)
    gy_lo_blk = pl.multiple_of((gy_lo // sub) * sub, sub)
    gy_hi_blk = pl.multiple_of((gy_hi // sub) * sub, sub)

    copies = [
        pltpu.make_async_copy(
            x_any.at[pl.ds(_mod(sx - 1, nx), 1), pl.ds(sy, ty)],
            xg_lo, sems.at[0],
        ),
        pltpu.make_async_copy(
            x_any.at[pl.ds(_mod(sx + tx, nx), 1), pl.ds(sy, ty)],
            xg_hi, sems.at[1],
        ),
        pltpu.make_async_copy(
            x_any.at[pl.ds(sx, tx), pl.ds(gy_lo_blk, sub)], yg_lo, sems.at[2]
        ),
        pltpu.make_async_copy(
            x_any.at[pl.ds(sx, tx), pl.ds(gy_hi_blk, sub)], yg_hi, sems.at[3]
        ),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    cdt = jnp.promote_types(body.dtype, jnp.float32)
    xc = body[:, :, :].astype(cdt)
    nz = xc.shape[2]

    xids = jax.lax.broadcasted_iota(jnp.int32, (tx, 1, 1), 0)
    xm = jnp.where(xids == 0, xg_lo[:, :, :].astype(cdt), pltpu.roll(xc, 1, 0))
    xp = jnp.where(
        xids == tx - 1, xg_hi[:, :, :].astype(cdt), pltpu.roll(xc, tx - 1, 0)
    )

    g_lo = _select_row(yg_lo[:, :, :].astype(cdt), gy_lo - gy_lo_blk, 1)
    g_hi = _select_row(yg_hi[:, :, :].astype(cdt), gy_hi - gy_hi_blk, 1)
    yids = jax.lax.broadcasted_iota(jnp.int32, (1, ty, 1), 1)
    ym = jnp.where(yids == 0, g_lo, pltpu.roll(xc, 1, 1))
    yp = jnp.where(yids == ty - 1, g_hi, pltpu.roll(xc, ty - 1, 1))

    ax = inv_dx2[0] * (xp + xm - 2.0 * xc)
    ax += inv_dx2[1] * (yp + ym - 2.0 * xc)
    ax += inv_dx2[2] * (
        pltpu.roll(xc, nz - 1, 2) + pltpu.roll(xc, 1, 2) - 2.0 * xc
    )

    upd = b_blk[:, :, :].astype(cdt) - ax
    # interior mask: zero global-boundary rows on masked axes
    if 0 in mask_axes:
        gx = xids + sx
        upd = jnp.where((gx == 0) | (gx == nx - 1), 0.0, upd)
    if 1 in mask_axes:
        gy = yids + sy
        upd = jnp.where((gy == 0) | (gy == ny - 1), 0.0, upd)
    if 2 in mask_axes:
        zids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nz), 2)
        upd = jnp.where((zids == 0) | (zids == nz - 1), 0.0, upd)

    out_ref[:, :, :] = (alpha * xc + beta * upd).astype(out_ref.dtype)


def pallas_jacobi3d(
    x: jnp.ndarray,
    b: jnp.ndarray,
    inv_dx2: tuple,
    alpha: float,
    beta: float,
    mask_axes: tuple,
    interpret: bool = False,
):
    """Fused ``alpha x + beta mask (b - A x)`` for the 3-D scalar-coefficient
    Laplacian. ``x``/``b``: ``(vdim, *nx)``."""
    gs = x.shape[1:]
    if len(gs) == 3 and not _v2_supported(gs, x.dtype):
        from pyapes_tpu.ops.pallas_stencil_v3 import (
            pallas_jacobi3d_v3,
            v3_supported,
        )

        if v3_supported(gs, x.dtype, streams=3):
            return pallas_jacobi3d_v3(
                x, b, inv_dx2, alpha, beta, mask_axes, interpret
            )
    assert len(gs) == 3 and _v2_supported(gs, x.dtype)
    if not interpret:
        from pyapes_tpu.ops.pallas_stencil_db import pallas_jacobi3d_db

        return pallas_jacobi3d_db(x, b, inv_dx2, alpha, beta, mask_axes)
    itemsize = max(4, np.dtype(x.dtype).itemsize)
    sub = _sublane(x.dtype)
    nx, ny, nz = gs
    tx, ty = _tiles_3d(gs, itemsize, sub)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec((tx, ty, nz), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tx, ty, nz), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec(
        (tx, ty, nz), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    call = pl.pallas_call(
        partial(
            _jacobi3d_kernel,
            tx=tx, ty=ty, nx=nx, ny=ny,
            inv_dx2=tuple(float(v) for v in inv_dx2),
            alpha=float(alpha), beta=float(beta),
            mask_axes=tuple(mask_axes), sub=sub,
        ),
        grid=(nx // tx, ny // ty),
        out_shape=jax.ShapeDtypeStruct(gs, x.dtype),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((1, ty, nz), x.dtype),
            pltpu.VMEM((1, ty, nz), x.dtype),
            pltpu.VMEM((tx, sub, nz), x.dtype),
            pltpu.VMEM((tx, sub, nz), x.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )
    outs = [call(x[d], x[d], b[d]) for d in range(x.shape[0])]
    return jnp.stack(outs)
