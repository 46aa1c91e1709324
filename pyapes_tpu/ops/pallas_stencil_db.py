"""Double-buffered variant of the 3-D fused stencil kernel.

The base kernel (``pallas_stencil.py``) serializes ghost-plane DMAs before
each tile's compute; here each program starts the NEXT program's ghost
fetches before computing, hiding DMA latency behind compute (scratch and
semaphores persist across grid steps — standard Pallas pipelining).
Measured ~1.25x over the base kernel at 512^3; selected automatically.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic scoped-vmem ceiling: the default 16 MB limit rejects large-nz
# tiles (768^3: 19.7 MB needed) even though the chip has 128 MB VMEM.
_VMEM_LIMIT = 64 * 1024 * 1024

from pyapes_tpu.ops.pallas_stencil import (
    _lane_bcast,
    _mod,
    _select_row,
    _sublane,
    _tiles_3d,
    _v2_supported,
)


def _ghost_copies(x_any, slot, sx, sy, tx, ty, nx, ny, bufs, sems, sub=8):
    xg_lo, xg_hi, yg_lo, yg_hi = bufs
    gy_lo = _mod(sy - 1, ny)
    gy_hi = _mod(sy + ty, ny)
    gy_lo_blk = pl.multiple_of((gy_lo // sub) * sub, sub)
    gy_hi_blk = pl.multiple_of((gy_hi // sub) * sub, sub)
    return [
        pltpu.make_async_copy(
            x_any.at[pl.ds(_mod(sx - 1, nx), 1), pl.ds(sy, ty)],
            xg_lo.at[slot],
            sems.at[slot, 0],
        ),
        pltpu.make_async_copy(
            x_any.at[pl.ds(_mod(sx + tx, nx), 1), pl.ds(sy, ty)],
            xg_hi.at[slot],
            sems.at[slot, 1],
        ),
        pltpu.make_async_copy(
            x_any.at[pl.ds(sx, tx), pl.ds(gy_lo_blk, sub)],
            yg_lo.at[slot],
            sems.at[slot, 2],
        ),
        pltpu.make_async_copy(
            x_any.at[pl.ds(sx, tx), pl.ds(gy_hi_blk, sub)],
            yg_hi.at[slot],
            sems.at[slot, 3],
        ),
    ]


def _stencil3d_db_compute(
    x_any,
    body,
    ap0, ac0, am0, ap1, ac1, am1, ap2, ac2, am2,
    xg_lo, xg_hi, yg_lo, yg_hi,
    sems,
    tx: int,
    ty: int,
    nx: int,
    ny: int,
    sub: int = 8,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    g = i * nj + j
    slot = jax.lax.rem(g, jnp.int32(2))
    nslot = jax.lax.rem(g + 1, jnp.int32(2))

    sx = i * tx
    sy = pl.multiple_of(j * ty, sub)

    bufs = (xg_lo, xg_hi, yg_lo, yg_hi)

    # First program: start its own ghosts.
    @pl.when(g == 0)
    def _():
        for c in _ghost_copies(
            x_any, slot, sx, sy, tx, ty, nx, ny, bufs, sems, sub
        ):
            c.start()

    # Start the NEXT program's ghosts (overlaps with this compute).
    j2 = jax.lax.rem(j + 1, jnp.int32(nj))
    i2 = i + (j + 1) // nj
    last = g == pl.num_programs(0) * nj - 1

    @pl.when(jnp.logical_not(last))
    def _():
        sx2 = i2 * tx
        sy2 = pl.multiple_of(j2 * ty, sub)
        for c in _ghost_copies(
            x_any, nslot, sx2, sy2, tx, ty, nx, ny, bufs, sems, sub
        ):
            c.start()

    # Wait for this program's ghosts.
    gy_lo = _mod(sy - 1, ny)
    gy_hi = _mod(sy + ty, ny)
    gy_lo_blk = pl.multiple_of((gy_lo // sub) * sub, sub)
    gy_hi_blk = pl.multiple_of((gy_hi // sub) * sub, sub)
    for c in _ghost_copies(
        x_any, slot, sx, sy, tx, ty, nx, ny, bufs, sems, sub
    ):
        c.wait()

    # bf16 inputs: narrow HBM traffic, f32 in-register math (see the base
    # kernel in pallas_stencil.py).
    cdt = jnp.promote_types(body.dtype, jnp.float32)
    xc = body[:, :, :].astype(cdt)
    nz = xc.shape[2]

    xids = jax.lax.broadcasted_iota(jnp.int32, (tx, 1, 1), 0)
    xm = jnp.where(xids == 0, xg_lo[slot].astype(cdt), pltpu.roll(xc, 1, 0))
    xp = jnp.where(
        xids == tx - 1, xg_hi[slot].astype(cdt), pltpu.roll(xc, tx - 1, 0)
    )

    out = (
        ap0[:, 0:1].astype(cdt).reshape(tx, 1, 1) * xp
        + ac0[:, 0:1].astype(cdt).reshape(tx, 1, 1) * xc
        + am0[:, 0:1].astype(cdt).reshape(tx, 1, 1) * xm
    )

    g_lo = _select_row(yg_lo[slot].astype(cdt), gy_lo - gy_lo_blk, 1)
    g_hi = _select_row(yg_hi[slot].astype(cdt), gy_hi - gy_hi_blk, 1)
    yids = jax.lax.broadcasted_iota(jnp.int32, (1, ty, 1), 1)
    ym = jnp.where(yids == 0, g_lo, pltpu.roll(xc, 1, 1))
    yp = jnp.where(yids == ty - 1, g_hi, pltpu.roll(xc, ty - 1, 1))

    out += (
        ap1[:, 0:1].astype(cdt).reshape(1, ty, 1) * yp
        + ac1[:, 0:1].astype(cdt).reshape(1, ty, 1) * xc
        + am1[:, 0:1].astype(cdt).reshape(1, ty, 1) * ym
    )

    out += (
        ap2[:].astype(cdt).reshape(1, 1, nz) * pltpu.roll(xc, nz - 1, 2)
        + ac2[:].astype(cdt).reshape(1, 1, nz) * xc
        + am2[:].astype(cdt).reshape(1, 1, nz) * pltpu.roll(xc, 1, 2)
    )
    return xc, out


def _stencil3d_db_kernel(
    x_any, body,
    ap0, ac0, am0, ap1, ac1, am1, ap2, ac2, am2,
    out_ref,
    xg_lo, xg_hi, yg_lo, yg_hi, sems,
    *, tx: int, ty: int, nx: int, ny: int, sub: int = 8,
):
    _, out = _stencil3d_db_compute(
        x_any, body, ap0, ac0, am0, ap1, ac1, am1, ap2, ac2, am2,
        xg_lo, xg_hi, yg_lo, yg_hi, sems, tx, ty, nx, ny, sub,
    )
    out_ref[:, :, :] = out.astype(out_ref.dtype)


def _stencil3d_dot_db_kernel(
    x_any, body,
    ap0, ac0, am0, ap1, ac1, am1, ap2, ac2, am2,
    out_ref, dot_ref,
    xg_lo, xg_hi, yg_lo, yg_hi, sems,
    *, tx: int, ty: int, nx: int, ny: int, sub: int = 8,
):
    """Stencil apply + per-program partial dot ``sum(x * (A x))`` — fuses
    the CG ``dot(d, A d)`` into the operator kernel (both tiles are already
    in registers; saves a full re-read of two 512^3 arrays per iteration)."""
    xc, out = _stencil3d_db_compute(
        x_any, body, ap0, ac0, am0, ap1, ac1, am1, ap2, ac2, am2,
        xg_lo, xg_hi, yg_lo, yg_hi, sems, tx, ty, nx, ny, sub,
    )
    out_ref[:, :, :] = out.astype(out_ref.dtype)
    # dot_ref is the FULL (gi, gj) partials array in SMEM (constant index
    # map -> it stays resident across the sequential grid); each program
    # writes its own slot.
    dot_ref[pl.program_id(0), pl.program_id(1)] = jnp.sum(xc * out)


def pallas_axis_stencil_db(coeffs, x: jnp.ndarray, interpret: bool = False):
    """Double-buffered 3-D fused stencil apply."""
    gs = x.shape[1:]
    assert len(gs) == 3 and _v2_supported(gs, x.dtype)
    itemsize = max(4, np.dtype(x.dtype).itemsize)
    sub = _sublane(x.dtype)
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
        pl.BlockSpec((tx, ty, nz), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
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
        partial(_stencil3d_db_kernel, tx=tx, ty=ty, nx=nx, ny=ny, sub=sub),
        grid=(nx // tx, ny // ty),
        out_shape=jax.ShapeDtypeStruct(gs, x.dtype),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((2, 1, ty, nz), x.dtype),
            pltpu.VMEM((2, 1, ty, nz), x.dtype),
            pltpu.VMEM((2, tx, sub, nz), x.dtype),
            pltpu.VMEM((2, tx, sub, nz), x.dtype),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )
    outs = [call(x[d], x[d], *flat) for d in range(x.shape[0])]
    return jnp.stack(outs)


def pallas_axis_stencil_dot(coeffs, x: jnp.ndarray, interpret: bool = False):
    """Double-buffered 3-D stencil apply that also returns ``sum(x * A x)``
    per component (fused CG alpha-dot; see ``_stencil3d_dot_db_kernel``).

    Returns ``(A x, dots)`` with ``dots`` shaped ``(vdim, 1, 1, 1)``.
    """
    gs = x.shape[1:]
    if len(gs) == 3 and not _v2_supported(gs, x.dtype):
        from pyapes_tpu.ops.pallas_stencil_v3 import (
            pallas_axis_stencil_dot_v3,
            v3_supported,
        )

        if v3_supported(gs, x.dtype, streams=3):
            return pallas_axis_stencil_dot_v3(coeffs, x, interpret)
    assert len(gs) == 3 and _v2_supported(gs, x.dtype)
    itemsize = max(4, np.dtype(x.dtype).itemsize)
    sub = _sublane(x.dtype)
    nx, ny, nz = gs
    tx, ty = _tiles_3d(gs, itemsize, sub)
    ddt = jnp.promote_types(x.dtype, jnp.float32)

    flat = [
        _lane_bcast(coeffs[0][0]), _lane_bcast(coeffs[0][1]),
        _lane_bcast(coeffs[0][2]),
        _lane_bcast(coeffs[1][0]), _lane_bcast(coeffs[1][1]),
        _lane_bcast(coeffs[1][2]),
        coeffs[2][0], coeffs[2][1], coeffs[2][2],
    ]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec((tx, ty, nz), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
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
    gi, gj = nx // tx, ny // ty
    out_specs = [
        pl.BlockSpec((tx, ty, nz), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gi, gj), lambda i, j: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    call = pl.pallas_call(
        partial(_stencil3d_dot_db_kernel, tx=tx, ty=ty, nx=nx, ny=ny, sub=sub),
        grid=(nx // tx, ny // ty),
        out_shape=[
            jax.ShapeDtypeStruct(gs, x.dtype),
            jax.ShapeDtypeStruct((nx // tx, ny // ty), ddt),
        ],
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, 1, ty, nz), x.dtype),
            pltpu.VMEM((2, 1, ty, nz), x.dtype),
            pltpu.VMEM((2, tx, sub, nz), x.dtype),
            pltpu.VMEM((2, tx, sub, nz), x.dtype),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )
    outs, dots = [], []
    for d in range(x.shape[0]):
        o, p = call(x[d], x[d], *flat)
        outs.append(o)
        dots.append(jnp.sum(p))
    return (
        jnp.stack(outs),
        jnp.stack(dots).reshape((x.shape[0],) + (1,) * len(gs)),
    )


def _jacobi3d_db_kernel(
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
    nj = pl.num_programs(1)
    g = i * nj + j
    slot = jax.lax.rem(g, jnp.int32(2))
    nslot = jax.lax.rem(g + 1, jnp.int32(2))

    sx = i * tx
    sy = pl.multiple_of(j * ty, sub)
    bufs = (xg_lo, xg_hi, yg_lo, yg_hi)

    @pl.when(g == 0)
    def _():
        for c in _ghost_copies(
            x_any, slot, sx, sy, tx, ty, nx, ny, bufs, sems, sub
        ):
            c.start()

    j2 = jax.lax.rem(j + 1, jnp.int32(nj))
    i2 = i + (j + 1) // nj
    last = g == pl.num_programs(0) * nj - 1

    @pl.when(jnp.logical_not(last))
    def _():
        sx2 = i2 * tx
        sy2 = pl.multiple_of(j2 * ty, sub)
        for c in _ghost_copies(
            x_any, nslot, sx2, sy2, tx, ty, nx, ny, bufs, sems, sub
        ):
            c.start()

    gy_lo = _mod(sy - 1, ny)
    gy_hi = _mod(sy + ty, ny)
    gy_lo_blk = pl.multiple_of((gy_lo // sub) * sub, sub)
    gy_hi_blk = pl.multiple_of((gy_hi // sub) * sub, sub)
    for c in _ghost_copies(
        x_any, slot, sx, sy, tx, ty, nx, ny, bufs, sems, sub
    ):
        c.wait()

    cdt = jnp.promote_types(body.dtype, jnp.float32)
    xc = body[:, :, :].astype(cdt)
    nz = xc.shape[2]

    xids = jax.lax.broadcasted_iota(jnp.int32, (tx, 1, 1), 0)
    xm = jnp.where(xids == 0, xg_lo[slot].astype(cdt), pltpu.roll(xc, 1, 0))
    xp = jnp.where(
        xids == tx - 1, xg_hi[slot].astype(cdt), pltpu.roll(xc, tx - 1, 0)
    )

    g_lo = _select_row(yg_lo[slot].astype(cdt), gy_lo - gy_lo_blk, 1)
    g_hi = _select_row(yg_hi[slot].astype(cdt), gy_hi - gy_hi_blk, 1)
    yids = jax.lax.broadcasted_iota(jnp.int32, (1, ty, 1), 1)
    ym = jnp.where(yids == 0, g_lo, pltpu.roll(xc, 1, 1))
    yp = jnp.where(yids == ty - 1, g_hi, pltpu.roll(xc, ty - 1, 1))

    ax = inv_dx2[0] * (xp + xm - 2.0 * xc)
    ax += inv_dx2[1] * (yp + ym - 2.0 * xc)
    ax += inv_dx2[2] * (
        pltpu.roll(xc, nz - 1, 2) + pltpu.roll(xc, 1, 2) - 2.0 * xc
    )

    upd = b_blk[:, :, :].astype(cdt) - ax
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


def pallas_jacobi3d_db(
    x, b, inv_dx2, alpha, beta, mask_axes, interpret: bool = False
):
    """Double-buffered fused Jacobi smoother / masked residual."""
    gs = x.shape[1:]
    assert len(gs) == 3 and _v2_supported(gs, x.dtype)
    itemsize = max(4, np.dtype(x.dtype).itemsize)
    sub = _sublane(x.dtype)
    nx, ny, nz = gs
    # Two pipelined body blocks (x and b) + doubled ghost buffers: halve
    # the tile budget vs the plain stencil to stay inside VMEM.
    tx, ty = _tiles_3d(gs, itemsize * 2, sub)

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
            _jacobi3d_db_kernel,
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
            pltpu.VMEM((2, 1, ty, nz), x.dtype),
            pltpu.VMEM((2, 1, ty, nz), x.dtype),
            pltpu.VMEM((2, tx, sub, nz), x.dtype),
            pltpu.VMEM((2, tx, sub, nz), x.dtype),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )
    outs = [call(x[d], x[d], b[d]) for d in range(x.shape[0])]
    return jnp.stack(outs)


def _jacobi3d_dot_db_kernel(
    x_any,
    body,
    b_blk,
    out_ref, dot_ref,
    xg_lo, xg_hi, yg_lo, yg_hi,
    sems,
    *,
    tx: int, ty: int, nx: int, ny: int,
    inv_dx2: tuple, alpha: float, beta: float, mask_axes: tuple,
    sub: int = 8,
):
    """Jacobi smooth step + per-program partial ``sum(b * out)`` — fuses
    the PCG ``dot(r, z)`` into the V-cycle's final post-smooth (both
    tiles are register-resident; saves the separate 0.75 GB dot pass per
    outer iteration)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    g = i * nj + j
    slot = jax.lax.rem(g, jnp.int32(2))
    nslot = jax.lax.rem(g + 1, jnp.int32(2))

    sx = i * tx
    sy = pl.multiple_of(j * ty, sub)
    bufs = (xg_lo, xg_hi, yg_lo, yg_hi)

    @pl.when(g == 0)
    def _():
        for c in _ghost_copies(
            x_any, slot, sx, sy, tx, ty, nx, ny, bufs, sems, sub
        ):
            c.start()

    j2 = jax.lax.rem(j + 1, jnp.int32(nj))
    i2 = i + (j + 1) // nj
    last = g == pl.num_programs(0) * nj - 1

    @pl.when(jnp.logical_not(last))
    def _():
        sx2 = i2 * tx
        sy2 = pl.multiple_of(j2 * ty, sub)
        for c in _ghost_copies(
            x_any, nslot, sx2, sy2, tx, ty, nx, ny, bufs, sems, sub
        ):
            c.start()

    gy_lo = _mod(sy - 1, ny)
    gy_hi = _mod(sy + ty, ny)
    gy_lo_blk = pl.multiple_of((gy_lo // sub) * sub, sub)
    gy_hi_blk = pl.multiple_of((gy_hi // sub) * sub, sub)
    for c in _ghost_copies(
        x_any, slot, sx, sy, tx, ty, nx, ny, bufs, sems, sub
    ):
        c.wait()

    cdt = jnp.promote_types(body.dtype, jnp.float32)
    xc = body[:, :, :].astype(cdt)
    nz = xc.shape[2]

    xids = jax.lax.broadcasted_iota(jnp.int32, (tx, 1, 1), 0)
    xm = jnp.where(xids == 0, xg_lo[slot].astype(cdt), pltpu.roll(xc, 1, 0))
    xp = jnp.where(
        xids == tx - 1, xg_hi[slot].astype(cdt), pltpu.roll(xc, tx - 1, 0)
    )

    g_lo = _select_row(yg_lo[slot].astype(cdt), gy_lo - gy_lo_blk, 1)
    g_hi = _select_row(yg_hi[slot].astype(cdt), gy_hi - gy_hi_blk, 1)
    yids = jax.lax.broadcasted_iota(jnp.int32, (1, ty, 1), 1)
    ym = jnp.where(yids == 0, g_lo, pltpu.roll(xc, 1, 1))
    yp = jnp.where(yids == ty - 1, g_hi, pltpu.roll(xc, ty - 1, 1))

    ax = inv_dx2[0] * (xp + xm - 2.0 * xc)
    ax += inv_dx2[1] * (yp + ym - 2.0 * xc)
    ax += inv_dx2[2] * (
        pltpu.roll(xc, nz - 1, 2) + pltpu.roll(xc, 1, 2) - 2.0 * xc
    )

    bv = b_blk[:, :, :].astype(cdt)
    upd = bv - ax
    if 0 in mask_axes:
        gx = xids + sx
        upd = jnp.where((gx == 0) | (gx == nx - 1), 0.0, upd)
    if 1 in mask_axes:
        gy = yids + sy
        upd = jnp.where((gy == 0) | (gy == ny - 1), 0.0, upd)
    if 2 in mask_axes:
        zids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nz), 2)
        upd = jnp.where((zids == 0) | (zids == nz - 1), 0.0, upd)

    out = alpha * xc + beta * upd
    out_ref[:, :, :] = out.astype(out_ref.dtype)
    dot_ref[pl.program_id(0), pl.program_id(1)] = jnp.sum(bv * out)


def pallas_jacobi3d_dot_db(
    x, b, inv_dx2, alpha, beta, mask_axes, interpret: bool = False
):
    """Double-buffered fused Jacobi step that also returns
    ``sum(b * out)`` per component (``dots`` shaped ``(vdim,)``)."""
    gs = x.shape[1:]
    assert len(gs) == 3 and _v2_supported(gs, x.dtype)
    itemsize = max(4, np.dtype(x.dtype).itemsize)
    sub = _sublane(x.dtype)
    nx, ny, nz = gs
    tx, ty = _tiles_3d(gs, itemsize * 2, sub)
    ddt = jnp.promote_types(x.dtype, jnp.float32)
    gi, gj = nx // tx, ny // ty

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec((tx, ty, nz), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tx, ty, nz), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((tx, ty, nz), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gi, gj), lambda i, j: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    call = pl.pallas_call(
        partial(
            _jacobi3d_dot_db_kernel,
            tx=tx, ty=ty, nx=nx, ny=ny,
            inv_dx2=tuple(float(v) for v in inv_dx2),
            alpha=float(alpha), beta=float(beta),
            mask_axes=tuple(mask_axes), sub=sub,
        ),
        grid=(gi, gj),
        out_shape=[
            jax.ShapeDtypeStruct(gs, x.dtype),
            jax.ShapeDtypeStruct((gi, gj), ddt),
        ],
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, 1, ty, nz), x.dtype),
            pltpu.VMEM((2, 1, ty, nz), x.dtype),
            pltpu.VMEM((2, tx, sub, nz), x.dtype),
            pltpu.VMEM((2, tx, sub, nz), x.dtype),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )
    outs, dots = [], []
    for d in range(x.shape[0]):
        o, p = call(x[d], x[d], b[d])
        outs.append(o)
        dots.append(jnp.sum(p))
    return jnp.stack(outs), jnp.stack(dots)
