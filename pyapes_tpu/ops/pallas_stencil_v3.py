"""Slab-resident fused stencil kernels (v3).

The v2 kernels (``pallas_stencil.py`` / ``pallas_stencil_db.py``) tile the
grid in x-slabs x y-tiles and fetch four ghost planes per tile; the y-ghost
fetches must be 8-row sublane-aligned blocks (Mosaic slicing rule on the
second-to-last dim), reading 8x the needed plane — the round-1 roofline gap.

v3 exploits the fact that dim 0 of a 3-D memref has NO alignment
constraint, plus the full 128 MB of physical VMEM on v5e-class chips
(``CompilerParams(vmem_limit_bytes=...)``; the default soft limit is only
~16 MB):

  * the grid iterates over x-slabs ONLY; each program stages the slab PLUS
    its two x-halo rows into one ``(tx+2, ny, nz)`` VMEM scratch with three
    exact DMAs (modular row indexing = exact torus wrap),
  * x-neighbors become STATIC SLICES of the staged buffer — zero roll /
    iota-select VPU work on the x axis,
  * full y/z extents live in the tile, so y/z neighbor access is an exact
    in-register ``pltpu.roll`` wrap — no ghost DMAs at all,
  * stage DMAs are double-buffered across grid steps (program i starts
    program i+1's fetches before computing).

Net traffic: reads ``(1 + 2/tx) * N``, writes ``N`` — at tx=16 that is
~6% above the information-theoretic minimum, vs ~19% for v2 (plus v2's
select/roll VPU overhead).

Supported: 3-D grids with ``nz % 128 == 0`` and a slab that fits VMEM
(``v3_supported``). 2-D grids keep the v2 kernel (dim 0 of a 2-D memref IS
the constrained sublane dim, so v3's trick does not apply).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 110 * 1024 * 1024
_DECLARED_BUDGET = 76 * 1024 * 1024  # stage + pipelined out (+ b) buffers


def _mod(i, n):
    return jax.lax.rem(i + jnp.int32(n), jnp.int32(n))


def _lane_bcast(c: jnp.ndarray) -> jnp.ndarray:
    """(n,) -> (n, 128): coefficient vectors indexed along a non-lane axis
    ride as lane-broadcast 2-D arrays (Mosaic alignment)."""
    return jnp.broadcast_to(c[:, None], (c.shape[0], 128))


def _v3_tile(gs: tuple[int, ...], itemsize: int, streams: int = 2) -> int:
    """Largest x-slab size (divisor of nx, <= 16) whose declared VMEM
    buffers fit the budget. ``streams`` counts pipelined (tx, ny, nz)
    blocks besides the stage: out (and b for the jacobi kernel)."""
    nx, ny, nz = gs
    plane = ny * nz * itemsize
    best = 0
    for tx in range(1, min(16, nx) + 1):
        if nx % tx:
            continue
        declared = 2 * (tx + 2) * plane + streams * 2 * tx * plane
        if declared <= _DECLARED_BUDGET:
            best = tx
    return best


def v3_supported(shape: tuple[int, ...], dtype=jnp.float32,
                 streams: int = 2) -> bool:
    if len(shape) != 3 or shape[-1] % 128 != 0:
        return False
    # in-register math upcasts to f32; budget on the staged dtype
    itemsize = np.dtype(dtype).itemsize
    return _v3_tile(shape, itemsize, streams) >= 1


def _stage_copies(x_any, stage, sems, step, slt, tx, nx):
    """Three exact DMAs staging slab ``step`` + x-halo rows into
    ``stage[slt]``: dim-0 slices of a 3-D memref carry no Mosaic alignment
    constraint, so single-row halo fetches read exactly one plane."""
    sx = step * tx
    return [
        pltpu.make_async_copy(
            x_any.at[pl.ds(_mod(sx - 1, nx), 1)],
            stage.at[slt, pl.ds(0, 1)],
            sems.at[slt, 0],
        ),
        pltpu.make_async_copy(
            x_any.at[pl.ds(sx, tx)],
            stage.at[slt, pl.ds(1, tx)],
            sems.at[slt, 1],
        ),
        pltpu.make_async_copy(
            x_any.at[pl.ds(_mod(sx + tx, nx), 1)],
            stage.at[slt, pl.ds(tx + 1, 1)],
            sems.at[slt, 2],
        ),
    ]


def _stage_prologue(x_any, stage, sems, tx, nx):
    """Shared double-buffering prologue: start step-0 fetches on the first
    program, prefetch step i+1, wait for step i. Returns (i, slot)."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(i, jnp.int32(2))
    nslot = jax.lax.rem(i + 1, jnp.int32(2))

    @pl.when(i == 0)
    def _():
        for c in _stage_copies(x_any, stage, sems, i, slot, tx, nx):
            c.start()

    @pl.when(i + 1 < n)
    def _():
        for c in _stage_copies(x_any, stage, sems, i + 1, nslot, tx, nx):
            c.start()

    for c in _stage_copies(x_any, stage, sems, i, slot, tx, nx):
        c.wait()
    return i, slot


def _slab_apply(stage, slot, coeff_rows, tx, ny, nz):
    """Apply the 7-point per-axis stencil to the staged slab.

    ``coeff_rows`` = (ap0, ac0, am0, ap1, ac1, am1, ap2, ac2, am2) already
    shaped for broadcast. Term order mirrors the jnp oracle
    (``ops.stencil.apply_axis_stencil``) so f32 results agree to ~1 ulp."""
    ap0, ac0, am0, ap1, ac1, am1, ap2, ac2, am2 = coeff_rows
    cdt = jnp.promote_types(stage.dtype, jnp.float32)
    xm = stage[slot, 0:tx].astype(cdt)
    xc = stage[slot, 1:tx + 1].astype(cdt)
    xp = stage[slot, 2:tx + 2].astype(cdt)
    out = ap0 * xp
    out = out + ac0 * xc
    out = out + am0 * xm
    out = out + ap1 * pltpu.roll(xc, ny - 1, 1)
    out = out + ac1 * xc
    out = out + am1 * pltpu.roll(xc, 1, 1)
    out = out + ap2 * pltpu.roll(xc, nz - 1, 2)
    out = out + ac2 * xc
    out = out + am2 * pltpu.roll(xc, 1, 2)
    return xc, out


def _coeff_rows(ax0, ax1, ax2, tx, ny, nz, cdt):
    """Shape the 9 pipelined coefficient inputs for broadcast (upcast
    BEFORE reshape: Mosaic's minor-dim-insertion reshape is 32-bit-only)."""
    ap0, ac0, am0 = (a[:, 0:1].astype(cdt).reshape(tx, 1, 1) for a in ax0)
    ap1, ac1, am1 = (a[:, 0:1].astype(cdt).reshape(1, ny, 1) for a in ax1)
    ap2, ac2, am2 = (a[:].astype(cdt).reshape(1, 1, nz) for a in ax2)
    return ap0, ac0, am0, ap1, ac1, am1, ap2, ac2, am2


def _stencil3d_v3_kernel(
    x_any,
    ap0, ac0, am0, ap1, ac1, am1, ap2, ac2, am2,
    out_ref,
    stage, sems,
    *, tx: int, nx: int, ny: int, nz: int,
):
    _, slot = _stage_prologue(x_any, stage, sems, tx, nx)
    cdt = jnp.promote_types(stage.dtype, jnp.float32)
    rows = _coeff_rows(
        (ap0, ac0, am0), (ap1, ac1, am1), (ap2, ac2, am2), tx, ny, nz, cdt
    )
    _, out = _slab_apply(stage, slot, rows, tx, ny, nz)
    out_ref[:, :, :] = out.astype(out_ref.dtype)


def _stencil3d_dot_v3_kernel(
    x_any,
    ap0, ac0, am0, ap1, ac1, am1, ap2, ac2, am2,
    out_ref, dot_ref,
    stage, sems,
    *, tx: int, nx: int, ny: int, nz: int,
):
    """Stencil apply + per-program partial ``sum(x * A x)`` (fused CG
    alpha-dot; both tiles are register-resident)."""
    i, slot = _stage_prologue(x_any, stage, sems, tx, nx)
    cdt = jnp.promote_types(stage.dtype, jnp.float32)
    rows = _coeff_rows(
        (ap0, ac0, am0), (ap1, ac1, am1), (ap2, ac2, am2), tx, ny, nz, cdt
    )
    xc, out = _slab_apply(stage, slot, rows, tx, ny, nz)
    out_ref[:, :, :] = out.astype(out_ref.dtype)
    dot_ref[i] = jnp.sum(xc * out)


def _common_specs(coeffs, gs, tx):
    nx, ny, nz = gs
    flat = [
        _lane_bcast(coeffs[0][0]), _lane_bcast(coeffs[0][1]),
        _lane_bcast(coeffs[0][2]),
        _lane_bcast(coeffs[1][0]), _lane_bcast(coeffs[1][1]),
        _lane_bcast(coeffs[1][2]),
        coeffs[2][0], coeffs[2][1], coeffs[2][2],
    ]
    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
    in_specs += [
        pl.BlockSpec((tx, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ] * 3
    in_specs += [
        pl.BlockSpec((ny, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ] * 3
    in_specs += [
        pl.BlockSpec((nz,), lambda i: (0,), memory_space=pltpu.VMEM)
    ] * 3
    return flat, in_specs


def pallas_axis_stencil_v3(coeffs, x: jnp.ndarray, interpret: bool = False):
    """Fused per-axis stencil apply, slab-resident variant. ``x``:
    ``(vdim, nx, ny, nz)``; drop-in equivalent of
    ``ops.stencil.apply_axis_stencil`` for ``v3_supported`` shapes."""
    gs = x.shape[1:]
    assert v3_supported(gs, x.dtype), gs
    nx, ny, nz = gs
    tx = _v3_tile(gs, np.dtype(x.dtype).itemsize)

    flat, in_specs = _common_specs(coeffs, gs, tx)
    call = pl.pallas_call(
        partial(_stencil3d_v3_kernel, tx=tx, nx=nx, ny=ny, nz=nz),
        grid=(nx // tx,),
        out_shape=jax.ShapeDtypeStruct(gs, x.dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tx, ny, nz), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tx + 2, ny, nz), x.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )
    outs = [call(x[d], *flat) for d in range(x.shape[0])]
    return jnp.stack(outs)


def pallas_axis_stencil_dot_v3(
    coeffs, x: jnp.ndarray, interpret: bool = False
):
    """Slab-resident stencil apply returning ``(A x, sum(x * A x))`` per
    component (``dots`` shaped ``(vdim, 1, 1, 1)``)."""
    gs = x.shape[1:]
    assert v3_supported(gs, x.dtype), gs
    nx, ny, nz = gs
    tx = _v3_tile(gs, np.dtype(x.dtype).itemsize)
    ddt = jnp.promote_types(x.dtype, jnp.float32)

    flat, in_specs = _common_specs(coeffs, gs, tx)
    call = pl.pallas_call(
        partial(_stencil3d_dot_v3_kernel, tx=tx, nx=nx, ny=ny, nz=nz),
        grid=(nx // tx,),
        out_shape=[
            jax.ShapeDtypeStruct(gs, x.dtype),
            jax.ShapeDtypeStruct((nx // tx,), ddt),
        ],
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (tx, ny, nz), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((nx // tx,), lambda i: (0,),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, tx + 2, ny, nz), x.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )
    outs, dots = [], []
    for d in range(x.shape[0]):
        o, p = call(x[d], *flat)
        outs.append(o)
        dots.append(jnp.sum(p))
    return (
        jnp.stack(outs),
        jnp.stack(dots).reshape((x.shape[0],) + (1,) * len(gs)),
    )


# ---------------------------------------------------------------------------
# 5-point (QUICK) variant: per-axis 5-vector stencils (offsets +2..-2,
# the 3rd-order QUICK advection banks) ride the same slab-resident
# pipeline with a ±2-row x-halo stage. 3-vector axes are zero-padded to
# 5 by the caller (two extra fused multiply-adds per axis — the kernel
# stays bandwidth-bound). Round-4 VERDICT item 5: these previously fell
# to the jnp roll-sum (linalg.py "5-point (QUICK) vectors: jnp path
# only").
# ---------------------------------------------------------------------------


def _v5_tile(gs: tuple[int, ...], itemsize: int, streams: int = 2) -> int:
    nx, ny, nz = gs
    plane = ny * nz * itemsize
    best = 0
    for tx in range(1, min(16, nx) + 1):
        if nx % tx:
            continue
        declared = 2 * (tx + 4) * plane + streams * 2 * tx * plane
        if declared <= _DECLARED_BUDGET:
            best = tx
    return best


def v5_supported(shape: tuple[int, ...], dtype=jnp.float32) -> bool:
    if len(shape) != 3 or shape[-1] % 128 != 0:
        return False
    # the ±2 y/z reach wraps via pltpu.roll — needs ny, nz >= 5; the ±2
    # x-halo staging needs nx >= 2 rows outside any slab
    if min(shape) < 8:
        return False
    return _v5_tile(shape, np.dtype(dtype).itemsize) >= 1


def _stage_copies5(x_any, stage, sems, step, slt, tx, nx):
    """Slab ``step`` + TWO x-halo rows each side into ``stage[slt]``
    (rows 0-1: i-2, i-1; rows 2..tx+1: body; rows tx+2..tx+3: +1, +2).
    tx divides nx, so each 2-row halo slice is contiguous mod nx."""
    sx = step * tx
    return [
        pltpu.make_async_copy(
            x_any.at[pl.ds(_mod(sx - 2, nx), 2)],
            stage.at[slt, pl.ds(0, 2)],
            sems.at[slt, 0],
        ),
        pltpu.make_async_copy(
            x_any.at[pl.ds(sx, tx)],
            stage.at[slt, pl.ds(2, tx)],
            sems.at[slt, 1],
        ),
        pltpu.make_async_copy(
            x_any.at[pl.ds(_mod(sx + tx, nx), 2)],
            stage.at[slt, pl.ds(tx + 2, 2)],
            sems.at[slt, 2],
        ),
    ]


def _stencil3d_v5_kernel(
    x_any,
    app0, ap0, ac0, am0, amm0,
    app1, ap1, ac1, am1, amm1,
    app2, ap2, ac2, am2, amm2,
    out_ref,
    stage, sems,
    *, tx: int, nx: int, ny: int, nz: int,
):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(i, jnp.int32(2))
    nslot = jax.lax.rem(i + 1, jnp.int32(2))

    @pl.when(i == 0)
    def _():
        for c in _stage_copies5(x_any, stage, sems, i, slot, tx, nx):
            c.start()

    @pl.when(i + 1 < n)
    def _():
        for c in _stage_copies5(x_any, stage, sems, i + 1, nslot, tx, nx):
            c.start()

    for c in _stage_copies5(x_any, stage, sems, i, slot, tx, nx):
        c.wait()

    cdt = jnp.promote_types(stage.dtype, jnp.float32)
    xmm = stage[slot, 0:tx].astype(cdt)
    xm = stage[slot, 1:tx + 1].astype(cdt)
    xc = stage[slot, 2:tx + 2].astype(cdt)
    xp = stage[slot, 3:tx + 3].astype(cdt)
    xpp = stage[slot, 4:tx + 4].astype(cdt)

    def r0(a):
        return a[:, 0:1].astype(cdt).reshape(tx, 1, 1)

    def r1(a):
        return a[:, 0:1].astype(cdt).reshape(1, ny, 1)

    def r2(a):
        return a[:].astype(cdt).reshape(1, 1, nz)

    # term order mirrors apply_axis_stencil: per axis, offsets
    # (-2, -1, 0, +1, +2) paired with (app, ap, ac, am, amm) reversed —
    # app multiplies x[i+2], amm x[i-2]
    out = r0(app0) * xpp + r0(ap0) * xp + r0(ac0) * xc
    out = out + r0(am0) * xm + r0(amm0) * xmm
    out = out + r1(app1) * pltpu.roll(xc, ny - 2, 1)
    out = out + r1(ap1) * pltpu.roll(xc, ny - 1, 1)
    out = out + r1(ac1) * xc
    out = out + r1(am1) * pltpu.roll(xc, 1, 1)
    out = out + r1(amm1) * pltpu.roll(xc, 2, 1)
    out = out + r2(app2) * pltpu.roll(xc, nz - 2, 2)
    out = out + r2(ap2) * pltpu.roll(xc, nz - 1, 2)
    out = out + r2(ac2) * xc
    out = out + r2(am2) * pltpu.roll(xc, 1, 2)
    out = out + r2(amm2) * pltpu.roll(xc, 2, 2)
    out_ref[:, :, :] = out.astype(out_ref.dtype)


def _pad5(cs):
    """Zero-pad a 3-vector axis entry (ap, ac, am) to the 5-vector form
    (app, ap, ac, am, amm)."""
    if len(cs) == 5:
        return tuple(cs)
    ap, ac, am = cs
    z = jnp.zeros_like(ac)
    return (z, ap, ac, am, z)


def pallas_axis_stencil_v5(coeffs, x: jnp.ndarray, interpret: bool = False):
    """Slab-resident 5-point per-axis stencil apply (QUICK banks). Each
    axis entry is a 3- or 5-vector tuple; 3-vectors are zero-padded.
    Drop-in equivalent of ``apply_axis_stencil`` for ``v5_supported``
    shapes."""
    gs = x.shape[1:]
    assert v5_supported(gs, x.dtype), gs
    nx, ny, nz = gs
    tx = _v5_tile(gs, np.dtype(x.dtype).itemsize)

    padded = [_pad5(cs) for cs in coeffs]
    flat = []
    for j, cs in enumerate(padded):
        for c in cs:
            flat.append(c if j == 2 else _lane_bcast(c))
    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
    in_specs += [
        pl.BlockSpec((tx, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ] * 5
    in_specs += [
        pl.BlockSpec((ny, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ] * 5
    in_specs += [
        pl.BlockSpec((nz,), lambda i: (0,), memory_space=pltpu.VMEM)
    ] * 5
    call = pl.pallas_call(
        partial(_stencil3d_v5_kernel, tx=tx, nx=nx, ny=ny, nz=nz),
        grid=(nx // tx,),
        out_shape=jax.ShapeDtypeStruct(gs, x.dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tx, ny, nz), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tx + 4, ny, nz), x.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )
    outs = [call(x[d], *flat) for d in range(x.shape[0])]
    return jnp.stack(outs)


# ---------------------------------------------------------------------------
# Halo-extended variant: the shard_map tier (parallel/halo.py) exchanges
# ghost rows over ICI with ppermute and hands this kernel a shard-LOCAL
# block pre-extended by one ghost row on each sharded axis. Neighbor access
# on extended axes is a static slice of the extended extent (no wrap);
# unextended axes keep the exact torus roll.
# ---------------------------------------------------------------------------


def ext_supported(out_shape: tuple[int, ...], ext: tuple[int, ...],
                  dtype=jnp.float32) -> bool:
    """Gate for ``pallas_axis_stencil_ext``: 3-D, lane dim unextended and
    128-aligned (an extended lane dim would pad every row by a full vreg),
    and the extended slab fits VMEM (same budget search as ``_ext_tile``)."""
    if len(out_shape) != 3 or len(ext) != 3:
        return False
    if ext[2] != 0 or out_shape[2] % 128 != 0:
        return False
    return _ext_tile(out_shape, ext, np.dtype(dtype).itemsize) >= 1


def _ext_tile(out_shape, ext, itemsize) -> int:
    nx, ny, nz = out_shape
    plane = (ny + 2 * ext[1]) * nz * itemsize
    best = 0
    for t in range(1, min(16, nx) + 1):
        if nx % t:
            continue
        declared = 2 * (t + 2) * plane + 2 * t * ny * nz * itemsize
        if declared <= _DECLARED_BUDGET:
            best = t
    return best


def _stencil3d_ext_kernel(
    x_any,
    ap0, ac0, am0, ap1, ac1, am1, ap2, ac2, am2,
    out_ref,
    stage, sems,
    *, tx: int, nx: int, ny: int, nz: int, ext: tuple,
):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(i, jnp.int32(2))
    nslot = jax.lax.rem(i + 1, jnp.int32(2))

    def copies(step, slt):
        sx = step * tx
        if ext[0]:
            # extended input: rows [sx, sx+tx+2) of x_ext are exactly the
            # slab + its halo rows — ONE contiguous DMA.
            return [
                pltpu.make_async_copy(
                    x_any.at[pl.ds(sx, tx + 2)], stage.at[slt],
                    sems.at[slt, 0],
                )
            ]
        return _stage_copies(x_any, stage, sems, step, slt, tx, nx)

    @pl.when(i == 0)
    def _():
        for c in copies(0, 0):
            c.start()

    @pl.when(i + 1 < n)
    def _():
        for c in copies(i + 1, nslot):
            c.start()

    for c in copies(i, slot):
        c.wait()

    cdt = jnp.promote_types(stage.dtype, jnp.float32)
    cy = slice(ext[1], ext[1] + ny)
    full = stage[slot]
    xm = full[0:tx, cy, :].astype(cdt)
    xc = full[1:tx + 1, cy, :].astype(cdt)
    xp = full[2:tx + 2, cy, :].astype(cdt)
    if ext[1]:
        ym = full[1:tx + 1, 0:ny, :].astype(cdt)
        yp = full[1:tx + 1, 2:ny + 2, :].astype(cdt)
    else:
        ym = pltpu.roll(xc, 1, 1)
        yp = pltpu.roll(xc, ny - 1, 1)
    zm = pltpu.roll(xc, 1, 2)
    zp = pltpu.roll(xc, nz - 1, 2)

    rows = _coeff_rows(
        (ap0, ac0, am0), (ap1, ac1, am1), (ap2, ac2, am2), tx, ny, nz, cdt
    )
    ap0r, ac0r, am0r, ap1r, ac1r, am1r, ap2r, ac2r, am2r = rows
    out = ap0r * xp
    out = out + ac0r * xc
    out = out + am0r * xm
    out = out + ap1r * yp
    out = out + ac1r * xc
    out = out + am1r * ym
    out = out + ap2r * zp
    out = out + ac2r * xc
    out = out + am2r * zm
    out_ref[:, :, :] = out.astype(out_ref.dtype)


def pallas_axis_stencil_ext(
    coeffs, x_ext: jnp.ndarray, ext: tuple[int, ...],
    interpret: bool = False,
):
    """Fused stencil apply on a halo-extended local block.

    Args:
        coeffs: per-axis (ap, ac, am) 1-D vectors sized to the OUTPUT
            (unextended) extents.
        x_ext: ``(vdim, nx + 2 ext0, ny + 2 ext1, nz)`` — one ghost row on
            each side of every extended axis (from ``halo_exchange``).
        ext: per-axis 0/1 extension flags (``ext[2]`` must be 0).
    """
    vdim = x_ext.shape[0]
    gs = tuple(
        s - 2 * e for s, e in zip(x_ext.shape[1:], ext)
    )
    assert ext_supported(gs, ext, x_ext.dtype), (gs, ext)
    nx, ny, nz = gs
    tx = _ext_tile(gs, ext, np.dtype(x_ext.dtype).itemsize)

    flat, in_specs = _common_specs(coeffs, gs, tx)
    call = pl.pallas_call(
        partial(_stencil3d_ext_kernel, tx=tx, nx=nx, ny=ny, nz=nz,
                ext=tuple(ext)),
        grid=(nx // tx,),
        out_shape=jax.ShapeDtypeStruct(gs, x_ext.dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tx, ny, nz), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tx + 2, ny + 2 * ext[1], nz), x_ext.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )
    outs = [call(x_ext[d], *flat) for d in range(vdim)]
    return jnp.stack(outs)


def _jacobi3d_v3_kernel(
    x_any,
    b_blk,
    out_ref,
    stage, sems,
    *, tx: int, nx: int, ny: int, nz: int,
    inv_dx2: tuple, alpha: float, beta: float, mask_axes: tuple,
):
    i, slot = _stage_prologue(x_any, stage, sems, tx, nx)
    cdt = jnp.promote_types(stage.dtype, jnp.float32)
    xm = stage[slot, 0:tx].astype(cdt)
    xc = stage[slot, 1:tx + 1].astype(cdt)
    xp = stage[slot, 2:tx + 2].astype(cdt)

    c = -2.0 * (inv_dx2[0] + inv_dx2[1] + inv_dx2[2])
    ax = c * xc + inv_dx2[0] * (xp + xm)
    ax += inv_dx2[1] * (
        pltpu.roll(xc, ny - 1, 1) + pltpu.roll(xc, 1, 1)
    )
    ax += inv_dx2[2] * (
        pltpu.roll(xc, nz - 1, 2) + pltpu.roll(xc, 1, 2)
    )

    upd = b_blk[:, :, :].astype(cdt) - ax
    sx = i * tx
    if 0 in mask_axes:
        gx = jax.lax.broadcasted_iota(jnp.int32, (tx, 1, 1), 0) + sx
        upd = jnp.where((gx == 0) | (gx == nx - 1), 0.0, upd)
    if 1 in mask_axes:
        gy = jax.lax.broadcasted_iota(jnp.int32, (1, ny, 1), 1)
        upd = jnp.where((gy == 0) | (gy == ny - 1), 0.0, upd)
    if 2 in mask_axes:
        gz = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nz), 2)
        upd = jnp.where((gz == 0) | (gz == nz - 1), 0.0, upd)

    out_ref[:, :, :] = (alpha * xc + beta * upd).astype(out_ref.dtype)


def pallas_jacobi3d_v3(
    x: jnp.ndarray,
    b: jnp.ndarray,
    inv_dx2: tuple,
    alpha: float,
    beta: float,
    mask_axes: tuple,
    interpret: bool = False,
):
    """Slab-resident ``alpha x + beta mask (b - A x)`` for the 3-D
    scalar-coefficient Laplacian (multigrid smoother / residual)."""
    gs = x.shape[1:]
    assert len(gs) == 3 and v3_supported(gs, x.dtype, streams=3), gs
    nx, ny, nz = gs
    tx = _v3_tile(gs, np.dtype(x.dtype).itemsize, streams=3)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec((tx, ny, nz), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    call = pl.pallas_call(
        partial(
            _jacobi3d_v3_kernel,
            tx=tx, nx=nx, ny=ny, nz=nz,
            inv_dx2=tuple(float(v) for v in inv_dx2),
            alpha=float(alpha), beta=float(beta),
            mask_axes=tuple(mask_axes),
        ),
        grid=(nx // tx,),
        out_shape=jax.ShapeDtypeStruct(gs, x.dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tx, ny, nz), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tx + 2, ny, nz), x.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )
    outs = [call(x[d], b[d]) for d in range(x.shape[0])]
    return jnp.stack(outs)


# -- double-sweep Jacobi (two smooths per memory pass) -----------------------


def _x2_tile(gs: tuple[int, ...], itemsize: int, from_zero: bool) -> int:
    """Largest x-slab size for the double-sweep kernel. Besides the
    staged/pipelined buffers (2 x (tx+4) planes of x — skipped in the
    from-zero variant — 2 x (tx+2) of b, 2 x tx out), the budget must
    cover the F32 COMPUTE temporaries (upcasted stage views, the
    intermediate sweep y, the updates): measured on hardware, a
    stage-only budget OOMs scoped vmem (124M at tx=16 bf16 512^3)."""
    nx, ny, nz = gs
    plane = ny * nz * itemsize
    plane32 = ny * nz * 4
    best = 0
    for tx in range(1, min(16, nx) + 1):
        if nx % tx:
            continue
        declared = 2 * (tx + 2) * plane + 2 * 2 * tx * plane
        if not from_zero:
            declared += 2 * (tx + 4) * plane
        # f32 temporaries: upcasted x view (tx+4), b view (tx+2),
        # y (tx+2), update (tx+2), z (tx)
        compute = ((0 if from_zero else tx + 4) + 3 * (tx + 2) + tx) * plane32
        if declared + compute <= _DECLARED_BUDGET:
            best = tx
    return best


def jacobi2_supported(shape: tuple[int, ...], dtype=jnp.float32,
                      from_zero: bool = False) -> bool:
    if len(shape) != 3 or shape[-1] % 128 != 0:
        return False
    itemsize = np.dtype(dtype).itemsize
    return _x2_tile(shape, itemsize, from_zero) >= 1


def _x2_copies(any_ref, stage, sems, sx, halo, tx, nx, slt):
    """Stage rows [sx - halo, sx + tx + halo) with per-row wrapped halo
    DMAs and one contiguous body DMA."""
    copies = []
    n = 2 * halo + 1
    for h in range(halo):
        copies.append(pltpu.make_async_copy(
            any_ref.at[pl.ds(_mod(sx - halo + h, nx), 1)],
            stage.at[slt, pl.ds(h, 1)],
            sems.at[slt, h],
        ))
    copies.append(pltpu.make_async_copy(
        any_ref.at[pl.ds(sx, tx)],
        stage.at[slt, pl.ds(halo, tx)],
        sems.at[slt, halo],
    ))
    for h in range(halo):
        copies.append(pltpu.make_async_copy(
            any_ref.at[pl.ds(_mod(sx + tx + h, nx), 1)],
            stage.at[slt, pl.ds(halo + tx + h, 1)],
            sems.at[slt, halo + 1 + h],
        ))
    assert len(copies) == n
    return copies


def _x2_prologue(refs_halos, stages, sems_list, tx, nx):
    """Double-buffering prologue over several (ref, halo, stage, sems)
    streams."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(i, jnp.int32(2))
    nslot = jax.lax.rem(i + 1, jnp.int32(2))

    def all_copies(step, slt):
        out = []
        for (ref, halo), stage, sems in zip(refs_halos, stages, sems_list):
            out += _x2_copies(ref, stage, sems, step * tx, halo, tx, nx, slt)
        return out

    @pl.when(i == 0)
    def _():
        for c in all_copies(i, slot):
            c.start()

    @pl.when(i + 1 < n)
    def _():
        for c in all_copies(i + 1, nslot):
            c.start()

    for c in all_copies(i, slot):
        c.wait()
    return i, slot


def _lap_rows(v, lo, hi, inv_dx2, ny, nz):
    """Central Laplacian of rows [lo, hi) of a staged block ``v`` (rows
    lo-1..hi must exist)."""
    c = -2.0 * (inv_dx2[0] + inv_dx2[1] + inv_dx2[2])
    xc = v[lo:hi]
    out = c * xc + inv_dx2[0] * (v[lo + 1:hi + 1] + v[lo - 1:hi - 1])
    out += inv_dx2[1] * (
        pltpu.roll(xc, ny - 1, 1) + pltpu.roll(xc, 1, 1)
    )
    out += inv_dx2[2] * (
        pltpu.roll(xc, nz - 1, 2) + pltpu.roll(xc, 1, 2)
    )
    return out


def _row_mask(upd, gstart, count, nx, ny, nz, mask_axes):
    """Zero the global-boundary rows of a (count, ny, nz) update whose
    first row is global row ``gstart`` (wrapped)."""
    if 0 in mask_axes:
        gx = jax.lax.rem(
            jax.lax.broadcasted_iota(jnp.int32, (count, 1, 1), 0)
            + jnp.int32(gstart) + jnp.int32(nx),
            jnp.int32(nx),
        )
        upd = jnp.where((gx == 0) | (gx == nx - 1), 0.0, upd)
    if 1 in mask_axes:
        gy = jax.lax.broadcasted_iota(jnp.int32, (1, ny, 1), 1)
        upd = jnp.where((gy == 0) | (gy == ny - 1), 0.0, upd)
    if 2 in mask_axes:
        gz = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nz), 2)
        upd = jnp.where((gz == 0) | (gz == nz - 1), 0.0, upd)
    return upd


def _jacobi3d_x2_kernel(
    x_any, b_any,
    out_ref,
    xstage, bstage, xsems, bsems,
    *, tx: int, nx: int, ny: int, nz: int,
    inv_dx2: tuple, beta: float, mask_axes: tuple,
    from_zero: bool, emit_dot: bool, dot_ref=None,
):
    """TWO damped-Jacobi sweeps per memory pass, bit-equivalent to two
    ``pallas_jacobi3d_v3`` calls (wrap + mask semantics each sweep):

        y = x + beta mask (b - A x)     on rows [sx-1, sx+tx+1)
        z = y + beta mask (b - A y)     on rows [sx, sx+tx)

    ``from_zero`` starts from x = 0 (y = beta mask b; no x staging at
    all), fusing the V-cycle's ``_first_smooth`` pair. ``emit_dot`` adds
    the per-program partial ``sum(b_center * z)`` — the PCG ``dot(r, z)``
    when this is the final post-smooth of the preconditioner."""
    refs = [((b_any, 1), bstage, bsems)]
    if not from_zero:
        refs.append(((x_any, 2), xstage, xsems))
    i, slot = _x2_prologue(
        [rh for rh, _, _ in refs],
        [st for _, st, _ in refs],
        [sm for _, _, sm in refs],
        tx, nx,
    )
    cdt = jnp.promote_types(bstage.dtype, jnp.float32)
    sx = i * tx
    bv = bstage[slot].astype(cdt)  # rows sx-1 .. sx+tx (tx+2 rows)

    # sweep 1: y on tx+2 rows (global sx-1 .. sx+tx)
    if from_zero:
        upd1 = bv
    else:
        xv = xstage[slot].astype(cdt)  # rows sx-2 .. sx+tx+1 (tx+4)
        upd1 = bv - _lap_rows(xv, 1, tx + 3, inv_dx2, ny, nz)
    upd1 = _row_mask(upd1, sx - 1, tx + 2, nx, ny, nz, mask_axes)
    if from_zero:
        y = beta * upd1
    else:
        y = xv[1:tx + 3] + beta * upd1

    # sweep 2: z on tx rows (global sx .. sx+tx-1)
    upd2 = bv[1:tx + 1] - _lap_rows(y, 1, tx + 1, inv_dx2, ny, nz)
    upd2 = _row_mask(upd2, sx, tx, nx, ny, nz, mask_axes)
    z = y[1:tx + 1] + beta * upd2

    out_ref[:, :, :] = z.astype(out_ref.dtype)
    if emit_dot:
        dot_ref[i] = jnp.sum(bv[1:tx + 1] * z)


def pallas_jacobi3d_x2(
    x, b, inv_dx2, beta, mask_axes,
    from_zero: bool = False, emit_dot: bool = False,
    interpret: bool = False,
):
    """Two fused damped-Jacobi sweeps (slab-resident): halves the smooth
    pair's HBM traffic vs two single-sweep kernel calls. ``x`` is ignored
    (may be None) when ``from_zero``. Returns ``z`` or ``(z, dots)``."""
    gs = b.shape[1:]
    assert jacobi2_supported(gs, b.dtype, from_zero), gs
    nx, ny, nz = gs
    tx = _x2_tile(gs, np.dtype(b.dtype).itemsize, from_zero)
    ddt = jnp.promote_types(b.dtype, jnp.float32)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    out_shape = [jax.ShapeDtypeStruct(gs, b.dtype)]
    out_specs = [
        pl.BlockSpec((tx, ny, nz), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if emit_dot:
        out_shape.append(jax.ShapeDtypeStruct((nx // tx,), ddt))
        out_specs.append(
            pl.BlockSpec((nx // tx,), lambda i: (0,),
                         memory_space=pltpu.SMEM)
        )
    scratch = [
        # from-zero never stages x: shrink its scratch to a stub
        pltpu.VMEM((2, 1 if from_zero else tx + 4, ny, nz), b.dtype),
        pltpu.VMEM((2, tx + 2, ny, nz), b.dtype),
        pltpu.SemaphoreType.DMA((2, 5)),
        pltpu.SemaphoreType.DMA((2, 3)),
    ]

    def kern(x_any, b_any, *rest):
        if emit_dot:
            out_ref, dot_ref, xstage, bstage, xsems, bsems = rest
        else:
            (out_ref, xstage, bstage, xsems, bsems) = rest
            dot_ref = None
        _jacobi3d_x2_kernel(
            x_any, b_any, out_ref, xstage, bstage, xsems, bsems,
            tx=tx, nx=nx, ny=ny, nz=nz,
            inv_dx2=tuple(float(v) for v in inv_dx2),
            beta=float(beta), mask_axes=tuple(mask_axes),
            from_zero=from_zero, emit_dot=emit_dot, dot_ref=dot_ref,
        )

    call = pl.pallas_call(
        kern,
        grid=(nx // tx,),
        out_shape=out_shape if emit_dot else out_shape[0],
        in_specs=in_specs,
        out_specs=out_specs if emit_dot else out_specs[0],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )
    vdim = b.shape[0]
    zero = jnp.zeros(gs, b.dtype)
    outs = [
        call(zero if from_zero else x[d], b[d]) for d in range(vdim)
    ]
    if emit_dot:
        zs = jnp.stack([o[0] for o in outs])
        dots = jnp.stack([jnp.sum(o[1]) for o in outs]).reshape(
            (vdim, 1, 1, 1)
        )
        return zs, dots
    return jnp.stack(outs)
