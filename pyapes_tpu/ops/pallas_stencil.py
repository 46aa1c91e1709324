"""Fused Pallas TPU stencil kernels.

The jnp fallback (``ops/stencil.py``) expresses the stencil as roll-sums;
XLA materializes each roll as a copy, so a 3-D 7-point apply moves ~6x the
necessary bytes. This kernel performs the whole apply in ONE VMEM pass:
the grid is tiled into x-slabs, each program DMAs its slab plus two ghost
planes from HBM, applies all axes' (ap, ac, am) coefficient vectors, and
writes the output slab. Ghost planes use modular indexing, so periodic
wrap (torus semantics of ``jnp.roll``) is exact.

Used as the hot-path stencil on TPU (``solver/linalg.py`` selects it when
``config["fdm"]["kernel"] == "pallas"``); interpret mode keeps CPU tests
runnable.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(n: int, max_tile: int = 8) -> int:
    for t in range(max_tile, 0, -1):
        if n % t == 0:
            return t
    return 1


def _stencil3d_kernel(
    x_hbm,
    ap0, ac0, am0, ap1, ac1, am1, ap2, ac2, am2,
    out_ref,
    scratch,
    sems,
    *,
    tile: int,
    nx: int,
):
    i = pl.program_id(0)
    start = i * tile

    # Body slab -> scratch rows [1, tile]; ghost planes wrap modularly.
    body = pltpu.make_async_copy(
        x_hbm.at[pl.ds(start, tile)], scratch.at[pl.ds(1, tile)], sems.at[0]
    )
    lo_src = jax.lax.rem(start - 1 + nx, jnp.int32(nx))
    hi_src = jax.lax.rem(start + tile, jnp.int32(nx))
    lo = pltpu.make_async_copy(
        x_hbm.at[pl.ds(lo_src, 1)], scratch.at[pl.ds(0, 1)], sems.at[1]
    )
    hi = pltpu.make_async_copy(
        x_hbm.at[pl.ds(hi_src, 1)], scratch.at[pl.ds(tile + 1, 1)], sems.at[2]
    )
    body.start()
    lo.start()
    hi.start()
    body.wait()
    lo.wait()
    hi.wait()

    xc = scratch[1 : tile + 1, :, :]
    xm0 = scratch[0:tile, :, :]
    xp0 = scratch[2 : tile + 2, :, :]

    a_p0 = ap0[:, 0:1].reshape(tile, 1, 1)
    a_c0 = ac0[:, 0:1].reshape(tile, 1, 1)
    a_m0 = am0[:, 0:1].reshape(tile, 1, 1)
    out = a_p0 * xp0 + a_c0 * xc + a_m0 * xm0

    # Axis 1 (full extent in-tile; roll == exact wrap).
    a_p1 = ap1[:].reshape(1, -1, 1)
    a_c1 = ac1[:].reshape(1, -1, 1)
    a_m1 = am1[:].reshape(1, -1, 1)
    n1 = xc.shape[1]
    out += a_p1 * pltpu.roll(xc, n1 - 1, 1) + a_c1 * xc + a_m1 * pltpu.roll(xc, 1, 1)

    # Axis 2.
    a_p2 = ap2[:].reshape(1, 1, -1)
    a_c2 = ac2[:].reshape(1, 1, -1)
    a_m2 = am2[:].reshape(1, 1, -1)
    n2 = xc.shape[2]
    out += a_p2 * pltpu.roll(xc, n2 - 1, 2) + a_c2 * xc + a_m2 * pltpu.roll(xc, 1, 2)

    out_ref[:, :, :] = out


def _stencil2d_kernel(
    x_hbm,
    ap0, ac0, am0, ap1, ac1, am1,
    out_ref,
    scratch,
    sems,
    *,
    tile: int,
    nx: int,
):
    i = pl.program_id(0)
    start = i * tile

    body = pltpu.make_async_copy(
        x_hbm.at[pl.ds(start, tile)], scratch.at[pl.ds(1, tile)], sems.at[0]
    )
    lo_src = jax.lax.rem(start - 1 + nx, jnp.int32(nx))
    hi_src = jax.lax.rem(start + tile, jnp.int32(nx))
    lo = pltpu.make_async_copy(
        x_hbm.at[pl.ds(lo_src, 1)], scratch.at[pl.ds(0, 1)], sems.at[1]
    )
    hi = pltpu.make_async_copy(
        x_hbm.at[pl.ds(hi_src, 1)], scratch.at[pl.ds(tile + 1, 1)], sems.at[2]
    )
    body.start()
    lo.start()
    hi.start()
    body.wait()
    lo.wait()
    hi.wait()

    xc = scratch[1 : tile + 1, :]
    xm0 = scratch[0:tile, :]
    xp0 = scratch[2 : tile + 2, :]

    out = (
        ap0[:, 0:1].reshape(tile, 1) * xp0
        + ac0[:, 0:1].reshape(tile, 1) * xc
        + am0[:, 0:1].reshape(tile, 1) * xm0
    )
    out += (
        ap1[:].reshape(1, -1) * pltpu.roll(xc, xc.shape[1] - 1, 1)
        + ac1[:].reshape(1, -1) * xc
        + am1[:].reshape(1, -1) * pltpu.roll(xc, 1, 1)
    )
    out_ref[:, :] = out


def pallas_axis_stencil(coeffs, x: jnp.ndarray, interpret: bool = False):
    """Fused per-axis stencil apply via Pallas (TPU hot path).

    Drop-in equivalent of ``ops.stencil.apply_axis_stencil`` for 2-D/3-D
    grids. ``x`` has shape ``(vdim, *nx)``; the kernel runs per component.
    """
    ndim = x.ndim - 1
    assert ndim in (2, 3), "pallas stencil: 2-D/3-D grids only"
    grid_shape = x.shape[1:]
    nx = grid_shape[0]
    tile = _pick_tile(nx)

    flat = []
    for j, (ap, ac, am) in enumerate(coeffs):
        if j == 0:
            # Axis-0 vectors are tile-sliced by BlockSpec; Mosaic cannot
            # prove alignment of dynamic rank-1 loads, so ship them as
            # (nx, 128) lane-broadcast 2-D arrays (tiny).
            flat += [
                jnp.broadcast_to(c[:, None], (nx, 128)) for c in (ap, ac, am)
            ]
        else:
            flat += [ap, ac, am]

    # All coefficient vectors ride along whole (tiny; rank-1 VMEM blocks
    # must be full arrays on TPU); the kernel slices axis-0 vectors.
    def full_spec(n):
        return pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM)

    def c0_spec():
        return pl.BlockSpec(
            (tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    if ndim == 3:
        kern = partial(_stencil3d_kernel, tile=tile, nx=nx)
        in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
        in_specs += [c0_spec(), c0_spec(), c0_spec()]
        in_specs += [full_spec(grid_shape[1])] * 3
        in_specs += [full_spec(grid_shape[2])] * 3
        out_spec = pl.BlockSpec(
            (tile,) + grid_shape[1:], lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        scratch = [
            pltpu.VMEM((tile + 2,) + grid_shape[1:], x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ]
    else:
        kern = partial(_stencil2d_kernel, tile=tile, nx=nx)
        in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
        in_specs += [c0_spec(), c0_spec(), c0_spec()]
        in_specs += [full_spec(grid_shape[1])] * 3
        out_spec = pl.BlockSpec(
            (tile,) + grid_shape[1:], lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        scratch = [
            pltpu.VMEM((tile + 2,) + grid_shape[1:], x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ]

    call = pl.pallas_call(
        kern,
        grid=(nx // tile,),
        out_shape=jax.ShapeDtypeStruct(grid_shape, x.dtype),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch,
        interpret=interpret,
    )

    outs = [call(x[d], *flat) for d in range(x.shape[0])]
    return jnp.stack(outs)
