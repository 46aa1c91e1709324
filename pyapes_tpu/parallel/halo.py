"""Explicit halo exchange with ``shard_map`` + ``lax.ppermute``.

Hand-scheduled counterpart of the GSPMD tier: each shard owns a contiguous
block of the grid; neighbor rows needed by the +-1 stencil travel over ICI
via ``ppermute``; Krylov dot products become ``psum``. Periodic wrap is the
natural ring permutation.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P


def _ring_perm(n: int, shift: int) -> list[tuple[int, int]]:
    return [(i, (i + shift) % n) for i in range(n)]


def halo_exchange(x: jnp.ndarray, axis: int, axis_name: str) -> tuple:
    """Fetch one ghost row from each neighbor along ``axis``.

    Must run inside ``shard_map``. Returns ``(lo_ghost, hi_ghost)``: the
    neighbor rows adjacent to this shard's lower/upper block faces (wrapped
    around the ring — callers mask the global-boundary shards as needed).
    """
    n = jax.lax.axis_size(axis_name)
    first = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
    last = jax.lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis], axis=axis)
    # My lower ghost is my left neighbor's last row.
    lo = jax.lax.ppermute(last, axis_name, _ring_perm(n, 1))
    # My upper ghost is my right neighbor's first row.
    hi = jax.lax.ppermute(first, axis_name, _ring_perm(n, -1))
    return lo, hi


def _shifted(x, ghost_lo, ghost_hi, axis):
    """Shard-local equivalents of roll(x, +1/-1, axis) given ghosts."""
    body_m = jax.lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)
    xm = jnp.concatenate([ghost_lo, body_m], axis=axis)  # x[i-1]
    body_p = jax.lax.slice_in_dim(x, 1, x.shape[axis], axis=axis)
    xp = jnp.concatenate([body_p, ghost_hi], axis=axis)  # x[i+1]
    return xm, xp


def make_sharded_stencil(decomp, coeffs, vdim_ndim: int):
    """Build a ``shard_map``-ped per-axis stencil apply.

    Equivalent to ``ops.stencil.apply_axis_stencil`` but with explicit
    ``ppermute`` halo exchange per sharded axis. Coefficient vectors are
    sharded along their axis like the data.

    Args:
        decomp: ``DomainDecomposition``.
        coeffs: per-axis (ap, ac, am) 1-D coefficient vectors (global).
        vdim_ndim: rank of the data array ``(vdim, *nx)``.
    """
    mesh = decomp.device_mesh()
    data_spec = decomp.spec(vdim_ndim)
    coeff_specs = tuple(
        (
            P(data_spec[1 + j]),
            P(data_spec[1 + j]),
            P(data_spec[1 + j]),
        )
        for j in range(len(decomp.mesh_shape))
    )

    def local_apply(x, *coeff_flat):
        cs = [
            (coeff_flat[3 * j], coeff_flat[3 * j + 1], coeff_flat[3 * j + 2])
            for j in range(len(decomp.mesh_shape))
        ]
        out = jnp.zeros_like(x)
        for j, (ap, ac, am) in enumerate(cs):
            axis = 1 + j
            shape = [1] * x.ndim
            shape[axis] = -1
            name = data_spec[axis]
            if name is None:
                xm = jnp.roll(x, 1, axis)
                xp = jnp.roll(x, -1, axis)
            else:
                lo, hi = halo_exchange(x, axis, name)
                xm, xp = _shifted(x, lo, hi, axis)
            out = (
                out
                + ap.reshape(shape) * xp
                + ac.reshape(shape) * x
                + am.reshape(shape) * xm
            )
        return out

    coeff_flat = tuple(c for triple in coeffs for c in triple)
    flat_specs = tuple(s for triple in coeff_specs for s in triple)

    fn = shard_map(
        local_apply,
        mesh=mesh,
        in_specs=(data_spec,) + flat_specs,
        out_specs=data_spec,
    )

    @jax.jit
    def apply(x):
        return fn(x, *coeff_flat)

    return apply


def psum_dot(a: jnp.ndarray, b: jnp.ndarray, axis_names) -> jnp.ndarray:
    """Shard-local dot + cross-shard ``psum`` (for shard_map Krylov loops)."""
    local = jnp.sum(a * b)
    return jax.lax.psum(local, axis_names)


def sharded_pallas_supported(decomp, global_shape: tuple[int, ...],
                             dtype) -> bool:
    """Whether the shard_map+Pallas tier can run this decomposition: 3-D,
    lane axis unsharded, per-shard block divisible and ``ext_supported``."""
    from pyapes_tpu.ops.pallas_stencil_v3 import ext_supported

    if len(global_shape) != 3 or len(decomp.mesh_shape) != 3:
        return False
    if decomp.mesh_shape[2] != 1:
        return False  # lane-dim halos would pad every row by a full vreg
    if any(s % d for s, d in zip(global_shape, decomp.mesh_shape)):
        return False
    local = tuple(s // d for s, d in zip(global_shape, decomp.mesh_shape))
    ext = tuple(1 if d > 1 else 0 for d in decomp.mesh_shape)
    return ext_supported(local, ext, dtype)


def make_sharded_pallas_apply(decomp, ndim_mesh: int,
                              interpret: bool = False):
    """Build a ``(coeffs, x) -> A x`` apply that runs the fused Pallas
    stencil on each shard with ``ppermute`` halo exchange over ICI.

    This closes the round-1 gap where a domain decomposition forced the
    jnp roll-sum (GSPMD partitions the rolls but the per-shard compute
    lost the fused-kernel bandwidth): ghost rows travel via
    ``halo_exchange``; the shard-local block, pre-extended by one row per
    sharded axis, feeds ``pallas_axis_stencil_ext``. Coefficient vectors
    are split along their axes by shard_map, so global-boundary surgery
    rows land on the edge shards automatically. Non-periodic global faces
    receive wrapped (garbage) ghosts exactly like the single-device torus
    kernel — those output rows are masked by the solver's interior mask.
    """
    mesh = decomp.device_mesh()
    data_spec = decomp.spec(1 + ndim_mesh)
    names = [data_spec[1 + j] for j in range(ndim_mesh)]
    ext = tuple(1 if n is not None else 0 for n in names)
    flat_specs = tuple(
        P(names[j]) for j in range(ndim_mesh) for _ in range(3)
    )

    def local_apply(x, *coeff_flat):
        from pyapes_tpu.ops.pallas_stencil_v3 import pallas_axis_stencil_ext

        cs = tuple(
            (coeff_flat[3 * j], coeff_flat[3 * j + 1], coeff_flat[3 * j + 2])
            for j in range(ndim_mesh)
        )
        for j, nm in enumerate(names):
            if nm is not None:
                lo, hi = halo_exchange(x, 1 + j, nm)
                x = jnp.concatenate([lo, x, hi], axis=1 + j)
        return pallas_axis_stencil_ext(cs, x, ext, interpret)

    fn = shard_map(
        local_apply,
        mesh=mesh,
        in_specs=(data_spec,) + flat_specs,
        out_specs=data_spec,
        # pallas_call outputs carry no varying-mesh-axes annotation yet
        check_vma=False,
    )

    def apply(coeffs, x):
        return fn(x, *[c for triple in coeffs for c in triple])

    return apply
