"""Spatial domain decomposition over a TPU device mesh.

The reference is strictly single-device (SURVEY §2: no DP/TP/PP/SP/EP, no
NCCL/MPI). The TPU-native scaling axis for a structured-grid PDE solver is
**spatial domain decomposition**: shard the grid axes over a
``jax.sharding.Mesh`` and let the stencil's neighbor accesses become halo
exchanges over ICI.

Two tiers are provided:

  * **GSPMD tier** (this module + ``solver/linalg.py``): annotate the
    solution/RHS with a ``NamedSharding`` and jit the whole Krylov
    ``while_loop``; XLA partitions the roll-based stencils into
    ``collective-permute`` halo exchanges and the dot products into
    ``all-reduce`` — the "pick a mesh, annotate, let XLA insert
    collectives" recipe.
  * **Explicit tier** (``parallel/halo.py``): ``shard_map`` +
    ``lax.ppermute`` halo exchange for hand-scheduled kernels.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import numpy as np
from jax.sharding import Mesh as JaxMesh
from jax.sharding import NamedSharding, PartitionSpec


@dataclass(frozen=True)
class DomainDecomposition:
    """Maps grid axes onto device-mesh axes.

    Args:
        mesh_shape: devices per grid axis, e.g. ``(2, 4)`` shards the first
            grid axis over 2 and the second over 4 devices. Use ``1`` to
            keep an axis unsharded. Product must not exceed the local
            device count.
        axis_names: device-mesh axis names (default ``sx, sy, sz``).

    Example:
        >>> dd = DomainDecomposition((2, 4))
        >>> x = jax.device_put(x, dd.sharding(ndim=3))   # (vdim, nx, ny)
    """

    mesh_shape: tuple[int, ...]
    axis_names: tuple[str, ...] = field(default=())
    devices: tuple | None = None

    def __post_init__(self):
        if not self.axis_names:
            object.__setattr__(
                self,
                "axis_names",
                tuple(f"s{n}" for n in "xyz"[: len(self.mesh_shape)]),
            )
        assert len(self.axis_names) == len(self.mesh_shape)

    @property
    def n_devices(self) -> int:
        return int(np.prod(self.mesh_shape))

    def device_mesh(self) -> JaxMesh:
        devs = (
            list(self.devices)
            if self.devices is not None
            else jax.devices()[: self.n_devices]
        )
        assert len(devs) >= self.n_devices, (
            f"DomainDecomposition: needs {self.n_devices} devices, "
            f"have {len(devs)}"
        )
        arr = np.array(devs[: self.n_devices]).reshape(self.mesh_shape)
        return JaxMesh(arr, self.axis_names)

    def spec(self, ndim: int, leading: int = 1) -> PartitionSpec:
        """PartitionSpec for an array with ``leading`` unsharded leading
        dims followed by the grid axes (e.g. ``(vdim, *nx)``)."""
        names = [None] * leading + [
            self.axis_names[j] if self.mesh_shape[j] > 1 else None
            for j in range(len(self.mesh_shape))
        ]
        while ndim > len(names):
            names.append(None)
        return PartitionSpec(*names[:ndim])

    def sharding(self, ndim: int, leading: int = 1) -> NamedSharding:
        return NamedSharding(self.device_mesh(), self.spec(ndim, leading))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.device_mesh(), PartitionSpec())
