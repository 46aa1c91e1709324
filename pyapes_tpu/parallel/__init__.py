"""Multi-chip scaling tier: spatial domain decomposition over a device
mesh (GSPMD shardings + explicit shard_map/ppermute halo exchange)."""
from pyapes_tpu.parallel.decomp import DomainDecomposition

__all__ = ["DomainDecomposition"]
