"""Mesh layer (reference ``pyapes/mesh/__init__.py``)."""
from pyapes_tpu.mesh._mesh import Mesh

__all__ = ["Mesh"]
