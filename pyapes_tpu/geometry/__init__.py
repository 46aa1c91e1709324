"""Geometry layer (reference ``pyapes/geometry/__init__.py``)."""
from pyapes_tpu.geometry.basis import Geometry, GeoTypeIdentifier
from pyapes_tpu.geometry.box import Box
from pyapes_tpu.geometry.cylinder import Cylinder
from pyapes_tpu.geometry.mask import MaskObstacle

__all__ = ["Box", "Cylinder", "Geometry", "GeoTypeIdentifier", "MaskObstacle"]
