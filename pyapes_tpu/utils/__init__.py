"""Utilities: checkpointing, profiling, debugging."""
from pyapes_tpu.utils import checkpoint, profile

__all__ = ["checkpoint", "profile"]
