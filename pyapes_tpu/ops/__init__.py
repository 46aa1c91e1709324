"""Low-level stencil/kernels tier (structured stencils + Pallas kernels)."""
from pyapes_tpu.ops.stencil import apply_axis_stencil

__all__ = ["apply_axis_stencil"]
