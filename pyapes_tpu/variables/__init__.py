"""Variables layer (reference ``pyapes/variables/__init__.py``)."""
from pyapes_tpu.variables.fields import Field

__all__ = ["Field"]
