"""Backend configuration: dtype policy and device/mesh discovery.

TPU-native counterpart of the reference backend (``pyapes/backend.py:7-94``).
Instead of torch's global default-tensor-type mutation, dtype is an explicit
policy object plumbed through ``Mesh``; double precision toggles JAX's x64
mode (used for CPU parity tests), while TPU runs default to float32/bfloat16.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np

DEVICE_TYPES = ["cpu", "tpu", "gpu", "cuda", "mps"]
"""Accepted device aliases. ``cuda``/``mps`` map onto whatever accelerator is
available so reference-style call sites keep working (``backend.py:7``)."""

DTYPE_SINGLE = ["single", "s", 32]
DTYPE_DOUBLE = ["double", "d", 64]
DTYPE_HALF = ["half", "bf16", 16]


def _ensure_x64() -> None:
    if not jax.config.read("jax_enable_x64"):
        jax.config.update("jax_enable_x64", True)


@dataclass
class DType:
    """Data-type policy for a simulation (reference ``backend.py:13-67``).

    Examples:
        >>> DType("single").float
        dtype('float32')
        >>> DType("double").float   # enables JAX x64 mode
        dtype('float64')
    """

    precision: str | int = "double"

    def __post_init__(self):
        if self.precision in DTYPE_SINGLE:
            self._float = np.dtype(np.float32)
            self._complex = np.dtype(np.complex64)
            self._int = np.dtype(np.int32)
        elif self.precision in DTYPE_DOUBLE:
            _ensure_x64()
            self._float = np.dtype(np.float64)
            self._complex = np.dtype(np.complex128)
            self._int = np.dtype(np.int64)
        elif self.precision in DTYPE_HALF:
            import jax.numpy as jnp

            self._float = np.dtype(jnp.bfloat16)
            self._complex = np.dtype(np.complex64)
            self._int = np.dtype(np.int32)
        else:
            raise ValueError("Invalid precision type!")
        self._bool = np.dtype(np.bool_)

    @property
    def float(self) -> np.dtype:
        return self._float

    @property
    def int(self) -> np.dtype:
        return self._int

    @property
    def complex(self) -> np.dtype:
        return self._complex

    @property
    def bool(self) -> np.dtype:
        return self._bool

    def __repr__(self) -> str:
        return f"(jax.dtype){self.precision}"


@dataclass
class Device:
    """Compute device handle (reference ``TorchDevice``, ``backend.py:70-94``).

    Resolves an alias (cpu/tpu/gpu/cuda/mps) to a concrete ``jax.Device``;
    falls back to the default backend device when the requested platform is
    not present (so reference scripts written for ``"cuda"`` run on TPU).
    """

    device_type: str = "cpu"

    def __post_init__(self):
        alias = self.device_type.lower()
        assert alias in DEVICE_TYPES, f"Device: unknown device {alias}"
        platform = {"cuda": "gpu", "mps": "gpu"}.get(alias, alias)
        try:
            self._device = jax.devices(platform)[0]
        except RuntimeError:
            self._device = jax.devices()[0]

    @property
    def device(self) -> jax.Device:
        return self._device

    def __repr__(self) -> str:
        return f"Device on {self._device}"


# Backwards-compatible alias used by reference-style code.
TorchDevice = Device
TORCH_DEVICE = DEVICE_TYPES


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Maybe enable JAX's persistent compilation cache (opt-in).

    Measured on the tunneled TPU backend (round 4,
    ``scripts/compile_probe.py``): the cache's executable SERIALIZATION is
    the dominant first-compile cost, not compilation itself — the 512^3
    whole-fastdiag bench program compiles in 77.8 s with the cache off vs
    242.8 s against a cold cache dir (round 3 recorded 437.5 s). The cache
    only pays when the SAME program structure is re-run in later processes
    (warm-cache start ~14 s) — a production-sim pattern, not the
    fresh-structure-per-run pattern benches and CI have.

    Default is therefore OFF. Opt in with ``PYAPES_COMPILE_CACHE=<dir>``
    (or ``1`` for the default dir), or pass ``path`` explicitly.

    Returns the cache directory used, or None when disabled.
    """
    import os

    env = os.environ.get("PYAPES_COMPILE_CACHE")
    if path is None:
        if not env or env == "0":
            return None
        path = (
            env
            if env != "1"
            else os.path.join(
                os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
                "pyapes_tpu_jax_cache",
            )
        )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything that took noticeable compile time; tiny programs
    # recompile faster than they deserialize.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path


def local_device_count() -> int:
    return jax.local_device_count()


def default_backend() -> str:
    return jax.default_backend()
