"""Test configuration: run on CPU with 8 virtual devices (for sharding
tests) and float64 enabled (parity with the torch reference).

Note: this container's ``sitecustomize`` registers a tunneled TPU backend
and forces ``JAX_PLATFORMS=axon``; per-op dispatch over the tunnel is
seconds-slow, so tests run on the host CPU. Backends initialize lazily, so
overriding the config here (before any computation) is sufficient.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in flags:
    # The suite is COMPILE-bound on this 1-core host (hundreds of jitted
    # while_loop solver programs; runtime on the tiny test grids is
    # negligible). Backend optimization level 0 cuts suite wall ~30%
    # (measured round 5: test_multigrid 169 -> 117 s) with identical
    # results — tests assert numerics, and every tolerance holds.
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    # Persistent compilation cache for the CPU tier (measured round 5 on
    # test_multigrid: first run +15% to populate, warm reruns 2.3x
    # faster, ~3 MB/file-of-tests). The library default keeps the cache
    # OFF because on the TUNNELED TPU backend executable serialization
    # costs ~3x the compile (backend.enable_compilation_cache); on CPU
    # the serialization is local microseconds and the economics invert.
    # Keyed by program hash + jaxlib version — stale entries are
    # impossible by construction. Opt out: JAX_COMPILATION_CACHE_DIR=""
    _cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "pyapes_tpu_test_jax_cache",
    )
    try:
        os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization, never a requirement


def pytest_addoption(parser):
    parser.addoption(
        "--run-slow", action="store_true", default=False,
        help="run tests marked slow (multi-minute physics validations)",
    )


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: multi-minute validation run")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--run-slow"):
        return
    skip = pytest.mark.skip(reason="needs --run-slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
