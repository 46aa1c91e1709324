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
