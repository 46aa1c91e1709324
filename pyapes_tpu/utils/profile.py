"""Profiling / observability helpers.

The reference's only instrumentation is a print-based convergence report
(``linalg.py:308-312``). Here: ``jax.profiler`` trace capture for TPU
timelines, a solve-timing context manager, and a roofline estimator for
stencil applies.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class SolveTimer:
    """Wall-clock timing of block_until_ready'd regions.

    Example:
        >>> with SolveTimer() as t:
        ...     solver.solve()
        >>> t.elapsed
    """

    def __enter__(self):
        self._tic = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._tic
        return False


def stencil_roofline(nx, dtype_bytes=4, hbm_gbps=819.0):
    """Speed-of-light time for one fused stencil apply on TPU v5e:
    read x once + write out once."""
    import math

    n = math.prod(nx)
    bytes_moved = 2 * n * dtype_bytes
    return bytes_moved / (hbm_gbps * 1e9)


def measure_achievable_bw(n: int = 512, reps: int = 30) -> float:
    """Measured achievable R+W stream bandwidth (GB/s) on this chip.

    Times a jitted elementwise copy-scale over an ``n^3`` f32 array,
    dependency-chained with a single host readback at the end (on the
    tunneled axon backend ``block_until_ready`` does NOT synchronize;
    only a value fetch does — r2 calibration finding). On the r2 bench
    chip (v5 lite tunnel) this returns ~395 GB/s vs the 819 GB/s nominal
    spec: roofline fractions should be quoted against BOTH numbers.
    """
    import time

    import jax
    import jax.numpy as jnp

    x = jax.random.normal(jax.random.PRNGKey(0), (n, n, n), jnp.float32)
    f = jax.jit(lambda a: a * 1.000001)
    o = f(x)
    float(o.ravel()[0])
    tic = time.perf_counter()
    for _ in range(reps):
        o = f(o)
    float(o.ravel()[0])
    dt = (time.perf_counter() - tic) / reps
    return 2 * n**3 * 4 / dt / 1e9


def bandwidth_report(nx, elapsed_s, dtype_bytes=4, hbm_gbps=819.0,
                     achievable_gbps: float | None = None):
    """Effective bandwidth and roofline fraction of a stencil apply.

    ``roofline_fraction`` is against the nominal spec ``hbm_gbps``;
    pass ``achievable_gbps`` (e.g. from ``measure_achievable_bw``) to also
    get the fraction of what the chip demonstrably delivers on a pure
    XLA copy — the honest kernel-efficiency number.
    """
    import math

    n = math.prod(nx)
    eff = 2 * n * dtype_bytes / elapsed_s
    out = {
        "effective_gbps": eff / 1e9,
        "roofline_fraction": eff / (hbm_gbps * 1e9),
    }
    if achievable_gbps:
        out["achievable_fraction"] = eff / (achievable_gbps * 1e9)
    return out
