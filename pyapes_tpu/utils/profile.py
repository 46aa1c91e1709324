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


def bandwidth_report(nx, elapsed_s, dtype_bytes=4, hbm_gbps=819.0):
    """Effective bandwidth and roofline fraction of a stencil apply."""
    import math

    n = math.prod(nx)
    eff = 2 * n * dtype_bytes / elapsed_s
    return {
        "effective_gbps": eff / 1e9,
        "roofline_fraction": eff / (hbm_gbps * 1e9),
    }
