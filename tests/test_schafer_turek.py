"""Schaefer-Turek 2D-2 (Re=100 flow past a cylinder) — slow tier.

The published benchmark intervals (Schaefer & Turek 1996) are asserted
tightly by the on-chip demo run recorded in BASELINE.md /
MEASURE_r4.jsonl (``demos/schafer_turek.py``, ny=83). This CI-feasible
coarse run (10 cells across the cylinder, staircase body) must still
(a) destabilize into periodic shedding and (b) put the Strouhal number
in a physics-discriminating window around the published 0.295-0.305 —
a steady wake, a wrong-frequency oscillation, or a blow-up all fail.
"""
import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "demos")
)


@pytest.mark.slow
def test_schafer_turek_strouhal_coarse() -> None:
    from schafer_turek import run_benchmark

    res = run_benchmark(ny=43, t_end=6.0, every=20, verbose=False)
    assert "St" in res, f"no developed lift oscillation: {res}"
    # coarse staircase bounds; the published interval is [0.295, 0.305]
    assert 0.25 <= res["St"] <= 0.35, res
    # the lift amplitude at Re=100 is O(1) (Cl_max ~ 1.0 published)
    assert 0.3 <= res["Cl_amp"] <= 3.0, res
