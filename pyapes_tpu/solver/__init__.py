"""Solver layer: explicit (FDC) / implicit (FDM) discretizations and
matrix-free Krylov solvers."""
from pyapes_tpu.solver.adjoint import (
    DifferentiableDiffusionSolve,
    DifferentiableSolve,
)
from pyapes_tpu.solver.fdc import FDC
from pyapes_tpu.solver.fdm import FDM
from pyapes_tpu.solver.ops import Solver

__all__ = [
    "DifferentiableDiffusionSolve",
    "DifferentiableSolve",
    "FDC",
    "FDM",
    "Solver",
]
