"""Ready-made problem templates ("model families") built on the solver
stack: Poisson, advection-diffusion, Burgers, Navier-Stokes
(lid-driven cavity), and Rosenbluth-Fokker-Planck evolution.

These are the framework's end-to-end flagships (the reference ships only
notebooks, ``demos/*.ipynb``)."""
from pyapes_tpu.models.poisson import PoissonSolver
from pyapes_tpu.models.advection_diffusion import AdvectionDiffusion
from pyapes_tpu.models.burgers import Burgers1D, BurgersND
from pyapes_tpu.models.natural_convection import NaturalConvection
from pyapes_tpu.models.navier_stokes import (
    ChannelFlow,
    LidDrivenCavity,
    PeriodicFlow,
    carreau_viscosity,
    power_law_viscosity,
    smagorinsky_viscosity,
)
from pyapes_tpu.models.rfp_evolution import RFPEvolution
from pyapes_tpu.models.rosenbluth import RosenbluthPotentials

__all__ = [
    "PoissonSolver",
    "AdvectionDiffusion",
    "Burgers1D",
    "BurgersND",
    "ChannelFlow",
    "LidDrivenCavity",
    "PeriodicFlow",
    "NaturalConvection",
    "carreau_viscosity",
    "power_law_viscosity",
    "smagorinsky_viscosity",
    "RFPEvolution",
    "RosenbluthPotentials",
]
