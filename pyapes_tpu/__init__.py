"""pyapes-tpu: a TPU-native structured-grid finite-difference PDE framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the reference
``pyapes`` package (OpenFOAM-like equation DSL, matrix-free Krylov solvers,
Dirichlet/Neumann/Periodic/Symmetry BCs, Cartesian + axisymmetric
coordinates, Fokker-Planck operators), redesigned TPU-first:

  * whole solves compile to single ``lax.while_loop`` programs (no host sync)
  * stencils run as fused XLA roll-sums or Pallas VMEM-tiled kernels
  * multi-chip scaling via ``jax.sharding`` domain decomposition with
    ``ppermute`` halo exchange over ICI
"""
__version__ = "0.1.0"


def __getattr__(name):
    # Lazy top-level conveniences (avoid importing jax at package import).
    if name in ("Box", "Cylinder"):
        from pyapes_tpu import geometry

        return getattr(geometry, name)
    if name == "Mesh":
        from pyapes_tpu.mesh import Mesh

        return Mesh
    if name == "Field":
        from pyapes_tpu.variables import Field

        return Field
    if name in ("FDM", "FDC", "Solver"):
        from pyapes_tpu import solver

        return getattr(solver, name)
    if name == "DomainDecomposition":
        from pyapes_tpu.parallel import DomainDecomposition

        return DomainDecomposition
    raise AttributeError(name)
