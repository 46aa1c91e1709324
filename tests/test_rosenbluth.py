"""Self-consistent Rosenbluth potentials + Fokker-Planck relaxation.

Beyond the reference: it ships the RFP operators (``solver/rfp.py``) but
takes H, G as external inputs; here they are solved in-framework
(``models/rosenbluth.py``) and validated against the analytic Maxwellian
potentials."""
import jax.numpy as jnp
import numpy as np

from pyapes_tpu.geometry import Cylinder
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.models import RFPEvolution, RosenbluthPotentials
from pyapes_tpu.models.rosenbluth import maxwellian_H
from pyapes_tpu.variables import Field


def _maxwellian(mesh, vth):
    R, Z = np.asarray(mesh._grid_np[0]), np.asarray(mesh._grid_np[1])
    return np.exp(-(R**2 + Z**2) / (2 * vth**2)) / (
        (2 * np.pi * vth**2) ** 1.5
    )


def _moments(mesh, f):
    R, Z = np.asarray(mesh._grid_np[0]), np.asarray(mesh._grid_np[1])
    dr, dz = (float(d) for d in mesh.dx_np)
    w = 2.0 * np.pi * R * dr * dz
    f = np.asarray(f)
    N = (f * w).sum()
    t_perp = (f * R**2 * w).sum() / N / 2.0  # two perpendicular dofs
    t_par = (f * Z**2 * w).sum() / N
    return N, t_perp, t_par


def test_maxwellian_potentials_match_analytic() -> None:
    """H of a centered Maxwellian matches 2 N erf(v / sqrt(2) vth) / v;
    G approaches the far-field N |v|."""
    mesh = Mesh(Cylinder[0:4, -4:4], None, [48, 96])
    vth = 0.8
    f0 = _maxwellian(mesh, vth)
    pots = RosenbluthPotentials(mesh, f0)
    assert abs(pots.N - 1.0) < 2e-3  # discrete normalization
    H, G = pots.solve(jnp.asarray(f0))
    assert pots._solver_h.report["converge"]
    assert pots._solver_g.report["converge"]

    Ha = maxwellian_H(mesh, pots.N, vth)
    rel = np.abs(np.asarray(H) - Ha) / np.abs(Ha).max()
    assert rel.max() < 0.01, rel.max()

    # far-field: G ~ N |v - v_mean| (monopole)
    G = np.asarray(G)
    assert abs(G[-1, 48] - pots.N * 4.0) / (pots.N * 4.0) < 0.01


def test_selfconsistent_relaxation_isotropizes() -> None:
    """An anisotropic (T_perp != T_par) distribution relaxes toward
    isotropy under self-consistent like-species collisions, conserving
    density."""
    mesh = Mesh(Cylinder[0:4.5, -4.5:4.5], None, [40, 80])
    R, Z = np.asarray(mesh._grid_np[0]), np.asarray(mesh._grid_np[1])
    t_perp0, t_par0 = 0.36, 1.0  # vth_perp=0.6, vth_par=1.0
    f0 = np.exp(-(R**2) / (2 * t_perp0) - Z**2 / (2 * t_par0))
    f0 /= (2 * np.pi * t_perp0) * np.sqrt(2 * np.pi * t_par0)

    f = Field("pdf", 1, mesh, None)
    f.set_var_tensor(jnp.asarray(f0))
    N0, tp0, tz0 = _moments(mesh, f()[0])
    aniso0 = abs(tz0 - tp0)

    model = RFPEvolution(mesh)
    f = model.run_selfconsistent(f, dt=4e-4, n_steps=300, refresh_every=50)

    v = np.asarray(f()[0])
    assert np.all(np.isfinite(v))
    N1, tp1, tz1 = _moments(mesh, v)
    assert abs(N1 - N0) / N0 < 5e-3, (N0, N1)
    aniso1 = abs(tz1 - tp1)
    # relaxation: anisotropy strictly decreases (collision time for these
    # units is O(1); t = 0.12 relaxes ~10%)
    assert aniso1 < 0.95 * aniso0, (aniso0, aniso1)
    # temperatures move toward each other, not past
    assert tp0 - 1e-3 < tp1 < tz1 < tz0 + 1e-3, (tp1, tz1)


def test_selfconsistent_maxwellian_is_steady() -> None:
    """A Maxwellian is (discretely, approximately) a fixed point of the
    self-consistent collision operator."""
    mesh = Mesh(Cylinder[0:3.2, -3.2:3.2], None, [40, 80])
    vth = 0.8
    f0 = _maxwellian(mesh, vth)
    f = Field("pdf", 1, mesh, None)
    f.set_var_tensor(jnp.asarray(f0))
    model = RFPEvolution(mesh)
    f = model.run_selfconsistent(f, dt=2e-4, n_steps=50, refresh_every=25)
    drift = np.abs(np.asarray(f()[0]) - f0).max() / f0.max()
    assert drift < 5e-3, drift
