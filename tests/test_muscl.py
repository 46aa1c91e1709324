"""MUSCL/TVD limited drift transport (``solver/rfp.py``): the reference
ships ``mc_limiter``/``minmod`` wired into nothing
(``/root/reference/pyapes/solver/rfp.py:260-282``); here they drive
``friction_apply_muscl`` — a positivity-preserving second-order scheme
used by ``RFPEvolution(scheme="muscl")`` (round-4 VERDICT item 8)."""
import jax
import jax.numpy as jnp
import numpy as np

from pyapes_tpu.geometry import Cylinder
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.solver.rfp import friction_apply, friction_apply_muscl


def _mesh(nr=32, nz=128):
    return Mesh(Cylinder[0:2, -4:4], None, [nr, nz], dtype="double")


def _advect(mesh, f0, v0, dt, n_steps, scheme, rk2=False):
    """Pure z-drift: H = -v0 z -> grad H = (0, -v0); f_t = -div(f grad H)
    = v0 f_z translates the profile at speed v0 toward NEGATIVE z.
    ``rk2`` uses SSP-RK2 (Heun) — the standard MUSCL pairing; forward
    Euler's O(dt) error otherwise hides the second-order space accuracy."""
    Hr = jnp.zeros(mesh.nx, dtype=f0.dtype)
    Hz = jnp.full(mesh.nx, -v0, dtype=f0.dtype)

    def L(f):
        if scheme == "central":
            return -friction_apply(Hr, Hz, f, mesh)
        return -friction_apply_muscl(Hr, Hz, f, mesh, limiter=scheme)

    def step(f, _):
        f1 = f + dt * L(f)
        if rk2:
            f1 = 0.5 * f + 0.5 * (f1 + dt * L(f1))
        return f1, None

    out, _ = jax.lax.scan(step, f0, None, length=n_steps)
    return out


def test_muscl_matches_central_on_smooth_data():
    """On a smooth profile the limited slopes reduce to (near-)central
    slopes: one explicit step of the MUSCL drift divergence agrees with
    the central face-average scheme to second order."""
    mesh = _mesh()
    R, Z = mesh.R, mesh.Z
    f = jnp.exp(-(R**2 + Z**2))
    Hr = -0.3 * R
    Hz = -0.5 * Z
    d_c = np.asarray(friction_apply(Hr, Hz, f, mesh))
    d_m = np.asarray(friction_apply_muscl(Hr, Hz, f, mesh))
    scale = np.abs(d_c).max()
    # interior only (walls are first-order by construction in both)
    err = np.abs(d_c - d_m)[2:-2, 2:-2].max() / scale
    assert err < 0.02, err


def test_muscl_positivity_central_oscillates():
    """Sharp (box) profile under constant drift: the central scheme
    produces O(1) undershoots (negative f); MUSCL stays positive and
    TVD along the transport axis."""
    mesh = _mesh()
    Z = mesh.Z
    f0 = jnp.where((Z > -0.5) & (Z < 0.5), 1.0, 0.0).astype(jnp.float64)
    dz = float(mesh.dx_np[1])
    v0, cfl = 1.0, 0.4
    dt = cfl * dz / v0
    n = int(1.5 / (v0 * dt))  # transport by ~1.5 toward -z, stays interior

    f_c = np.asarray(_advect(mesh, f0, v0, dt, n, "central"))
    f_m = np.asarray(_advect(mesh, f0, v0, dt, n, "mc"))

    assert f_c.min() < -0.05, f_c.min()  # central DOES oscillate here
    assert f_m.min() > -1e-12, f_m.min()
    assert f_m.max() < 1.0 + 1e-12, f_m.max()

    # total variation along z must not grow (TVD)
    def tv(f):
        return np.abs(np.diff(f, axis=1)).sum()

    assert tv(f_m) <= tv(np.asarray(f0)) + 1e-10


def test_muscl_mass_conservation():
    """Zero-flux walls: the volume integral (2 pi r weight) of the
    transported density is conserved while the profile stays interior."""
    mesh = _mesh()
    R, Z = mesh.R, mesh.Z
    f0 = jnp.exp(-4.0 * (R**2 + (Z + 1.0) ** 2))
    dz = float(mesh.dx_np[1])
    dt = 0.4 * dz
    n = int(1.0 / dt)
    f1 = _advect(mesh, f0, 1.0, dt, n, "mc")
    w = np.asarray(R)
    m0 = float(jnp.sum(f0 * w))
    m1 = float(jnp.sum(f1 * w))
    assert abs(m1 - m0) / m0 < 1e-6, (m0, m1)


def test_muscl_second_order_convergence():
    """Smooth-profile transport with SSP-RK2: the L1 error drops ≳3x per
    grid doubling (second order away from the extremum, where the TVD
    limiter clips to first order; plain first-order upwind gives 2x)."""
    errs = []
    for nz in (96, 192):
        mesh = Mesh(Cylinder[0:2, -4:4], None, [16, nz], dtype="double")
        Z = mesh.Z
        f0 = jnp.exp(-4.0 * (Z - 1.0) ** 2)
        dz = float(mesh.dx_np[1])
        v0 = 1.0
        dt = 0.2 * dz / v0
        n = int(round(1.0 / (v0 * dt)))
        t_end = n * dt
        f1 = np.asarray(_advect(mesh, f0, v0, dt, n, "mc", rk2=True))
        # transport toward -z: exact endpoint is f0(z + v0 t)
        exact = np.asarray(jnp.exp(-4.0 * (Z + v0 * t_end - 1.0) ** 2))
        errs.append(np.abs(f1 - exact)[:, 4:-4].mean())
    assert errs[0] / errs[1] > 3.0, errs


def test_rfp_evolution_muscl_scheme():
    """RFPEvolution(scheme='muscl'): full drift+diffusion explicit run
    stays positive and close to the central run on a smooth Maxwellian."""
    from pyapes_tpu.models.rfp_evolution import RFPEvolution
    from pyapes_tpu.variables import Field

    mesh = _mesh(32, 48)
    R, Z = np.asarray(mesh.R), np.asarray(mesh.Z)
    f0 = np.exp(-(R**2 + Z**2) / (2 * 0.8**2))
    H = -np.sqrt(R**2 + Z**2 + 0.5)
    G = np.sqrt(R**2 + Z**2 + 0.5)

    out = {}
    for scheme in ("central", "muscl"):
        model = RFPEvolution(mesh, H, G, scheme=scheme)
        f = Field("pdf", 1, mesh, None)
        f.set_var_tensor(jnp.asarray(f0))
        f = model.run(f, dt=2e-4, n_steps=20)
        out[scheme] = np.asarray(f())
    assert np.all(np.isfinite(out["muscl"]))
    assert out["muscl"].min() > -1e-12
    diff = np.abs(out["muscl"] - out["central"]).max()
    assert diff < 5e-3 * np.abs(out["central"]).max(), diff
