import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax.numpy as jnp
from pyapes_tpu.geometry import Box
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.models.navier_stokes import LidDrivenCavity

def make():
    mesh = Mesh(Box[0:1, 0:1], None, [17, 17], dtype="double")
    return LidDrivenCavity(mesh, nu=0.05, lid_velocity=1.0,
                           config={"sync": False})

dt = 0.01
m1 = make(); m1.run(dt, 8)
m2 = make(); m2.run(dt, 8, fused=True)
for j in range(2):
    a, b = np.asarray(m1.vel[j]()), np.asarray(m2.vel[j]())
    print(f"u{j} max|diff| = {np.abs(a-b).max():.3e}")
pa, pb = np.asarray(m1.p()), np.asarray(m2.p())
print(f"p  max|diff| = {np.abs(pa-pb).max():.3e}")
# a further eager step after fused stepping must still work (no leaked tracers)
m2.run(dt, 1)
m1.run(dt, 1)
print(f"post-eager u0 diff = {np.abs(np.asarray(m1.vel[0]())-np.asarray(m2.vel[0]())).max():.3e}")
