import time, os
import jax, jax.numpy as jnp
from pyapes_tpu.backend import enable_compilation_cache
from pyapes_tpu.geometry import Box
from pyapes_tpu.mesh import Mesh
from pyapes_tpu.models.navier_stokes import LidDrivenCavity

enable_compilation_cache()
n = 128
mesh = Mesh(Box[0:1,0:1,0:1], None, [n,n,n], device="tpu", dtype="single")
dt = 0.25/n
model = LidDrivenCavity(mesh, nu=0.01, lid_velocity=1.0,
                        lid_profile="regularized", config={"sync": False})
def settle():
    return float(model.p()[0].ravel()[0])

t0=time.perf_counter(); model.run(dt,1); settle()
print(f"first step (compile): {time.perf_counter()-t0:.1f}s")
t0=time.perf_counter(); model.run(dt,5); settle()
w=time.perf_counter()-t0
print(f"5 warm steps: {w:.3f}s -> {w/5*1000:.0f} ms/step")

# instrument one step: wrap the solvers
import pyapes_tpu.solver.linalg as linalg
orig = linalg.solve
times = []
def timed(var, rhs, eqs, config, mesh_):
    t=time.perf_counter()
    r = orig(var, rhs, eqs, config, mesh_)
    _ = float(var()[0].ravel()[0])   # force completion
    times.append((var.name, time.perf_counter()-t))
    return r
linalg.solve = timed
t0=time.perf_counter(); model.run(dt,1); settle()
tot = time.perf_counter()-t0
print(f"instrumented step: {tot:.3f}s; solves: {[(nm, round(s,3)) for nm,s in times]}")
print(f"non-solve glue: {tot - sum(s for _,s in times):.3f}s")
linalg.solve = orig
# python-only overhead of one step (trace building): time with solves on cache
import cProfile, pstats, io
pr = cProfile.Profile(); pr.enable()
model.run(dt,1)
pr.disable(); settle()
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(18)
print(s.getvalue()[:3500])
