import time
import jax, jax.numpy as jnp, numpy as np
from pyapes_tpu.backend import enable_compilation_cache
enable_compilation_cache()
from pyapes_tpu.ops.pallas_stencil_db import pallas_axis_stencil_db

N = 512
shape = (N, N, N)
def run(dtype, label, reps=20):
    x = jax.random.normal(jax.random.PRNGKey(0), (1,) + shape, jnp.float32).astype(dtype)
    coeffs = tuple(
        tuple(jnp.asarray(np.random.RandomState(7).randn(n), dtype) for _ in range(3))
        for n in shape)
    f = jax.jit(lambda v: pallas_axis_stencil_db(coeffs, v))
    print(f"compiling {label}...", flush=True)
    o = f(x); float(o.ravel()[0].astype(jnp.float32))
    tic = time.perf_counter()
    for _ in range(reps):
        o = f(o)
    float(o.ravel()[0].astype(jnp.float32))
    dt = (time.perf_counter() - tic) / reps
    by = 2 * N**3 * np.dtype(dtype).itemsize
    print(f"{label}: {dt*1e3:.3f} ms  {by/dt/1e9:.0f} GB/s", flush=True)

run(jnp.float32, "v2 f32 ")
run(jnp.bfloat16, "v2 bf16")
