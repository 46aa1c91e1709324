#!/usr/bin/env python3
"""Probe usable HBM on the tunneled chip + the fastdiag 768^3 live set.

Phase A: device memory_stats (if the plugin exposes them).
Phase B: allocate 1.6875-GiB f32 cubes (768^3) one at a time until
RESOURCE_EXHAUSTED -> usable HBM in units of the bench's own array size.
"""
import os
import sys

import jax
import jax.numpy as jnp

dev = jax.devices()[0]
print("device:", dev, flush=True)
stats = None
try:
    stats = dev.memory_stats()
except Exception as e:  # plugin may not expose stats
    print("memory_stats unavailable:", e, flush=True)
if stats:
    for k in sorted(stats):
        print(f"  {k}: {stats[k]:,}", flush=True)

n = int(os.environ.get("N", "768"))
per = n**3 * 4 / 2**30
print(f"allocating {n}^3 f32 cubes ({per:.3f} GiB each)...", flush=True)
bufs = []
for i in range(16):
    try:
        key = jax.random.PRNGKey(i)
        x = jax.random.normal(key, (n, n, n), jnp.float32)
        # force materialization (block_until_ready insufficient on axon)
        float(x.ravel()[0])
        bufs.append(x)
        print(f"  cube {i + 1}: ok (total {per * (i + 1):.2f} GiB)", flush=True)
    except Exception as e:
        print(f"  cube {i + 1}: FAILED: {type(e).__name__}", flush=True)
        break
if stats is not None:
    try:
        s2 = dev.memory_stats()
        print("bytes_in_use now:", f"{s2.get('bytes_in_use', -1):,}",
              flush=True)
    except Exception:
        pass
sys.exit(0)
