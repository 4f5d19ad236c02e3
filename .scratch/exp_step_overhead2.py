"""Is the ~235us floor per-step or per-run? Does it hit pallas steps?"""
import sys; sys.path.insert(0, "/root/repo")
import time
from functools import partial
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def run_time(step_fn, x0, k, reps=5):
    @jax.jit
    def run(x):
        y = jax.lax.fori_loop(0, k, lambda i, y: step_fn(y), x)
        return jnp.sum(y[:8])
    float(run(x0))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(run(x0)); ts.append(time.perf_counter() - t0)
    return float(np.median(ts))

n = 1310720
x = jnp.ones((n,), jnp.float32)
for k in (25, 100, 400):
    t = run_time(lambda y: y * 1.0000001, x, k)
    print(f"xla 1-op k={k}: total {t*1e3:.2f} ms  per-step {t/k*1e6:.1f} us", flush=True)

BLOCK = 131072
def copy_kern(x_ref, y_ref):
    y_ref[:] = x_ref[:] * 1.0000001
pcopy = pl.pallas_call(copy_kern, grid=(n // BLOCK,),
    in_specs=[pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((n,), jnp.float32))
for k in (25, 100, 400):
    t = run_time(pcopy, x, k)
    print(f"pallas copy k={k}: total {t*1e3:.2f} ms  per-step {t/k*1e6:.1f} us", flush=True)
