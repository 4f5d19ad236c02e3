"""Pallas multi-stream triad roofline."""
import sys; sys.path.insert(0, "/root/repo")
import time
from functools import partial
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def chain_time(step_fn, x0, k=100, reps=5):
    @jax.jit
    def run(x):
        y = jax.lax.fori_loop(0, k, lambda i, y: step_fn(y), x)
        return jnp.sum(y[:8])
    float(run(x0))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(run(x0)); ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / k

def pallas_streams(n_read, N=64*1024*1024, BLOCK=131072):
    def kern(*refs):
        acc = refs[0][:]
        for r in refs[1:-1]:
            acc = acc + r[:]
        refs[-1][:] = acc * 0.001
    f = pl.pallas_call(kern, grid=(N // BLOCK,),
        in_specs=[pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM)] * n_read,
        out_specs=pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N,), jnp.float32))
    others = [jnp.full((N,), float(i + 2), jnp.float32) for i in range(n_read - 1)]
    x = jnp.ones((N,), jnp.float32)
    t = chain_time(lambda y: f(y, *others), x, k=100)
    gbps = (n_read + 1) * N * 4 / t / 1e9
    print(f"pallas {n_read}-read+1-write: {gbps:.1f} GB/s", flush=True)
    return gbps

for nr in (1, 3, 5, 7):
    pallas_streams(nr)
