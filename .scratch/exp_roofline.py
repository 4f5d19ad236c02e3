"""Which streaming pattern measures peak HBM bandwidth on this chip?"""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp

def chain_time(step_fn, x0, k=100, reps=5):
    @jax.jit
    def run(x):
        y = jax.lax.fori_loop(0, k, lambda i, y: step_fn(y), x)
        return jnp.sum(y[0][:8]) if isinstance(y, tuple) else jnp.sum(y[:8])
    float(run(x0))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(run(x0)); ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / k

N = 64 * 1024 * 1024  # 256 MB per stream
one = jnp.ones((N,), jnp.float32)

# 1 read + 1 write
t = chain_time(lambda y: y * 1.0000001 + 1.0, one, k=100)
print(f"copy chain (2 streams): {2*N*4/t/1e9:.1f} GB/s", flush=True)

# 4 streams: read 3 + write 1 (rotating tuple to keep dependency)
x3 = (one, one * 2, one * 3)
t = chain_time(lambda ys: (ys[1], ys[2], ys[0] * 0.3333 + ys[1] * 0.3333 + ys[2] * 0.3333),
               x3, k=100)
print(f"3-read+1-write rotate (4 streams): {4*N*4/t/1e9:.1f} GB/s", flush=True)

# 6 streams
x5 = tuple(one * (i + 1) for i in range(5))
t = chain_time(lambda ys: ys[1:] + (sum(y * 0.19 for y in ys),), x5, k=100)
print(f"5-read+1-write rotate (6 streams): {6*N*4/t/1e9:.1f} GB/s", flush=True)
