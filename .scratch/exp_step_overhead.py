"""fori_loop per-step overhead vs array size; per-op vs per-step."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp

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

for n in (1310720, 5242880, 20971520, 67108864):
    x = jnp.ones((n,), jnp.float32)
    t1 = chain_time(lambda y: y * 1.0000001, x, k=100)
    t2 = chain_time(lambda y: jnp.sin(y * 1.0000001) * 0.99 + 0.001, x, k=100)  # more flops, same streams
    bw = 2 * n * 4 / t1 / 1e9
    print(f"n={n:>9}: 1-op {t1*1e6:7.1f} us ({bw:5.1f} GB/s)   heavier-op {t2*1e6:7.1f} us", flush=True)

# per-op vs per-step: two DEPENDENT multiplies in one step (XLA fuses -> 1 kernel)
n = 1310720
x = jnp.ones((n,), jnp.float32)
t_unfused = chain_time(lambda y: jnp.tanh(y) * 0.5 + jnp.sin(y) * 0.001, x, k=100)
print(f"n={n}: two-branch body {t_unfused*1e6:.1f} us", flush=True)
