"""Bisect: why is a dense matvec inside lax.while_loop ~500x slower than the
same matvec chained in a fori_loop on the TPU?

Variants (all inside ONE jit, k steps, scalar fetch forces completion):
  A fori_loop, carry = x only
  B while_loop, cond = i < k, carry = (i, x)
  C while_loop, cond = i < k and flag, carry = (i, flag, x)
  D while_loop, full solver-ish carry (several vectors + scalars + hist)
  E while_loop like C but body also does hist.at[i].set(norm)
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

N = 4096
K = 50
import time as _t
_t0 = _t.perf_counter()
A = jnp.asarray(np.random.default_rng(0).standard_normal((N, N)).astype(np.float32)) * 0.001
A.block_until_ready()
print(f"A upload {_t.perf_counter()-_t0:.1f}s", file=sys.stderr, flush=True)
x0 = jnp.ones((N,), jnp.float32)


def timeit(fn, *args):
    t0 = time.perf_counter()
    float(fn(*args))
    print(f"  compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
    # chain-time style: the loop itself is the dependency chain; fetch scalar
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


@jax.jit
def var_a(x):
    y = jax.lax.fori_loop(0, K, lambda i, y: A @ y, x)
    return jnp.sum(y[:8])


@jax.jit
def var_b(x):
    def cond(st):
        return st[0] < K
    def body(st):
        i, y = st
        return (i + 1, A @ y)
    _, y = jax.lax.while_loop(cond, body, (jnp.int32(0), x))
    return jnp.sum(y[:8])


@jax.jit
def var_c(x):
    def cond(st):
        return (st[0] < K) & (st[1] == 0)
    def body(st):
        i, f, y = st
        y = A @ y
        f = jnp.where(jnp.sum(y[:4]) > 1e30, 1, 0).astype(jnp.int32)
        return (i + 1, f, y)
    _, _, y = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0), x))
    return jnp.sum(y[:8])


@jax.jit
def var_d(x):
    hist = jnp.full((2000,), -1.0, jnp.float32)
    def cond(st):
        return (st[0] < K) & (st[1] == 0)
    def body(st):
        i, f, y, p, v, rho, hist = st
        v = A @ p
        alpha = rho / jnp.dot(y, v)
        y2 = y - alpha * v
        norm = jnp.sqrt(jnp.dot(y2, y2))
        f = jnp.where(norm < 1e-30, 1, 0).astype(jnp.int32)
        return (i + 1, f, y2, y2, v, norm, hist)
    st = (jnp.int32(0), jnp.int32(0), x, x, x, jnp.float32(1.0), hist)
    out = jax.lax.while_loop(cond, body, st)
    return jnp.sum(out[2][:8])


@jax.jit
def var_e(x):
    hist = jnp.full((2000,), -1.0, jnp.float32)
    def cond(st):
        return (st[0] < K) & (st[1] == 0)
    def body(st):
        i, f, y, hist = st
        y = A @ y
        norm = jnp.sqrt(jnp.dot(y, y))
        hist = hist.at[i].set(norm)
        f = jnp.where(norm > 1e30, 1, 0).astype(jnp.int32)
        return (i + 1, f, y, hist)
    out = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0), x, hist))
    return jnp.sum(out[2][:8])


@jax.jit
def var_f(x):
    # while_loop + lax.cond inside the body (precond_core's second_half shape)
    def cond(st):
        return (st[0] < K) & (st[1] == 0)
    def body(st):
        i, f, y = st
        y1 = A @ y
        n1 = jnp.sqrt(jnp.dot(y1, y1))
        y2 = jax.lax.cond(n1 > 1e30, lambda _: y1, lambda _: A @ y1, None)
        f = jnp.where(n1 > 1e30, 1, 0).astype(jnp.int32)
        return (i + 1, f, y2)
    out = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0), x))
    return jnp.sum(out[2][:8])


print("backend:", jax.default_backend(), file=sys.stderr)
for name, fn in [("A fori", var_a), ("B while_trivial", var_b),
                 ("C while_flag", var_c), ("D while_solverish", var_d),
                 ("E while_hist", var_e), ("F while_cond_inside", var_f)]:
    print(name, file=sys.stderr, flush=True)
    dt = timeit(fn, x0)
    per = dt / K * 1e3
    print(f"{name:22s} total {dt*1e3:8.2f} ms   per-step {per:7.3f} ms", flush=True)
