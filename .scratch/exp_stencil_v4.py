"""V5: maskless kernel + tiny XLA seam scatter-fix; sub sweep."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def chain_time(step_fn, x0, k=200, reps=5):
    @jax.jit
    def run(x):
        y = jax.lax.fori_loop(0, k, lambda i, y: step_fn(y), x)
        return jnp.sum(y[:8])
    float(run(x0))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(run(x0)); ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / k

from cuda_mat_tpu.models.problems import banded_laplacian_dia
side = 3163
dia = banded_laplacian_dia(side, dtype=np.float32)
n = dia.n
TERMS = ((-side, 0, -1.0), (-1, -1, -1.0), (0, 0, 4.0), (1, 1, -1.0), (side, 0, -1.0))

def build(BLOCK, SUB):
    NPAD = -(-n // BLOCK) * BLOCK
    nv = BLOCK // SUB + 2
    n_sub = (NPAD + 2 * BLOCK) // SUB
    LASTI = (n - 1) // BLOCK + 1
    def sub_map(j):
        return lambda i: (jnp.clip(i * (BLOCK // SUB) + j - 1, 0, n_sub - 1),)
    xspecs = [pl.BlockSpec((SUB,), sub_map(j), memory_space=pltpu.VMEM) for j in range(nv)]
    def kern(*refs):
        x_refs, y_ref = refs[:-1], refs[-1]
        i, g = pl.program_id(0), pl.num_programs(0)
        @pl.when((i > 0) & (i < g - 1))
        def _():
            xs = jnp.concatenate([r[:] for r in x_refs])
            acc = None
            for (off, dc, s) in TERMS:
                w = jax.lax.slice(xs, (SUB + off,), (SUB + off + BLOCK,))
                acc = jnp.float32(s) * w if acc is None else acc + jnp.float32(s) * w
            @pl.when(i >= LASTI)
            def _tail():
                t = (i - 1) * BLOCK + jax.lax.broadcasted_iota(jnp.int32, (BLOCK,), 0)
                y_ref[:] = jnp.where(t < n, acc, 0.0)
            @pl.when(i < LASTI)
            def _notail():
                y_ref[:] = acc
        @pl.when((i == 0) | (i == g - 1))
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)
    f = pl.pallas_call(kern, grid=(NPAD // BLOCK + 2,),
        in_specs=xspecs,
        out_specs=pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NPAD + 2 * BLOCK,), jnp.float32))
    return f, nv, NPAD

def bench_v5(BLOCK, SUB):
    f, nv, NPAD = build(BLOCK, SUB)
    # seam corrections: for (off, dc, s) invalid at output p: subtract s*x[p+off]
    rs = np.arange(1, side, dtype=np.int64)
    pL = rs * side          # gj==0: dc=-1 term invalid (reads prev row end)
    pR = rs * side - 1      # gj==side-1: dc=+1 term invalid
    idxL = jnp.asarray(BLOCK + pL)   # padded coords
    idxR = jnp.asarray(BLOCK + pR)
    def step(x):
        y = f(*([x] * nv))
        # remove the invalid contributions: term was  -1.0 * x[p-1] / x[p+1]
        y = y.at[idxL].add(1.0 * x[idxL - 1])
        y = y.at[idxR].add(1.0 * x[idxR + 1])
        return y * 0.1
    xp = jnp.zeros(NPAD + 2 * BLOCK, jnp.float32).at[BLOCK:BLOCK + n].set(1.0)
    t = chain_time(jax.jit(step), xp, k=200)
    print(f"V5 scatterfix blk={BLOCK} sub={SUB}: {t*1e6:.1f} us  nnz/s={dia.nnz/t:.3e}  vs_dia={558.8/(t*1e6):.2f}x", flush=True)
    # correctness vs DIA reference
    rng = np.random.default_rng(0)
    xv = rng.standard_normal(n).astype(np.float32)
    xpad = jnp.zeros(NPAD + 2 * BLOCK, jnp.float32).at[BLOCK:BLOCK + n].set(xv)
    y = np.asarray(jax.jit(step)(xpad))[BLOCK:BLOCK + n] / 0.1
    yref = dia.matvec(xv)
    err = np.abs(y - yref).max() / np.abs(yref).max()
    print(f"   max rel err vs DIA oracle: {err:.2e}", flush=True)

for blk, sub in ((262144, 8192), (262144, 16384), (262144, 32768), (131072, 16384)):
    bench_v5(blk, sub)
