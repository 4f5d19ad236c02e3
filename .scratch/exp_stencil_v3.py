"""Block-size sweep for the seam-stream const-stencil kernel."""
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

def bench(BLOCK, SUB, masked=True):
    NPAD = -(-n // BLOCK) * BLOCK
    nv = BLOCK // SUB + 2
    n_sub = (NPAD + 2 * BLOCK) // SUB
    LASTI = (n - 1) // BLOCK + 1
    def sub_map(j):
        return lambda i: (jnp.clip(i * (BLOCK // SUB) + j - 1, 0, n_sub - 1),)
    xspecs = [pl.BlockSpec((SUB,), sub_map(j), memory_space=pltpu.VMEM) for j in range(nv)]
    def kern(*refs):
        x_refs = refs[:nv]
        m_refs = refs[nv:2*nv] if masked else ()
        y_ref = refs[-1]
        i, g = pl.program_id(0), pl.num_programs(0)
        @pl.when((i > 0) & (i < g - 1))
        def _():
            xs = jnp.concatenate([r[:] for r in x_refs])
            if masked:
                ms = jnp.concatenate([r[:] for r in m_refs])
            acc = None
            for (off, dc, s) in TERMS:
                w = jax.lax.slice(xs, (SUB + off,), (SUB + off + BLOCK,))
                if masked and dc != 0:
                    w = w * jax.lax.slice(ms, (SUB + dc,), (SUB + dc + BLOCK,))
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
        in_specs=xspecs * (2 if masked else 1),
        out_specs=pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NPAD + 2 * BLOCK,), jnp.float32))
    xp = jnp.zeros(NPAD + 2 * BLOCK, jnp.float32).at[BLOCK:BLOCK + n].set(1.0)
    ms = np.zeros(NPAD + 2 * BLOCK, np.float32)
    ms[BLOCK:BLOCK + n] = (np.arange(n) % side != 0).astype(np.float32)
    ms = jnp.asarray(ms)
    if masked:
        step = jax.jit(lambda y: f(*([y] * nv), *([ms] * nv)) * 0.1)
    else:
        step = jax.jit(lambda y: f(*([y] * nv)) * 0.1)
    t = chain_time(step, xp, k=200)
    tag = "V3" if masked else "V0"
    print(f"{tag} blk={BLOCK} sub={SUB} steps={NPAD//BLOCK+2}: {t*1e6:.1f} us  nnz/s={dia.nnz/t:.3e}  vs_dia={558.8/(t*1e6):.2f}x", flush=True)

for blk, sub in ((65536, 4096), (131072, 4096), (262144, 8192)):
    bench(blk, sub, masked=True)
bench(262144, 8192, masked=False)
bench(131072, 8192, masked=True)
