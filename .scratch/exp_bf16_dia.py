"""bf16 DIA data revisit (VERDICT r1 #9): per-diagonal 1-D bf16 streams."""
import sys; sys.path.insert(0, "/root/repo")
import time
from functools import partial
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
BLOCK, SUB = 32768, 4096
NPAD = -(-n // BLOCK) * BLOCK
OFFS = tuple(int(o) for o in dia.offsets)
ND = len(OFFS)

def build(data_dt):
    nv = BLOCK // SUB + 2
    n_sub = (NPAD + 2 * BLOCK) // SUB
    def sub_map(j):
        return lambda i: (jnp.clip(i * (BLOCK // SUB) + j - 1, 0, n_sub - 1),)
    xspecs = [pl.BlockSpec((SUB,), sub_map(j), memory_space=pltpu.VMEM) for j in range(nv)]
    dspecs = [pl.BlockSpec((BLOCK,), lambda i: (jnp.clip(i - 1, 0, NPAD // BLOCK - 1),),
                           memory_space=pltpu.VMEM) for _ in range(ND)]
    def kern(*refs):
        x_refs = refs[:nv]
        d_refs = refs[nv:nv + ND]
        y_ref = refs[-1]
        i, g = pl.program_id(0), pl.num_programs(0)
        @pl.when((i > 0) & (i < g - 1))
        def _():
            xs = jnp.concatenate([r[:] for r in x_refs])
            acc = None
            for d, off in enumerate(OFFS):
                w = d_refs[d][:].astype(jnp.float32) * jax.lax.slice(
                    xs, (SUB + off,), (SUB + off + BLOCK,))
                acc = w if acc is None else acc + w
            y_ref[:] = acc
        @pl.when((i == 0) | (i == g - 1))
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)
    f = pl.pallas_call(kern, grid=(NPAD // BLOCK + 2,),
        in_specs=xspecs + dspecs,
        out_specs=pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NPAD + 2 * BLOCK,), jnp.float32))
    dstreams = [jnp.asarray(np.pad(dia.data[d], (0, NPAD - n)), data_dt) for d in range(ND)]
    nv_ = nv
    xp = jnp.zeros(NPAD + 2 * BLOCK, jnp.float32).at[BLOCK:BLOCK + n].set(1.0)
    step = jax.jit(lambda y: f(*([y] * nv_), *dstreams) * 0.1)
    t = chain_time(step, xp, k=200)
    itemsz = 2 if data_dt == jnp.bfloat16 else 4
    traffic = (ND * itemsz + (1 + 2 * SUB / BLOCK) * 4 + 4) * n
    print(f"per-diag 1-D {data_dt.__name__}: {t*1e6:.1f} us  nnz/s={dia.nnz/t:.3e}  model {traffic/t/1e9:.0f} GB/s", flush=True)

build(jnp.float32)    # control: same kernel structure, f32 streams
build(jnp.bfloat16)
