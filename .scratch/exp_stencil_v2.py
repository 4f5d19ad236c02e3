"""Isolate const-stencil kernel costs: maskless floor, mask-stream variants."""
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
TERMS = ((-side, 0, -1.0), (-1, -1, -1.0), (0, 0, 4.0), (1, 1, -1.0), (side, 0, -1.0))

def specs(k):
    n_sub = (NPAD + 2 * BLOCK) // SUB
    def sub_map(j):
        return lambda i: (jnp.clip(i * (BLOCK // SUB) + j - 1, 0, n_sub - 1),)
    return [pl.BlockSpec((SUB,), sub_map(j), memory_space=pltpu.VMEM)
            for j in range(BLOCK // SUB + 2)]

def run_variant(name, kernel, extra_inputs, extra_specs, model_bytes):
    f = pl.pallas_call(
        kernel, grid=(NPAD // BLOCK + 2,),
        in_specs=specs(BLOCK // SUB + 2) + extra_specs,
        out_specs=pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NPAD + 2 * BLOCK,), jnp.float32))
    xp = jnp.zeros(NPAD + 2 * BLOCK, jnp.float32).at[BLOCK:BLOCK + n].set(1.0)
    nv = BLOCK // SUB + 2
    step = jax.jit(lambda y: f(*([y] * nv), *extra_inputs) * 0.1)
    t = chain_time(step, xp, k=200)
    print(f"{name}: {t*1e6:.1f} us  {model_bytes/t/1e9:.1f} GB/s(model)  nnz/s={dia.nnz/t:.3e}", flush=True)
    return t

# V0: maskless (WRONG results; perf floor probe)
def k_v0(*refs):
    x_refs, y_ref = refs[:-1], refs[-1]
    i, g = pl.program_id(0), pl.num_programs(0)
    @pl.when((i > 0) & (i < g - 1))
    def _():
        xs = jnp.concatenate([r[:] for r in x_refs])
        acc = None
        for (off, dc, s) in TERMS:
            w = jnp.float32(s) * jax.lax.slice(xs, (SUB + off,), (SUB + off + BLOCK,))
            acc = w if acc is None else acc + w
        y_ref[:] = acc
    @pl.when((i == 0) | (i == g - 1))
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

run_variant("V0 maskless floor", k_v0, [], [], 2 * n * 4)

# V3: f32 seam-mask stream (tail folded into mask zeros) + when-gated tail fixup
mseam = np.zeros(NPAD + 2 * BLOCK, np.float32)
idx = np.arange(n)
mseam[BLOCK:BLOCK + n] = (idx % side != 0).astype(np.float32)
mseam = jnp.asarray(mseam)
LASTI = (BLOCK + n - 1) // BLOCK  # grid index of block containing row n-1

def k_v3(*refs):
    x_refs = refs[:BLOCK // SUB + 2]
    m_refs = refs[BLOCK // SUB + 2:-1]
    y_ref = refs[-1]
    i, g = pl.program_id(0), pl.num_programs(0)
    @pl.when((i > 0) & (i < g - 1))
    def _():
        xs = jnp.concatenate([r[:] for r in x_refs])
        ms = jnp.concatenate([r[:] for r in m_refs])
        acc = None
        for (off, dc, s) in TERMS:
            w = jax.lax.slice(xs, (SUB + off,), (SUB + off + BLOCK,))
            if dc == -1:
                w = w * jax.lax.slice(ms, (SUB,), (SUB + BLOCK,))
            elif dc == 1:
                w = w * jax.lax.slice(ms, (SUB + 1,), (SUB + 1 + BLOCK,))
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

run_variant("V3 seam-stream", k_v3, [mseam] * (BLOCK // SUB + 2), specs(0), int(3.5 * n) * 4)

# V4: two pure-multiply masks (mrow applied to acc), no iota anywhere
mrow = np.zeros(NPAD + 2 * BLOCK, np.float32)
mrow[BLOCK:BLOCK + n] = 1.0
mrow_j = jnp.asarray(mrow)

def k_v4(*refs):
    nv = BLOCK // SUB + 2
    x_refs = refs[:nv]
    m_refs = refs[nv:2 * nv]
    r_ref = refs[2 * nv]
    y_ref = refs[-1]
    i, g = pl.program_id(0), pl.num_programs(0)
    @pl.when((i > 0) & (i < g - 1))
    def _():
        xs = jnp.concatenate([r[:] for r in x_refs])
        ms = jnp.concatenate([r[:] for r in m_refs])
        acc = None
        for (off, dc, s) in TERMS:
            w = jax.lax.slice(xs, (SUB + off,), (SUB + off + BLOCK,))
            if dc == -1:
                w = w * jax.lax.slice(ms, (SUB,), (SUB + BLOCK,))
            elif dc == 1:
                w = w * jax.lax.slice(ms, (SUB + 1,), (SUB + 1 + BLOCK,))
            acc = jnp.float32(s) * w if acc is None else acc + jnp.float32(s) * w
        y_ref[:] = acc * r_ref[:]
    @pl.when((i == 0) | (i == g - 1))
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

rspec = [pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM)]
run_variant("V4 two-mask", k_v4, [mseam] * (BLOCK // SUB + 2) + [mrow_j], specs(0) + rspec, int(4.5 * n) * 4)
