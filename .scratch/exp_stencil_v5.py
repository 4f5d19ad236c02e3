"""V3b: bf16 seam mask; V6: gap-strided layout (no seam masks)."""
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

# ---- V3b: seam-stream with bf16 mask --------------------------------------
def bench_v3(BLOCK, SUB, mdt):
    NPAD = -(-n // BLOCK) * BLOCK
    nv = BLOCK // SUB + 2
    n_sub = (NPAD + 2 * BLOCK) // SUB
    LASTI = (n - 1) // BLOCK + 1
    def sub_map(j):
        return lambda i: (jnp.clip(i * (BLOCK // SUB) + j - 1, 0, n_sub - 1),)
    xspecs = [pl.BlockSpec((SUB,), sub_map(j), memory_space=pltpu.VMEM) for j in range(nv)]
    def kern(*refs):
        x_refs, m_refs, y_ref = refs[:nv], refs[nv:2*nv], refs[-1]
        i, g = pl.program_id(0), pl.num_programs(0)
        @pl.when((i > 0) & (i < g - 1))
        def _():
            xs = jnp.concatenate([r[:] for r in x_refs])
            ms = jnp.concatenate([r[:] for r in m_refs]).astype(jnp.float32)
            acc = None
            for (off, dc, s) in TERMS:
                w = jax.lax.slice(xs, (SUB + off,), (SUB + off + BLOCK,))
                if dc != 0:
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
        in_specs=xspecs * 2,
        out_specs=pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NPAD + 2 * BLOCK,), jnp.float32))
    ms = np.zeros(NPAD + 2 * BLOCK, np.float32)
    ms[BLOCK:BLOCK + n] = (np.arange(n) % side != 0)
    ms = jnp.asarray(ms, mdt)
    xp = jnp.zeros(NPAD + 2 * BLOCK, jnp.float32).at[BLOCK:BLOCK + n].set(1.0)
    step = jax.jit(lambda y: f(*([y] * nv), *([ms] * nv)) * 0.1)
    t = chain_time(step, xp, k=200)
    print(f"V3 blk={BLOCK} sub={SUB} mask={mdt}: {t*1e6:.1f} us  nnz/s={dia.nnz/t:.3e}  vs_dia={558.8/(t*1e6):.2f}x", flush=True)



# ---- V6: gap-strided layout ------------------------------------------------
def bench_v6(S, SUB_MULT, BLK_MULT):
    # stride S >= side, gap cells zero; block = S*BLK_MULT, sub = S*SUB_MULT
    SUB = S * SUB_MULT
    BLOCK = S * BLK_MULT
    assert BLOCK % SUB == 0 and SUB % 1024 == 0
    R = side
    nprime = R * S
    NPAD = -(-nprime // BLOCK) * BLOCK
    nv = BLOCK // SUB + 2
    n_sub = (NPAD + 2 * BLOCK) // SUB
    LASTI = (nprime - 1) // BLOCK + 1
    T2 = ((-S, -1.0), (-1, -1.0), (0, 4.0), (1, -1.0), (S, -1.0))
    gapmask = np.ones(BLOCK, np.float32)
    gm2 = gapmask.reshape(BLK_MULT, S); gm2[:, side:] = 0.0
    gapmask = jnp.asarray(gapmask)
    def sub_map(j):
        return lambda i: (jnp.clip(i * (BLOCK // SUB) + j - 1, 0, n_sub - 1),)
    xspecs = [pl.BlockSpec((SUB,), sub_map(j), memory_space=pltpu.VMEM) for j in range(nv)]
    gspec = pl.BlockSpec((BLOCK,), lambda i: (0,), memory_space=pltpu.VMEM)
    def kern(*refs):
        x_refs, g_ref, y_ref = refs[:nv], refs[nv], refs[-1]
        i, g = pl.program_id(0), pl.num_programs(0)
        @pl.when((i > 0) & (i < g - 1))
        def _():
            xs = jnp.concatenate([r[:] for r in x_refs])
            acc = None
            for (off, s) in T2:
                w = jax.lax.slice(xs, (SUB + off,), (SUB + off + BLOCK,))
                acc = jnp.float32(s) * w if acc is None else acc + jnp.float32(s) * w
            acc = acc * g_ref[:]
            @pl.when(i >= LASTI)
            def _tail():
                t = (i - 1) * BLOCK + jax.lax.broadcasted_iota(jnp.int32, (BLOCK,), 0)
                y_ref[:] = jnp.where(t < nprime, acc, 0.0)
            @pl.when(i < LASTI)
            def _notail():
                y_ref[:] = acc
        @pl.when((i == 0) | (i == g - 1))
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)
    f = pl.pallas_call(kern, grid=(NPAD // BLOCK + 2,),
        in_specs=xspecs + [gspec],
        out_specs=pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NPAD + 2 * BLOCK,), jnp.float32))
    # x in strided layout
    x2 = np.zeros((R, S), np.float32); x2[:, :side] = 1.0
    xp = jnp.zeros(NPAD + 2 * BLOCK, jnp.float32).at[BLOCK:BLOCK + nprime].set(x2.reshape(-1))
    step = jax.jit(lambda y: f(*([y] * nv), gapmask) * 0.1)
    t = chain_time(step, xp, k=200)
    print(f"V6 gap S={S} blk={BLOCK}({BLK_MULT}) sub={SUB}: {t*1e6:.1f} us  nnz/s={dia.nnz/t:.3e}  vs_dia={558.8/(t*1e6):.2f}x", flush=True)
    # correctness
    rng = np.random.default_rng(0)
    xv = rng.standard_normal(n).astype(np.float32)
    x2 = np.zeros((R, S), np.float32); x2[:, :side] = xv.reshape(R, side)
    xpad = jnp.zeros(NPAD + 2 * BLOCK, jnp.float32).at[BLOCK:BLOCK + nprime].set(x2.reshape(-1))
    y = np.asarray(jax.jit(step)(xpad))
    ygrid = y[BLOCK:BLOCK + nprime].reshape(R, S)
    assert np.all(ygrid[:, side:] == 0.0), "gap cells not zero!"
    yv = ygrid[:, :side].reshape(-1) / 0.1
    yref = dia.matvec(xv)
    err = np.abs(yv - yref).max() / np.abs(yref).max()
    print(f"   max rel err: {err:.2e}", flush=True)

bench_v6(3200, 8, 80)     # sub=25600, blk=256000
bench_v6(3200, 4, 80)     # sub=12800, blk=256000
bench_v6(4096, 4, 64)     # power-of-2 stride (28% pad): sub=16384, blk=262144
