"""Stencil matvec t vs kernel block (grid-step overhead) on TPU, 10M rows."""
import time
import numpy as np
import jax, jax.numpy as jnp
from cuda_mat_tpu.models.problems import banded_laplacian_dia
from cuda_mat_tpu.ops.pallas_stencil import ConstStencilOperator

dia = banded_laplacian_dia(3163, dtype=np.float32)  # 10.0M rows
n = dia.n

def chain(op, x, k=200, reps=5):
    @jax.jit
    def run(x):
        y = jax.lax.fori_loop(0, k, lambda i, y: op.matvec(y) * 0.1, x)
        return jnp.sum(y[:8])
    float(run(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(run(x)); ts.append(time.perf_counter()-t0)
    return float(np.median(ts)) / k

for bt in (262144, 204800, 104448, 65536, 32768):
    op = ConstStencilOperator.from_dia(dia, block_target=bt)
    x = op.pad_vec(jnp.ones((n,), jnp.float32))
    t = chain(op, x)
    steps = (op.npad + 2*op.block)//op.block
    print(f"block={op.block} sub={op.sub} steps={steps}: {t*1e6:.1f} us", flush=True)
