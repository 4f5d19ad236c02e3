"""Sweep Pallas DIA kernel block size on the bench workload (10M-row 2-D
Laplacian, w=3163): larger blocks cut the x halo overfetch (1 + 2*sub/block)."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from cuda_mat_tpu.models.problems import banded_laplacian_dia
from cuda_mat_tpu.ops.pallas_spmv import PallasDIAOperator

dia = banded_laplacian_dia(3163, dtype=np.float32)
n = dia.n


def chain(op, x, k=200, reps=5):
    @jax.jit
    def run(x):
        y = jax.lax.fori_loop(0, k, lambda i, y: op.matvec(y) * 0.1, x)
        return jnp.sum(y[:8])
    float(run(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(run(x)); ts.append(time.perf_counter() - t0)
    return min(ts) / k


for block in (16384, 32768, 65536, 131072):
    op = PallasDIAOperator.from_dia(dia, block=block)
    x = op.pad_vec(jnp.ones((n,), jnp.float32))
    t = chain(op, x)
    gbps = (dia.ndiag * n + 2 * n) * 4 / t / 1e9
    real = (dia.ndiag * n + (1 + 2 * op.sub / block) * n + n) * 4 / t / 1e9
    print(f"block={block:6d} sub={op.sub} t={t*1e6:7.1f} us  "
          f"model={gbps:6.1f} GB/s  real={real:6.1f} GB/s", flush=True)
