"""TPU: bf16 diagonal data vs f32 on the bench workload (block=32768)."""
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


for label, ddt in (("f32 ", None), ("bf16", jnp.bfloat16)):
    op = PallasDIAOperator.from_dia(dia, block=32768, data_dtype=ddt)
    x = op.pad_vec(jnp.ones((n,), jnp.float32))
    t = chain(op, x)
    itemsize = 2 if ddt is not None else 4
    bytes_model = dia.ndiag * n * itemsize + 2 * n * 4
    print(f"{label} data: t={t*1e6:7.1f} us  model={bytes_model/t/1e9:6.1f} GB/s"
          f"  (f32-equiv {(dia.ndiag*n+2*n)*4/t/1e9:6.1f})", flush=True)
