import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp

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

from cuda_mat_tpu.formats.dia import DIAMatrix
from cuda_mat_tpu.ops.pallas_spmv import PallasDIAOperator

n = 10004569
rng = np.random.default_rng(0)
for nd, offs in ((3, (-3163, 0, 3163)), (5, (-3163, -1, 0, 1, 3163)), (9, (-3164, -3163, -3162, -1, 0, 1, 3162, 3163, 3164))):
    data = rng.standard_normal((nd, n)).astype(np.float32) * 0.01
    data[nd // 2] = 1.0
    dia = DIAMatrix(n, n, np.asarray(offs, np.int32), data, nd * n)
    op = PallasDIAOperator.from_dia(dia, block=32768)
    x = op.pad_vec(jnp.ones(n, jnp.float32))
    t = chain_time(lambda y: op.matvec(y) * 0.3, x, k=200)
    gbps = (nd + 2.25) * n * 4 / t / 1e9
    print(f"ndiag={nd}: {t*1e6:.1f} us  true-traffic {gbps:.1f} GB/s", flush=True)
