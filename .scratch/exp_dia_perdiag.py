"""Re-measure production PallasDIAOperator (per-diag streams) + e2e solves."""
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

from cuda_mat_tpu.models.problems import banded_laplacian_dia, grid_laplacian
from cuda_mat_tpu.ops.pallas_spmv import PallasDIAOperator

side = 3163
dia = banded_laplacian_dia(side, dtype=np.float32)
n = dia.n
op = PallasDIAOperator.from_dia(dia, block=32768)
x = op.pad_vec(jnp.ones(n, jnp.float32))
t = chain_time(lambda y: op.matvec(y) * 0.1, x, k=200)
print(f"PallasDIA per-diag blk=32768: {t*1e6:.1f} us  nnz/s={dia.nnz/t:.3e}  (was 558.8 us stacked)", flush=True)
# correctness
rng = np.random.default_rng(0)
xv = rng.standard_normal(n).astype(np.float32)
y = np.asarray(op.unpad_vec(op.matvec(op.pad_vec(xv))))
err = np.abs(y - dia.matvec(xv)).max() / np.abs(dia.matvec(xv)).max()
print(f"max rel err: {err:.2e}", flush=True)
for blk in (65536, 131072):
    op2 = PallasDIAOperator.from_dia(dia, block=blk)
    x2 = op2.pad_vec(jnp.ones(n, jnp.float32))
    t2 = chain_time(lambda y: op2.matvec(y) * 0.1, x2, k=200)
    print(f"PallasDIA per-diag blk={blk}: {t2*1e6:.1f} us  nnz/s={dia.nnz/t2:.3e}", flush=True)

# e2e: 1M-row Neumann with stencil operator (factors now per-diag streams)
from cuda_mat_tpu.config import SolverConfig
from cuda_mat_tpu.solvers.bicgstab import solve
a = grid_laplacian(10000, 100)
b = np.ones(a.n)
cfg = SolverConfig(maxit=2000, tol=1e-4, dtype="float32", precond="ilu0_neumann", neumann_terms=3)
solve(a, b, cfg)
res = solve(a, b, cfg)
print(f"1M neumann auto(stencil): iters={res.iters} dtAlg={res.dt_alg*1e3:.1f} ms (was 63.7)", flush=True)
