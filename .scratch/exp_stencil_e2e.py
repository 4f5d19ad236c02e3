"""Production ConstStencilOperator on TPU: matvec + e2e solves."""
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

from cuda_mat_tpu.models.problems import banded_laplacian_dia, banded_laplacian
from cuda_mat_tpu.ops.pallas_stencil import ConstStencilOperator

side = 3163
dia = banded_laplacian_dia(side, dtype=np.float32)
op = ConstStencilOperator.from_dia(dia, dtype=jnp.float32)
print(f"layout: stride={op.stride} sub={op.sub} block={op.block} npad={op.npad} overhead={op.npad/op.n-1:.3f}", flush=True)
x = op.pad_vec(jnp.ones(op.n, jnp.float32))
t = chain_time(lambda y: op.matvec(y) * 0.1, x, k=200)
print(f"ConstStencil 10M matvec: {t*1e6:.1f} us  nnz/s={op.nnz/t:.3e}  vs_dia_558.8us={558.8/(t*1e6):.2f}x", flush=True)

# correctness on TPU vs DIAMatrix oracle
rng = np.random.default_rng(0)
xv = rng.standard_normal(op.n).astype(np.float32)
y = np.asarray(op.unpad_vec(op.matvec(op.pad_vec(xv))))
err = np.abs(y - dia.matvec(xv)).max() / np.abs(dia.matvec(xv)).max()
print(f"matvec max rel err: {err:.2e}", flush=True)

# ---- e2e 1M-row solves: grid 10000x100 narrow-band (BASELINE config) ------
from cuda_mat_tpu.config import SolverConfig
from cuda_mat_tpu.solvers.bicgstab import solve
from cuda_mat_tpu.formats.coo import COOMatrix
from cuda_mat_tpu.formats.csr import CSRMatrix

def lap_grid(r, c):
    n = r * c
    idx = np.arange(n, dtype=np.int64)
    rows = [idx]; cols = [idx]; data = [np.full(n, 4.0)]
    left = idx[idx % c != 0]
    rows += [left, left - 1]; cols += [left - 1, left]
    data += [np.full(left.shape[0], -1.0)] * 2
    up = idx[idx >= c]
    rows += [up, up - c]; cols += [up - c, up]
    data += [np.full(up.shape[0], -1.0)] * 2
    return CSRMatrix.from_coo(COOMatrix(n, n, np.concatenate(rows), np.concatenate(cols), np.concatenate(data)))

a = lap_grid(10000, 100)
b = np.ones(a.n)
cfg = SolverConfig(maxit=2000, tol=1e-4, dtype="float32", precond="ilu0_neumann", neumann_terms=3)
for fmt in ("pallas_dia", "stencil"):
    solve(a, b, cfg, format=fmt)
    res = solve(a, b, cfg, format=fmt)
    print(f"1M neumann {fmt}: iters={res.iters} status={res.status.name} dtAlg={res.dt_alg*1e3:.1f} ms", flush=True)

# mat10000 exact-ILU auto path (the reference CLI default)
from cuda_mat_tpu.io.mmio import load_mm_sparse_matrix
from cuda_mat_tpu.solvers.bicgstab import bicgstab_lu_precond
a2 = load_mm_sparse_matrix("/root/repo/data/mat10000.mtx")
b2 = np.ones(a2.n)
cfg2 = SolverConfig(maxit=2000, tol=1e-4, dtype="float32", trisolve_block=128)
bicgstab_lu_precond(a2, b2, cfg2)
res = bicgstab_lu_precond(a2, b2, cfg2)
print(f"mat10000 ilu0 auto: iters={res.iters} status={res.status.name} dtAlg={res.dt_alg*1e3:.2f} ms", flush=True)
