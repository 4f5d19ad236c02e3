"""TPU 1M-row configs:
1. 2-D Laplacian (w=1000): f32 Jacobi -> expect honest BREAKDOWN now;
   solve_refined(jacobi) behavior recorded.
2. Narrow-band Laplacian grid 10000x100 (w=100, mat10000 pattern x100 rows):
   ILU(0) via Pallas trisolve B=128 -- the scaled headline config.
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from cuda_mat_tpu.formats.csr import CSRMatrix
from cuda_mat_tpu.formats.coo import COOMatrix
from cuda_mat_tpu.models.problems import banded_laplacian
from cuda_mat_tpu.config import SolverConfig
from cuda_mat_tpu.solvers.bicgstab import solve
from cuda_mat_tpu.solvers.refine import solve_refined


def laplacian_grid(rows, cols):
    n = rows * cols
    idx = np.arange(n, dtype=np.int64)
    r = [idx]; c = [idx]; d = [np.full(n, 4.0)]
    left = idx[idx % cols != 0]
    r += [left, left - 1]; c += [left - 1, left]
    d += [np.full(left.shape[0], -1.0)] * 2
    up = idx[idx >= cols]
    r += [up, up - cols]; c += [up - cols, up]
    d += [np.full(up.shape[0], -1.0)] * 2
    return CSRMatrix.from_coo(COOMatrix(n, n, np.concatenate(r),
                                        np.concatenate(c), np.concatenate(d)))


# --- config 2 first (the one expected to work) ---
a2 = laplacian_grid(10000, 100)   # n=1M, w=100
b2 = np.ones(a2.n)
cfg2 = SolverConfig(maxit=5000, tol=1e-6, dtype="float32", precond="ilu0",
                    trisolve_block=128)
t0 = time.perf_counter()
r1 = solve(a2, b2, cfg2)
print(f"1M narrow-band ILU: cold dtAlg={r1.dt_alg*1e3:.0f} ms "
      f"setup={r1.dt_setup:.1f}s", flush=True)
r2 = solve(a2, b2, cfg2)
rel = np.linalg.norm(b2 - a2.matvec(r2.x.astype(np.float64))) / np.linalg.norm(b2)
print(f"1M narrow-band ILU: iters={r2.iters} status={r2.status.name} "
      f"true_rel={rel:.2e} dtAlg warm={r2.dt_alg*1e3:.1f} ms "
      f"({r2.dt_alg/max(r2.iters,1)*1e3:.2f} ms/iter)", flush=True)

# --- config 1: wide-band 2-D Laplacian ---
a1 = banded_laplacian(1000)
b1 = np.ones(a1.n)
cfg1 = SolverConfig(maxit=2000, tol=1e-6, dtype="float32", precond="jacobi")
r = solve(a1, b1, cfg1)
r = solve(a1, b1, cfg1)
print(f"1M 2-D Laplacian jacobi f32: iters={r.iters} status={r.status.name} "
      f"dtAlg warm={r.dt_alg*1e3:.0f} ms", flush=True)
rr = solve_refined(a1, b1, SolverConfig(maxit=2000, tol=1e-8,
                                        precond="jacobi"),
                   inner_tol=1e-3, max_restarts=6)
rel = np.linalg.norm(b1 - a1.matvec(rr.x)) / np.linalg.norm(b1)
print(f"1M 2-D Laplacian refined(jacobi): status={rr.status.name} "
      f"inner_iters={rr.iters} true_rel={rel:.2e} dtAlg={rr.dt_alg:.1f} s",
      flush=True)
