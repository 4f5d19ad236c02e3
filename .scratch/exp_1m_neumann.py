"""TPU 1M-row narrow-band: Neumann-series ILU vs exact blocked-sweep ILU."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
T0 = time.perf_counter()
def log(m): print(f"[{time.perf_counter()-T0:7.1f}s] {m}", flush=True)

from cuda_mat_tpu.formats.csr import CSRMatrix
from cuda_mat_tpu.formats.coo import COOMatrix
from cuda_mat_tpu.config import SolverConfig
from cuda_mat_tpu.solvers.bicgstab import solve

rows, cols = 10000, 100
n = rows * cols
idx = np.arange(n, dtype=np.int64)
r = [idx]; c = [idx]; d = [np.full(n, 4.0)]
left = idx[idx % cols != 0]
r += [left, left - 1]; c += [left - 1, left]
d += [np.full(left.shape[0], -1.0)] * 2
up = idx[idx >= cols]
r += [up, up - cols]; c += [up - cols, up]
d += [np.full(up.shape[0], -1.0)] * 2
a = CSRMatrix.from_coo(COOMatrix(n, n, np.concatenate(r),
                                 np.concatenate(c), np.concatenate(d)))
b = np.ones(n)
log(f"matrix built n={a.n}")

for terms in (3, 5):
    cfg = SolverConfig(maxit=5000, tol=1e-6, dtype="float32",
                       precond="ilu0_neumann", neumann_terms=terms)
    r1 = solve(a, b, cfg)
    log(f"neumann k={terms}: cold dtAlg={r1.dt_alg*1e3:.0f} ms "
        f"setup={r1.dt_setup:.1f}s")
    r2 = solve(a, b, cfg)
    rel = np.linalg.norm(b - a.matvec(r2.x.astype(np.float64))) / np.linalg.norm(b)
    log(f"neumann k={terms}: iters={r2.iters} status={r2.status.name} "
        f"true_rel={rel:.2e} dtAlg warm={r2.dt_alg*1e3:.1f} ms "
        f"({r2.dt_alg/max(r2.iters,1)*1e3:.3f} ms/iter)")

# exact ILU for comparison with the faster (f32) setup path
cfg = SolverConfig(maxit=5000, tol=1e-6, dtype="float32", precond="ilu0",
                   trisolve_block=128)
r1 = solve(a, b, cfg)
log(f"exact ilu: cold dtAlg={r1.dt_alg*1e3:.0f} ms setup={r1.dt_setup:.1f}s")
r2 = solve(a, b, cfg)
rel = np.linalg.norm(b - a.matvec(r2.x.astype(np.float64))) / np.linalg.norm(b)
log(f"exact ilu: iters={r2.iters} status={r2.status.name} "
    f"true_rel={rel:.2e} dtAlg warm={r2.dt_alg*1e3:.1f} ms "
    f"({r2.dt_alg/max(r2.iters,1)*1e3:.3f} ms/iter)")

# f64-grade accuracy at f32 speed: refined outer loop around the Neumann inner
from cuda_mat_tpu.solvers.refine import solve_refined
cfg = SolverConfig(maxit=5000, tol=1e-8, precond="ilu0_neumann",
                   neumann_terms=3)
rr = solve_refined(a, b, cfg, inner_tol=1e-5, max_restarts=8)
rel = np.linalg.norm(b - a.matvec(rr.x)) / np.linalg.norm(b)
log(f"refined neumann: status={rr.status.name} inner_iters={rr.iters} "
    f"true_rel={rel:.2e} dtAlg={rr.dt_alg*1e3:.0f} ms")
