"""Measure the carry-protocol distributed solve on the real chip:
single-chip 1M solve vs dist stencil mesh(1) 1M (VERDICT r4 #1 'done'
criterion: dist within ~1.2x of single-chip at the same iteration count)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

from cuda_mat_tpu.config import SolverConfig  # noqa: E402
from cuda_mat_tpu.models.problems import grid_laplacian  # noqa: E402
from cuda_mat_tpu.parallel.mesh import make_mesh  # noqa: E402
from cuda_mat_tpu.parallel.dist_solver import make_dist_bicgstab  # noqa: E402
from cuda_mat_tpu.solvers.bicgstab import solve  # noqa: E402

print("backend:", jax.default_backend(), jax.devices()[0], flush=True)

a1 = grid_laplacian(10000, 100)
b1 = np.ones(a1.n)
cfg1 = SolverConfig(maxit=2000, tol=1e-4, dtype="float32",
                    precond="ilu0_neumann", neumann_terms=3)

t0 = time.perf_counter()
solve(a1, b1, cfg1)                      # compile
print("single compile", round(time.perf_counter() - t0, 1), "s", flush=True)
r = solve(a1, b1, cfg1)
print("single 1m:", r.iters, "iters,", round(r.dt_alg * 1e3, 1), "ms,",
      r.status.name, flush=True)

mesh1 = make_mesh(1)
t0 = time.perf_counter()
ds = make_dist_bicgstab(a1, mesh1, cfg1, local_engine="stencil")
ds.solve(b1)                             # compile
print("dist compile", round(time.perf_counter() - t0, 1), "s", flush=True)
best = None
for _ in range(3):
    rd = ds.solve(b1)
    best = rd if best is None or rd.dt_alg < best.dt_alg else best
    print("dist 1m:", rd.iters, "iters,", round(rd.dt_alg * 1e3, 1), "ms,",
          rd.status.name, flush=True)
rel = np.linalg.norm(b1 - a1.matvec(best.x.astype(np.float64))) \
    / np.linalg.norm(b1)
print("dist rel resid:", rel, flush=True)
print("ratio dist/single:", round(best.dt_alg / r.dt_alg, 3), flush=True)
