"""Distributed stencil engine with the fused msolve kernel, mesh(1) on TPU."""
import time

import numpy as np

from cuda_mat_tpu.config import SolverConfig
from cuda_mat_tpu.models.problems import grid_laplacian
from cuda_mat_tpu.parallel.mesh import make_mesh
from cuda_mat_tpu.parallel.dist_solver import make_dist_bicgstab

a = grid_laplacian(10000, 100)   # 1M rows (bench workload)
b = np.ones(a.n)
cfg = SolverConfig(maxit=2000, tol=1e-4, dtype="float32",
                   precond="ilu0_neumann", neumann_terms=3)
mesh = make_mesh(1)
t0 = time.perf_counter()
solver = make_dist_bicgstab(a, mesh, cfg, local_engine="stencil")
solver.solve(b)
t1 = time.perf_counter()
r = solver.solve(b)
r2 = solver.solve(b)
print(f"dist mesh(1) 1M: iters={r.iters} dtAlg={r.dt_alg*1e3:.1f} ms "
      f"(run2 {r2.dt_alg*1e3:.1f}) status={r.status.name} "
      f"compile={t1-t0:.0f}s", flush=True)
