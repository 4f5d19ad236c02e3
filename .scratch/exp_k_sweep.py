"""Neumann-series k sweep at 10M rows with fused const factors (TPU).

With the fused constant-factor series (BASELINE.md r3), one msolve is 2
kernel launches regardless of k — only the composed stencil's term count
grows.  Higher k cuts iterations (CPU sweep: k=3:30, k=4:25, k=5:24 at
tol=1e-4) so the old k=3 default (tuned when each term cost 2 matvecs) may
no longer be optimal.  Measures warm dtAlg + iters for k in 3..6.
"""
import sys
import time

import numpy as np

from cuda_mat_tpu.config import SolverConfig
from cuda_mat_tpu.models.problems import grid_laplacian
from cuda_mat_tpu.solvers.bicgstab import solve

R, C = int(sys.argv[1]) if len(sys.argv) > 1 else 100000, 100
a = grid_laplacian(R, C)
b = np.ones(a.n)
print(f"n={a.n} grid {R}x{C}", flush=True)

for k in (3, 4, 5, 6):
    cfg = SolverConfig(maxit=2000, tol=1e-4, dtype="float32",
                       precond="ilu0_neumann", neumann_terms=k)
    t0 = time.perf_counter()
    solve(a, b, cfg)                    # compile
    t1 = time.perf_counter()
    res = solve(a, b, cfg)              # warm
    res2 = solve(a, b, cfg)             # warm x2 (contention check)
    print(f"k={k}: iters={res.iters} dtAlg={res.dt_alg*1e3:.1f} ms "
          f"(run2 {res2.dt_alg*1e3:.1f} ms, iters {res2.iters}) "
          f"status={res.status.name} compile={t1-t0:.0f}s", flush=True)
