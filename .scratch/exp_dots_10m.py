"""10M-row solve with fused dot epilogues (opt-in), k=4 and k=3."""
import time
import numpy as np
from cuda_mat_tpu.config import SolverConfig
from cuda_mat_tpu.models.problems import grid_laplacian
from cuda_mat_tpu.solvers.bicgstab import solve

a = grid_laplacian(100000, 100)
b = np.ones(a.n)
for k in (4, 3):
    cfg = SolverConfig(maxit=2000, tol=1e-4, dtype="float32",
                       precond="ilu0_neumann", neumann_terms=k,
                       fused_dots=True)
    t0 = time.perf_counter()
    solve(a, b, cfg)
    t1 = time.perf_counter()
    r = solve(a, b, cfg)
    r2 = solve(a, b, cfg)
    print(f"k={k} fused_dots: iters={r.iters} dtAlg={r.dt_alg*1e3:.1f} ms "
          f"(run2 {r2.dt_alg*1e3:.1f}) status={r.status.name} "
          f"compile={t1-t0:.0f}s", flush=True)
