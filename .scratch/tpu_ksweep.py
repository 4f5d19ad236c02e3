"""k-sweep of the fused Neumann msolve at 10M rows (fma kernel, flat body).
r3 measured k=4 the winner at 284 ms; the kernel has since gained the BLAS1
prologue fold — higher k adds only VPU terms per launch, so re-sweep."""
import sys

sys.path.insert(0, "/root/repo")  # no PYTHONPATH — breaks axon registration

import numpy as np

from cuda_mat_tpu.config import SolverConfig
from cuda_mat_tpu.models.problems import grid_laplacian
from cuda_mat_tpu.solvers.bicgstab import solve

a = grid_laplacian(100000, 100)
b = np.ones(a.n)
ks = (4, 5, 6)
cfgs = {}
for k in ks:
    cfgs[k] = SolverConfig(maxit=2000, tol=1e-4, dtype="float32",
                           precond="ilu0_neumann", neumann_terms=k)
    r = solve(a, b, cfgs[k])              # compile
    print(f"compiled k={k}: iters={r.iters} status={r.status.name}",
          flush=True)
ts = {k: [] for k in ks}
it = {}
for rep in range(5):
    for k in ks:
        r = solve(a, b, cfgs[k])
        ts[k].append(r.dt_alg)
        it[k] = r.iters
for k in ks:
    t = sorted(ts[k])
    print(f"k={k}: iters={it[k]} dtAlg(ms)={[round(x * 1e3, 1) for x in t]} "
          f"median={t[len(t) // 2] * 1e3:.1f} "
          f"ms/iter={t[len(t) // 2] / it[k] * 1e3:.3f}", flush=True)
