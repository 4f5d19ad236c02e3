"""Clean e2e A/B of config.fuse_blas1 at 10M rows (no concurrent processes).
Interleaved warm runs so tunnel drift hits both arms equally."""
import sys

sys.path.insert(0, "/root/repo")  # no PYTHONPATH — breaks axon registration

import numpy as np

from cuda_mat_tpu.config import SolverConfig
from cuda_mat_tpu.models.problems import grid_laplacian
from cuda_mat_tpu.solvers.bicgstab import solve

a = grid_laplacian(100000, 100)
b = np.ones(a.n)
cfgs = {
    fuse: SolverConfig(maxit=2000, tol=1e-4, dtype="float32",
                       precond="ilu0_neumann", neumann_terms=4,
                       fuse_blas1=fuse)
    for fuse in (False, True)
}
for fuse, cfg in cfgs.items():
    r = solve(a, b, cfg)                  # compile
    print(f"compiled fuse={fuse}: iters={r.iters}", flush=True)
ts = {False: [], True: []}
it = {}
for rep in range(5):
    for fuse, cfg in cfgs.items():
        r = solve(a, b, cfg)
        ts[fuse].append(r.dt_alg)
        it[fuse] = r.iters
for fuse in (False, True):
    t = sorted(ts[fuse])
    print(f"fuse_blas1={fuse}: iters={it[fuse]} "
          f"dtAlg(ms)={[round(x * 1e3, 1) for x in t]} "
          f"median={t[len(t) // 2] * 1e3:.1f}", flush=True)
