"""Fused one-launch msolve kernel at 10M rows, k=3/4 (TPU).

Baseline (same protocol, series mode r3): k=3 325.5 ms @ 74, k=4 304.7 @ 65.
"""
import sys
import time

import numpy as np

from cuda_mat_tpu.config import SolverConfig
from cuda_mat_tpu.models.problems import grid_laplacian
from cuda_mat_tpu.solvers.bicgstab import solve

a = grid_laplacian(100000, 100)
b = np.ones(a.n)
print(f"n={a.n}", flush=True)

from cuda_mat_tpu.precond import preconditioners as P
orig = P.NeumannILUPreconditioner.from_csr.__func__
def spy(cls, *args, **kw):
    pre = orig(cls, *args, **kw)
    print(f"  fused mode = {pre.fused}", flush=True)
    return pre
P.NeumannILUPreconditioner.from_csr = classmethod(spy)

for k in (3, 4):
    cfg = SolverConfig(maxit=2000, tol=1e-4, dtype="float32",
                       precond="ilu0_neumann", neumann_terms=k)
    t0 = time.perf_counter()
    solve(a, b, cfg)                    # compile
    t1 = time.perf_counter()
    res = solve(a, b, cfg)
    res2 = solve(a, b, cfg)
    print(f"k={k}: iters={res.iters} dtAlg={res.dt_alg*1e3:.1f} ms "
          f"(run2 {res2.dt_alg*1e3:.1f} ms) status={res.status.name} "
          f"compile={t1-t0:.0f}s", flush=True)
