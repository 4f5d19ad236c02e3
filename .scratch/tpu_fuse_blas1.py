"""VERDICT r3 #5 experiment: fold the p-update / r1-production axpys into
the fused msolve kernel prologue (config.fuse_blas1).  Measures the 10M-row
flagship solve with the fold on/off, plus maxit-differenced per-iteration
time (tol=0, maxit 30 vs 90 — cancels fixed overhead AND iteration-count
chaos between variants).  Run alone on the chip (CLAUDE.md: never two TPU
processes)."""
import sys

sys.path.insert(0, "/root/repo")  # script lives in .scratch/; do NOT use
# PYTHONPATH — setting it breaks the axon plugin registration (measured)

import numpy as np

from cuda_mat_tpu.config import SolverConfig
from cuda_mat_tpu.models.problems import grid_laplacian
from cuda_mat_tpu.solvers.bicgstab import solve

a = grid_laplacian(100000, 100)
b = np.ones(a.n)

for fuse in (False, True):
    base = SolverConfig(maxit=2000, tol=1e-4, dtype="float32",
                        precond="ilu0_neumann", neumann_terms=4,
                        fuse_blas1=fuse)
    r = solve(a, b, base)                      # compile
    ts = []
    for _ in range(3):
        r = solve(a, b, base)
        ts.append(r.dt_alg)
    print(f"fuse_blas1={fuse}: iters={r.iters} status={r.status.name} "
          f"dtAlg(ms)={[round(t * 1e3, 1) for t in sorted(ts)]}", flush=True)
    # maxit-differencing: per-iteration device time independent of trajectory
    per = {}
    for m in (30, 90):
        cfg = base.replace(tol=0.0, maxit=m)
        solve(a, b, cfg)                       # compile
        tm = min(solve(a, b, cfg).dt_alg for _ in range(3))
        per[m] = tm
    it_ms = (per[90] - per[30]) / 60 * 1e3
    print(f"fuse_blas1={fuse}: t30={per[30] * 1e3:.1f} ms t90={per[90] * 1e3:.1f} ms"
          f" per-iter={it_ms:.3f} ms", flush=True)
