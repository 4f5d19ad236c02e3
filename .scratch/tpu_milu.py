"""MILU(0.97) at the 10M-row flagship: interleaved e2e A/B vs plain ILU(0)
at k=4, plus a milu+k=6 arm (the numpy sweep says higher k pays again once
MILU cuts the iteration count — BASELINE.md r4)."""
import sys

sys.path.insert(0, "/root/repo")  # no PYTHONPATH — breaks axon registration

import numpy as np

from cuda_mat_tpu.config import SolverConfig
from cuda_mat_tpu.models.problems import grid_laplacian
from cuda_mat_tpu.solvers.bicgstab import solve

a = grid_laplacian(100000, 100)
b = np.ones(a.n)
arms = {
    "ilu_k4": SolverConfig(maxit=2000, tol=1e-4, dtype="float32",
                           precond="ilu0_neumann", neumann_terms=4),
    "milu_k4": SolverConfig(maxit=2000, tol=1e-4, dtype="float32",
                            precond="ilu0_neumann", neumann_terms=4,
                            milu_omega=0.97),
    "milu_k6": SolverConfig(maxit=2000, tol=1e-4, dtype="float32",
                            precond="ilu0_neumann", neumann_terms=6,
                            milu_omega=0.97),
}
for name, cfg in arms.items():
    r = solve(a, b, cfg)                  # compile (k4 arms share the graph)
    print(f"compiled {name}: iters={r.iters} status={r.status.name} "
          f"true_rel={r.residual_true / r.residual0:.2e}", flush=True)
ts = {k: [] for k in arms}
it = {}
for rep in range(5):
    for name, cfg in arms.items():
        r = solve(a, b, cfg)
        ts[name].append(r.dt_alg)
        it[name] = r.iters
for name in arms:
    t = sorted(ts[name])
    print(f"{name}: iters={it[name]} "
          f"dtAlg(ms)={[round(x * 1e3, 1) for x in t]} "
          f"median={t[len(t) // 2] * 1e3:.1f}", flush=True)
