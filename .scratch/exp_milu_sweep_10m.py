"""MILU omega x Neumann-k sweep at the 10M-row flagship scale (r4 swept
omega at 100k rows only; k=6 tied k=4 within noise at omega=0.97).

Per k: one compile; per omega: factor values only (setup, no compile).
Interleaved repeats on the best candidates at the end.

Run from /root/repo with no PYTHONPATH.
"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np

from cuda_mat_tpu.config import SolverConfig
from cuda_mat_tpu.models.problems import grid_laplacian
from cuda_mat_tpu.solvers.bicgstab import make_solver

a = grid_laplacian(100000, 100)
b = np.ones(a.n)
base = SolverConfig(maxit=2000, tol=1e-4, dtype="float32",
                    precond="ilu0_neumann")

results = {}
solvers = {}
for k in (4, 6):
    for om in (0.96, 0.97, 0.98):
        cfg = base.replace(neumann_terms=k, milu_omega=om)
        ps = make_solver(a, cfg)
        ps.solve(b)                      # compile (cached per k) + warm
        r = ps.solve(b)
        ms = sorted([r.dt_alg] + [ps.solve(b).dt_alg for _ in range(2)])
        med = ms[1] * 1e3
        results[(k, om)] = (med, r.iters, r.status.name)
        solvers[(k, om)] = ps
        print(f"k={k} om={om}: {med:.1f} ms @ {r.iters} {r.status.name}",
              flush=True)

best = sorted(results.items(), key=lambda kv: kv[1][0])[:2]
print("top-2:", best, flush=True)
# interleaved confirmation on the top-2
(ka, oa), _ = best[0]
(kb, ob), _ = best[1]
A, B = solvers[(ka, oa)], solvers[(kb, ob)]
am, bm = [], []
for _ in range(5):
    am.append(A.solve(b).dt_alg * 1e3)
    bm.append(B.solve(b).dt_alg * 1e3)
print(f"interleaved: ({ka},{oa}) median {np.median(am):.1f} "
      f"vs ({kb},{ob}) median {np.median(bm):.1f}")
print("a:", [round(t, 1) for t in am])
print("b:", [round(t, 1) for t in bm])
