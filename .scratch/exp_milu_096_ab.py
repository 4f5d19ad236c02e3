"""Interleaved confirmation: MILU omega=0.96 vs 0.97 at the 10M flagship
(k=4).  Same compiled graph (factor values only).  Run from /root/repo."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np

from cuda_mat_tpu.config import SolverConfig
from cuda_mat_tpu.models.problems import grid_laplacian
from cuda_mat_tpu.solvers.bicgstab import make_solver

a = grid_laplacian(100000, 100)
b = np.ones(a.n)
base = SolverConfig(maxit=2000, tol=1e-4, dtype="float32",
                    precond="ilu0_neumann", neumann_terms=4,
                    true_residual=False)
A = make_solver(a, base.replace(milu_omega=0.96))
B = make_solver(a, base.replace(milu_omega=0.97))
ra, rb = A.solve(b), B.solve(b)          # compile (shared) + warm
print("iters 0.96 / 0.97:", ra.iters, rb.iters, ra.status.name,
      rb.status.name, flush=True)
am, bm = [], []
for _ in range(7):
    am.append(A.solve(b).dt_alg * 1e3)
    bm.append(B.solve(b).dt_alg * 1e3)
print("0.96:", [round(t, 1) for t in am], "median",
      round(float(np.median(am)), 1))
print("0.97:", [round(t, 1) for t in bm], "median",
      round(float(np.median(bm)), 1))
# true residual check on the winner (host f64, once)
from cuda_mat_tpu.solvers.bicgstab import host_matvec_f64
rel = float(np.linalg.norm(b - host_matvec_f64(a, A.solve(b).x))
            / np.linalg.norm(b))
print("0.96 true rel residual:", rel)
