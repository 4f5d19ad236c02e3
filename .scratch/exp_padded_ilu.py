"""TPU: exact-ILU solve with the Pallas SpMV kept (round-2 PaddedPreconditioner)."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
from cuda_mat_tpu.config import SolverConfig
from cuda_mat_tpu.io.mmio import load_mm_sparse_matrix
from cuda_mat_tpu.solvers.bicgstab import solve

a = load_mm_sparse_matrix("/root/repo/data/mat10000.mtx")
b = np.ones(a.n)
print("backend:", jax.default_backend(), flush=True)
for fmt, label in ((None, "auto(padded pallas)"), ("dia", "plain XLA DIA")):
    cfg = SolverConfig(maxit=2000, tol=1e-4, dtype="float32",
                       precond="ilu0", trisolve_block=128)
    r = solve(a, b, cfg, format=fmt)   # compile
    r = solve(a, b, cfg, format=fmt)   # warm
    rel = np.linalg.norm(b - a.matvec(r.x)) / np.linalg.norm(b)
    print(f"{label:22s}: iters={r.iters} status={r.status.name} "
          f"dtAlg={r.dt_alg*1e3:.1f} ms true_rel={rel:.2e}", flush=True)
