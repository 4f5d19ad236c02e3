"""TPU: 1M-row banded Laplacian solve — Jacobi vs ILU(0), f32."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from cuda_mat_tpu.models.problems import banded_laplacian
from cuda_mat_tpu.config import SolverConfig
from cuda_mat_tpu.solvers.bicgstab import solve

side = 1000   # n = 1,000,000, w = 1000, 5 diagonals
t0 = time.perf_counter()
a = banded_laplacian(side)
print(f"built n={a.n} nnz={a.nnz} in {time.perf_counter()-t0:.1f}s", flush=True)
b = np.ones(a.n)

for precond, tol in (("jacobi", 1e-6), ("ilu0", 1e-6)):
    cfg = SolverConfig(maxit=5000, tol=tol, dtype="float32", precond=precond,
                       trisolve_block=1024)
    t0 = time.perf_counter()
    r1 = solve(a, b, cfg)
    print(f"{precond}: cold dtAlg={r1.dt_alg*1e3:.0f} ms setup={r1.dt_setup:.1f}s",
          flush=True)
    r2 = solve(a, b, cfg)
    rel = np.linalg.norm(b - a.matvec(r2.x.astype(np.float64))) / np.linalg.norm(b)
    print(f"{precond}: iters={r2.iters} status={r2.status.name} "
          f"true_rel={rel:.2e} dtAlg warm={r2.dt_alg*1e3:.1f} ms "
          f"({r2.dt_alg/max(r2.iters,1)*1e3:.2f} ms/iter)", flush=True)
