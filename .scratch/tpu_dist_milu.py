"""dist mesh(1) 10M with MILU factors: the distributed engine should reap
the same iteration cut (shared factor path)."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
from cuda_mat_tpu.config import SolverConfig
from cuda_mat_tpu.models.problems import grid_laplacian
from cuda_mat_tpu.parallel.mesh import make_mesh
from cuda_mat_tpu.parallel.dist_solver import make_dist_bicgstab

a = grid_laplacian(100000, 100)
b = np.ones(a.n)
cfg = SolverConfig(maxit=2000, tol=1e-4, dtype="float32",
                   precond="ilu0_neumann", neumann_terms=4, milu_omega=0.97)
solver = make_dist_bicgstab(a, make_mesh(1), cfg, local_engine="stencil")
solver.solve(b)                     # compile
ts = []
for _ in range(3):
    r = solver.solve(b)
    ts.append(r.dt_alg)
print(f"dist milu mesh(1) 10M: iters={r.iters} status={r.status.name} "
      f"dtAlg(ms)={[round(t * 1e3, 1) for t in sorted(ts)]}", flush=True)
