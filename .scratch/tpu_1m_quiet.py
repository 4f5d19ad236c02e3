"""Quiet interleaved 1M-row single-chip vs dist mesh(1) (bench runs are
RTT-noisy at this scale; 48 ms fixed dominates)."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
from cuda_mat_tpu.config import SolverConfig
from cuda_mat_tpu.models.problems import grid_laplacian
from cuda_mat_tpu.parallel.mesh import make_mesh
from cuda_mat_tpu.parallel.dist_solver import make_dist_bicgstab
from cuda_mat_tpu.solvers.bicgstab import solve

a = grid_laplacian(10000, 100)
b = np.ones(a.n)
cfg = SolverConfig(maxit=2000, tol=1e-4, dtype="float32",
                   precond="ilu0_neumann", neumann_terms=3)
solve(a, b, cfg)                      # compile
ds = make_dist_bicgstab(a, make_mesh(1), cfg, local_engine="stencil")
ds.solve(b)                           # compile
ts = {"single": [], "dist": []}
it = {}
for _ in range(5):
    r = solve(a, b, cfg); ts["single"].append(r.dt_alg); it["single"] = r.iters
    r = ds.solve(b); ts["dist"].append(r.dt_alg); it["dist"] = r.iters
for k, v in ts.items():
    v = sorted(v)
    print(f"{k}: iters={it[k]} dtAlg(ms)={[round(x*1e3,1) for x in v]} "
          f"median={v[2]*1e3:.1f}", flush=True)
