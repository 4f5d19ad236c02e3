"""TPU timing: fused single-launch msolve vs two-launch, and full ILU solve
on mat10000 (warm dtAlg)."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from cuda_mat_tpu.io.mmio import load_mm_sparse_matrix
from cuda_mat_tpu.reference.cpu_solvers import ilu0_factorize
from cuda_mat_tpu.ops.pallas_trisolve import PallasBandedTriSolver, _fused_msolve
from cuda_mat_tpu.config import SolverConfig
from cuda_mat_tpu import bicgstab_lu_precond

a = load_mm_sparse_matrix("/root/repo/data/mat10000.mtx")
m = ilu0_factorize(a)
tri = PallasBandedTriSolver.from_factor(a, m, block=128, dtype=jnp.float32)
f0 = jnp.asarray(np.random.default_rng(0).standard_normal(a.n), jnp.float32)

K = 100

def chain(step):
    @jax.jit
    def run(x):
        y = jax.lax.fori_loop(0, K, lambda i, y: step(y), x)
        return jnp.sum(y[:8])
    float(run(f0))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); float(run(f0)); ts.append(time.perf_counter() - t0)
    return min(ts) / K * 1e3

two = chain(lambda f: tri.solve_upper(tri.solve_lower(f)))
fused = chain(lambda f: tri.msolve(f))
print(f"two-launch msolve : {two:.4f} ms/apply", flush=True)
print(f"fused msolve      : {fused:.4f} ms/apply", flush=True)

# correctness on-chip
x1 = np.asarray(tri.msolve(f0))
x2 = np.asarray(tri.solve_upper(tri.solve_lower(f0)))
print("fused vs two max abs diff:", float(np.max(np.abs(x1 - x2))))

# end-to-end warm solve
b = np.ones(a.n)
cfg = SolverConfig(maxit=2000, tol=1e-6, dtype="float32", trisolve_block=128)
r1 = bicgstab_lu_precond(a, b, cfg)
r2 = bicgstab_lu_precond(a, b, cfg)
print(f"mat10000 ILU solve: iters={r2.iters} res={r2.residual/r2.residual0:.2e} "
      f"dtAlg warm={r2.dt_alg*1e3:.1f} ms (cold {r1.dt_alg*1e3:.0f} ms)")

# dense-fallback path on the CLI's default random system (ROADMAP claimed
# ~500x while_loop slowdown -- bisect showed while==fori; measure for real)
from cuda_mat_tpu.models.problems import random_diag_nonzero_system
from cuda_mat_tpu.solvers.bicgstab import bicgstab
ar, br = random_diag_nonzero_system(10000, prob_of_zero=0.99, seed=0)
cfgr = SolverConfig(maxit=2000, tol=1e-6, dtype="float32")
rr1 = bicgstab(ar, br, cfgr, format="dense")
rr2 = bicgstab(ar, br, cfgr, format="dense")
print(f"random10000 dense bicgstab: iters={rr2.iters} status={rr2.status} "
      f"dtAlg warm={rr2.dt_alg*1e3:.1f} ms ({rr2.dt_alg/max(rr2.iters,1)*1e3:.2f} ms/iter)",
      flush=True)
# BELL operator on the same system for comparison
rb1 = bicgstab(ar, br, cfgr, format="bell")
rb2 = bicgstab(ar, br, cfgr, format="bell")
print(f"random10000 bell  bicgstab: iters={rb2.iters} status={rb2.status} "
      f"dtAlg warm={rb2.dt_alg*1e3:.1f} ms", flush=True)
