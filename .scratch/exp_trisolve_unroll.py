"""TPU: trisolve msolve per-apply vs in-kernel unroll factor + e2e solve."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from cuda_mat_tpu.io.mmio import load_mm_sparse_matrix
from cuda_mat_tpu.reference.cpu_solvers import ilu0_factorize
from cuda_mat_tpu.ops.pallas_trisolve import PallasBandedTriSolver
from cuda_mat_tpu.config import SolverConfig
from cuda_mat_tpu import bicgstab_lu_precond

a = load_mm_sparse_matrix("/root/repo/data/mat10000.mtx")
m = ilu0_factorize(a)
f0 = jnp.asarray(np.random.default_rng(0).standard_normal(a.n), jnp.float32)
K = 200


def chain(step, x0, k=K, reps=5):
    @jax.jit
    def run(x):
        y = jax.lax.fori_loop(0, k, lambda i, y: step(y), x)
        return jnp.sum(y[:8])
    float(run(x0))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(run(x0)); ts.append(time.perf_counter() - t0)
    return min(ts) / k


ref = None
for unroll in (1, 4, 8, 16):
    tri = PallasBandedTriSolver.from_factor(a, m, block=128, unroll=unroll,
                                            dtype=jnp.float32)
    t = chain(lambda f: tri.msolve(f), f0)
    x = np.asarray(tri.msolve(f0))
    if ref is None:
        ref = x
    print(f"unroll={unroll:2d}  msolve {t*1e3:.4f} ms/apply  "
          f"maxdiff vs unroll1 {np.max(np.abs(x - ref)):.2e}", flush=True)

b = np.ones(a.n)
cfg = SolverConfig(maxit=2000, tol=1e-6, dtype="float32", trisolve_block=128)
bicgstab_lu_precond(a, b, cfg)
r = bicgstab_lu_precond(a, b, cfg)
print(f"mat10000 ILU e2e (default unroll=8): iters={r.iters} "
      f"res={r.residual/r.residual0:.2e} dtAlg warm={r.dt_alg*1e3:.1f} ms",
      flush=True)
