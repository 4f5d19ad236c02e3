"""TPU: fused msolve unroll sweep, micro + e2e mat10000 ILU solve."""
import dataclasses, sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from cuda_mat_tpu.io.mmio import load_mm_sparse_matrix
from cuda_mat_tpu.reference.cpu_solvers import ilu0_factorize
from cuda_mat_tpu.ops.pallas_trisolve import PallasBandedTriSolver
from cuda_mat_tpu.config import SolverConfig
from cuda_mat_tpu.ops.operators import make_operator
from cuda_mat_tpu.solvers.bicgstab import precond_core
from cuda_mat_tpu.precond.preconditioners import ILU0Preconditioner

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


op = make_operator(a, dtype=jnp.float32, format="dia")
b = jnp.asarray(np.ones(a.n), jnp.float32)
tol = jnp.float32(1e-6)
x0 = jnp.ones(a.n, jnp.float32)


@jax.jit
def e2e(tri, x0, b):
    return precond_core(op.matvec, tri.msolve, jnp.dot, x0, b, tol, 2000)


ref = None
for unroll in (1, 4, 8, 16):
    tri = PallasBandedTriSolver.from_factor(a, m, block=128, unroll=unroll,
                                            dtype=jnp.float32)  # fused=True
    t = chain(lambda f: tri.msolve(f), f0)
    x = np.asarray(tri.msolve(f0))
    if ref is None:
        ref = x
    # warm e2e
    jax.block_until_ready(e2e(tri, x0, b))
    t0 = time.perf_counter()
    out = jax.block_until_ready(e2e(tri, x0, b))
    te = time.perf_counter() - t0
    print(f"fused unroll={unroll:2d}  msolve {t*1e3:.4f} ms/apply  "
          f"e2e {te*1e3:6.1f} ms iters={int(out[2])} "
          f"maxdiff {np.max(np.abs(x - ref)):.2e}", flush=True)
