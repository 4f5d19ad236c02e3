"""Where does the 1M-row Neumann iteration spend its time?"""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp

def chain_time(step_fn, x0, k=100, reps=5):
    @jax.jit
    def run(x):
        y = jax.lax.fori_loop(0, k, lambda i, y: step_fn(y), x)
        return jnp.sum(y[:8])
    float(run(x0))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(run(x0)); ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / k

from cuda_mat_tpu.config import SolverConfig
from cuda_mat_tpu.models.problems import grid_laplacian
from cuda_mat_tpu.solvers.bicgstab import _as_op
from cuda_mat_tpu.precond.preconditioners import NeumannILUPreconditioner

a = grid_laplacian(10000, 100)
op = _as_op(a, jnp.float32)   # auto: stencil on TPU
print("op:", type(op).__name__, "block", op.block, "npad", op.npad, flush=True)
pre = NeumannILUPreconditioner.from_csr(a, dtype=jnp.float32, terms=3, pad_like=op)
x = op.pad_vec(jnp.ones(a.n, jnp.float32))

t_mv = chain_time(lambda y: op.matvec(y) * 0.1, x, k=100)
print(f"A matvec: {t_mv*1e6:.1f} us", flush=True)
t_ms = chain_time(lambda y: pre.msolve(y) * 0.1, x, k=100)
print(f"msolve (4 factor SpMVs + diag): {t_ms*1e6:.1f} us", flush=True)
t_blas = chain_time(lambda y: (y * 1.0000001 + 0.5 * y), x, k=100)
print(f"one fused axpy-ish op on npad vec: {t_blas*1e6:.1f} us", flush=True)
t_dot = chain_time(lambda y: y * (1.0 / (1.0 + jnp.dot(y, y))), x, k=100)
print(f"dot + scale: {t_dot*1e6:.1f} us", flush=True)
# empty-ish chain overhead
t_nop = chain_time(lambda y: y * 1.0000001, x, k=100)
print(f"single stream op: {t_nop*1e6:.1f} us", flush=True)
# full iteration for comparison: 2 matvec + 2 msolve
t_iter = chain_time(lambda y: pre.msolve(op.matvec(pre.msolve(op.matvec(y) * 0.1) * 0.1) * 0.1) * 0.1, x, k=50)
print(f"2 matvec + 2 msolve chained: {t_iter*1e6:.1f} us (vs solver 690 us/iter)", flush=True)
