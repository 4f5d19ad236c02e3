"""TPU 1M-row narrow-band ILU, instrumented per phase."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
T0 = time.perf_counter()
def log(msg):
    print(f"[{time.perf_counter()-T0:7.1f}s] {msg}", flush=True)

from cuda_mat_tpu.formats.csr import CSRMatrix
from cuda_mat_tpu.formats.coo import COOMatrix
from cuda_mat_tpu.config import SolverConfig
from cuda_mat_tpu.precond.preconditioners import ILU0Preconditioner, _factorize

rows, cols = 10000, 100
n = rows * cols
idx = np.arange(n, dtype=np.int64)
r = [idx]; c = [idx]; d = [np.full(n, 4.0)]
left = idx[idx % cols != 0]
r += [left, left - 1]; c += [left - 1, left]
d += [np.full(left.shape[0], -1.0)] * 2
up = idx[idx >= cols]
r += [up, up - cols]; c += [up - cols, up]
d += [np.full(up.shape[0], -1.0)] * 2
a = CSRMatrix.from_coo(COOMatrix(n, n, np.concatenate(r),
                                 np.concatenate(c), np.concatenate(d)))
log(f"matrix built n={a.n} nnz={a.nnz}")

mv = _factorize(a)
log("ILU(0) factorized")

pre = ILU0Preconditioner.from_csr(a, block=128, dtype=jnp.float32)
log(f"preconditioner built: {type(pre.tri).__name__}")
jax.block_until_ready(jax.tree_util.tree_leaves(pre))
log("W data uploaded")

from cuda_mat_tpu.ops.operators import make_operator
op = make_operator(a, dtype=jnp.float32, format="dia")
b = jnp.asarray(np.ones(n), jnp.float32)
x0 = jnp.ones(n, jnp.float32)
jax.block_until_ready((op, b, x0))
log("operator uploaded")

from cuda_mat_tpu.solvers.bicgstab import precond_core

@jax.jit
def e2e(pre, x0, b):
    return precond_core(op.matvec, pre.msolve, jnp.dot, x0, b,
                        jnp.float32(1e-6), 5000)

out = jax.block_until_ready(e2e(pre, x0, b))
log(f"first solve done: iters={int(out[2])} status={int(out[1])}")
t0 = time.perf_counter()
out = jax.block_until_ready(e2e(pre, x0, b))
dt = time.perf_counter() - t0
rel = float(out[3] / out[4])
log(f"warm solve: iters={int(out[2])} status={int(out[1])} rel={rel:.2e} "
    f"dtAlg={dt*1e3:.1f} ms ({dt/max(int(out[2]),1)*1e3:.3f} ms/iter)")
