"""BELL einsum SpMV achieved GB/s on TPU (VERDICT r1 #5)."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp

def chain_time(step_fn, x0, k=100, reps=5, op=None):
    @jax.jit
    def run(op_, x):
        y = jax.lax.fori_loop(0, k, lambda i, y: step_fn(op_, y), x)
        return jnp.sum(y[:8])
    float(run(op, x0))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(run(op, x0)); ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / k

from cuda_mat_tpu.models.problems import random_diag_nonzero_system
from cuda_mat_tpu.ops.operators import BELLOperator, make_operator

# roofline
copy_elems = 64 * 1024 * 1024
src = jnp.ones((copy_elems,), jnp.float32)
t_copy = chain_time(lambda o, y: y * 1.0000001 + 1.0, src, k=100)
roof = 2 * copy_elems * 4 / t_copy / 1e9
print(f"roofline: {roof:.1f} GB/s", flush=True)

# n=10000 random P0=0.99 (reference CLI default workload)
a, _ = random_diag_nonzero_system(10000, 0.99)
op = BELLOperator.from_csr(a, bs=128, dtype=jnp.float32)
nbr, kmax, bs, _ = op.values.shape
bytes_v = nbr * kmax * bs * bs * 4
print(f"BELL: nbr={nbr} kmax={kmax} values={bytes_v/2**20:.0f} MiB nnz={a.nnz}", flush=True)
x = jnp.ones(a.n, jnp.float32)
t = chain_time(lambda o, y: o.matvec(y)[:a.n] * 0.001, x, k=100, op=op)
gbps = bytes_v / t / 1e9
print(f"BELL einsum matvec: {t*1e6:.1f} us  {gbps:.1f} GB/s  = {gbps/roof:.2f}x roofline  nnz/s={a.nnz/t:.3e}", flush=True)

# blocky case: block-banded matrix (BELL << dense) - 512 block-rows, 5 blocks each
rng = np.random.default_rng(0)
bs2 = 128
nbr2 = 512
k2 = 5
n2 = nbr2 * bs2
from cuda_mat_tpu.formats.coo import COOMatrix
from cuda_mat_tpu.formats.csr import CSRMatrix
rows_l, cols_l, data_l = [], [], []
for br in range(nbr2):
    for dj in range(-2, 3):
        bc = br + dj
        if not (0 <= bc < nbr2):
            continue
        rr, cc = np.meshgrid(np.arange(bs2), np.arange(bs2), indexing='ij')
        rows_l.append((br * bs2 + rr).ravel())
        cols_l.append((bc * bs2 + cc).ravel())
        data_l.append(rng.standard_normal(bs2 * bs2) * 0.01)
a2 = CSRMatrix.from_coo(COOMatrix(n2, n2, np.concatenate(rows_l), np.concatenate(cols_l), np.concatenate(data_l)))
a2d = a2.data.copy()
op2 = BELLOperator.from_csr(a2, bs=bs2, dtype=jnp.float32)
bytes_v2 = np.prod(op2.values.shape) * 4
x2 = jnp.ones(n2, jnp.float32)
t2 = chain_time(lambda o, y: o.matvec(y)[:n2] * 0.01, x2, k=100, op=op2)
gbps2 = bytes_v2 / t2 / 1e9
print(f"block-banded BELL (n={n2}, {bytes_v2/2**20:.0f} MiB): {t2*1e6:.1f} us  {gbps2:.1f} GB/s = {gbps2/roof:.2f}x roofline", flush=True)
