"""TPU measurement: const-stencil kernel vs Pallas DIA kernel, 10M-row Laplacian."""
import sys; sys.path.insert(0, "/root/repo")
import time, sys
import numpy as np
import jax, jax.numpy as jnp

def chain_time(step_fn, x0, k=200, reps=5):
    @jax.jit
    def run(x):
        y = jax.lax.fori_loop(0, k, lambda i, y: step_fn(y), x)
        return jnp.sum(y[:8])
    float(run(x0))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(run(x0)); ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / k

print("backend:", jax.default_backend(), file=sys.stderr)
from cuda_mat_tpu.models.problems import banded_laplacian_dia
from cuda_mat_tpu.ops.pallas_spmv import PallasDIAOperator
from cuda_mat_tpu.ops.pallas_stencil import ConstStencilOperator

side = 3163
dia = banded_laplacian_dia(side, dtype=np.float32)
n = dia.n

# roofline
copy_elems = 64 * 1024 * 1024
src = jnp.ones((copy_elems,), jnp.float32)
t_copy = chain_time(lambda y: y * 1.0000001 + 1.0, src, k=200)
roof = 2 * copy_elems * 4 / t_copy / 1e9
print(f"roofline copy: {roof:.1f} GB/s", flush=True)

# DIA kernel
op = PallasDIAOperator.from_dia(dia, block=32768)
x = op.pad_vec(jnp.ones((n,), jnp.float32))
t_dia = chain_time(lambda y: op.matvec(y) * 0.1, x, k=200)
print(f"pallas_dia blk=32768: {t_dia*1e6:.1f} us  {(7*n)*4/t_dia/1e9:.1f} GB/s(7n model)  nnz/s={dia.nnz/t_dia:.3e}", flush=True)

# const stencil, block sweep
for blk in (16384, 32768, 65536, 131072):
    sop = ConstStencilOperator.from_dia(dia, block=blk)
    xs = sop.pad_vec(jnp.ones((n,), jnp.float32))
    t_s = chain_time(lambda y: sop.matvec(y) * 0.1, xs, k=200)
    # traffic model: x read once (+2/k halo), y written once = 2n * 4 bytes
    print(f"const_stencil blk={blk} sub={sop.sub}: {t_s*1e6:.1f} us  "
          f"{2*n*4/t_s/1e9:.1f} GB/s(2n model)  nnz/s={sop.nnz/t_s:.3e}  "
          f"speedup_vs_dia={t_dia/t_s:.2f}x", flush=True)
