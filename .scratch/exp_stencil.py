"""TPU: 2-D stencil kernel vs 1-D DIA kernel on the 10M-row bench grid."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from cuda_mat_tpu.models.problems import banded_laplacian_dia
from cuda_mat_tpu.ops.pallas_spmv import PallasDIAOperator
from cuda_mat_tpu.ops.pallas_stencil import StencilOperator2D

side = 3163
n = side * side


def chain(op, x, k=200, reps=5):
    @jax.jit
    def run(x):
        y = jax.lax.fori_loop(0, k, lambda i, y: op.matvec(y) * 0.1, x)
        return jnp.sum(y[:8])
    float(run(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(run(x)); ts.append(time.perf_counter() - t0)
    return min(ts) / k


# correctness anchor on a small grid vs CSR (on-device, real kernel)
from cuda_mat_tpu.models.problems import banded_laplacian
a_small = banded_laplacian(100)  # = mat10000 pattern
xs = np.random.default_rng(0).standard_normal(10000).astype(np.float32)
for constant in (True, False):
    ops = StencilOperator2D.laplacian(100, 100, tr=8, tc=128,
                                      constant=constant)
    ys = np.asarray(ops.unpad_vec(ops.matvec(ops.pad_vec(xs))))
    err = np.max(np.abs(ys - a_small.matvec(xs.astype(np.float64))))
    print(f"small-grid constant={constant}: maxerr={err:.2e}", flush=True)

for label, tr, tc in (("256x512", 256, 512), ("512x512", 512, 512),
                      ("256x1024", 256, 1024)):
    for constant in (True, False):
        op = StencilOperator2D.laplacian(side, side, tr=tr, tc=tc,
                                         constant=constant)
        x = op.pad_vec(jnp.ones(n, jnp.float32))
        t = chain(op, x)
        model = (5 * n + 2 * n) * 4 / t / 1e9          # DIA-equivalent model
        free = 2 * n * 4 / t / 1e9                      # matrix-free model
        print(f"stencil {label} constant={constant}: t={t*1e6:7.1f} us "
              f"DIA-model={model:6.1f} GB/s  bytes-moved~="
              f"{free if constant else model:6.1f}", flush=True)

dia = banded_laplacian_dia(side, dtype=np.float32)
opd = PallasDIAOperator.from_dia(dia, block=32768)
xd = opd.pad_vec(jnp.ones(n, jnp.float32))
t = chain(opd, xd)
print(f"DIA kernel blk=32768: t={t*1e6:7.1f} us model="
      f"{(5*n+2*n)*4/t/1e9:6.1f} GB/s", flush=True)
