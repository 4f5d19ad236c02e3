"""Dispatch-node-count experiment: precond_core vs a 'flat' body variant
(no lax.cond — unconditional second half + selects; single fused hist
write) at 10M rows, k=4.  Decisions/values identical; only dead work on
the exit iteration is added."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from cuda_mat_tpu.config import SolverConfig
from cuda_mat_tpu.models.problems import grid_laplacian
import importlib
B = importlib.import_module('cuda_mat_tpu.solvers.bicgstab')
from cuda_mat_tpu.solvers.bicgstab import _PState, _RUNNING, _CONVERGED, _BREAKDOWN

def precond_core_flat(matvec, msolve, dot, x0, b, tol, maxit):
    dt = b.dtype
    one = jnp.asarray(1.0, dt)
    r = b - matvec(x0)
    rw = r
    nrmr0 = jnp.sqrt(dot(r, r))

    def cond(st):
        return (st.i < maxit) & (st.status == _RUNNING)

    def body(st):
        rhop = st.rho
        rho = dot(rw, st.r)
        beta = jnp.where(st.i > 0, (rho / rhop) * (st.alpha / st.omega),
                         jnp.asarray(0.0, dt))
        p = st.r + beta * (st.p - st.omega * st.v)
        pw = msolve(p)
        v = matvec(pw)
        alpha = rho / dot(rw, v)
        r1 = st.r - alpha * v
        x1 = st.x + alpha * pw
        nrmr1 = jnp.sqrt(dot(r1, r1))
        conv1 = nrmr1 < tol * nrmr0
        s = msolve(r1)
        t = matvec(s)
        omega_c = dot(t, r1) / dot(t, t)
        omega = jnp.where(conv1, st.omega, omega_c)
        x2 = jnp.where(conv1, x1, x1 + omega_c * s)
        r2 = jnp.where(conv1, r1, r1 - omega_c * t)
        nrmr2 = jnp.where(conv1, nrmr1, jnp.sqrt(dot(r2, r2)))
        conv2 = (~conv1) & (nrmr2 < tol * nrmr0)
        broke = (~conv1) & (~conv2) & (jnp.isnan(nrmr2) | jnp.isnan(alpha))
        status = jnp.where(conv1 | conv2, _CONVERGED,
                           jnp.where(broke, _BREAKDOWN, _RUNNING)
                           ).astype(jnp.int32)
        i_next = jnp.where(conv1, st.i, st.i + 1).astype(jnp.int32)
        pair = jnp.stack([nrmr1, jnp.where(conv1, -one, nrmr2)])
        hist = jax.lax.dynamic_update_slice(st.hist, pair, (2 * st.i,))
        return _PState(i_next, status, x2, r2, p, v, rho, alpha, omega,
                       nrmr2, hist)

    init = _PState(jnp.int32(0), jnp.int32(_RUNNING), x0, r, r,
                   jnp.zeros_like(b), jnp.asarray(0.0, dt), one, one, nrmr0,
                   jnp.full((2 * maxit,), -1.0, dt))
    st = jax.lax.while_loop(cond, body, init)
    return st.x, st.status, st.i, st.nrmr, nrmr0, st.hist

@partial(jax.jit, static_argnames=("maxit",))
def flat_solve(op, pre, x0, b, tol, maxit):
    return precond_core_flat(op.matvec, pre.msolve, jnp.dot, x0, b, tol, maxit)

a = grid_laplacian(100000, 100)
b = np.ones(a.n)
cfg = SolverConfig(maxit=2000, tol=1e-4, dtype="float32",
                   precond="ilu0_neumann", neumann_terms=4)

# production baseline (this process, same contention state)
t0 = time.perf_counter(); B.solve(a, b, cfg); t1 = time.perf_counter()
rb = B.solve(a, b, cfg)
print(f"baseline: iters={rb.iters} dtAlg={rb.dt_alg*1e3:.1f} ms "
      f"compile={t1-t0:.0f}s", flush=True)

# flat body on the same operator/preconditioner construction path
from cuda_mat_tpu.solvers.bicgstab import _as_op, _dtype_of
import cuda_mat_tpu.solvers.bicgstab as bb
dtype = _dtype_of(cfg)
op = _as_op(a, dtype, None)
from cuda_mat_tpu.ops.pallas_stencil import (ConstStencilOperator,
                                             plan_const_neumann_layout)
plan = plan_const_neumann_layout(op.terms, 4, op.c_grid, op.stride)
if plan is not None and (plan[0] > op.sub or op.block > plan[1]):
    op = ConstStencilOperator.from_dia(a.to_dia(max_diags=16), dtype=dtype,
                                       min_sub=plan[0], block_target=plan[1])
from cuda_mat_tpu.precond.preconditioners import NeumannILUPreconditioner
pre = NeumannILUPreconditioner.from_csr(a, dtype=dtype, terms=4, pad_like=op)
print("pre mode:", pre.fused, flush=True)
bd = op.pad_vec(b); x0d = op.pad_vec(np.ones(op.n))
tol = jnp.asarray(1e-4, dtype)
t0 = time.perf_counter()
out = jax.block_until_ready(flat_solve(op, pre, x0d, bd, tol, 2000))
t1 = time.perf_counter()
for _ in range(2):
    t2 = time.perf_counter()
    out = flat_solve(op, pre, x0d, bd, tol, 2000)
    out = jax.block_until_ready(out)
    _ = float(np.asarray(out[3]))
    t3 = time.perf_counter()
    print(f"flat: iters={int(out[2])} dtAlg={(t3-t2)*1e3:.1f} ms "
          f"compile={t1-t0:.0f}s status={int(out[1])}", flush=True)
