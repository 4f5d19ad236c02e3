"""Interleaved A/B: check_halves True vs False on the 10M-row flagship
(stencil + fused Neumann msolve k=4, MILU omega=0.97, f32, tol=1e-4).

Engagement proof first (r4 phantom-A/B discipline): the two configs must
lower to different HLO (select count differs) and the off-run must report
one extra iteration when the on-run exits on a first half-step — otherwise
any timing delta is noise.

Run from /root/repo with no PYTHONPATH (axon plugin constraint).
"""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax

from cuda_mat_tpu.config import SolverConfig
from cuda_mat_tpu.models.problems import grid_laplacian
from cuda_mat_tpu.solvers.bicgstab import make_solver

a = grid_laplacian(100000, 100)
b = np.ones(a.n)
cfg = SolverConfig(maxit=2000, tol=1e-4, dtype="float32",
                   precond="ilu0_neumann", neumann_terms=4, milu_omega=0.97)

ps_on = make_solver(a, cfg)
ps_off = make_solver(a, cfg.replace(check_halves=False))

# --- engagement proof: lowered programs differ ---------------------------
from cuda_mat_tpu.solvers.bicgstab import _precond_solve
import jax.numpy as jnp

bd = ps_on._prep_vec(b)
x0d = ps_on._prep_vec(np.ones(a.n))
texts = {}
for ch, ps in ((True, ps_on), (False, ps_off)):
    texts[ch] = _precond_solve.lower(
        ps.op, ps.pre, x0d, bd, jnp.asarray(1e-4, jnp.float32), 2000,
        False, fused_dots=False, fuse_blas1=False,
        check_halves=ch).as_text()
n_sel = {ch: t.count("stablehlo.select") for ch, t in texts.items()}
print("select counts:", n_sel, flush=True)
assert n_sel[False] < n_sel[True], "arms identical -> phantom A/B"

# --- interleaved warm timing --------------------------------------------
r_on = ps_on.solve(b)    # compile + warm
r_off = ps_off.solve(b)
print("iters on/off:", r_on.iters, r_off.iters, "status",
      r_on.status.name, r_off.status.name, flush=True)

on_ms, off_ms = [], []
for rep in range(7):
    on_ms.append(ps_on.solve(b).dt_alg * 1e3)
    off_ms.append(ps_off.solve(b).dt_alg * 1e3)
print("on  ms:", [round(t, 1) for t in on_ms])
print("off ms:", [round(t, 1) for t in off_ms])
print("median on", round(float(np.median(on_ms)), 1),
      "median off", round(float(np.median(off_ms)), 1))
