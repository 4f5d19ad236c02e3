"""Mixed-precision iterative refinement.

The reference computes everything in float64.  On TPU, float64 is emulated
and slow; the TPU-native route to reference-grade accuracy is classic
iterative refinement: solve corrections in fast float32 on the device, and
compute the *true residual in float64 on the host* between restarts
(BiCGSTAB is restartable from any iterate, so each outer step is just a
fresh solve of ``A e = r``):

    r_k = b − A x_k          (float64, host)
    e_k ≈ solve(A, r_k)      (float32, device, tol_inner)
    x_{k+1} = x_k + e_k      (float64, host)

Converges to the float64-accurate solution as long as the inner solver
reduces the residual by any fixed factor per restart.
"""

from __future__ import annotations

import time
from typing import List, Optional

import numpy as np

from cuda_mat_tpu.config import SolverConfig, DEFAULT_CONFIG
from cuda_mat_tpu.solvers.bicgstab import host_matvec_f64, solve
from cuda_mat_tpu.solvers.result import SolveResult, SolverStatus


def solve_refined(a, b: np.ndarray, config: SolverConfig = DEFAULT_CONFIG,
                  inner_tol: float = 1e-4, max_restarts: int = 20,
                  x0: Optional[np.ndarray] = None) -> SolveResult:
    """Solve to ``config.tol`` relative residual in float64 terms, using
    float32 inner solves (``config.dtype`` is forced to float32 on device).

    The returned ``residual_history`` holds the float64 outer residuals (one
    per restart); ``iters`` is the total inner iteration count.
    """
    t0 = time.perf_counter()
    b64 = np.asarray(b, dtype=np.float64)
    norm_b0: Optional[float] = None
    x = (np.ones(a.n, dtype=np.float64) if x0 is None
         else np.asarray(x0, dtype=np.float64))
    # inner solves skip the per-solve true-residual SpMV: the outer loop
    # already computes the f64 residual each restart
    inner_cfg = config.replace(dtype="float32", tol=inner_tol,
                               true_residual=False)
    total_inner = 0
    outer_hist: List[float] = []
    dt_alg = 0.0
    status = SolverStatus.MAXIT
    rel = np.inf
    for k in range(max_restarts):
        r = b64 - host_matvec_f64(a, x)             # float64 true residual
        nrm = float(np.linalg.norm(r))
        if norm_b0 is None:
            norm_b0 = nrm if nrm > 0 else 1.0       # ||r0|| as in the reference
        outer_hist.append(nrm)
        rel = nrm / norm_b0
        if rel < config.tol:
            status = SolverStatus.CONVERGED
            break
        inner = solve(a, r, inner_cfg, x0=np.zeros(a.n))
        dt_alg += inner.dt_alg
        total_inner += inner.iters
        if inner.status == SolverStatus.BREAKDOWN and \
                not np.isfinite(inner.x).all():
            status = SolverStatus.BREAKDOWN
            break
        x = x + inner.x.astype(np.float64)
    return SolveResult(
        x=x, status=status, iters=total_inner, residual=float(rel * norm_b0),
        residual0=float(norm_b0), dt_alg=dt_alg,
        dt_setup=time.perf_counter() - t0 - dt_alg,
        residual_history=np.asarray(outer_hist),
        # the outer residual is already the f64 host-computed true residual
        residual_true=float(rel * norm_b0))
