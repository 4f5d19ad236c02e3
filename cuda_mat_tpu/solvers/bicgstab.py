"""BiCGSTAB solver family as single ``lax.while_loop``s under ``jit``.

The central design departure from the reference: its GPU loops sync ~6 scalar
dot/norm results to the host *per iteration* to compute alpha/beta/omega and
decide the convergence branch (reference pbicgstab.cu:81,106,111,135-136,142
and the host-side branches at :116,:147).  Here the entire iteration —
SpMV, preconditioner solves, all BLAS1 ops, scalar recurrences, and the
convergence/breakdown decisions — is one jitted ``lax.while_loop``; XLA fuses
every vector op between SpMV calls and nothing touches the host until the
solve finishes.

Three public entry points mirror reference pbicgstab.h:113-120:

- :func:`bicgstab`            — plain CSR, h-form loop (pbicgstab.cu:425-578,
  with the intended residual init; see cpu_solvers docstring)
- :func:`bicgstab_split`      — ``A = A0 + diag(d)`` (pbicgstab.cu:581-754)
- :func:`bicgstab_lu_precond` — ILU(0) preconditioned (pbicgstab.cu:45-154)

plus a generic :func:`solve` that picks the preconditioner from
``SolverConfig``.
"""

from __future__ import annotations

import time
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cuda_mat_tpu.config import SolverConfig, DEFAULT_CONFIG
from cuda_mat_tpu.formats.csr import CSRMatrix
from cuda_mat_tpu.ops.operators import make_operator, SplitOperator
from cuda_mat_tpu.precond.preconditioners import (
    IdentityPreconditioner,
    make_preconditioner,
)
from cuda_mat_tpu.solvers.result import SolveResult, SolverStatus

_RUNNING = 0
_CONVERGED = 1
_BREAKDOWN = 2


class _HState(NamedTuple):
    i: jax.Array
    status: jax.Array
    x: jax.Array
    x0: jax.Array
    r: jax.Array
    p: jax.Array
    v: jax.Array
    rho: jax.Array
    alpha: jax.Array
    omega: jax.Array
    norm: jax.Array
    hist: jax.Array


def hform_core(matvec, dot, x0, b, tol, btol, maxit, debug=False):
    """h-form BiCGSTAB loop (reference gpu_pbicgstab2, pbicgstab.cu:488-573):
    scalar recurrences rho/alpha/omega, explicit intermediate h = x0 + αp̂,
    convergence check then |omega| breakdown guard, state ping-pong at the
    end of each iteration (here: just the new carry).

    Generic over ``matvec`` and ``dot`` so the same algorithm runs single-chip
    (``dot = jnp.dot``) and inside ``shard_map`` (``dot`` = local partial +
    ``psum``, ``matvec`` = halo-exchange SpMV) — the distributed path shares
    this exact code (SURVEY §2 distributed component 3)."""
    dt = b.dtype
    one = jnp.asarray(1.0, dt)
    r = b - matvec(x0)
    r0 = r
    norm0 = jnp.sqrt(dot(r, r))
    if debug:
        jax.debug.print("initial norm = {}", norm0)

    def cond(st: _HState):
        return (st.i < maxit) & (st.status == _RUNNING)

    def body(st: _HState) -> _HState:
        rho_ = dot(r0, st.r)
        beta = (rho_ / st.rho) * (st.alpha / st.omega)
        p_ = st.r + beta * (st.p - st.omega * st.v)
        v_ = matvec(p_)
        alpha = rho_ / dot(r0, v_)
        h = st.x0 + alpha * p_
        s = st.r - alpha * v_
        t = matvec(s)
        omega = dot(t, s) / dot(t, t)
        x = h + omega * s
        r_ = s - omega * t
        norm = jnp.sqrt(dot(r_, r_))
        if debug:
            jax.debug.print("k = {}, norm = {}", st.i, norm)
        conv = norm < tol * norm0
        broke = (~conv) & ((jnp.abs(omega) < btol) | jnp.isnan(omega))
        status = jnp.where(conv, _CONVERGED,
                           jnp.where(broke, _BREAKDOWN, _RUNNING)
                           ).astype(jnp.int32)
        hist = st.hist.at[st.i].set(norm)
        return _HState(st.i + 1, status, x, x, r_, p_, v_, rho_, alpha, omega,
                       norm, hist)

    z = jnp.zeros_like(b)
    init = _HState(jnp.int32(0), jnp.int32(_RUNNING), z, x0, r, z, z,
                   one, one, one, norm0, jnp.full((maxit,), -1.0, dt))
    st = jax.lax.while_loop(cond, body, init)
    return st.x, st.status, st.i, st.norm, norm0, st.hist


@partial(jax.jit, static_argnames=("maxit", "debug"))
def _hform_solve(op, x0, b, tol, btol, maxit, debug=False):
    return hform_core(op.matvec, jnp.dot, x0, b, tol, btol, maxit, debug)


class _PState(NamedTuple):
    i: jax.Array
    status: jax.Array
    x: jax.Array
    r: jax.Array
    p: jax.Array
    v: jax.Array
    rho: jax.Array
    alpha: jax.Array
    omega: jax.Array
    nrmr: jax.Array
    hist: jax.Array


def precond_core(matvec, msolve, dot, x0, b, tol, maxit, debug=False,
                 matvec_dots=None, msolve_fma=None, check_halves=True):
    """Preconditioned BiCGSTAB loop (reference gpu_pbicgstab,
    pbicgstab.cu:45-154): two M-solve + SpMV half-steps per iteration with a
    convergence check after each; the first check exits *without* bumping the
    iteration counter (reference :116), the second bumps it (:147-150).

    Generic over ``matvec``/``msolve``/``dot`` (see :func:`hform_core`).

    ``matvec_dots(x, ws, with_self=False) -> (y, parts)``: optional fused
    SpMV + dot-partials (e.g.
    :meth:`~cuda_mat_tpu.ops.pallas_stencil.ConstStencilOperator.matvec_dots`)
    — the alpha/omega reductions then re-read nothing (reference dot sites
    pbicgstab.cu:106,135-136 fused into the :104,:132 SpMVs).

    ``msolve_fma(a, c1, b_, c2, c) -> (p, M⁻¹p)``: optional BLAS1-prologue
    msolve (e.g. :meth:`~cuda_mat_tpu.precond.preconditioners.
    NeumannILUPreconditioner.msolve_fma`) — the p-update and r1-production
    axpys (reference pbicgstab.cu:86-88,:108) then run inside the msolve
    kernel instead of as separate XLA nodes (VERDICT r3 #5).

    ``check_halves=False`` elides the reference's *first-half* convergence
    check (reference pbicgstab.cu:116) — the dot + sqrt + compare + the four
    selects that guard the dead half-iteration disappear from the loop body
    and convergence is only tested after full iterations (:147).  The
    trajectory is unchanged except at the exit: a solve that would have
    exited on a first half-step runs its second half too (one extra msolve +
    SpMV once per solve, and the residual only gets smaller).  Off by
    default for reference trajectory parity (VERDICT r4 #6)."""
    dt = b.dtype
    one = jnp.asarray(1.0, dt)
    r = b - matvec(x0)
    rw = r
    nrmr0 = jnp.sqrt(dot(r, r))
    if debug:
        jax.debug.print("gpu, init residual:norm {}", nrmr0)

    def cond(st: _PState):
        return (st.i < maxit) & (st.status == _RUNNING)

    def body(st: _PState) -> _PState:
        # "Flat" (branch-free) body: no lax.cond — the two data-dependent
        # branches of the reference loop (the i==0 p-init and the first-half
        # convergence exit, pbicgstab.cu:83-89,:116) become selects around
        # unconditionally-executed compute.  Each op node inside while_loop
        # costs ~0.1 ms of dispatch on the tunnel target (BASELINE.md r3
        # dot-epilogue note), so removing the two cond nodes measured 8%
        # e2e at 10M rows (284 -> 260 ms, SAME iteration count — the
        # selected values, status, counter, and history are identical; the
        # only addition is one discarded half-iteration at the exit).
        # Divisors are select-guarded so the dead half-iteration can never
        # manufacture NaN/Inf (keeps --debug-nans usable and breakdown
        # detection exact).
        rhop = st.rho
        rho = dot(rw, st.r)
        first = st.i == 0
        beta = jnp.where(first, jnp.asarray(0.0, dt),
                         (rho / jnp.where(first, one, rhop))
                         * (st.alpha / st.omega))
        if msolve_fma is None:
            p = st.r + beta * (st.p - st.omega * st.v)
            pw = msolve(p)
        else:
            p, pw = msolve_fma(st.r, beta, st.p, -st.omega, st.v)
        if matvec_dots is None:
            v = matvec(pw)
            den_a = dot(rw, v)
        else:
            v, parts = matvec_dots(pw, (rw,))
            den_a = parts[0]
        alpha = rho / den_a
        if msolve_fma is None:
            r1 = st.r - alpha * v
        else:
            # two-stream form: r1 = r - alpha*v (no dead third operand)
            r1, s = msolve_fma(st.r, -alpha, v)
        x1 = st.x + alpha * pw
        if check_halves:
            nrmr1 = jnp.sqrt(dot(r1, r1))
            if debug:
                jax.debug.print("i = {}, residual norm (before precond) = {}",
                                st.i, nrmr1)
            conv1 = nrmr1 < tol * nrmr0
        if msolve_fma is None:
            s = msolve(r1)
        if matvec_dots is None:
            t = matvec(s)
            num_o = dot(t, r1)
            den_o = dot(t, t)
        else:
            t, parts = matvec_dots(s, (r1,), with_self=True)
            num_o, den_o = parts[0], parts[1]
        if check_halves:
            omega_c = (jnp.where(conv1, one, num_o)
                       / jnp.where(conv1, one, den_o))
            omega = jnp.where(conv1, st.omega, omega_c)
            x2 = jnp.where(conv1, x1, x1 + omega_c * s)
            r2 = jnp.where(conv1, r1, r1 - omega_c * t)
            nrmr2 = jnp.where(conv1, nrmr1, jnp.sqrt(dot(r2, r2)))
        else:
            # full-iteration checks only: the first-half dot/sqrt/compare and
            # the selects guarding the dead half-iteration are gone entirely
            conv1 = jnp.asarray(False)
            omega = num_o / den_o
            x2 = x1 + omega * s
            r2 = r1 - omega * t
            nrmr2 = jnp.sqrt(dot(r2, r2))
        if debug:
            jax.debug.print("i = {}, residual norm = {}", st.i, nrmr2)
        conv2 = (~conv1) & (nrmr2 < tol * nrmr0)
        # the reference's preconditioned loop has no NaN guard and would spin
        # to maxit on a float breakdown (its *unpreconditioned* loops do guard,
        # pbicgstab.cu:559) — we surface BREAKDOWN instead of burning maxit
        broke = (~conv1) & (~conv2) & (jnp.isnan(nrmr2) | jnp.isnan(alpha))
        status = jnp.where(conv1 | conv2, _CONVERGED,
                           jnp.where(broke, _BREAKDOWN, _RUNNING)
                           ).astype(jnp.int32)
        if check_halves:
            i_next = jnp.where(conv1, st.i, st.i + 1).astype(jnp.int32)
            pair = jnp.stack([nrmr1, jnp.where(conv1, -one, nrmr2)])
        else:
            i_next = (st.i + 1).astype(jnp.int32)
            pair = jnp.stack([-one, nrmr2])   # first-half slots stay unused
        hist = jax.lax.dynamic_update_slice(st.hist, pair, (2 * st.i,))
        return _PState(i_next, status, x2, r2, p, v, rho, alpha, omega,
                       nrmr2, hist)

    init = _PState(jnp.int32(0), jnp.int32(_RUNNING), x0, r, r,
                   jnp.zeros_like(b), jnp.asarray(0.0, dt), one, one, nrmr0,
                   jnp.full((2 * maxit,), -1.0, dt))
    st = jax.lax.while_loop(cond, body, init)
    return st.x, st.status, st.i, st.nrmr, nrmr0, st.hist


@partial(jax.jit, static_argnames=("maxit", "debug", "fused_dots",
                                   "fuse_blas1", "check_halves"))
def _precond_solve(op, pre, x0, b, tol, maxit, debug=False, fused_dots=False,
                   fuse_blas1=False, check_halves=True):
    mvd = getattr(op, "matvec_dots", None) if fused_dots else None
    # the BLAS1-prologue msolve only pays when it actually folds into the
    # kernel launch; as a pure-XLA fallback it is the same graph
    mfma = (pre.msolve_fma
            if fuse_blas1 and getattr(pre, "fma_fits", False) else None)
    return precond_core(op.matvec, pre.msolve, jnp.dot, x0, b, tol, maxit,
                        debug, matvec_dots=mvd, msolve_fma=mfma,
                        check_halves=check_halves)


# ---------------------------------------------------------------------------
# Host-facing wrappers
# ---------------------------------------------------------------------------

_warned_tpu_f64 = False


def _dtype_of(config: SolverConfig):
    """Resolve the compute dtype.  Policy for float64 on TPU: *allowed* (it
    is the reference's precision, pbicgstab.cu computes in double) but the
    MXU/VPU have no f64 datapath — XLA emulates it at >10x cost — so we warn
    once and point at the two native options: ``dtype="float32"`` (the
    headline workloads converge in f32, BASELINE.md) or
    :func:`cuda_mat_tpu.solvers.refine.solve_refined` (f32 device solves +
    f64 host residual refinement = f64-grade accuracy at f32 speed)."""
    dt = jnp.dtype(config.dtype)
    global _warned_tpu_f64
    if (dt == jnp.dtype("float64") and not _warned_tpu_f64
            and jax.default_backend() == "tpu"):
        import warnings

        warnings.warn(
            "float64 on TPU is software-emulated (>10x slower than f32); "
            "consider SolverConfig(dtype='float32') or "
            "cuda_mat_tpu.solve_refined for f64-grade accuracy at f32 speed",
            stacklevel=3)
        _warned_tpu_f64 = True
    return dt


def _as_op(a, dtype, format=None):
    if isinstance(a, CSRMatrix):
        if a.n != a.m:
            raise ValueError(
                f"square matrix is expected, got {a.n}x{a.m}")  # cf. example.cpp:257-260
        pallas_formats = ("pallas_dia", "stencil")
        if format in pallas_formats or (format is None
                                        and jax.default_backend() == "tpu"):
            # on TPU prefer the Pallas block-halo kernel when the matrix is
            # banded enough for DIA (~5x the XLA DIA formulation); off-TPU a
            # forced format="pallas_dia"/"stencil" runs the kernel in
            # interpret mode (slow — for tests and CPU debugging of the
            # padded protocol)
            interpret = jax.default_backend() != "tpu"
            try:
                dia = a.to_dia(max_diags=16)
            except ValueError:
                if format in pallas_formats:
                    raise
                dia = None
            if dia is not None and (a.nnz >= 0.4 * dia.ndiag * a.n
                                    or format in pallas_formats):
                # constant-coefficient grid stencils (the Laplacian family)
                # run matrix-free: ~2n bytes/matvec vs the DIA kernel's
                # (ndiag+2.5)n — detection is an exact proof, so
                # auto-upgrading is always safe
                if format != "pallas_dia":
                    from cuda_mat_tpu.ops.pallas_stencil import (
                        ConstStencilOperator, detect_const_stencil)

                    if detect_const_stencil(dia) is not None:
                        try:
                            return ConstStencilOperator.from_dia(
                                dia, dtype=dtype, interpret=interpret)
                        except ValueError:
                            # stencil layout over its VMEM budget (huge
                            # lcm(sub, stride)); the DIA kernel still applies
                            if format == "stencil":
                                raise
                    elif format == "stencil":
                        raise ValueError(
                            "matrix is not a constant-coefficient grid"
                            " stencil; drop format='stencil'")
                from cuda_mat_tpu.ops.pallas_spmv import PallasDIAOperator

                return PallasDIAOperator.from_dia(
                    dia, dtype=dtype, interpret=interpret)
        return make_operator(a, dtype=dtype, format=format)
    return a  # already a device operator


def _is_padded(op) -> bool:
    return hasattr(op, "pad_vec")


_warned_no_callbacks = False


def effective_debug(debug: bool) -> bool:
    """In-loop residual printing (``jax.debug.print``, the reference's
    debug-trace oracle pbicgstab.cu:113-114) needs host callbacks, which the
    axon TPU tunnel does not implement — degrade to a warning instead of a
    mid-solve JaxRuntimeError.  The residual history is still returned as
    data either way."""
    global _warned_no_callbacks
    if not debug:
        return False
    try:
        import jax.extend

        ver = jax.extend.backend.get_backend().platform_version
    except Exception:
        return True
    if "axon" not in ver:
        return True
    if not _warned_no_callbacks:
        import warnings

        warnings.warn(
            "debug=True: this TPU backend does not support host callbacks;"
            " in-loop residual prints are disabled (the residual history is"
            " still available in SolveResult.residual_history)", stacklevel=3)
        _warned_no_callbacks = True
    return False


_warned_fused_dots = False


def effective_fused_dots(fused: bool) -> bool:
    """Guard the experimental dot-epilogue kernels the way
    :func:`effective_debug` guards host callbacks: the epilogue's cross-grid
    VMEM reduction sends the *axon* remote Mosaic compile into a
    multi-minute/hung state that wedges the chip claim (measured ~30 min,
    BASELINE.md r3), so on that backend the flag degrades to a one-time
    warning instead of hanging the user's session (ADVICE r3)."""
    global _warned_fused_dots
    if not fused:
        return False
    try:
        import jax.extend

        ver = jax.extend.backend.get_backend().platform_version
    except Exception:
        return True
    if "axon" not in ver:
        return True
    if not _warned_fused_dots:
        import warnings

        warnings.warn(
            "fused_dots=True: the dot-epilogue kernel hangs this TPU"
            " backend's remote Mosaic compile (BASELINE.md r3); forcing"
            " fused_dots off", stacklevel=3)
        _warned_fused_dots = True
    return False


def _force_completion(out) -> None:
    """Fetch one scalar of the solve output to the host before the dtAlg
    timer stops.  ``block_until_ready`` over the axon TPU tunnel can return
    before kernel completion (CLAUDE.md), which would silently turn dtAlg
    into a dispatch time; a literal value transfer cannot return early."""
    float(np.asarray(out[3]).reshape(-1)[0])


def host_matvec_f64(a, x) -> np.ndarray:
    """``A x`` in float64 on the host.  For CSR this uses bincount instead of
    CSRMatrix.matvec's np.add.at — same sum, ~20x faster at bench scale
    (50M nnz); used by the true-residual report and iterative refinement."""
    x64 = np.asarray(x, np.float64)
    if isinstance(a, CSRMatrix):
        rows = np.repeat(np.arange(a.n), a.row_lengths)
        return np.bincount(rows, weights=np.asarray(a.data, np.float64)
                           * x64[a.indices], minlength=a.n)
    return np.asarray(a.matvec(x64), np.float64)


def _host_residual_norm(a, x, b) -> float:
    """``||b - A x||_2`` recomputed in float64 on the host — the honest
    convergence number next to the iteration's recursive residual (reference
    convergence contract pbicgstab.cu:116,147; one SpMV, outside dtAlg)."""
    return float(np.linalg.norm(np.asarray(b, np.float64)
                                - host_matvec_f64(a, x)))


def _attach_true_residual(res: SolveResult, a, b, config: SolverConfig,
                          d=None) -> SolveResult:
    from cuda_mat_tpu.formats.dia import DIAMatrix

    if config.true_residual and isinstance(a, (CSRMatrix, DIAMatrix)):
        bb = np.asarray(b, np.float64)
        if d is not None:                     # split form A = A0 + diag(d)
            bb = bb - np.asarray(d, np.float64) * np.asarray(res.x, np.float64)
        res.residual_true = _host_residual_norm(a, res.x, bb)
    return res


def _check_shapes(op, b):
    b = np.asarray(b)
    if b.ndim != 1 or b.shape[0] != op.n:
        raise ValueError(
            f"b must be a vector of length n={op.n}, got shape {b.shape}"
        )  # cf. example.cpp:320-328


def _finish(x, status, iters, nrmr, nrmr0, hist, t_alg, t_setup, maxit
            ) -> SolveResult:
    status = int(status)
    if status == _RUNNING:
        status = SolverStatus.MAXIT
    return SolveResult(
        x=np.asarray(x), status=SolverStatus(status), iters=int(iters),
        residual=float(nrmr), residual0=float(nrmr0), dt_alg=t_alg,
        dt_setup=t_setup, residual_history=np.asarray(hist))


def bicgstab(a, b, config: SolverConfig = DEFAULT_CONFIG,
             x0: Optional[np.ndarray] = None, format: Optional[str] = None
             ) -> SolveResult:
    """Plain BiCGSTAB on CSR, x0 = all-ones by default (reference wrapper
    pbicgstab.cu:756-922, x0 init at :827-832)."""
    cfg = config if config.precond in (None, "none", "identity") \
        else config.replace(precond="none")
    return make_solver(a, cfg, format=format).solve(b, x0=x0)


def bicgstab_split(a0, d, x0, b, config: SolverConfig = DEFAULT_CONFIG,
                   format: Optional[str] = None) -> SolveResult:
    """BiCGSTAB on the split form ``(A0 + diag(d)) x = b`` with caller-supplied
    x0 (reference pbicgstab.cu:926-1088; SpMV is the fused d∘x + A0·x)."""
    dt = _dtype_of(config)
    t0 = time.perf_counter()
    base = _as_op(a0, dt, format)
    padded = _is_padded(base)
    if padded:
        # pad d alongside the vectors: the pad region of d is zero, padded x
        # stays zero, so d∘x keeps the padding a fixed point of the iteration
        op = SplitOperator(base, base.pad_vec(np.asarray(d)))
        _check_shapes(op, b)
        bd = base.pad_vec(np.asarray(b))
        x0d = base.pad_vec(np.asarray(x0))
    else:
        op = SplitOperator(base, jnp.asarray(d, dt))
        _check_shapes(op, b)
        bd = jnp.asarray(b, dt)
        x0d = jnp.asarray(x0, dt)
    jax.block_until_ready((op, bd, x0d))
    t1 = time.perf_counter()
    out = _hform_solve(op, x0d, bd, jnp.asarray(config.tol, dt),
                       jnp.asarray(config.breakdown_tol, dt), config.maxit,
                       effective_debug(config.debug))
    out = jax.block_until_ready(out)
    _force_completion(out)
    t2 = time.perf_counter()
    out = (base.unpad_vec(out[0]),) + out[1:] if padded else out
    return _attach_true_residual(
        _finish(*out, t2 - t1, t1 - t0, config.maxit), a0, b, config, d=d)


def bicgstab_lu_precond(a, b, config: SolverConfig = DEFAULT_CONFIG,
                        format: Optional[str] = None) -> SolveResult:
    """ILU(0)-preconditioned BiCGSTAB, x0 = all-ones (reference
    bicgstab_lu_precond, pbicgstab.cu:157-409; x0 at :306-308).  Unlike the
    reference — which always returns true (:408) — the result carries real
    convergence status."""
    cfg = config.replace(precond="ilu0")
    return solve(a, b, cfg, format=format)


def solve(a, b, config: SolverConfig = DEFAULT_CONFIG,
          x0: Optional[np.ndarray] = None, format: Optional[str] = None
          ) -> SolveResult:
    """Generic preconditioned solve; ``config.precond`` selects
    none/jacobi/ilu0.  One-shot convenience over :func:`make_solver` —
    repeated solves of the same matrix should build a
    :class:`PreparedSolver` once instead (the operator/preconditioner setup
    re-runs here on every call; reference setup/solve phase split
    pbicgstab.cu:335-363 vs :366)."""
    return make_solver(a, config, format=format).solve(b, x0=x0)


def _build_setup(a, op, padded, dt, config: SolverConfig):
    """Preconditioner construction for ``op``/``a`` (the reference's setup
    phase: analysis + ILU(0) factorization, pbicgstab.cu:335-363).  May
    *replace* ``op`` (stencil-layout re-plan for the fused Neumann series, or
    the non-padded fallback when the factors cannot restride) — returns
    ``(op, pre, padded)``."""
    if config.precond in (None, "none", "identity"):
        return op, None, padded
    if isinstance(a, CSRMatrix):
        if padded and config.precond == "ilu0":
            # exact ILU(0): keep the Pallas SpMV — the triangular solvers
            # work on true-n vectors, so adapt them at the msolve boundary
            # (round-1 downgraded the whole operator to the slow XLA DIA
            # formulation here, 0.12-0.15x of roofline per matvec)
            from cuda_mat_tpu.precond.preconditioners import (
                PaddedPreconditioner)

            pre = PaddedPreconditioner(
                make_preconditioner("ilu0", a, block=config.trisolve_block,
                                    dtype=dt,
                                    milu_omega=config.milu_omega), op)
        elif padded and config.precond == "jacobi":
            from cuda_mat_tpu.precond.preconditioners import JacobiPreconditioner

            diag = a.diagonal()
            if np.any(diag == 0):
                raise ValueError(
                    "Jacobi preconditioner requires a nonzero diagonal")
            pre = JacobiPreconditioner(op.pad_vec(1.0 / diag))
        elif padded and config.precond == "ilu0_neumann":
            # build N_l/N_u in the operator's padded layout: the whole
            # preconditioned iteration then runs on padded vectors at Pallas
            # kernel bandwidth
            from cuda_mat_tpu.precond.preconditioners import (
                NeumannILUPreconditioner)

            if config.neumann_const_factors and hasattr(op, "stride"):
                # re-plan the layout for the fused series stencils: widen the
                # halo sub-block to their polynomial offsets (costs only x
                # overfetch on A's matvec) and cap the block so the widest
                # kernel fits the scoped-VMEM budget
                from cuda_mat_tpu.ops.pallas_stencil import (
                    ConstStencilOperator, plan_const_neumann_layout)

                plan = plan_const_neumann_layout(
                    op.terms, config.neumann_terms, op.c_grid, op.stride,
                    fuse_blas1=config.fuse_blas1)
                if plan is not None and (plan[0] > op.sub
                                         or op.block > plan[1]):
                    try:
                        op = ConstStencilOperator.from_dia(
                            a.to_dia(max_diags=16), dtype=dt,
                            interpret=op.interpret, min_sub=plan[0],
                            block_target=plan[1])
                    except ValueError:
                        pass  # layout infeasible: sequential series applies
            try:
                pre = NeumannILUPreconditioner.from_csr(
                    a, dtype=dt, terms=config.neumann_terms, pad_like=op,
                    const_factors=config.neumann_const_factors,
                    milu_omega=config.milu_omega)
            except ValueError:
                op = make_operator(a, dtype=dt, format=None)
                padded = False
                pre = make_preconditioner(config.precond, a,
                                          block=config.trisolve_block,
                                          dtype=dt,
                                          terms=config.neumann_terms,
                                          milu_omega=config.milu_omega)
        else:
            pre = make_preconditioner(config.precond, a,
                                      block=config.trisolve_block, dtype=dt,
                                      terms=config.neumann_terms,
                                      milu_omega=config.milu_omega)
    else:
        pre = IdentityPreconditioner()
    return op, pre, padded


class PreparedSolver:
    """A prepared (operator + preconditioner + jitted loop) single-chip
    solver — the twin of
    :class:`~cuda_mat_tpu.parallel.dist_solver.DistBicgstabSolver`
    (VERDICT r4 #1).

    Built once by :func:`make_solver`; :meth:`solve` may then be called for
    any number of right-hand sides without re-running ``_as_op`` (DIA
    conversion + stencil detection + layout planning) or re-factorizing the
    ILU(0) preconditioner.  Mirrors the reference's setup/solve phase split
    (analysis + csrilu0 once, pbicgstab.cu:335-363; ``gpu_pbicgstab`` per
    call, :366).  The jitted loops (:func:`_hform_solve` /
    :func:`_precond_solve`) are module-level jit caches keyed on the
    op/pre pytree *structure*, so two PreparedSolvers of the same
    configuration also share one compiled graph."""

    def __init__(self, a, op, pre, padded, dt, config: SolverConfig,
                 dt_setup: float, perm=None):
        self.a = a
        self.op = op
        self.pre = pre
        self._padded = padded
        self._dt = dt
        self._config = config
        self.dt_setup = dt_setup
        self._perm = perm          # RCM permutation (input ordering -> op's)

    @property
    def n(self) -> int:
        return self.op.n

    def _prep_vec(self, v) -> jax.Array:
        v = np.asarray(v)
        if self._perm is not None:
            from cuda_mat_tpu.formats.reorder import permute_vector

            v = permute_vector(v, self._perm)
        if self._padded:
            return self.op.pad_vec(v)
        return jnp.asarray(v, self._dt)

    def solve(self, b, x0: Optional[np.ndarray] = None) -> SolveResult:
        """Solve ``A x = b``; ``x0`` defaults to all-ones (reference
        pbicgstab.cu:306-308, :827-832)."""
        cfg = self._config
        _check_shapes(self.op, b)
        bd = self._prep_vec(b)
        x0d = self._prep_vec(np.ones(self.op.n) if x0 is None else x0)
        # dtAlg excludes H2D transfers (reference pbicgstab.h:108-109):
        # force the uploads to finish before starting the solve timer
        jax.block_until_ready((bd, x0d))
        t1 = time.perf_counter()
        if self.pre is None:
            out = _hform_solve(self.op, x0d, bd,
                               jnp.asarray(cfg.tol, self._dt),
                               jnp.asarray(cfg.breakdown_tol, self._dt),
                               cfg.maxit, effective_debug(cfg.debug))
        else:
            out = _precond_solve(
                self.op, self.pre, x0d, bd, jnp.asarray(cfg.tol, self._dt),
                cfg.maxit, effective_debug(cfg.debug),
                fused_dots=effective_fused_dots(cfg.fused_dots),
                fuse_blas1=cfg.fuse_blas1, check_halves=cfg.check_halves)
        out = jax.block_until_ready(out)
        _force_completion(out)
        t2 = time.perf_counter()
        out = (self.op.unpad_vec(out[0]),) + out[1:] if self._padded else out
        if self._perm is not None:
            from cuda_mat_tpu.formats.reorder import unpermute_vector

            out = (unpermute_vector(out[0], self._perm),) + out[1:]
        return _attach_true_residual(
            _finish(*out, t2 - t1, self.dt_setup, cfg.maxit), self.a, b, cfg)


def make_solver(a, config: SolverConfig = DEFAULT_CONFIG,
                format: Optional[str] = None) -> PreparedSolver:
    """Build the operator + preconditioner + jitted loop once; the returned
    :class:`PreparedSolver` solves any number of right-hand sides.  This is
    the single-chip twin of
    :func:`~cuda_mat_tpu.parallel.dist_solver.make_dist_bicgstab`
    (reference setup/solve split pbicgstab.cu:335-374)."""
    t0 = time.perf_counter()
    perm = None
    a_in = a
    cfg = config
    if cfg.reorder not in (None, "none") and isinstance(a, CSRMatrix):
        if cfg.reorder != "rcm":
            raise ValueError(f"unknown reorder {cfg.reorder!r}")
        from cuda_mat_tpu.formats.reorder import permute_csr, rcm_permutation

        perm = rcm_permutation(a)
        a_in = permute_csr(a, perm)
        cfg = cfg.replace(reorder="none")
    dt = _dtype_of(cfg)
    op = _as_op(a_in, dt, format)
    op, pre, padded = _build_setup(a_in, op, _is_padded(op), dt, cfg)
    jax.block_until_ready((op, pre))
    # keep the ORIGINAL a for the true-residual check: x is unpermuted back
    # to the input ordering before _attach_true_residual runs
    return PreparedSolver(a, op, pre, padded, dt, cfg,
                          time.perf_counter() - t0, perm=perm)
