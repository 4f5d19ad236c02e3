#!/usr/bin/env python
"""Headline benchmark: single-chip SpMV throughput vs measured HBM roofline.

Prints ONE JSON line to stdout:
    {"metric": "spmv_gbps_per_chip", "value": <GB/s>, "unit": "GB/s",
     "vs_baseline": <fraction of measured roofline>}

The reference publishes no numbers (BASELINE.md); its protocol is solver-only
timing on the banded workloads.  The BASELINE.json target is >= 0.70 of
roofline SpMV throughput per chip, so ``vs_baseline`` is the achieved
fraction of the *measured* single-stream HBM copy bandwidth on this chip
(>= 0.70 = target met).  NOTE: the copy chain is a *lower bound* on peak HBM
bandwidth — the per-diagonal multi-stream DMA pattern measures up to ~1.4x
the single-stream chain (~0.87 of the v5e spec peak, BASELINE.md r2) — so
``vs_baseline`` may legitimately exceed 1.  Details (roofline, nnz/s,
solve stats) go to stderr.

Measurement hygiene (VERDICT r4 weak #3 — single warm runs drifted up to
71% between rounds on the ~48 ms-RTT tunnel):

- every solve arm reports the MEDIAN of 3 warm solves through one
  PreparedSolver (setup+compile amortized; the solves are 0.03-0.5 s);
- the mat10000 arm additionally emits a maxit-differenced calibration
  (``*_ms_per_iter`` + ``*_fixed_ms``): two forced-iteration runs at
  different maxit caps, differenced, so the per-iteration time is net of
  the tunnel's fixed dispatch/RTT cost — the number that is actually
  comparable across rounds;
- a pid lockfile guards against a concurrent TPU process (measured ~20%
  contention swings, CLAUDE.md); contention is recorded in the JSON line.

Byte model for DIA SpMV: each diagonal's values are read once, x is read once
per diagonal slice, y written once -> (ndiag*n + ndiag*n + n) * itemsize is
the pessimistic count; we use the standard operand-once model
(ndiag*n + 2n) * itemsize, which matches what a perfectly cached kernel must
move through HBM.
"""

import json
import os
import sys
import time

import numpy as np

_LOCK = "/tmp/cuda_mat_tpu_tpu.lock"


def _acquire_lock() -> bool:
    """Best-effort single-TPU-process guard.  Returns True when the lock was
    clean (no live concurrent holder); False records contention."""
    try:
        if os.path.exists(_LOCK):
            pid = int(open(_LOCK).read().strip() or 0)
            if pid and pid != os.getpid():
                try:
                    os.kill(pid, 0)
                except (OSError, ProcessLookupError):
                    pass            # stale lock
                else:
                    print(f"WARNING: live TPU process {pid} holds {_LOCK}; "
                          "numbers may be depressed ~20% by contention",
                          file=sys.stderr)
                    return False
        with open(_LOCK, "w") as f:
            f.write(str(os.getpid()))
    except OSError:
        pass
    return True


def _chain_time(step_fn, x0, k=200, reps=5, args=()):
    """Median per-step time of a k-step *dependency chain* of ``step_fn``
    inside one jit, completion forced by fetching a scalar.

    Rationale: the axon TPU tunnel has ~30 ms host<->device round-trip
    latency and ``block_until_ready`` on a remote array does not wait for
    kernel completion, so single-dispatch timings are garbage in both
    directions.  A y_{i+1} = f(y_i) chain cannot be hoisted by XLA, amortizes
    the sync to 1/k, and the final reduction forces real completion.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, *a):
        # extra operands ride as jit ARGUMENTS (pytrees), not closure
        # captures — captured device arrays are baked into the program as
        # constants and blow the remote-compile request past its length
        # limit at ~400 MB (HTTP 413; hit by the dense/BELL operators)
        y = jax.lax.fori_loop(0, k, lambda i, y: step_fn(y, *a), x)
        return jnp.sum(y[:8])

    float(run(x0, *args))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(x0, *args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / k


def _median_solve(solver, b, reps=3):
    """Median-of-``reps`` warm solves (first call also compiles; it is
    excluded).  Returns the median-dt_alg result."""
    solver.solve(b)                            # compile + warm
    rs = [solver.solve(b) for _ in range(reps)]
    rs.sort(key=lambda r: r.dt_alg)
    return rs[len(rs) // 2]


def _median_refined(a, b, cfg, inner_tol, solver, reps=3):
    from cuda_mat_tpu.solvers.refine import solve_refined

    rs = [solve_refined(a, b, cfg, inner_tol=inner_tol, solver=solver)
          for _ in range(reps)]
    rs.sort(key=lambda r: r.dt_alg)
    return rs[len(rs) // 2]


def _calibrated_per_iter(make, a, b, cfg, m1, m2):
    """Maxit-differenced per-iteration time: force exactly ``m1`` and ``m2``
    iterations (tol=0 disables convergence, btol=0 the |omega| guard),
    difference the median dtAlg — the result is net of the fixed
    dispatch/RTT cost, which is returned alongside.  The dtAlg protocol is
    the reference's (pbicgstab.h:108-109); the differencing is this repo's
    tunnel-calibration methodology (BASELINE.md), now in the artifact.
    Returns ``(per_iter, fixed, (iters1, iters2))`` — the actual iteration
    counts expose a breakdown-shortened spread (a NaN stops even a tol=0
    run; r5 run 2's dense arm went negative exactly that way)."""
    forced = cfg.replace(tol=0.0, breakdown_tol=0.0, true_residual=False)
    r1 = _median_solve(make(a, forced.replace(maxit=m1)), b, reps=5)
    r2 = _median_solve(make(a, forced.replace(maxit=m2)), b, reps=5)
    if r2.iters == r1.iters:
        return None, None, (r1.iters, r2.iters)
    per_iter = (r2.dt_alg - r1.dt_alg) / (r2.iters - r1.iters)
    fixed = r1.dt_alg - r1.iters * per_iter
    return per_iter, fixed, (r1.iters, r2.iters)


def main():
    import jax
    import jax.numpy as jnp

    from cuda_mat_tpu.models.problems import banded_laplacian_dia
    from cuda_mat_tpu.ops.operators import DIAOperator

    backend = jax.default_backend()
    dev = jax.devices()[0]
    info = {"backend": backend, "device": str(dev)}
    info["lock_clean"] = _acquire_lock()

    # ---- measured HBM roofline: big copy (read + write) -------------------
    copy_elems = 64 * 1024 * 1024  # 256 MB f32
    src = jnp.ones((copy_elems,), jnp.float32)
    t_copy = _chain_time(lambda y, *a: y * 1.0000001 + 1.0, src, k=200)
    roofline_gbps = 2 * copy_elems * 4 / t_copy / 1e9
    info["roofline_gbps"] = round(roofline_gbps, 1)

    # ---- DIA SpMV on a large banded Laplacian -----------------------------
    # Pallas block-halo kernel on TPU (the production operator for banded
    # matrices); plain XLA DIA on CPU (Pallas interpret mode is too slow to
    # chain-time there)
    side = 3163 if backend == "tpu" else 500   # 10.0M rows on TPU
    dia = banded_laplacian_dia(side, dtype=np.float32)
    n = dia.n
    if backend == "tpu":
        from cuda_mat_tpu.ops.pallas_spmv import PallasDIAOperator

        op = PallasDIAOperator.from_dia(dia, block=32768)
        x = op.pad_vec(jnp.ones((n,), jnp.float32))
    else:
        op = DIAOperator(jnp.asarray(dia.data),
                         tuple(int(o) for o in dia.offsets), n)
        x = jnp.ones((n,), jnp.float32)
    # *0.1 keeps the chained iterates bounded (spectral radius < 1); the
    # scale fuses into the spmv epilogue for free
    t_spmv = _chain_time(lambda y, o: o.matvec(y) * 0.1, x, k=200,
                         args=(op,))
    bytes_moved = (dia.ndiag * n + 2 * n) * 4
    spmv_gbps = bytes_moved / t_spmv / 1e9
    nnz_per_s = dia.nnz / t_spmv
    info.update(n=n, nnz=dia.nnz, t_spmv_us=round(t_spmv * 1e6, 1),
                spmv_gbps=round(spmv_gbps, 1),
                nnz_per_s=f"{nnz_per_s:.3e}")

    # ---- constant-stencil kernel (matrix-free, gap-strided layout) ---------
    stencil_nnz_per_s = None
    if backend == "tpu":
        try:
            from cuda_mat_tpu.ops.pallas_stencil import ConstStencilOperator

            sop = ConstStencilOperator.from_dia(dia)
            xs = sop.pad_vec(jnp.ones((n,), jnp.float32))
            t_sten = _chain_time(lambda y, o: o.matvec(y) * 0.1, xs,
                                 k=200, args=(sop,))
            stencil_nnz_per_s = sop.nnz / t_sten
            info.update(t_stencil_us=round(t_sten * 1e6, 1),
                        stencil_nnz_per_s=f"{stencil_nnz_per_s:.3e}",
                        stencil_vs_dia=round(t_spmv / t_sten, 2))
        except Exception as e:
            info["stencil_error"] = repr(e)[:200]

    # ---- mat10000 solve stats (reference headline workload) ---------------
    from cuda_mat_tpu.config import SolverConfig
    from cuda_mat_tpu.solvers.bicgstab import make_solver

    try:
        from cuda_mat_tpu.io.mmio import load_mm_sparse_matrix

        a = load_mm_sparse_matrix("data/mat10000.mtx")
        b = np.ones(a.n)
        dt = "float32" if backend == "tpu" else "float64"
        tol = 1e-4 if dt == "float32" else 1e-6
        cfg = SolverConfig(maxit=2000, tol=tol, dtype=dt, precond="ilu0",
                           trisolve_block=128)
        res = _median_solve(make_solver(a, cfg), b)
        info.update(mat10000_iters=res.iters,
                    mat10000_dt_alg_ms=round(res.dt_alg * 1e3, 2),
                    mat10000_status=res.status.name)
        # tunnel-drift-proof number: maxit-differenced ms/iter + the fixed
        # dispatch/RTT overhead (VERDICT r4 weak #3).  The spread must beat
        # the noise floor: at n=10000 an iteration is ~0.1-0.2 ms against a
        # ~60 ms fixed tunnel cost, so difference over ~290 iterations
        # (run 1 of r5 measured -0.04 ms/iter over a 20-iteration spread)
        per_iter, fixed, its = _calibrated_per_iter(make_solver, a, b, cfg,
                                                    10, 300)
        info["mat10000_calib_iters"] = list(its)
        if per_iter is not None:
            info.update(mat10000_ms_per_iter=round(per_iter * 1e3, 3),
                        mat10000_fixed_ms=round(fixed * 1e3, 2))
    except Exception as e:  # bench must always emit its JSON line
        info["mat10000_error"] = repr(e)[:200]

    # ---- mat900 exact-ILU arm (the reference CLI's other .mtx workload;
    # VERDICT r4 weak #4: the Pallas exact-trisolve path had no regression
    # arm beyond mat10000)
    try:
        a9 = load_mm_sparse_matrix("data/mat900.mtx")
        b9 = np.ones(a9.n)
        r9 = _median_solve(make_solver(a9, cfg), b9)
        info.update(mat900_iters=r9.iters,
                    mat900_dt_alg_ms=round(r9.dt_alg * 1e3, 2),
                    mat900_status=r9.status.name)
    except Exception as e:
        info["mat900_error"] = repr(e)[:200]

    # ---- BELL / dense operators on the reference CLI default workload
    # (random n=10000, P(zero)=0.99, example.cpp:173-175,274-286) — the
    # non-stencil production matvecs, maxit-differenced (the system itself
    # breaks down unpreconditioned at ~iter 27, which is reference parity;
    # forced short runs give a stable ms/iter regression number).
    # r1 measured 1.62 (BELL) / 2.33 (dense) ms/iter.
    if backend == "tpu":
        from cuda_mat_tpu.models.problems import random_diag_nonzero_system

        ar, _ = random_diag_nonzero_system(10000, 0.99, seed=0)
        br = np.ones(ar.n)
        cfg_r = SolverConfig(maxit=2000, tol=1e-4, dtype="float32",
                             precond="none")
        from cuda_mat_tpu.ops.operators import make_operator

        for fmt in ("bell", "dense"):
            try:
                # kernel-level chain timing (stable; same methodology as the
                # spmv/stencil arms — the solve-differenced key below swings
                # with the tunnel because breakdown at ~iter 27 caps the
                # differencing spread)
                opf = make_operator(ar, dtype=jnp.float32, format=fmt)
                xr = jnp.ones((ar.n,), jnp.float32)
                t_mv = _chain_time(lambda y, o: o.matvec(y) * 1e-3, xr,
                                   k=100, args=(opf,))
                info[f"{fmt}_matvec_us"] = round(t_mv * 1e6, 1)
                mk = lambda a_, c_: make_solver(a_, c_, format=fmt)  # noqa: E731
                per_iter, fixed, its = _calibrated_per_iter(mk, ar, br,
                                                            cfg_r, 4, 24)
                info[f"{fmt}_calib_iters"] = list(its)
                if per_iter is not None:
                    info[f"{fmt}_ms_per_iter"] = round(per_iter * 1e3, 3)
                    info[f"{fmt}_fixed_ms"] = round(fixed * 1e3, 2)
            except Exception as e:
                info[f"{fmt}_error"] = repr(e)[:200]

    # ---- mat10000 at the REFERENCE protocol: maxit=2000, tol=1e-6 in true
    # f64 residual terms (example.cpp:179-180; VERDICT r2 next-round #5) —
    # f32 inner solves + f64 host residual correction between restarts,
    # through ONE prepared solver (no per-restart re-setup)
    if backend == "tpu":
        try:
            cfg6 = SolverConfig(maxit=2000, tol=1e-4, dtype="float32",
                                precond="ilu0_neumann", neumann_terms=3)
            ps6 = make_solver(a, cfg6)
            ps6.solve(b)                                   # compile
            rr = _median_refined(a, b, cfg6.replace(tol=1e-6), 1e-4, ps6)
            info.update(
                mat10000_refined_rel_residual=float(rr.residual
                                                    / rr.residual0),
                mat10000_refined_ms=round(rr.dt_alg * 1e3, 2),
                mat10000_refined_iters=rr.iters,
                mat10000_refined_status=rr.status.name)
        except Exception as e:
            info["mat10000_refined_error"] = repr(e)[:200]

    # ---- solve-level headline: 1M-row Neumann solve + refined to 1e-6 -----
    # (VERDICT r1 #6: track e2e solve regressions, not just SpMV; refined
    # demonstrates the reference tolerance — 1e-6 in *true f64 residual*
    # terms, example.cpp:180 — at f32 device speed)
    a1 = b1 = cfg1 = None
    if backend == "tpu":
        try:
            from cuda_mat_tpu.models.problems import grid_laplacian

            a1 = grid_laplacian(10000, 100)     # 1M rows, narrow band
            b1 = np.ones(a1.n)
            cfg1 = SolverConfig(maxit=2000, tol=1e-4, dtype="float32",
                                precond="ilu0_neumann", neumann_terms=3)
            ps1 = make_solver(a1, cfg1)
            r1m = _median_solve(ps1, b1)
            info.update(solve_1m_ms=round(r1m.dt_alg * 1e3, 1),
                        solve_1m_iters=r1m.iters,
                        solve_1m_status=r1m.status.name)
            # drift-proof per-iteration number for the 1M arm (dtAlg there
            # rides a ~60 ms fixed tunnel term that drifts 63-75 ms across
            # clean runs; ~90 forced iterations put ~40 ms of signal above
            # the floor)
            per1, fix1, its1 = _calibrated_per_iter(make_solver, a1, b1,
                                                    cfg1, 10, 100)
            info["solve_1m_calib_iters"] = list(its1)
            if per1 is not None:
                info.update(solve_1m_ms_per_iter=round(per1 * 1e3, 3),
                            solve_1m_fixed_ms=round(fix1 * 1e3, 2))
            rref = _median_refined(a1, b1, cfg1.replace(tol=1e-6), 1e-4, ps1)
            info.update(refined_rel_residual=float(rref.residual
                                                   / rref.residual0),
                        refined_ms=round(rref.dt_alg * 1e3, 1),
                        refined_status=rref.status.name)
        except Exception as e:
            info["solve_1m_error"] = repr(e)[:200]

        # ---- 10M-row flagship solve: stencil matvec + one-launch fused
        # Neumann msolve (k=4) + branch-free loop body (the headline e2e
        # number; r2 650 ms -> r3 260-266 -> r4 211 ms with MILU)
        a10 = b10 = cfg10 = None
        try:
            a10 = grid_laplacian(100000, 100)
            b10 = np.ones(a10.n)
            cfg10 = SolverConfig(maxit=2000, tol=1e-4, dtype="float32",
                                 precond="ilu0_neumann", neumann_terms=4)
            ps10 = make_solver(a10, cfg10)
            r10 = _median_solve(ps10, b10)
            info.update(solve_10m_ms=round(r10.dt_alg * 1e3, 1),
                        solve_10m_iters=r10.iters,
                        solve_10m_status=r10.status.name)
            # flagship scale at the REFERENCE protocol (example.cpp:179-180:
            # maxit=2000, tol=1e-6) in true-f64-residual terms — f32 inner
            # solves + f64 host residual restarts, shared prepared solver
            rr10 = _median_refined(a10, b10, cfg10.replace(tol=1e-6), 1e-4,
                                   ps10)
            info.update(
                solve_10m_refined_rel_residual=float(rr10.residual
                                                     / rr10.residual0),
                solve_10m_refined_ms=round(rr10.dt_alg * 1e3, 1),
                solve_10m_refined_iters=rr10.iters,
                solve_10m_refined_status=rr10.status.name)
            # relaxed-MILU arm (beyond-reference preconditioner option; the
            # flagship): same compiled graph as cfg10 — only the factor
            # values change.  omega=0.96 is the 10M-scale optimum (r5
            # bracketed sweep 0.95-0.98 -> 51/48/52/55 iters; r4's 0.97 was
            # the 100k-row optimum — the sweet spot drifts down with scale)
            cfg10m = cfg10.replace(milu_omega=0.96)
            ps10m = make_solver(a10, cfg10m)
            r10m = _median_solve(ps10m, b10)
            info.update(solve_10m_milu_ms=round(r10m.dt_alg * 1e3, 1),
                        solve_10m_milu_iters=r10m.iters,
                        solve_10m_milu_status=r10m.status.name)
            # the reference-protocol (tol=1e-6 true-f64) headline with the
            # MILU factors: fewer inner iterations per restart
            rrm = _median_refined(a10, b10, cfg10m.replace(tol=1e-6), 1e-4,
                                  ps10m)
            info.update(
                solve_10m_milu_refined_rel_residual=float(
                    rrm.residual / rrm.residual0),
                solve_10m_milu_refined_ms=round(rrm.dt_alg * 1e3, 1),
                solve_10m_milu_refined_iters=rrm.iters,
                solve_10m_milu_refined_status=rrm.status.name)
        except Exception as e:
            info["solve_10m_error"] = repr(e)[:200]

        # ---- distributed flagship on a mesh(1): the gap-strided stencil
        # engine + fused Neumann msolve through shard_map/ppermute/psum
        # (the multi-chip production config, executed on the one real chip —
        # at parity with the single-chip path per iteration, BASELINE.md r4)
        try:
            from cuda_mat_tpu.parallel.mesh import make_mesh
            from cuda_mat_tpu.parallel.dist_solver import make_dist_bicgstab
            from cuda_mat_tpu.solvers.refine import solve_refined

            mesh1 = make_mesh(1)
            if a1 is not None:
                dsolver = make_dist_bicgstab(a1, mesh1, cfg1,
                                             local_engine="stencil")
                rd = _median_solve(dsolver, b1)
                info.update(dist_stencil_1m_ms=round(rd.dt_alg * 1e3, 1),
                            dist_stencil_1m_iters=rd.iters,
                            dist_stencil_1m_status=rd.status.name)
            # flagship 10M-row scale through the distributed engine with the
            # round-4 flagship MILU factors (VERDICT r4 #5: the dist bench
            # arm must carry the production preconditioner, not just prose)
            if a10 is not None:
                dsolver10 = make_dist_bicgstab(
                    a10, mesh1, cfg10.replace(milu_omega=0.96),
                    local_engine="stencil")
                rd10 = _median_solve(dsolver10, b10)
                info.update(dist_stencil_10m_milu_ms=round(rd10.dt_alg * 1e3,
                                                           1),
                            dist_stencil_10m_milu_iters=rd10.iters,
                            dist_stencil_10m_milu_status=rd10.status.name)
                # the reference 1e-6 contract THROUGH the distributed engine
                # (VERDICT r4 missing #1 / next #2): f32 dist inner solves +
                # f64 host restarts, reusing the compiled dist solver
                rdr = _median_refined(a10, b10,
                                      cfg10.replace(milu_omega=0.96,
                                                    tol=1e-6),
                                      1e-4, dsolver10)
                info.update(
                    dist_10m_refined_rel_residual=float(rdr.residual
                                                        / rdr.residual0),
                    dist_10m_refined_ms=round(rdr.dt_alg * 1e3, 1),
                    dist_10m_refined_iters=rdr.iters,
                    dist_10m_refined_status=rdr.status.name)
        except Exception as e:
            info["dist_stencil_error"] = repr(e)[:200]

    print(json.dumps(info), file=sys.stderr)
    out = {
        "metric": "spmv_gbps_per_chip",
        "value": round(spmv_gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(spmv_gbps / roofline_gbps, 4),
    }
    # solve-level metrics ride in the same line so the driver records them
    for k in ("lock_clean", "stencil_nnz_per_s", "stencil_vs_dia",
              "solve_1m_ms", "solve_1m_ms_per_iter",
              "solve_10m_ms", "solve_10m_milu_ms",
              "solve_10m_milu_refined_rel_residual",
              "solve_10m_milu_refined_ms",
              "solve_10m_refined_rel_residual",
              "solve_10m_refined_ms", "refined_rel_residual", "refined_ms",
              "mat10000_dt_alg_ms", "mat10000_ms_per_iter",
              "mat10000_fixed_ms", "mat10000_refined_rel_residual",
              "mat10000_refined_ms", "mat900_dt_alg_ms",
              "bell_ms_per_iter", "dense_ms_per_iter",
              "bell_matvec_us", "dense_matvec_us",
              "dist_stencil_1m_ms", "dist_stencil_10m_milu_ms",
              "dist_10m_refined_rel_residual", "dist_10m_refined_ms"):
        if k in info:
            out[k] = info[k]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
