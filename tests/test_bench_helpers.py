"""bench.py helper functions (they produce the driver artifact — the
medians, the maxit-differencing calibration, and the concurrency lock
must keep working on the CPU backend too)."""

import os

import numpy as np

import bench as bench_mod
from bench import _acquire_lock, _calibrated_per_iter, _median_solve
from cuda_mat_tpu.config import SolverConfig
from cuda_mat_tpu.solvers.bicgstab import make_solver


def test_median_solve_returns_median(mat900):
    ps = make_solver(mat900, SolverConfig(maxit=2000, tol=1e-6,
                                          precond="ilu0"))
    res = _median_solve(ps, np.ones(mat900.n), reps=3)
    assert res.converged
    assert res.dt_alg > 0


def test_calibrated_per_iter_positive(mat900):
    cfg = SolverConfig(maxit=2000, tol=1e-6, precond="ilu0")
    per_iter, fixed, its = _calibrated_per_iter(
        make_solver, mat900, np.ones(mat900.n), cfg, 5, 50)
    # tol=0 forces the caps exactly (f64 does not NaN in 50 iters here)
    assert its == (5, 50)
    assert per_iter is not None and per_iter > 0


def test_acquire_lock_stale_and_contended(tmp_path, monkeypatch):
    lock = tmp_path / "bench.lock"
    monkeypatch.setattr(bench_mod, "_LOCK", str(lock))
    # stale lock (dead pid) is reclaimed
    lock.write_text("999999999")
    assert _acquire_lock() is True
    assert int(lock.read_text()) == os.getpid()
    # own pid counts as clean (re-entry)
    assert _acquire_lock() is True
    # a live foreign pid reports contention (pid 1 is always alive)
    lock.write_text("1")
    assert _acquire_lock() is False
