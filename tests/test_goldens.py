"""Checked-in trajectory goldens (SURVEY §4 / ROADMAP).

Two layers of pinning:

1. Oracle stability — regenerating each oracle trajectory must match the
   checked-in golden *bitwise* (same machine ops in the same order; guards
   the numpy oracles in reference/cpu_solvers.py against accidental edits).
2. Solver parity — the jitted f64 solvers must reproduce the golden
   iteration count and solution (the reference-trajectory criterion of
   BASELINE.md).

Regenerate with ``python tests/make_goldens.py`` after an *intentional*
oracle change.
"""

import os

import numpy as np
import pytest

from cuda_mat_tpu.config import SolverConfig
from cuda_mat_tpu.reference.cpu_solvers import (bicg_cpu, bicgstab_hform_cpu,
                                                bicgstab_ilu_cpu,
                                                bicgstab_split_cpu)
from cuda_mat_tpu.solvers.bicgstab import bicgstab, bicgstab_lu_precond

GOLDENS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


def _load(name):
    return np.load(os.path.join(GOLDENS, f"{name}.npz"))


def _assert_bitwise(r, g):
    assert int(r.iters) == int(g["iters"])
    assert bool(r.converged) == bool(g["converged"])
    np.testing.assert_array_equal(np.asarray(r.residual_history,
                                             dtype=np.float64), g["history"])
    np.testing.assert_array_equal(np.asarray(r.x, dtype=np.float64), g["x"])


def test_oracle_mat3_hform_bitwise(mat3, vec3):
    _assert_bitwise(bicgstab_hform_cpu(mat3, vec3, maxit=200, tol=1e-5),
                    _load("mat3_hform"))


def test_oracle_mat3_split_bitwise(mat3_a0, vec3_d, vec3):
    _assert_bitwise(
        bicgstab_split_cpu(mat3_a0, vec3_d, np.ones(3), vec3, maxit=2000,
                           tol=1e-5), _load("mat3_split"))


def test_oracle_mat900_ilu_bitwise(mat900):
    _assert_bitwise(bicgstab_ilu_cpu(mat900, np.ones(900)),
                    _load("mat900_ilu"))


def test_oracle_mat900_hform_bitwise(mat900):
    _assert_bitwise(bicgstab_hform_cpu(mat900, np.ones(900)),
                    _load("mat900_hform"))


def test_oracle_mat900_bicg_bitwise(mat900):
    _assert_bitwise(bicg_cpu(mat900, np.ones(900)), _load("mat900_bicg"))


def test_oracle_mat10000_ilu_bitwise(mat10000):
    _assert_bitwise(bicgstab_ilu_cpu(mat10000, np.ones(10000)),
                    _load("mat10000_ilu"))


def test_solver_matches_golden_mat3(mat3, vec3):
    g = _load("mat3_hform")
    r = bicgstab(mat3, vec3, SolverConfig(maxit=200, tol=1e-5))
    assert r.converged and r.iters == int(g["iters"])
    np.testing.assert_allclose(r.x, g["x"], rtol=1e-10, atol=1e-12)
    # reference demo anchor: x = [7/6, 17/3, -23/6]
    np.testing.assert_allclose(r.x, [7 / 6, 17 / 3, -23 / 6], rtol=1e-9)


def test_solver_matches_golden_mat900_ilu(mat900):
    g = _load("mat900_ilu")
    r = bicgstab_lu_precond(mat900, np.ones(900),
                            SolverConfig(maxit=2000, tol=1e-6))
    assert r.converged
    assert abs(r.iters - int(g["iters"])) <= 2  # f64 jit vs numpy fp order
    np.testing.assert_allclose(r.x, g["x"], rtol=1e-5, atol=1e-7)
