"""Blocked triangular solver vs the numpy sequential oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from cuda_mat_tpu.models.problems import banded_laplacian, gen_rand_csr_matrix
from cuda_mat_tpu.ops.trisolve import BlockTriangularSolver
from cuda_mat_tpu.reference.cpu_solvers import (ilu0_factorize,
                                                solve_lower_unit, solve_upper)
from cuda_mat_tpu.formats.csr import CSRMatrix


def _check(csr, block, rng, rtol=1e-9):
    m = ilu0_factorize(csr)
    tri = BlockTriangularSolver.from_factor(csr, m, block=block)
    f = rng.standard_normal(csr.n)
    y_ref = solve_lower_unit(csr, m, f)
    x_ref = solve_upper(csr, m, y_ref)
    y = np.asarray(tri.solve_lower(jnp.asarray(f)))
    np.testing.assert_allclose(y, y_ref, rtol=rtol, atol=1e-10)
    x = np.asarray(tri.msolve(jnp.asarray(f)))
    np.testing.assert_allclose(x, x_ref, rtol=rtol, atol=1e-10)


@pytest.mark.parametrize("block", [8, 16, 64])
def test_banded_blocks(block, rng):
    _check(banded_laplacian(12), block, rng)  # n=144, offsets ±1, ±12


def test_block_not_dividing_n(rng):
    _check(banded_laplacian(11), 32, rng)  # n=121, 121 % 32 != 0


def test_block_larger_than_n(rng):
    a = gen_rand_csr_matrix(20, 20, 0.5, 1.0, 3.0, seed=5)
    d = a.to_dense() + 30 * np.eye(20)
    _check(CSRMatrix.from_dense(d), 64, rng)


def test_general_sparse(rng):
    a = gen_rand_csr_matrix(100, 100, 0.9, 0.5, 2.0, seed=9)
    d = a.to_dense() + 50 * np.eye(100)
    _check(CSRMatrix.from_dense(d), 16, rng)


def test_mat900_msolve(mat900, rng):
    _check(mat900, 64, rng)
