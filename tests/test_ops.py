"""Device operator tests: every SpMV formulation vs the numpy oracle
(SURVEY §4 implication 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_mat_tpu.formats.csr import CSRMatrix
from cuda_mat_tpu.models.problems import banded_laplacian, gen_rand_csr_matrix
from cuda_mat_tpu.ops.operators import (CSROperator, DIAOperator, DenseOperator,
                                        ELLOperator, SplitOperator,
                                        make_operator)


@pytest.fixture(scope="module")
def rand_csr():
    return gen_rand_csr_matrix(60, 60, probability_of_zero=0.85, vmin=-3.0,
                               vmax=3.0, seed=11)


@pytest.mark.parametrize("fmt", ["csr", "ell", "dense"])
def test_spmv_formats_random(rand_csr, fmt, rng):
    op = make_operator(rand_csr, dtype=jnp.float64, format=fmt)
    x = rng.standard_normal(60)
    y = jax.jit(lambda o, xx: o.matvec(xx))(op, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), rand_csr.matvec(x), rtol=1e-13, atol=1e-12)


@pytest.mark.parametrize("fmt", ["csr", "ell", "dia", "dense"])
def test_spmv_formats_banded(fmt, rng):
    a = banded_laplacian(12)
    op = make_operator(a, dtype=jnp.float64, format=fmt)
    x = rng.standard_normal(144)
    y = jax.jit(lambda o, xx: o.matvec(xx))(op, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), a.matvec(x), rtol=1e-13, atol=1e-12)


def test_auto_format_selection(rand_csr, mat10000):
    assert isinstance(make_operator(mat10000), DIAOperator)
    op = make_operator(rand_csr)
    assert isinstance(op, (ELLOperator, CSROperator))


def test_split_operator(mat3, mat3_a0, vec3_d, rng):
    base = make_operator(mat3_a0, format="csr")
    op = SplitOperator(base, jnp.asarray(vec3_d))
    x = rng.standard_normal(3)
    np.testing.assert_allclose(np.asarray(op.matvec(jnp.asarray(x))),
                               mat3.matvec(x), rtol=1e-13, atol=1e-12)


def test_operators_are_pytrees(rand_csr):
    op = make_operator(rand_csr, format="ell")
    leaves = jax.tree_util.tree_leaves(op)
    assert len(leaves) == 2
    # jit must treat the operator as an argument without error
    f = jax.jit(lambda o: o.matvec(jnp.ones(60)))
    f(op)


def test_mat10000_spmv(mat10000, rng):
    x = rng.standard_normal(10000)
    for fmt in ("dia", "ell", "csr"):
        op = make_operator(mat10000, format=fmt)
        y = np.asarray(op.matvec(jnp.asarray(x)))
        np.testing.assert_allclose(y, mat10000.matvec(x), rtol=1e-12)
