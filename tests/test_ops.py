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


def test_bell_operator_matches_csr(rng):
    """Blocked-ELL (BSR-padded) matvec == scalar CSR matvec on an
    unstructured random matrix (incl. n not a multiple of the block)."""
    import jax.numpy as jnp
    import numpy as np
    from cuda_mat_tpu.models.problems import random_diag_nonzero_system
    from cuda_mat_tpu.ops.operators import BELLOperator

    a, _ = random_diag_nonzero_system(300, prob_of_zero=0.97, seed=7)
    op = BELLOperator.from_csr(a, bs=64, dtype=jnp.float64)
    x = rng.standard_normal(a.n)
    np.testing.assert_allclose(np.asarray(op.matvec(jnp.asarray(x))),
                               a.matvec(x), rtol=1e-10, atol=1e-10)


def test_bell_block_structured_solve(rng):
    """Block-diagonal-dominant system through the generic solver with the
    BELL operator format."""
    import numpy as np
    from cuda_mat_tpu.config import SolverConfig
    from cuda_mat_tpu.formats.csr import CSRMatrix
    from cuda_mat_tpu.solvers.bicgstab import bicgstab

    n, bs = 256, 32
    d = np.zeros((n, n))
    for i in range(0, n, bs):
        blk = rng.standard_normal((bs, bs)) * 0.1
        d[i:i + bs, i:i + bs] = blk + np.eye(bs) * 4
    a = CSRMatrix.from_dense(d)
    b = rng.uniform(1.0, 5.0, n)
    res = bicgstab(a, b, SolverConfig(maxit=500, tol=1e-10), format="bell")
    assert res.converged
    assert np.linalg.norm(b - a.matvec(res.x)) / np.linalg.norm(b) < 1e-8


def test_factory_prefers_bell_on_tpu_for_blocky(monkeypatch):
    """The TPU heuristic picks BELL when nnz cluster into few 128x128 blocks,
    and dense when they don't (small n) — exercised by faking the backend."""
    import jax
    import numpy as np
    from cuda_mat_tpu.formats.csr import CSRMatrix
    from cuda_mat_tpu.ops import operators as ops

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    rng = np.random.default_rng(11)
    # blocky: nonzeros confined to the block diagonal of a 16-block grid
    n, bs = 2048, 128
    d = np.zeros((n, n))
    for i in range(0, n, bs):
        d[i:i + bs, i:i + bs] = rng.standard_normal((bs, bs))
    blocky = ops.make_operator(CSRMatrix.from_dense(d), dtype=np.float64)
    assert isinstance(blocky, ops.BELLOperator)
    # scattered: uniform random fill touches nearly every block -> dense
    d2 = np.where(rng.random((512, 512)) > 0.99,
                  rng.standard_normal((512, 512)), 0.0) + np.eye(512)
    dense = ops.make_operator(CSRMatrix.from_dense(d2), dtype=np.float64)
    assert isinstance(dense, ops.DenseOperator)
