"""Pallas DIA kernel tests (interpret mode on CPU; the real compile path is
exercised on TPU by bench.py and the verify drive)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cuda_mat_tpu.models.problems import banded_laplacian_dia
from cuda_mat_tpu.ops.pallas_spmv import PallasDIAOperator


@pytest.fixture(scope="module")
def op_and_dia():
    dia = banded_laplacian_dia(20, dtype=np.float32)  # n=400, w=20
    op = PallasDIAOperator.from_dia(dia, block=1024, interpret=True)
    return op, dia


def test_matvec_matches_oracle(op_and_dia, rng):
    op, dia = op_and_dia
    x = rng.standard_normal(dia.n).astype(np.float32)
    y = np.asarray(op.unpad_vec(op.matvec(op.pad_vec(jnp.asarray(x)))))
    y_ref = dia.matvec(x.astype(np.float64))
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5)


def test_padding_is_invariant(op_and_dia, rng):
    """Pad blocks must stay exactly zero through matvec (the property that
    lets the whole solver loop run in padded space)."""
    op, dia = op_and_dia
    x = rng.standard_normal(dia.n).astype(np.float32)
    yp = op.matvec(op.pad_vec(jnp.asarray(x)))
    b = op.block
    assert float(jnp.abs(yp[:b]).max()) == 0.0
    assert float(jnp.abs(yp[b + op.npad:]).max()) == 0.0
    # rows beyond n within npad stay zero too (data rows are zero there)
    assert float(jnp.abs(yp[b + op.n: b + op.npad]).max()) == 0.0


def test_chains_without_repacking(op_and_dia, rng):
    op, dia = op_and_dia
    x = rng.standard_normal(dia.n).astype(np.float32)
    yp = op.matvec(op.matvec(op.pad_vec(jnp.asarray(x))))
    y2_ref = dia.matvec(dia.matvec(x.astype(np.float64)))
    np.testing.assert_allclose(np.asarray(op.unpad_vec(yp)), y2_ref,
                               rtol=1e-4, atol=1e-3)


def test_n_not_multiple_of_block(rng):
    dia = banded_laplacian_dia(33, dtype=np.float32)  # n=1089
    op = PallasDIAOperator.from_dia(dia, block=1024, interpret=True)
    assert op.npad == 2048
    x = rng.standard_normal(dia.n).astype(np.float32)
    y = np.asarray(op.unpad_vec(op.matvec(op.pad_vec(jnp.asarray(x)))))
    np.testing.assert_allclose(y, dia.matvec(x.astype(np.float64)),
                               rtol=1e-5, atol=1e-4)


def test_block_grows_to_fit_bandwidth():
    dia = banded_laplacian_dia(60, dtype=np.float32)  # w=60 > tiny block
    op = PallasDIAOperator.from_dia(dia, block=1024, interpret=True)
    assert op.block >= 60


def test_solver_runs_on_pallas_operator(rng):
    """The jitted BiCGSTAB loop must run entirely in padded space."""
    from cuda_mat_tpu.solvers.bicgstab import hform_core
    import jax

    dia = banded_laplacian_dia(16, dtype=np.float32)
    op = PallasDIAOperator.from_dia(dia, block=1024, interpret=True)
    b = op.pad_vec(jnp.ones(dia.n, jnp.float32))
    x0 = op.pad_vec(jnp.ones(dia.n, jnp.float32))
    x, status, iters, nrmr, nrmr0, hist = hform_core(
        op.matvec, jnp.dot, x0, b, jnp.float32(1e-4), jnp.float32(1e-5), 200)
    assert int(status) == 1
    xs = np.asarray(op.unpad_vec(x))
    from cuda_mat_tpu.models.problems import banded_laplacian

    a = banded_laplacian(16)
    r = np.linalg.norm(np.ones(256) - a.matvec(xs.astype(np.float64)))
    assert r / np.sqrt(256) < 1e-2
