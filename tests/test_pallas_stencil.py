"""2-D grid-stencil Pallas kernel vs the CSR matvec (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cuda_mat_tpu.models.problems import banded_laplacian
from cuda_mat_tpu.ops.pallas_stencil import StencilOperator2D
from cuda_mat_tpu.solvers.bicgstab import precond_core


def _lap_grid(r, c):
    """R×C-grid 5-point Laplacian as CSR (banded_laplacian generalized)."""
    from cuda_mat_tpu.formats.coo import COOMatrix
    from cuda_mat_tpu.formats.csr import CSRMatrix

    n = r * c
    idx = np.arange(n, dtype=np.int64)
    rows = [idx]; cols = [idx]; data = [np.full(n, 4.0)]
    left = idx[idx % c != 0]
    rows += [left, left - 1]; cols += [left - 1, left]
    data += [np.full(left.shape[0], -1.0)] * 2
    up = idx[idx >= c]
    rows += [up, up - c]; cols += [up - c, up]
    data += [np.full(up.shape[0], -1.0)] * 2
    return CSRMatrix.from_coo(COOMatrix(n, n, np.concatenate(rows),
                                        np.concatenate(cols),
                                        np.concatenate(data)))


@pytest.mark.parametrize("constant", [True, False])
@pytest.mark.parametrize("r,c,tr,tc", [
    (30, 30, 16, 16),     # mat900 grid, padded tiles (mask path)
    (32, 32, 16, 16),     # flush fit (no mask)
    (20, 50, 8, 32),      # rectangular + padding
])
def test_stencil_matches_csr(constant, r, c, tr, tc, rng):
    a = _lap_grid(r, c)
    op = StencilOperator2D.laplacian(r, c, dtype=jnp.float64, tr=tr, tc=tc,
                                     constant=constant, interpret=True)
    x = rng.standard_normal(r * c)
    y = np.asarray(op.unpad_vec(op.matvec(op.pad_vec(x))))
    np.testing.assert_allclose(y, a.matvec(x), rtol=1e-12, atol=1e-12)


def test_stencil_pad_is_fixed_point(rng):
    op = StencilOperator2D.laplacian(30, 30, dtype=jnp.float64, tr=16, tc=16,
                                     constant=True, interpret=True)
    xp = op.pad_vec(rng.standard_normal(900))
    yp = np.asarray(op.matvec(xp))
    g = yp.reshape(op.rp + 2 * op.tr, op.cp + 2 * op.tc)
    inner = g[op.tr: op.tr + op.r, op.tc: op.tc + op.c]
    assert np.count_nonzero(g) == np.count_nonzero(inner)  # pads all zero


def test_stencil_full_solve_matches_plain(rng):
    """Whole BiCGSTAB iteration on padded grids solves the 30×30 5-point
    Laplacian (banded_laplacian(30); NOT mat900 — GR_30_30 is a denser
    stencil)."""
    a = banded_laplacian(30)
    op = StencilOperator2D.laplacian(30, 30, dtype=jnp.float64, tr=16, tc=16,
                                     constant=True, interpret=True)
    b = rng.uniform(1.0, 5.0, 900)
    from cuda_mat_tpu.solvers.bicgstab import hform_core

    x, status, iters, *_ = hform_core(
        op.matvec, jnp.dot, op.pad_vec(np.ones(900)), op.pad_vec(b),
        jnp.float64(1e-8), jnp.float64(1e-5), 2000)
    assert int(status) == 1
    xs = np.asarray(op.unpad_vec(x))
    rel = np.linalg.norm(b - a.matvec(xs)) / np.linalg.norm(b)
    assert rel < 1e-7
