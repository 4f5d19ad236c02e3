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


# ---------------------------------------------------------------------------
# Constant-coefficient 1-D masked kernel (ConstStencilOperator)
# ---------------------------------------------------------------------------

from cuda_mat_tpu.ops.pallas_stencil import (  # noqa: E402
    ConstStencilOperator, detect_const_stencil)


def test_detect_const_stencil_laplacian():
    dia = banded_laplacian(30).to_dia()
    det = detect_const_stencil(dia)
    assert det is not None
    c, terms = det
    assert c == 30
    assert {(off, dc) for off, dc, _ in terms} == {
        (-30, 0), (-1, -1), (0, 0), (1, 1), (30, 0)}
    assert {s for *_, s in terms} == {-1.0, 4.0}


def test_detect_const_stencil_ninepoint():
    from cuda_mat_tpu.models.problems import laplacian_2d

    dia = laplacian_2d(12).to_dia()
    det = detect_const_stencil(dia)
    assert det is not None
    c, terms = det
    assert c == 12 and len(terms) == 9
    assert {(off, dc) for off, dc, _ in terms} == {
        (-13, -1), (-12, 0), (-11, 1), (-1, -1), (0, 0), (1, 1),
        (11, -1), (12, 0), (13, 1)}


def test_detect_const_stencil_rejects_variable():
    dia = banded_laplacian(20).to_dia()
    dia.data[2, 7] = 5.0  # one interior diagonal entry off-constant
    assert detect_const_stencil(dia) is None


def test_detect_const_stencil_rejects_tridiagonal():
    # pure within-row band: no row-step offset, nothing to gain over DIA
    from cuda_mat_tpu.formats.coo import COOMatrix
    from cuda_mat_tpu.formats.csr import CSRMatrix

    n = 64
    i = np.arange(n)
    coo = COOMatrix(n, n, np.concatenate([i, i[1:], i[:-1]]),
                    np.concatenate([i, i[1:] - 1, i[:-1] + 1]),
                    np.concatenate([np.full(n, 2.0), np.full(n - 1, -1.0),
                                    np.full(n - 1, -1.0)]))
    assert detect_const_stencil(CSRMatrix.from_coo(coo).to_dia()) is None


@pytest.mark.parametrize("fixture", ["banded_laplacian", "laplacian_2d",
                                     "rect"])
def test_const_stencil_matches_csr(fixture, rng):
    from cuda_mat_tpu.models.problems import laplacian_2d

    if fixture == "banded_laplacian":
        a = banded_laplacian(30)
    elif fixture == "laplacian_2d":
        a = laplacian_2d(20)
    else:
        a = _lap_grid(40, 25)   # rectangular grid
    op = ConstStencilOperator.from_dia(a.to_dia(), dtype=jnp.float64,
                                       block_target=2048, interpret=True)
    x = rng.standard_normal(a.n)
    y = np.asarray(op.unpad_vec(op.matvec(op.pad_vec(x))))
    np.testing.assert_allclose(y, a.matvec(x), rtol=1e-12, atol=1e-12)
    assert op.nnz == a.nnz


def test_const_stencil_pad_fixed_point(rng):
    a = banded_laplacian(30)
    op = ConstStencilOperator.from_dia(a.to_dia(), dtype=jnp.float64,
                                       block_target=2048, interpret=True)
    xp = op.pad_vec(rng.standard_normal(a.n))
    yp = np.asarray(op.matvec(xp))
    # every non-true-cell position (side pads, gap cells, tail) must be an
    # exact zero so padded vectors are a fixed point of the iteration
    true_cells = np.asarray(op.pad_vec(np.ones(a.n))) != 0.0
    assert np.all(yp[~true_cells] == 0.0)


def test_const_stencil_e2e_solve_matches_plain(rng):
    """solve() with format='stencil' reproduces the default-format result on
    the mat10000 pattern (ILU(0), the reference CLI default)."""
    from cuda_mat_tpu.config import SolverConfig
    from cuda_mat_tpu.solvers.bicgstab import solve

    a = banded_laplacian(30)
    b = rng.uniform(1.0, 5.0, a.n)
    cfg = SolverConfig(maxit=2000, tol=1e-8, dtype="float64", precond="ilu0",
                       trisolve_block=64)
    r_plain = solve(a, b, cfg)
    r_sten = solve(a, b, cfg, format="stencil")
    assert r_sten.status.name == r_plain.status.name == "CONVERGED"
    assert r_sten.iters == r_plain.iters
    np.testing.assert_allclose(r_sten.x, r_plain.x, rtol=1e-9, atol=1e-12)


def test_const_stencil_e2e_neumann(rng):
    """ilu0_neumann builds its factors in the stencil operator's padded
    layout (pad_like interop) and matches the unpadded result."""
    from cuda_mat_tpu.config import SolverConfig
    from cuda_mat_tpu.solvers.bicgstab import solve

    a = banded_laplacian(30)
    b = rng.uniform(1.0, 5.0, a.n)
    cfg = SolverConfig(maxit=2000, tol=1e-8, dtype="float64",
                       precond="ilu0_neumann", neumann_terms=3)
    r_sten = solve(a, b, cfg, format="stencil")
    r_dia = solve(a, b, cfg, format="dia")
    assert r_sten.status.name == "CONVERGED"
    assert r_sten.iters == r_dia.iters
    np.testing.assert_allclose(r_sten.x, r_dia.x, rtol=1e-9, atol=1e-12)


def test_format_stencil_rejects_nonstencil():
    from cuda_mat_tpu.config import SolverConfig
    from cuda_mat_tpu.models.problems import random_diag_nonzero_system
    from cuda_mat_tpu.solvers.bicgstab import solve

    a, b = random_diag_nonzero_system(50, prob_of_zero=0.9)
    with pytest.raises(ValueError):
        solve(a, b, SolverConfig(precond="none"), format="stencil")


def test_matvec_dots_matches_separate(rng):
    """The fused dot-epilogue kernel returns the same y as matvec and dots
    equal to jnp.dot within reduction-order tolerance (lane partials)."""
    import jax.numpy as jnp

    from cuda_mat_tpu.models.problems import grid_laplacian
    from cuda_mat_tpu.ops.pallas_stencil import ConstStencilOperator

    a = grid_laplacian(40, 12)
    op = ConstStencilOperator.from_dia(a.to_dia(max_diags=16),
                                       dtype=jnp.float64, interpret=True)
    x = op.pad_vec(rng.standard_normal(a.n))
    w = op.pad_vec(rng.standard_normal(a.n))
    y_ref = op.matvec(x)
    y, dots = op.matvec_dots(x, (w,), with_self=True)
    assert np.array_equal(np.asarray(y), np.asarray(y_ref))
    np.testing.assert_allclose(
        np.asarray(dots),
        [float(jnp.dot(w, y_ref)), float(jnp.dot(y_ref, y_ref))],
        rtol=1e-12)


def test_fused_dots_solve_matches_plain(rng):
    """solve(fused_dots=True) (EXPERIMENTAL, off by default) tracks the
    plain-dot trajectory on the stencil path."""
    from cuda_mat_tpu.config import SolverConfig
    from cuda_mat_tpu.solvers.bicgstab import solve

    a = banded_laplacian(30)
    b = rng.uniform(1.0, 5.0, a.n)
    cfg = SolverConfig(maxit=2000, tol=1e-8, dtype="float64",
                       precond="ilu0_neumann", neumann_terms=3)
    r_f = solve(a, b, cfg.replace(fused_dots=True), format="stencil")
    r_p = solve(a, b, cfg, format="stencil")
    assert r_f.status.name == "CONVERGED"
    assert abs(r_f.iters - r_p.iters) <= max(2, 0.15 * r_p.iters)
    np.testing.assert_allclose(r_f.x, r_p.x, rtol=1e-8, atol=1e-10)
