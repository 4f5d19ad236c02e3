"""Truncated Neumann-series ILU(0) application (the bandwidth-optimal TPU
alternative to triangular sweeps — SURVEY §7 'Jacobi-iteration approximation')."""

import numpy as np
import jax.numpy as jnp
import pytest

from cuda_mat_tpu.config import SolverConfig
from cuda_mat_tpu.precond.preconditioners import (ILU0Preconditioner,
                                                  NeumannILUPreconditioner)
from cuda_mat_tpu.reference.cpu_solvers import (ilu0_factorize,
                                                solve_lower_unit, solve_upper)
from cuda_mat_tpu.solvers.bicgstab import solve


def test_series_converges_to_exact_trisolve(mat900, rng):
    """As k grows, the truncated series application approaches the exact
    L/U solves (the factors of the Laplacian are strongly diagonally
    dominant, so rho(N) << 1)."""
    m = ilu0_factorize(mat900)
    f = rng.standard_normal(900)
    exact = solve_upper(mat900, m, solve_lower_unit(mat900, m, f))
    errs = []
    for k in (2, 4, 8, 16):
        pre = NeumannILUPreconditioner.from_csr(mat900, dtype=jnp.float64,
                                                terms=k)
        approx = np.asarray(pre.msolve(jnp.asarray(f)))
        errs.append(np.linalg.norm(approx - exact) / np.linalg.norm(exact))
    assert errs[0] < 0.5
    assert all(b < a for a, b in zip(errs, errs[1:]))  # monotone improvement
    # the factors' iteration matrix has rho ~ 0.6 on this fixture, so 16
    # terms land around 6e-4 — plenty for a preconditioner
    assert errs[-1] < 1e-2


def test_terms_one_is_jacobi_on_the_factor(mat900, rng):
    """k=1 keeps only the j=0 term: msolve(f) = D^-1 f."""
    m = ilu0_factorize(mat900)
    pre = NeumannILUPreconditioner.from_csr(mat900, dtype=jnp.float64, terms=1)
    f = rng.standard_normal(900)
    got = np.asarray(pre.msolve(jnp.asarray(f)))
    np.testing.assert_allclose(got, np.asarray(pre.inv_d) * f, rtol=1e-12)


@pytest.mark.parametrize("terms,max_extra", [(2, 30), (3, 15), (5, 8)])
def test_neumann_solve_converges(mat900, rng, terms, max_extra):
    """The preconditioned solve converges; more terms → closer to the exact
    ILU(0) iteration count."""
    b = rng.uniform(1.0, 5.0, 900)
    exact = solve(mat900, b, SolverConfig(maxit=2000, tol=1e-6,
                                          precond="ilu0", trisolve_block=64))
    res = solve(mat900, b, SolverConfig(maxit=2000, tol=1e-6,
                                        precond="ilu0_neumann",
                                        neumann_terms=terms))
    assert res.converged
    assert res.iters <= exact.iters + max_extra
    rel = np.linalg.norm(b - mat900.matvec(res.x)) / np.linalg.norm(b)
    assert rel < 1e-5


def test_neumann_cli(capsys):
    from cuda_mat_tpu.cli import main

    rc = main(["-M", "data/mat900.mtx", "--precond", "ilu0_neumann",
               "--neumann-terms", "4", "--platform", "cpu", "--x64"])
    assert rc == 0
    assert "iterations" in capsys.readouterr().out


def test_neumann_padded_layout_matches_unpadded(mat900, rng):
    """pad_like: N_l/N_u built in the Pallas padded layout produce the same
    msolve as the plain-operator form (pads stay zero through every term)."""
    import jax.numpy as jnp
    from cuda_mat_tpu.ops.pallas_spmv import PallasDIAOperator

    pad_op = PallasDIAOperator.from_dia(mat900.to_dia(), dtype=jnp.float64,
                                        block=1024, interpret=True)
    pre_pad = NeumannILUPreconditioner.from_csr(mat900, dtype=jnp.float64,
                                                terms=4, pad_like=pad_op)
    pre = NeumannILUPreconditioner.from_csr(mat900, dtype=jnp.float64,
                                            terms=4)
    f = rng.standard_normal(900)
    got = np.asarray(pad_op.unpad_vec(pre_pad.msolve(pad_op.pad_vec(f))))
    want = np.asarray(pre.msolve(jnp.asarray(f)))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
    # pads remain exactly zero
    out = np.asarray(pre_pad.msolve(pad_op.pad_vec(f)))
    assert np.all(out[:pad_op.block] == 0) and np.all(out[pad_op.block + 900:] == 0)
