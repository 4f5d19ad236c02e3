"""Preconditioners as device pytrees with an ``msolve`` method.

The reference supports exactly one preconditioner — ILU(0) applied through
two cuSPARSE triangular solves (reference pbicgstab.cu:92-98,:356-363) — and
none for the other two entry points.  Here the preconditioner is a
first-class pluggable object; Jacobi is the cheap TPU-friendly option for
diagonally dominant systems, ILU(0) matches the reference path exactly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cuda_mat_tpu.ops.trisolve import BlockTriangularSolver
from cuda_mat_tpu.reference.cpu_solvers import ilu0_factorize


@dataclasses.dataclass(frozen=True)
class IdentityPreconditioner:
    """M = I (the unpreconditioned paths, reference pbicgstab.cu:425-754)."""

    def msolve(self, f: jax.Array) -> jax.Array:
        return f


jax.tree_util.register_dataclass(IdentityPreconditioner, data_fields=[],
                                 meta_fields=[])


@dataclasses.dataclass(frozen=True)
class JacobiPreconditioner:
    """M = diag(A): one multiply per application — bandwidth-trivial on TPU."""

    inv_diag: jax.Array

    @classmethod
    def from_csr(cls, csr, dtype=jnp.float64) -> "JacobiPreconditioner":
        d = csr.diagonal()
        if np.any(d == 0):
            raise ValueError("Jacobi preconditioner requires a nonzero diagonal")
        return cls(jnp.asarray(1.0 / d, dtype=dtype))

    def msolve(self, f: jax.Array) -> jax.Array:
        return self.inv_diag * f


jax.tree_util.register_dataclass(JacobiPreconditioner, data_fields=["inv_diag"],
                                 meta_fields=[])


@dataclasses.dataclass(frozen=True)
class ILU0Preconditioner:
    """ILU(0): zero-fill incomplete factors on A's pattern, applied with the
    blocked triangular solver (see :mod:`cuda_mat_tpu.ops.trisolve`).

    Factorization happens once at setup on the host (the reference also
    treats it as a one-time setup phase, timed separately at
    pbicgstab.cu:356-363); the native C++ factorizer is used when built.
    """

    tri: object  # BlockTriangularSolver | PallasBandedTriSolver

    @classmethod
    def from_csr(cls, csr, block: int = 256, dtype=jnp.float64,
                 engine: str = "auto",
                 milu_omega: float = 0.0) -> "ILU0Preconditioner":
        """``engine``: "blocked" = generic fori_loop solver; "pallas_banded" =
        single-launch Pallas kernel (banded factors only); "auto" = Pallas on
        a TPU backend when the band fits the block, else blocked.
        ``milu_omega``: relaxed modified-ILU(0) factor values
        (:func:`milu0_factorize`); 0 = reference-parity ILU(0)."""
        # Both trisolve engines precompute per-block inverses: O(n*B) floats.
        # Refuse configurations that would silently eat gigabytes at setup
        # (a 1M-row, B=1024 factor is ~8 GB of inverses and minutes of host
        # np.linalg.inv) — at that scale use Jacobi, solve_refined, or the
        # distributed block-Jacobi ILU(0).
        nb = -(-csr.n // block)
        w_bytes = 2 * nb * block * block * np.dtype(dtype).itemsize
        if w_bytes > (2 << 30):
            raise ValueError(
                f"ILU(0) blocked trisolve would precompute {w_bytes / 2**30:.1f}"
                f" GiB of block inverses (n={csr.n}, block={block}); use"
                f" precond='jacobi', solve_refined, or the distributed"
                f" bjacobi_ilu0 for systems this large")
        mvals = _factorize(csr, milu_omega)
        if engine == "auto":
            engine = "blocked"
            if jax.default_backend() == "tpu" and block <= 512:
                # block > 512 overflows VMEM in the Pallas sweep pipeline
                # (see pallas_trisolve.from_factor) — use the XLA blocked
                # solver for wide bands
                offs = csr.indices.astype(np.int64) - np.repeat(
                    np.arange(csr.n, dtype=np.int64), csr.row_lengths)
                if offs.size and max(-offs.min(), offs.max()) <= block:
                    engine = "pallas_banded"
        if engine == "pallas_banded":
            from cuda_mat_tpu.ops.pallas_trisolve import PallasBandedTriSolver

            return cls(PallasBandedTriSolver.from_factor(csr, mvals,
                                                         block=block,
                                                         dtype=dtype))
        return cls(BlockTriangularSolver.from_factor(csr, mvals, block=block,
                                                     dtype=dtype))

    def msolve(self, f: jax.Array) -> jax.Array:
        return self.tri.msolve(f)


jax.tree_util.register_dataclass(ILU0Preconditioner, data_fields=["tri"],
                                 meta_fields=[])


@dataclasses.dataclass(frozen=True)
class NeumannILUPreconditioner:
    """ILU(0) applied by a *truncated Neumann series* instead of triangular
    solves — the bandwidth-optimal TPU formulation for large n (the
    "Jacobi-iteration approximation" alternative named in SURVEY §7).

    With ``L = I + N_l`` (unit lower) and ``U = D(I + N_u)``,
    ``N_u = D⁻¹ · strict_upper``:

        L⁻¹ ≈ Σ_{j<k} (−N_l)ʲ        U⁻¹ ≈ (Σ_{j<k} (−N_u)ʲ) D⁻¹

    so one application is ``2(k−1)`` *banded SpMVs* — which run at HBM
    roofline — instead of sequential sweeps over O(n·B) block inverses
    (measured on the 1M-row narrow-band config: the exact blocked sweep moves
    2 GB of W data per application = 6.9 ms/iter; the k=3 series moves
    ~70 MB).  The preconditioner is approximate: iteration counts rise
    relative to exact ILU(0); convergence of the series needs
    ρ(N) < 1, which holds for the diagonally-dominant/M-matrix factors of
    the headline workloads.
    """

    nl: object       # strict-lower operator (any matvec pytree), or the
                     # fused series polynomial P_l when ``fused``; the whole
                     # M⁻¹ polynomial when ``fused == "mono"``
    nu: object       # D⁻¹·strict-upper operator / fused P_u / None (mono)
    inv_d: jax.Array
    terms: int       # static k (total series terms; k=1 degrades to Jacobi)
    fused: object = False  # static: False = sequential series;
                     # "series" = nl/nu are whole-series stencils (one launch
                     # per triangle); "kernel" = the whole msolve
                     # P_u·(inv_d ∘ P_l·x) runs as ONE Pallas launch with the
                     # intermediate held in VMEM scratch (bitwise-equal to
                     # "series", ~3 HBM passes instead of ~7); "mono" = nl is
                     # the single composed polynomial P_u·d*·P_l — msolve is
                     # ONE kernel launch (the diagonal is approximated by its
                     # interior constant too; measured +0 iterations at tol
                     # 1e-4 and 1e-8)
    gap_ext: object = None  # (block + 2·hpad,) extended gapmask ("kernel")
    fma_fits: bool = False  # static: the BLAS1-prologue kernel variant
                     # (msolve_fma) fits the scoped-VMEM budget — it holds
                     # three input streams + the p output on top of the
                     # plain kernel's working set

    @classmethod
    def from_csr(cls, csr, dtype=jnp.float32, terms: int = 3,
                 engine: str = "auto", pad_like=None,
                 const_factors: bool = True,
                 prefer_mono: bool = False,
                 milu_omega: float = 0.0) -> "NeumannILUPreconditioner":
        """``pad_like``: a :class:`PallasDIAOperator` for A — build N_l/N_u as
        Pallas operators in the *same padded layout*, so the whole msolve maps
        padded→padded vectors at kernel bandwidth (zero pads are a fixed point
        of every term).

        ``const_factors`` (stencil ``pad_like`` only): approximate each factor
        diagonal by its deep-interior fixed-point value and run N_l/N_u
        matrix-free through the same gap-strided kernel as A — the factor
        value streams (the dominant msolve traffic at 1M rows, inflated
        stride/C by restriding) vanish entirely.  The ILU recurrence of a
        constant stencil converges geometrically away from the boundary, so
        only a boundary layer (~3-5% of entries on the measured grids) is
        perturbed; this changes the *preconditioner*, not the system — the
        exact diagonal D stays a vector, convergence is still measured
        against A (VERDICT r2 next-round #6: 'exploit that the ILU(0) factor
        of a constant stencil is near-Toeplitz away from the boundary')."""
        from cuda_mat_tpu.ops.operators import make_operator

        low, up, diag = neumann_factors(csr, milu_omega)
        if pad_like is not None and hasattr(pad_like, "stride") \
                and const_factors:
            nl = _const_factor_operator(low, pad_like)
            nu = _const_factor_operator(up, pad_like)
            inv_d = pad_like.pad_vec(1.0 / diag)
            # fuse each triangular series into ONE whole-series stencil when
            # its polynomial offsets fit the operator's halo sub-block:
            # msolve then costs 2 kernel launches + 1 elementwise multiply
            fl = _fused_series_operator(nl, terms)
            fu = _fused_series_operator(nu, terms)
            if fl is not None and fu is not None:
                # ``prefer_mono``: additionally approximate D⁻¹ by its
                # interior constant and compose the whole M⁻¹ ≈ P_u·d*·P_l
                # into ONE polynomial stencil — msolve = one matrix-free
                # launch.  Largely superseded by the one-launch "kernel"
                # mode below, which matches mono's launch/collective count
                # while keeping the exact diagonal (BASELINE.md r3
                # "strictly dominates"); mono remains as an explicit
                # request and as the distributed fallback when the kernel's
                # wider halo does not fit the layout.
                if prefer_mono:
                    import dataclasses as _dc

                    from cuda_mat_tpu.ops.pallas_stencil import (
                        compose_stencil_terms, strided_offsets)

                    r = pad_like.n // pad_like.c_grid
                    d_star = float(diag[(r // 2) * pad_like.c_grid
                                        + pad_like.c_grid // 2])
                    try:
                        mt = compose_stencil_terms(
                            fu.terms,
                            tuple((o, d, v / d_star)
                                  for (o, d, v) in fl.terms),
                            pad_like.c_grid, pad_like.stride)
                        st = strided_offsets(mt, pad_like.c_grid,
                                             pad_like.stride)
                        if max(abs(s[0]) for s in st) <= pad_like.sub \
                                and _vmem_fits(pad_like, len(mt)):
                            mono = _dc.replace(pad_like, terms=mt,
                                               strided_terms=st)
                            return cls(mono, None, jnp.zeros(0, inv_d.dtype),
                                       terms, fused="mono")
                    except ValueError:
                        pass
                # one-launch fused msolve: requires the halo sub-block to
                # cover P_l's window over the extended u region and both
                # polynomials' VMEM working sets at once (layouts planned by
                # plan_const_neumann_layout default to this)
                from cuda_mat_tpu.ops.pallas_stencil import (
                    FMA3_MSOLVE_EXTRA_BUFS, MSOLVE_EXTRA_BUFS,
                    extend_gapmask, msolve_halo)

                hpad = msolve_halo(fu.strided_terms)
                h_l = max(abs(t[0]) for t in fl.strided_terms)
                if (h_l + hpad <= pad_like.sub and hpad <= pad_like.block
                        and _vmem_fits(pad_like,
                                       len(fl.terms) + len(fu.terms)
                                       + MSOLVE_EXTRA_BUFS)):
                    gap_ext = jnp.asarray(extend_gapmask(
                        np.asarray(pad_like.gapmask), hpad))
                    return cls(fl, fu, inv_d, terms, fused="kernel",
                               gap_ext=gap_ext,
                               fma_fits=_vmem_fits(
                                   pad_like,
                                   len(fl.terms) + len(fu.terms)
                                   + FMA3_MSOLVE_EXTRA_BUFS))
                return cls(fl, fu, inv_d, terms, fused="series")
            return cls(nl, nu, inv_d, terms)
        if pad_like is not None:
            from cuda_mat_tpu.ops.pallas_spmv import PallasDIAOperator

            low_d = low.to_dia(max_diags=128)
            up_d = up.to_dia(max_diags=128)
            if hasattr(pad_like, "stride"):
                # gap-strided ConstStencilOperator: re-index the factors into
                # the same strided coordinates; the restrided DIA data's zero
                # slots mask gaps/tail, so the fixed-point property holds
                from cuda_mat_tpu.ops.pallas_stencil import restride_dia

                low_d = restride_dia(low_d, pad_like.c_grid, pad_like.stride)
                up_d = restride_dia(up_d, pad_like.c_grid, pad_like.stride)
            nl = PallasDIAOperator.from_dia(low_d,
                                            dtype=dtype, block=pad_like.block,
                                            interpret=pad_like.interpret)
            nu = PallasDIAOperator.from_dia(up_d,
                                            dtype=dtype, block=pad_like.block,
                                            interpret=pad_like.interpret)
            if (nl.npad, nl.block) != (pad_like.npad, pad_like.block) or \
                    (nu.npad, nu.block) != (pad_like.npad, pad_like.block):
                raise ValueError("factor padding does not match the operator")
            return cls(nl, nu, pad_like.pad_vec(1.0 / diag), terms)
        fmt = None if engine == "auto" else engine
        return cls(make_operator(low, dtype=dtype, format=fmt),
                   make_operator(up, dtype=dtype, format=fmt),
                   jnp.asarray(1.0 / diag, dtype), terms)

    def msolve(self, f: jax.Array) -> jax.Array:
        if self.fused == "mono":
            return self.nl.matvec(f)
        if self.fused == "kernel":
            from cuda_mat_tpu.ops.pallas_stencil import (
                const_series_msolve_padded)

            op = self.nl
            return const_series_msolve_padded(
                f, self.inv_d, self.gap_ext, op.strided_terms,
                self.nu.strided_terms, op.np_true, op.block, op.sub,
                op.interpret)
        if self.fused:
            return self.nu.matvec(self.inv_d * self.nl.matvec(f))
        y = f
        term = f
        for _ in range(self.terms - 1):
            term = -self.nl.matvec(term)
            y = y + term
        g = self.inv_d * y
        x = g
        term = g
        for _ in range(self.terms - 1):
            term = -self.nu.matvec(term)
            x = x + term
        return x

    def msolve_fma(self, a, c1, b, c2=None, c=None):
        """``(p, M⁻¹ p)`` with ``p = a + c1·(b + c2·c)`` (or ``a + c1·b``
        when ``c`` is None — the r1-production axpy, saving the dead
        operand's HBM stream) — the BLAS1 prologue folded into the
        one-launch fused msolve kernel when it fits scoped VMEM
        (``fused == "kernel"`` and :attr:`fma_fits`), else the XLA
        combination + plain :meth:`msolve` (same math; the kernel's in-VPU
        FMA may differ from XLA's by one contraction ulp).  Solver hook:
        :func:`cuda_mat_tpu.solvers.bicgstab.precond_core` feeds the
        p-update and r1-production axpys through this (VERDICT r3 #5)."""
        if self.fused == "kernel" and self.fma_fits:
            from cuda_mat_tpu.ops.pallas_stencil import (
                const_series_msolve_fma_padded)

            op = self.nl
            return const_series_msolve_fma_padded(
                a, c1, b, c2, c, self.inv_d, self.gap_ext, op.strided_terms,
                self.nu.strided_terms, op.np_true, op.block, op.sub,
                op.interpret)
        p = a + c1 * b if c is None else a + c1 * (b + c2 * c)
        return p, self.msolve(p)


jax.tree_util.register_dataclass(NeumannILUPreconditioner,
                                 data_fields=["nl", "nu", "inv_d", "gap_ext"],
                                 meta_fields=["terms", "fused", "fma_fits"])


@dataclasses.dataclass(frozen=True)
class PaddedPreconditioner:
    """Adapt a true-n preconditioner to a padded-vector operator protocol.

    The Pallas operators (:class:`~cuda_mat_tpu.ops.pallas_spmv.
    PallasDIAOperator`, :class:`~cuda_mat_tpu.ops.pallas_stencil.
    StencilOperator2D`) run the solver loop on *padded* vectors; the exact
    triangular solvers work on true-n vectors.  This wrapper unpads at the
    msolve boundary and re-pads the result with exact zeros, so the padding
    stays a fixed point of the whole preconditioned iteration and the SpMV
    never has to leave the fast padded layout (fixes the round-1 downgrade
    where ``precond="ilu0"`` silently rebuilt the operator as the slow XLA
    DIA formulation).  Cost: two O(n) copies per application — negligible
    next to the O(n·B) sweep traffic.

    Reference role: the L/U solves feeding csrmv at pbicgstab.cu:92-104.
    """

    inner: object    # preconditioner over true-n vectors
    op: object       # padded operator providing pad_vec / unpad_vec

    def msolve(self, f_pad: jax.Array) -> jax.Array:
        return self.op.pad_vec(self.inner.msolve(self.op.unpad_vec(f_pad)))


jax.tree_util.register_dataclass(PaddedPreconditioner,
                                 data_fields=["inner", "op"],
                                 meta_fields=[])


def _vmem_fits(op, nterms: int) -> bool:
    """Scoped-VMEM fit of an nterms-term const-stencil kernel at ``op``'s
    block (see pallas_stencil.stencil_vmem_block_cap; always true in
    interpret mode)."""
    from cuda_mat_tpu.ops.pallas_stencil import stencil_vmem_block_cap

    return op.interpret or op.block <= stencil_vmem_block_cap(nterms)


def _fused_series_operator(n_op, k: int):
    """Whole-series stencil ``P = Σ_{j<k} (−N)^j`` sharing ``n_op``'s layout,
    or None when a polynomial offset exceeds the layout's gap width or halo
    sub-block, or the kernel would overflow scoped VMEM (the sequential
    series still applies)."""
    import dataclasses as _dc

    from cuda_mat_tpu.ops.pallas_stencil import (neumann_poly_terms,
                                                 strided_offsets)

    try:
        pt = neumann_poly_terms(n_op.terms, k, n_op.c_grid, n_op.stride)
    except ValueError:
        return None
    st = strided_offsets(pt, n_op.c_grid, n_op.stride)
    if max(abs(s[0]) for s in st) > n_op.sub or not _vmem_fits(n_op, len(pt)):
        return None
    return _dc.replace(n_op, terms=pt, strided_terms=st)


def _const_factor_operator(factor_csr, pad_like):
    """Matrix-free constant-stencil operator for an ILU factor, sharing
    ``pad_like``'s gap-strided layout (same block/sub/gapmask/padding, so
    padded vectors flow through A and the factors without relayout)."""
    import dataclasses as _dc

    from cuda_mat_tpu.ops.pallas_stencil import const_factor_terms

    fd = factor_csr.to_dia(max_diags=128)
    terms, sterms = const_factor_terms(fd, pad_like.c_grid, pad_like.stride)
    if max(abs(s[0]) for s in sterms) > pad_like.sub:
        raise ValueError("factor offsets exceed the operator's halo sub-block")
    return _dc.replace(pad_like, terms=terms, strided_terms=sterms)


def neumann_factors(csr, milu_omega: float = 0.0):
    """ILU(0)-factorize ``csr`` and split the factor for the Neumann series:
    returns ``(N_l, N_u, diag)`` where ``N_l`` is the strict lower triangle of
    M (unit-lower L = I + N_l), ``N_u`` is D⁻¹·strict-upper (U = D(I + N_u)),
    both as host :class:`CSRMatrix`, and ``diag`` is D.  Shared by the
    single-chip :class:`NeumannILUPreconditioner` and the distributed
    row-partitioned path (reference msolve role: pbicgstab.cu:92-98).

    ``milu_omega`` > 0 switches to relaxed modified ILU(0)
    (:func:`milu0_factorize`) — a beyond-reference option that cuts
    iteration counts substantially on the Laplacian family (BASELINE.md
    r4); 0 (default) keeps the reference-parity ILU(0) factor."""
    from cuda_mat_tpu.formats.coo import COOMatrix
    from cuda_mat_tpu.formats.csr import CSRMatrix

    mvals = _factorize(csr, milu_omega)
    rows = np.repeat(np.arange(csr.n, dtype=np.int64), csr.row_lengths)
    cols = csr.indices.astype(np.int64)
    lower = cols < rows
    upper = cols > rows
    diag = np.zeros(csr.n)
    diag[rows[cols == rows]] = mvals[cols == rows]
    if np.any(diag == 0):
        raise ValueError("ILU(0) factor has a zero diagonal")
    if not lower.any() or not upper.any():
        raise ValueError("matrix has an empty strict triangle; use"
                         " precond='jacobi'")
    low = CSRMatrix.from_coo(COOMatrix(
        csr.n, csr.n, rows[lower].astype(np.int32),
        cols[lower].astype(np.int32), mvals[lower]))
    upv = mvals[upper] / diag[rows[upper]]  # D^-1 * strict upper
    up = CSRMatrix.from_coo(COOMatrix(
        csr.n, csr.n, rows[upper].astype(np.int32),
        cols[upper].astype(np.int32), upv))
    return low, up, diag


def _factorize(csr, milu_omega: float = 0.0) -> np.ndarray:
    try:
        from cuda_mat_tpu.native import loader as _native

        if _native.available():
            if milu_omega:
                return _native.milu0_factorize(csr, milu_omega)
            return _native.ilu0_factorize(csr)
    except ImportError:
        pass
    if milu_omega:
        return milu0_factorize(csr, milu_omega)
    return ilu0_factorize(csr)


def milu0_factorize(csr, omega: float) -> np.ndarray:
    """Relaxed modified ILU(0) (pure-numpy fallback; the native
    ``cmt_milu0`` agrees to accumulation-order ulps — the dropped-fill sum
    is a reduction): the IKJ elimination of
    :func:`~cuda_mat_tpu.reference.cpu_solvers.ilu0_factorize` restricted
    to the pattern, but each row's *dropped* fill (update terms at
    positions outside the pattern) is summed and ``omega`` times it is
    subtracted from the row's diagonal.  ``omega=1`` preserves A's row
    sums through L·U (classic MILU — O(h⁻¹) conditioning on the Laplacian
    family vs ILU(0)'s O(h⁻²)); ``0 < omega < 1`` is relaxed MILU, which
    keeps the factor diagonally dominant enough for the truncated Neumann
    series (BASELINE.md r4 sweeps: omega≈0.97 best)."""
    n = csr.n
    m = csr.data.astype(np.float64).copy()
    indptr, indices = csr.indptr, csr.indices
    diag_pos = np.empty(n, dtype=np.int64)
    for i in range(n):
        lo, hi = indptr[i], indptr[i + 1]
        js = indices[lo:hi]
        k = np.searchsorted(js, i)
        if k >= js.shape[0] or js[k] != i:
            raise ValueError(
                f"MILU(0) requires a stored nonzero diagonal (row {i})")
        diag_pos[i] = lo + k
    for i in range(n):
        lo, hi = indptr[i], indptr[i + 1]
        dropped = 0.0
        for kk in range(lo, int(diag_pos[i])):
            k = indices[kk]
            pivot = m[diag_pos[k]]
            if pivot == 0.0:
                raise ValueError(f"MILU(0) zero pivot at row {k}")
            m[kk] = m[kk] / pivot
            lik = m[kk]
            klo, khi = int(diag_pos[k]) + 1, indptr[k + 1]
            if klo >= khi:
                continue
            row_i_js = indices[kk + 1:hi]
            row_k_js = indices[klo:khi]
            pos = np.searchsorted(row_i_js, row_k_js)
            ok = pos < row_i_js.shape[0]
            ok[ok] &= row_i_js[pos[ok]] == row_k_js[ok]
            upd = lik * m[klo:khi]
            m[kk + 1 + pos[ok]] -= upd[ok]
            dropped += float(upd[~ok].sum())
        m[diag_pos[i]] -= omega * dropped
    return m


def make_preconditioner(kind: str, csr, block: int = 256, dtype=jnp.float64,
                        terms: int = 3, milu_omega: float = 0.0):
    if kind in (None, "none", "identity"):
        return IdentityPreconditioner()
    if kind == "jacobi":
        return JacobiPreconditioner.from_csr(csr, dtype=dtype)
    if kind == "ilu0":
        return ILU0Preconditioner.from_csr(csr, block=block, dtype=dtype,
                                           milu_omega=milu_omega)
    if kind == "ilu0_neumann":
        return NeumannILUPreconditioner.from_csr(csr, dtype=dtype,
                                                 terms=terms,
                                                 milu_omega=milu_omega)
    raise ValueError(f"unknown preconditioner {kind!r}")
