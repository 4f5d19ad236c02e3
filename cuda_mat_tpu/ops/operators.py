"""Device-resident sparse linear operators (JAX pytrees).

Each operator owns device arrays and provides ``matvec(x)``, replacing the
reference's ``cusparseDcsrmv`` call sites (reference pbicgstab.cu:67,104,132,
469,501,528) and its one custom kernel — the fused ``y = d∘x + A0·x`` of the
split form (``mult_spec`` + csrmv-with-beta=1, reference pbicgstab.cu:36-42,
:675-676).  Operators are pytrees, so they can be closed over or passed as
arguments to ``jit``-compiled solver loops and sharded with ``shard_map``.

Format choice (``make_operator``) is a load-time decision:

- DIA  — few distinct diagonals, dense enough: no-gather shifted multiply-add
         (the banded fixtures mat900/mat10000 and all Laplacian workloads)
- ELL  — bounded row length: rectangular gather, regular VPU lanes
- CSR  — fallback: segment-sum over nnz
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _register(cls, data_fields, meta_fields):
    jax.tree_util.register_dataclass(cls, data_fields=data_fields,
                                     meta_fields=meta_fields)
    return cls


@dataclasses.dataclass(frozen=True)
class CSROperator:
    """CSR SpMV via segment-sum: ``y = segsum(data * x[indices], row_ids)``.

    ``row_ids`` (the COO row index of every nnz) is precomputed at load time
    so the device op is pure gather/multiply/segment-sum.
    """

    data: jax.Array      # [nnz]
    indices: jax.Array   # int32[nnz]
    row_ids: jax.Array   # int32[nnz]
    n: int               # static
    m: int               # static

    def matvec(self, x: jax.Array) -> jax.Array:
        prod = self.data * jnp.take(x, self.indices)
        return jax.ops.segment_sum(prod, self.row_ids, num_segments=self.n,
                                   indices_are_sorted=True)


_register(CSROperator, ["data", "indices", "row_ids"], ["n", "m"])


@dataclasses.dataclass(frozen=True)
class ELLOperator:
    """ELL SpMV: ``y = sum_k values[:, k] * x[cols[:, k]]`` — one rectangular
    gather + a row reduction, fully fuseable by XLA."""

    values: jax.Array  # [n, K]
    cols: jax.Array    # int32[n, K]
    m: int             # static

    @property
    def n(self) -> int:
        return self.values.shape[0]

    def matvec(self, x: jax.Array) -> jax.Array:
        return jnp.sum(self.values * jnp.take(x, self.cols, axis=0), axis=1)


_register(ELLOperator, ["values", "cols"], ["m"])


@dataclasses.dataclass(frozen=True)
class DIAOperator:
    """Banded (DIA) SpMV: ``y = sum_d data[d] * shift(x, off_d)`` — no gather.

    ``offsets`` is a static tuple, so the trace unrolls into ndiag shifted
    fused multiply-adds; XLA emits a single fused loop over HBM.  This is the
    speed-of-light formulation for the reference's banded fixtures.  The
    Pallas kernel in :mod:`cuda_mat_tpu.ops.pallas_spmv` implements the same
    contraction with explicit VMEM blocking.
    """

    data: jax.Array            # [ndiag, n] row-aligned
    offsets: Tuple[int, ...]   # static, ascending
    m: int                     # static

    @property
    def n(self) -> int:
        return self.data.shape[1]

    def matvec(self, x: jax.Array) -> jax.Array:
        n = self.n
        y = jnp.zeros(n, dtype=jnp.result_type(self.data, x))
        for d, off in enumerate(self.offsets):
            lo = max(0, -off)
            hi = min(n, self.m - off)
            if hi <= lo:
                continue
            seg = self.data[d, lo:hi] * jax.lax.dynamic_slice(
                x, (lo + off,), (hi - lo,))
            y = y.at[lo:hi].add(seg)
        return y


_register(DIAOperator, ["data"], ["offsets", "m"])


@dataclasses.dataclass(frozen=True)
class BELLOperator:
    """Blocked-ELL SpMV: BSR rows padded to a uniform ``kmax`` blocks, so the
    contraction is one block-granular gather + a batched (bs,bs)@(bs,) matmul
    — MXU-shaped work instead of element gathers (the TPU answer to
    fine-grained unstructured sparsity when the matrix has dense sub-blocks).

        y_r = sum_k  values[r, k] @ xb[cols[r, k]]

    The gather moves whole ``bs``-element rows of ``xb`` (contiguous, lane
    aligned for bs >= 128), which the TPU handles ~2 orders of magnitude
    better than per-element gathers.  Padding blocks are all-zero and point
    at block-column 0.
    """

    values: jax.Array   # [nbr, kmax, bs, bs]
    cols: jax.Array     # int32[nbr, kmax]
    n: int              # static true rows
    m: int              # static true cols

    @property
    def bs(self) -> int:
        return self.values.shape[-1]

    @classmethod
    def from_csr(cls, csr, bs: int = 128, dtype=jnp.float32
                 ) -> "BELLOperator":
        bsr = csr.to_bsr(block=bs)
        nbr = bsr.nbrows
        counts = np.diff(bsr.indptr)
        kmax = max(int(counts.max()) if nbr else 1, 1)
        values = np.zeros((nbr, kmax, bs, bs), dtype=np.dtype(dtype))
        cols = np.zeros((nbr, kmax), dtype=np.int32)
        rows_of_block = np.repeat(np.arange(nbr), counts)
        pos = np.arange(len(bsr.indices)) - bsr.indptr[rows_of_block]
        values[rows_of_block, pos] = bsr.blocks
        cols[rows_of_block, pos] = bsr.indices
        return cls(jnp.asarray(values), jnp.asarray(cols), csr.n, csr.m)

    def matvec(self, x: jax.Array) -> jax.Array:
        bs = self.bs
        nbc = -(-self.m // bs)
        xp = jnp.zeros(nbc * bs, x.dtype).at[: self.m].set(x[: self.m])
        xb = xp.reshape(nbc, bs)
        xg = jnp.take(xb, self.cols, axis=0)        # [nbr, kmax, bs]
        # precision=HIGHEST: the MXU's native pass truncates f32 operands to
        # bf16 (preferred_element_type only widens the accumulator), which
        # measurably degrades BiCGSTAB residual recurrences (mat10000 with a
        # bf16-truncated msolve: 28 -> 64 iters); the op is bandwidth-bound so
        # the 3-pass f32 emulation is near-free
        y = jnp.einsum("rkab,rkb->ra", self.values, xg,
                       preferred_element_type=x.dtype,
                       precision=jax.lax.Precision.HIGHEST)
        return y.reshape(-1)[: self.n]


_register(BELLOperator, ["values", "cols"], ["n", "m"])


@dataclasses.dataclass(frozen=True)
class SplitOperator:
    """Fused split-form operator ``A = A0 + diag(d)``:
    ``matvec(x) = d∘x + A0·x`` in one trace (reference's mult_spec + csrmv
    accumulate pair, pbicgstab.cu:675-676)."""

    a0: object          # any operator pytree
    d: jax.Array        # [n]

    @property
    def n(self) -> int:
        return self.a0.n

    @property
    def m(self) -> int:
        return self.a0.m

    def matvec(self, x: jax.Array) -> jax.Array:
        return self.d * x + self.a0.matvec(x)


_register(SplitOperator, ["a0", "d"], [])


@dataclasses.dataclass(frozen=True)
class DenseOperator:
    """Dense matvec — for tiny systems (mat3) and testing."""

    a: jax.Array

    @property
    def n(self) -> int:
        return self.a.shape[0]

    @property
    def m(self) -> int:
        return self.a.shape[1]

    def matvec(self, x: jax.Array) -> jax.Array:
        return self.a @ x


_register(DenseOperator, ["a"], [])


# ---------------------------------------------------------------------------
# Factory
# ---------------------------------------------------------------------------

def make_operator(csr, dtype=jnp.float64, format: Optional[str] = None,
                  max_diags: int = 16, min_dia_density: float = 0.4,
                  max_ell_expand: float = 4.0,
                  dense_budget_bytes: int = 2 << 30):
    """Build the best device operator for a host CSR matrix.

    ``format`` forces one of {"csr", "ell", "dia", "bell", "dense"}; by default the
    choice follows the structure heuristics in the class docstrings — with
    one TPU-specific twist: unstructured gathers run at ~1 GB/s on the TPU
    VPU (measured: ELL-gather SpMV at 0.2% of roofline), so on a TPU backend
    an unstructured matrix whose dense form fits ``dense_budget_bytes``
    is materialized dense and fed to the MXU — 50x wasteful in bytes but
    ~300x faster per nonzero than gathering.
    """
    if format is None:
        coo = csr.to_coo()
        offs = np.unique(coo.cols.astype(np.int64) - coo.rows.astype(np.int64))
        if 0 < offs.shape[0] <= max_diags and \
                csr.nnz >= min_dia_density * offs.shape[0] * csr.n:
            format = "dia"
        elif jax.default_backend() == "tpu":
            # gathers are ~400x off roofline on the TPU VPU; prefer MXU-shaped
            # work: block-sparse (BELL) when the nnz cluster into 128x128
            # blocks covering <= 1/4 of the dense grid, else dense when it
            # fits the budget, else fall through to the gather formats
            bs = 128
            nbr, nbc = -(-csr.n // bs), -(-csr.m // bs)
            bkeys = np.unique((coo.rows.astype(np.int64) // bs) * nbc
                              + coo.cols.astype(np.int64) // bs)
            nblocks = bkeys.shape[0]
            # BELLOperator pads every block-row to kmax = MAX blocks per
            # block-row, so size the budget on the padded allocation (an
            # arrow/bordered matrix has tiny nblocks but one full block-row)
            per_row = np.bincount((bkeys // nbc).astype(np.int64),
                                  minlength=nbr)
            kmax = int(per_row.max()) if per_row.size else 1
            bell_bytes = nbr * max(kmax, 1) * bs * bs * np.dtype(dtype).itemsize
            if (nblocks <= 0.25 * nbr * nbc
                    and bell_bytes <= dense_budget_bytes):
                format = "bell"
            elif csr.n * csr.m * np.dtype(dtype).itemsize <= dense_budget_bytes:
                format = "dense"
        if format is None:
            max_row = int(csr.row_lengths.max()) if csr.n else 1
            if csr.n and max_row * csr.n <= max_ell_expand * max(csr.nnz, 1):
                format = "ell"
            else:
                format = "csr"
    if format == "bell":
        return BELLOperator.from_csr(csr, dtype=dtype)
    if format == "dense":
        return DenseOperator(jnp.asarray(csr.to_dense(), dtype=dtype))
    if format == "dia":
        dia = csr.to_dia()
        return DIAOperator(jnp.asarray(dia.data, dtype=dtype),
                           tuple(int(o) for o in dia.offsets), csr.m)
    if format == "ell":
        ell = csr.to_ell()
        return ELLOperator(jnp.asarray(ell.values, dtype=dtype),
                           jnp.asarray(ell.cols), csr.m)
    if format == "csr":
        row_ids = np.repeat(np.arange(csr.n, dtype=np.int32), csr.row_lengths)
        return CSROperator(jnp.asarray(csr.data, dtype=dtype),
                           jnp.asarray(csr.indices), jnp.asarray(row_ids),
                           csr.n, csr.m)
    raise ValueError(f"unknown operator format {format!r}")
