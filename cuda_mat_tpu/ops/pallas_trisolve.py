"""Pallas TPU kernel for *banded* blocked triangular solves.

The generic blocked solver (:mod:`cuda_mat_tpu.ops.trisolve`) runs one XLA
``fori_loop`` step per row block; each step pays dispatch/gather overhead, so
an ILU(0) application on mat10000 costs milliseconds — making ILU slower in
wall-time than simply iterating longer unpreconditioned.  For banded factors
(every headline workload) this kernel collapses each sweep into ONE
``pallas_call`` whose recurrence is two MXU matmuls per block:

    y_b = W_b (f_b − C_b y_{b−1})  =  W_b f_b − (W_b C_b) y_{b−1}

where ``W_b`` is the precomputed inverse of the diagonal triangular block and
``C_b`` the dense off-block coupling into the neighboring block (bandwidth ≤
block, so exactly one neighbor).  ``W_b`` and ``WC_b = W_b C_b`` are both
precomputed at setup, transposed so the kernel computes row-vector matmuls
``(1,B)·(B,B)`` that Mosaic handles natively (1-D vector ops like rotates /
concats are unsupported on sub-tile shapes):

    y_rowᵀ = f_row · W_bᵀ − prev_row · WC_bᵀ

TPU grid steps run sequentially, so the carry ``prev`` is a persistent VMEM
scratch; the two B×B matrices stream through the BlockSpec pipeline and
their DMA overlaps the previous block's compute.  The sweep is exact (same
blocked recurrence as ops.trisolve, algebraically folded).

Memory/traffic are O(n·B) per sweep — intended for the single-chip ILU(0)
configs (mat10000-class); ops.trisolve remains the general-pattern fallback.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _sweep_kernel(f_ref, wt_ref, wct_ref, y_ref, prev, *, unroll, forward):
    """One grid step processes ``unroll`` consecutive blocks of the sequential
    recurrence (python-unrolled in-kernel): TPU grid steps cost ~2 us each in
    pipeline bookkeeping while the per-block matmuls are ~1 us of bandwidth,
    so fewer/bigger steps is the whole game."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        prev[...] = jnp.zeros_like(prev)

    dt = f_ref.dtype
    # precision=HIGHEST: the MXU's native bf16 pass truncates f32 operands,
    # which visibly weakens the preconditioner (mat10000: 28 -> 64 iters);
    # the 3-pass f32 emulation restores it and the sweep stays bandwidth-bound
    hi = jax.lax.Precision.HIGHEST
    for u in range(unroll):
        j = u if forward else unroll - 1 - u
        y = (jnp.dot(f_ref[j], wt_ref[j], preferred_element_type=dt,
                     precision=hi)
             - jnp.dot(prev[...], wct_ref[j], preferred_element_type=dt,
                       precision=hi))
        y_ref[j] = y
        prev[...] = y


@partial(jax.jit, static_argnames=("block", "forward", "unroll", "interpret"))
def _banded_sweep(f: jax.Array, wt: jax.Array, wct: jax.Array, block: int,
                  forward: bool, unroll: int = 1,
                  interpret: bool = False) -> jax.Array:
    """One triangular sweep: f [nb*B] → y [nb*B], forward (lower factor) or
    backward (upper factor) over the blocks; ``unroll`` blocks per grid step
    (requires nb % unroll == 0 — from_factor pads with identity blocks)."""
    nb = wt.shape[0]
    npad = nb * block
    assert nb % unroll == 0
    g = nb // unroll
    # vectors as (nb, 1, block): the last two block dims (1, block) match the
    # full array dims, satisfying Mosaic's sublane/lane tiling rules
    f3 = f.reshape(nb, 1, block)

    def vmap_(i):
        return (i, 0, 0) if forward else (g - 1 - i, 0, 0)

    kernel = partial(_sweep_kernel, unroll=unroll, forward=forward)
    out = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((unroll, 1, block), vmap_, memory_space=pltpu.VMEM),
            pl.BlockSpec((unroll, block, block), vmap_,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((unroll, block, block), vmap_,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((unroll, 1, block), vmap_,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 1, block), f.dtype),
        scratch_shapes=[pltpu.VMEM((1, block), f.dtype)],
        interpret=interpret,
    )(f3, wt, wct)
    return out.reshape(npad)


def _fused_kernel(f_ref, wtlo_ref, wctlo_ref, wtup_ref, wctup_ref, x_ref,
                  prev, ys, *, g, unroll):
    """Fused L-then-U sweep: grid steps [0, g) run the forward (lower)
    recurrence over ``unroll`` blocks each, buffering every y block in the
    VMEM scratch ``ys``; steps [g, 2g) run the backward (upper) recurrence
    off that buffer.  ``prev`` carries y_{b-1} in the first half and x_{b+1}
    in the second (reset by the ``where`` at the half boundaries)."""
    s = pl.program_id(0)
    dt = f_ref.dtype
    hi = jax.lax.Precision.HIGHEST  # see _sweep_kernel on why not MXU-bf16

    @pl.when(s < g)
    def _forward():
        pv = jnp.where(s == 0, jnp.zeros_like(prev), prev[...])
        for u in range(unroll):
            y = (jnp.dot(f_ref[u], wtlo_ref[u], preferred_element_type=dt,
                         precision=hi)
                 - jnp.dot(pv, wctlo_ref[u], preferred_element_type=dt,
                           precision=hi))
            ys[pl.ds(s * unroll + u, 1), :] = y
            x_ref[u] = y  # dummy flush; overwritten by the backward visit
            pv = y
        prev[...] = pv

    @pl.when(s >= g)
    def _backward():
        bb = (2 * g - 1 - s) * unroll  # first block of this step's group
        pv = jnp.where(s == g, jnp.zeros_like(prev), prev[...])
        for u in range(unroll - 1, -1, -1):
            x = (jnp.dot(ys[pl.ds(bb + u, 1), :], wtup_ref[u],
                         preferred_element_type=dt, precision=hi)
                 - jnp.dot(pv, wctup_ref[u], preferred_element_type=dt,
                           precision=hi))
            x_ref[u] = x
            pv = x
        prev[...] = pv


@partial(jax.jit, static_argnames=("block", "unroll", "interpret"))
def _fused_msolve(f: jax.Array, wt_lo, wct_lo, wt_up, wct_up, block: int,
                  unroll: int = 1, interpret: bool = False) -> jax.Array:
    """Both triangular sweeps of ``M⁻¹f = U \\ (L \\ f)`` in ONE pallas_call
    (2·nb/unroll sequential grid steps); the intermediate y never touches
    HBM.  Measured (TPU v5e, mat10000 B=128): inside a solver while_loop the
    single launch beats two per application by ~0.25 ms/iteration even
    though a chained micro-bench slightly favors two launches."""
    nb = wt_lo.shape[0]
    assert nb % unroll == 0
    g = nb // unroll
    f3 = f.reshape(nb, 1, block)

    def fwd_map(s):
        return (jnp.minimum(s, g - 1), 0, 0)

    def bwd_map(s):
        return (jnp.where(s < g, 0, 2 * g - 1 - s), 0, 0)

    def out_map(s):
        return (jnp.where(s < g, s, 2 * g - 1 - s), 0, 0)

    out = pl.pallas_call(
        partial(_fused_kernel, g=g, unroll=unroll),
        grid=(2 * g,),
        in_specs=[
            pl.BlockSpec((unroll, 1, block), fwd_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((unroll, block, block), fwd_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((unroll, block, block), fwd_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((unroll, block, block), bwd_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((unroll, block, block), bwd_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((unroll, 1, block), out_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 1, block), f.dtype),
        scratch_shapes=[pltpu.VMEM((1, block), f.dtype),
                        pltpu.VMEM((nb, block), f.dtype)],
        interpret=interpret,
    )(f3, wt_lo, wct_lo, wt_up, wct_up)
    return out.reshape(nb * block)


# cap on the fused kernel's y scratch (VMEM is ~16 MB/core; leave room for
# the double-buffered (B,B) operand pipeline)
_FUSED_VMEM_BUDGET = 4 << 20


@dataclasses.dataclass(frozen=True)
class PallasBandedTriSolver:
    """Banded ILU(0) triangular-solve pair as two single-launch kernels."""

    wt_lo: jax.Array   # [nb, B, B] transposed inverse of unit-lower blocks
    wct_lo: jax.Array  # [nb, B, B] transposed (W_b C_b), C = coupling to prev
    wt_up: jax.Array   # [nb, B, B] transposed inverse of upper blocks
    wct_up: jax.Array  # [nb, B, B] transposed (W_b C_b), C = coupling to next
    n: int             # static true dimension
    block: int         # static
    unroll: int = 1    # blocks per grid step (see _sweep_kernel)
    interpret: bool = False
    fused: bool = True  # single-launch L+U msolve (see msolve docstring)

    @property
    def npad(self) -> int:
        return self.wt_lo.shape[0] * self.block

    @classmethod
    def from_factor(cls, csr, mvals: np.ndarray, block: int = 128,
                    dtype=jnp.float32, unroll: int = 4,
                    interpret: bool = False) -> "PallasBandedTriSolver":
        """Build from a CSR combined ILU(0) factor (strict lower = L with
        unit diagonal, diag + upper = U; same convention as ops.trisolve).
        Requires bandwidth <= block on both sides.  ``nb`` is padded to a
        multiple of ``unroll`` with identity blocks (W=I, WC=0), which keep
        the padded y/x region exactly zero in both sweep directions."""
        n = csr.n
        rows = np.repeat(np.arange(n, dtype=np.int64), csr.row_lengths)
        cols = csr.indices.astype(np.int64)
        offs = cols - rows
        if offs.size and max(-offs.min(), offs.max()) > block:
            raise ValueError(
                f"bandwidth {max(-offs.min(), offs.max())} exceeds block {block}")
        nb = -(-n // block)
        # VMEM cap: the pipeline holds ~2 in-flight copies of the two
        # (unroll, B, B) operand blocks; keep unroll*B^2 under ~256k elements
        # (B=1024 OOMs VMEM even at unroll=1 — use ops.trisolve there)
        unroll = max(1, min(unroll, nb, 262144 // (block * block) or 1))
        nb = -(-nb // unroll) * unroll

        # setup in the target precision (f32 for TPU solves): the inverses
        # feed an f32 kernel anyway, and f32 batched inv/matmul cuts the
        # 1M-row setup from ~225 s to a fraction (BLAS batched gemm)
        cdt = np.float64 if np.dtype(dtype) == np.float64 else np.float32
        lo_diag = np.tile(np.eye(block, dtype=cdt), (nb, 1, 1))
        up_diag = np.tile(np.eye(block, dtype=cdt), (nb, 1, 1))
        c_lo = np.zeros((nb, block, block), dtype=cdt)  # coupling to previous
        c_up = np.zeros((nb, block, block), dtype=cdt)  # coupling to next
        b_of = rows // block
        jb = rows % block
        same = (cols // block) == b_of
        lower = offs < 0
        upper = ~lower  # includes the diagonal

        # in-block entries → dense triangular blocks
        m_ = np.asarray(mvals)
        sel = lower & same
        lo_diag[b_of[sel], jb[sel], cols[sel] % block] = m_[sel]
        sel = upper & same
        up_diag[b_of[sel], jb[sel], cols[sel] % block] = m_[sel]
        # off-block entries → dense coupling blocks (exactly one neighbor,
        # since bandwidth <= block)
        sel = lower & ~same
        c_lo[b_of[sel], jb[sel], cols[sel] % block] = m_[sel]
        sel = upper & ~same
        c_up[b_of[sel], jb[sel], cols[sel] % block] = m_[sel]

        w_lo = np.linalg.inv(lo_diag)
        w_up = np.linalg.inv(up_diag)
        wct_lo = np.matmul(w_lo, c_lo)  # batched BLAS gemm (einsum is slow)
        wct_up = np.matmul(w_up, c_up)
        tr = lambda a: np.ascontiguousarray(np.transpose(a, (0, 2, 1)))
        return cls(jnp.asarray(tr(w_lo), dtype), jnp.asarray(tr(wct_lo), dtype),
                   jnp.asarray(tr(w_up), dtype), jnp.asarray(tr(wct_up), dtype),
                   n, block, unroll, interpret)

    def _pad(self, f: jax.Array) -> jax.Array:
        return jnp.zeros(self.npad, f.dtype).at[: self.n].set(f)

    def solve_lower(self, f: jax.Array) -> jax.Array:
        y = _banded_sweep(self._pad(f), self.wt_lo, self.wct_lo, self.block,
                          True, self.unroll, self.interpret)
        return y[: self.n]

    def solve_upper(self, f: jax.Array) -> jax.Array:
        x = _banded_sweep(self._pad(f), self.wt_up, self.wct_up, self.block,
                          False, self.unroll, self.interpret)
        return x[: self.n]

    def msolve(self, f: jax.Array) -> jax.Array:
        """``M⁻¹ f = U \\ (L \\ f)``.

        Default (``fused=True``): both sweeps in ONE pallas_call (requires
        the intermediate-y scratch to fit VMEM).  Measured end-to-end inside
        the solver while_loop this saves ~0.25 ms/iteration vs two launches
        (mat10000: 36 vs 48 ms solve) — launch overhead dominates inside
        while_loop even though a chained micro-bench slightly favors two
        launches.  Falls back to two single-sweep launches when fused=False
        or the y scratch exceeds the VMEM budget."""
        nb = self.wt_lo.shape[0]
        if self.fused and (nb * self.block * jnp.dtype(f.dtype).itemsize
                           <= _FUSED_VMEM_BUDGET):
            x = _fused_msolve(self._pad(f), self.wt_lo, self.wct_lo,
                              self.wt_up, self.wct_up, self.block,
                              self.unroll, self.interpret)
            return x[: self.n]
        return self.solve_upper(self.solve_lower(f))


jax.tree_util.register_dataclass(
    PallasBandedTriSolver,
    data_fields=["wt_lo", "wct_lo", "wt_up", "wct_up"],
    meta_fields=["n", "block", "unroll", "interpret", "fused"])
