"""Pallas TPU kernel for 2-D grid-stencil SpMV.

The headline workloads are 5-point Laplacians on an R×C grid (mat900 =
GR_30_30, mat10000 = 100×100, the bench systems up to 3163×3163 — reference
mat10000.mtx:1-5).  Viewed as a matrix they are banded with offsets
{±1, ±C, 0}; viewed as a *grid* they are a stencil:

    y[i,j] = Σ_k  coeff_k[i,j] · x[i+dr_k, j+dc_k]

The 1-D DIA kernel must stream an x window of (1 + 2·sub/block)·n because its
halo is the full matrix bandwidth (= C); the 2-D view's halo is ONE grid row/
column per side, so x traffic drops to ~(1+2/TR+2/TC)·n.  Layout follows the
same block-halo trick as :mod:`pallas_spmv` lifted to 2-D: the grid is stored
padded with one zero *tile ring* (TR rows / TC cols on each side), the kernel
receives the 3×3 tile neighborhood as nine shifted BlockSpec views, and edge
programs write the zero padding — so padded grids are a fixed point and whole
solver iterations run on them without repacking.

Row-aligned coefficients (coeff_k[i,j] = A[(i,j), (i+dr,j+dc)], zero where
the neighbor leaves the grid) make boundary handling free: clipped halo reads
are multiplied by zero.

Two data modes:

- **variable coefficients** (general): coeff_k are (R, C) grids → traffic
  ndiag·n + x + y  (≈ the DIA model with the overfetch removed)
- **constant coefficients** (uniform interior stencil): coeff_k are scalars
  *except* boundary corrections are folded into the row-aligned grids of the
  offsets that leave the grid... for the pure Laplacian every coefficient is
  constant and the boundary is encoded by the zero pad ring plus zeroed
  boundary coefficients, so we keep per-offset (R, C) grids ONLY for offsets
  whose coefficient actually varies and scalars for the rest — the Laplacian
  interior reads just x and writes y (~2n traffic, ~3.5× the variable mode).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _stencil_kernel(*refs, offsets, n_var, tr, tc, r, c, mask):
    """refs = (x_00..x_22 [9 tile views], coeff_0..coeff_{n_var-1}, y_ref);
    scalar coefficients arrive via the closure in ``offsets`` entries of the
    form (dr, dc, scalar_or_None).  ``mask=True`` zeroes output rows/cols
    beyond the true grid (needed with scalar coefficients when the padded
    grid is larger than the true one — keeps the pad region an exact zero
    fixed point)."""
    x_refs = refs[:9]
    coeff_refs = refs[9: 9 + n_var]
    y_ref = refs[-1]
    i = pl.program_id(0)
    j = pl.program_id(1)
    gi = pl.num_programs(0)
    gj = pl.num_programs(1)

    @pl.when((i > 0) & (i < gi - 1) & (j > 0) & (j < gj - 1))
    def _interior():
        # assemble the (3TR, 3TC) neighborhood, then slice shifted windows
        rows = [jnp.concatenate([x_refs[3 * a + b][...] for b in range(3)],
                                axis=1) for a in range(3)]
        xs = jnp.concatenate(rows, axis=0)
        acc = None
        ci = 0
        for (dr, dc, scal) in offsets:
            win = jax.lax.slice(xs, (tr + dr, tc + dc),
                                (2 * tr + dr, 2 * tc + dc))
            if scal is None:
                term = coeff_refs[ci][...] * win
                ci += 1
            else:
                term = scal * win
            acc = term if acc is None else acc + term
        if mask:
            row0 = (i - 1) * tr
            col0 = (j - 1) * tc
            ir = jax.lax.broadcasted_iota(jnp.int32, (tr, tc), 0)
            ic = jax.lax.broadcasted_iota(jnp.int32, (tr, tc), 1)
            valid = ((row0 + ir) < r) & ((col0 + ic) < c)
            acc = jnp.where(valid, acc, jnp.zeros_like(acc))
        y_ref[...] = acc

    @pl.when((i == 0) | (i == gi - 1) | (j == 0) | (j == gj - 1))
    def _edge():
        y_ref[...] = jnp.zeros_like(y_ref)


@partial(jax.jit, static_argnames=("offsets", "tr", "tc", "rp", "cp", "r",
                                   "c", "interpret"))
def stencil_spmv_padded(coeffs, x_pad: jax.Array, offsets, tr: int, tc: int,
                        rp: int, cp: int, r: int, c: int,
                        interpret: bool = False) -> jax.Array:
    """``y_pad = A x_pad`` on tile-ring padded grids (flattened vectors).

    ``offsets``: static tuple of (dr, dc, scalar_or_None); entries with
    ``None`` consume one (rp, cp) grid from ``coeffs`` (variable), others use
    the given scalar (constant).  ``x_pad``: flat [(rp+2tr)*(cp+2tc)].
    """
    gi = rp // tr + 2
    gj = cp // tc + 2
    x2 = x_pad.reshape(rp + 2 * tr, cp + 2 * tc)
    mask = any(o[2] is not None for o in offsets) and (rp != r or cp != c)

    def xmap(a, b):
        return lambda i, j: (jnp.clip(i + a - 1, 0, gi - 1),
                             jnp.clip(j + b - 1, 0, gj - 1))

    x_specs = [pl.BlockSpec((tr, tc), xmap(a, b), memory_space=pltpu.VMEM)
               for a in range(3) for b in range(3)]
    n_var = sum(1 for o in offsets if o[2] is None)
    coeff_specs = [pl.BlockSpec(
        (tr, tc), lambda i, j: (jnp.clip(i - 1, 0, rp // tr - 1),
                                jnp.clip(j - 1, 0, cp // tc - 1)),
        memory_space=pltpu.VMEM) for _ in range(n_var)]
    kernel = partial(_stencil_kernel, offsets=offsets, n_var=n_var,
                     tr=tr, tc=tc, r=r, c=c, mask=mask)
    out = pl.pallas_call(
        kernel,
        grid=(gi, gj),
        in_specs=x_specs + coeff_specs,
        out_specs=pl.BlockSpec((tr, tc), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp + 2 * tr, cp + 2 * tc),
                                       x_pad.dtype),
        interpret=interpret,
    )(*([x2] * 9), *coeffs)
    return out.reshape(-1)


@dataclasses.dataclass(frozen=True)
class StencilOperator2D:
    """Device operator for an R×C grid stencil, padded-vector protocol
    (compatible with the solver loops' ``pad_vec``/``unpad_vec`` contract).

    ``matvec`` maps flat padded grids to flat padded grids; the padding (one
    zero tile ring) is invariant under the iteration.
    """

    coeffs: Tuple[jax.Array, ...]          # variable-coefficient grids [rp, cp]
    offsets: Tuple[Tuple[int, int, object], ...]  # static (dr, dc, scal|None)
    r: int            # static true grid rows
    c: int            # static true grid cols
    rp: int           # static padded rows (multiple of tr)
    cp: int           # static padded cols (multiple of tc)
    tr: int           # static tile rows
    tc: int           # static tile cols
    vec_dtype: str = "float32"
    interpret: bool = False

    @property
    def n(self) -> int:
        return self.r * self.c

    @property
    def m(self) -> int:
        return self.n

    @classmethod
    def laplacian(cls, r: int, c: int, dtype=jnp.float32, tr: int = 256,
                  tc: int = 512, constant: bool = True,
                  interpret: bool = False) -> "StencilOperator2D":
        """5-point Laplacian (diag 4, neighbors −1) — the mat900/mat10000/
        bench family.  In the 2-D view every boundary (grid edge AND the
        row seam of the flattened matrix) is just the zero pad ring, so
        ``constant=True`` needs *no coefficient grids at all*: matrix-free,
        ~2n bytes of traffic per matvec.  ``constant=False`` builds the
        equivalent variable-coefficient form (one (rp,cp) grid per offset) —
        the general path any grid-stencil matrix can use."""
        rp, cp = _round_up(r, tr), _round_up(c, tc)
        dt = np.dtype(dtype)
        if constant:
            offsets = ((-1, 0, -1.0), (0, -1, -1.0), (0, 0, 4.0),
                       (0, 1, -1.0), (1, 0, -1.0))
            coeffs = ()
        else:
            diag = np.zeros((rp, cp), dtype=dt)
            diag[:r, :c] = 4.0
            row = np.zeros((rp, cp), dtype=dt)
            row[:r, :c] = -1.0
            offsets = ((-1, 0, None), (0, -1, None), (0, 0, None),
                       (0, 1, None), (1, 0, None))
            coeffs = (jnp.asarray(row), jnp.asarray(row), jnp.asarray(diag),
                      jnp.asarray(row), jnp.asarray(row))
        return cls(coeffs, offsets, r, c, rp, cp, tr, tc,
                   str(np.dtype(dtype)), interpret)

    def pad_vec(self, v) -> jax.Array:
        dt = jnp.dtype(self.vec_dtype)
        g = jnp.zeros((self.rp + 2 * self.tr, self.cp + 2 * self.tc), dt)
        v2 = jnp.asarray(v, dt).reshape(self.r, self.c)
        g = g.at[self.tr: self.tr + self.r,
                 self.tc: self.tc + self.c].set(v2)
        return g.reshape(-1)

    def unpad_vec(self, v_pad: jax.Array) -> jax.Array:
        g = v_pad.reshape(self.rp + 2 * self.tr, self.cp + 2 * self.tc)
        return g[self.tr: self.tr + self.r,
                 self.tc: self.tc + self.c].reshape(-1)

    def matvec(self, x_pad: jax.Array) -> jax.Array:
        return stencil_spmv_padded(self.coeffs, x_pad, self.offsets,
                                   self.tr, self.tc, self.rp, self.cp,
                                   self.r, self.c, self.interpret)


jax.tree_util.register_dataclass(
    StencilOperator2D, data_fields=["coeffs"],
    meta_fields=["offsets", "r", "c", "rp", "cp", "tr", "tc", "vec_dtype",
                 "interpret"])


# ---------------------------------------------------------------------------
# Constant-coefficient stencil in the gap-strided 1-D block-halo layout
# ---------------------------------------------------------------------------
#
# The 2-D tile kernel above streams its 3x3 halo neighborhood as nine full
# tile views, which Mosaic re-DMAs on every grid step (the index maps change
# each step, so the revisiting guard never fires) — ~9x of x per matvec.  For
# *constant-coefficient* grid stencils (the whole Laplacian family: mat900,
# mat10000, every bench system — reference mat10000.mtx:1-5) there is a
# strictly better formulation, measured on TPU v5e (see BASELINE.md):
#
# - keep the proven 1-D block-halo layout of :mod:`~cuda_mat_tpu.ops.
#   pallas_spmv` (x streamed once + 2·sub/block halo overfetch, y written
#   once ≈ 2n bytes/matvec) but drop the per-diagonal coefficient STREAMS
#   ((ndiag)·n bytes — 5/7.5 of the DIA kernel's traffic) in favour of
#   compile-time scalars;
# - store the grid **gap-strided**: each grid row of C cells is padded to a
#   stride S = round_up(C + max|dc|, 128) with zero gap cells.  A stencil
#   read that crosses a row boundary (the ±1 "seam" entries that a flat
#   layout must mask per element) then lands in a zero gap cell — boundary
#   handling costs nothing.  Masking alternatives measured and rejected:
#   iota+rem per element (0.6x of the DIA kernel — integer rem is catastrophic
#   on the VPU), a streamed f32 seam mask (1.9x), XLA scatter fix-up (0.7x —
#   TPU scatter copies the whole vector);
# - gap cells of the OUTPUT are re-zeroed by one multiply with a gap mask
#   that is identical for every block (block % S == 0), passed once through a
#   constant-index BlockSpec so it stays VMEM-resident across the whole grid
#   (~0 HBM traffic);
# - the pad tail [n', npad) is zeroed by an iota compare gated with
#   ``pl.when`` to the final blocks only.
#
# Result: padded vectors are a fixed point of the kernel, the whole solver
# iteration runs in the strided layout, and the matvec moves ~2.2·n bytes —
# measured 3.0x the DIA kernel's throughput (2.7e11 nnz/s, 86% of the copy
# roofline at a 2.2n byte model) on the 10M-row 5-point Laplacian.
# Replaces the same cusparseDcsrmv call sites (reference pbicgstab.cu:104,
# :132) as the DIA kernel.


def _const_stencil_kernel(*refs, terms, block, sub, np_true):
    # refs = (base_ref [SMEM], x_sub_0 .. x_sub_{k+1}, gapmask_ref, y_ref)
    # terms = ((strided_off, scal), ...); np_true = R*S (strided true length);
    # base_ref holds the *global* strided row of this shard's first true row
    # (0 single-chip) so the tail mask [np_true, npad) works per shard under
    # shard_map — all shards trace the same program (VERDICT r2 #1).
    base_ref = refs[0]
    x_refs = refs[1:-2]
    gap_ref, y_ref = refs[-2], refs[-1]
    i = pl.program_id(0)
    g = pl.num_programs(0)
    base = base_ref[0]

    @pl.when((i > 0) & (i < g - 1))
    def _interior():
        xs = jnp.concatenate([r[:] for r in x_refs])
        vdt = xs.dtype
        acc = None
        for (off, scal) in terms:
            xw = jax.lax.slice(xs, (sub + off,), (sub + off + block,))
            term = jnp.asarray(scal, vdt) * xw
            acc = term if acc is None else acc + term
        acc = acc * gap_ref[:]
        row0 = base + (i - 1) * block   # global strided row of acc[0]

        @pl.when(row0 + block > np_true)
        def _tail():
            # zero [np_true, npad): the only rows where gapmask (periodic in
            # S) is not already the right mask
            t = row0 + jax.lax.broadcasted_iota(jnp.int32, (block,), 0)
            y_ref[:] = jnp.where(t < jnp.int32(np_true), acc,
                                 jnp.zeros_like(acc))

        @pl.when(row0 + block <= np_true)
        def _notail():
            y_ref[:] = acc

    @pl.when((i == 0) | (i == g - 1))
    def _edge():
        y_ref[:] = jnp.zeros_like(y_ref)


@partial(jax.jit, static_argnames=("terms", "np_true", "block", "sub",
                                   "interpret"))
def const_stencil_spmv_padded(x_pad: jax.Array, gapmask: jax.Array, terms,
                              np_true: int, block: int, sub: int,
                              interpret: bool = False,
                              base=None) -> jax.Array:
    """``y_pad = A x_pad`` for a constant-coefficient grid stencil on
    gap-strided block-halo padded vectors.

    ``terms``: static tuple of (strided offset, scalar); ``gapmask``: (block,)
    0/1 vector zeroing gap cells (requires block % stride == 0 so the mask is
    per-block identical); ``np_true``: R*S *global* strided length before
    block padding; ``base``: optional int32 (1,) array with the global
    strided row of ``x_pad[block]`` — pass ``lax.axis_index * shard_rows``
    under ``shard_map`` so the tail mask is globally correct per shard
    (defaults to 0: the single-chip layout).
    """
    npad = x_pad.shape[0] - 2 * block
    assert npad % block == 0 and block % sub == 0
    offs = [t[0] for t in terms]
    assert max(abs(min(offs)), abs(max(offs))) <= sub
    assert gapmask.shape == (block,)
    g = npad // block + 2
    k = block // sub
    n_sub = (npad + 2 * block) // sub
    if base is None:
        base = jnp.zeros((1,), jnp.int32)

    def sub_map(j):
        return lambda i: (jnp.clip(i * k + j - 1, 0, n_sub - 1),)

    base_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    x_specs = [pl.BlockSpec((sub,), sub_map(j), memory_space=pltpu.VMEM)
               for j in range(k + 2)]
    gap_spec = pl.BlockSpec((block,), lambda i: (0,),
                            memory_space=pltpu.VMEM)
    kernel = partial(_const_stencil_kernel, terms=terms, block=block,
                     sub=sub, np_true=np_true)
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[base_spec] + x_specs + [gap_spec],
        out_specs=pl.BlockSpec((block,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad + 2 * block,), x_pad.dtype),
        interpret=interpret,
    )(jnp.asarray(base, jnp.int32).reshape(1), *([x_pad] * (k + 2)), gapmask)


def _const_stencil_dots_kernel(*refs, terms, block, sub, np_true, n_w,
                               with_self):
    # y = A x plus fused dot epilogues: per-lane, PER-BLOCK partials of
    # <w_j, y> (and <y, y> when ``with_self``) written to a (g, n_dots, 128)
    # output — the solver's alpha/omega reductions then cost zero extra HBM
    # passes over y/w instead of one full re-read each (ROADMAP r3 "fold dot
    # partials into the kernels' epilogue"; replaces the cublasDdot call
    # sites pbicgstab.cu:106,135-136 fused with the csrmv at :104,:132).
    # The cross-block + 128-lane sums happen in XLA on the tiny output as a
    # tree reduction — the r3 form accumulated sequentially across the grid
    # in a grid-resident VMEM block, which both degraded conditioning
    # (ADVICE r3: g sequential adds per lane) and was the moving part in the
    # axon Mosaic compile hang (BASELINE.md r3).
    # refs = (base_ref, x_sub_0..x_sub_{k+1}, gapmask_ref, w_0..w_{n_w-1},
    #         y_ref, dot_ref[(1, n_dots, 128) block of the (g,...) output])
    base_ref = refs[0]
    k = block // sub
    x_refs = refs[1:1 + (k + 2)]
    gap_ref = refs[1 + (k + 2)]
    w_refs = refs[2 + (k + 2): 2 + (k + 2) + n_w]
    y_ref, dot_ref = refs[-2], refs[-1]
    i = pl.program_id(0)
    g = pl.num_programs(0)
    base = base_ref[0]

    @pl.when((i > 0) & (i < g - 1))
    def _interior():
        xs = jnp.concatenate([r[:] for r in x_refs])
        vdt = xs.dtype
        acc = None
        for (off, scal) in terms:
            xw = jax.lax.slice(xs, (sub + off,), (sub + off + block,))
            term = jnp.asarray(scal, vdt) * xw
            acc = term if acc is None else acc + term
        acc = acc * gap_ref[:]
        row0 = base + (i - 1) * block

        @pl.when(row0 + block > np_true)
        def _tail():
            t = row0 + jax.lax.broadcasted_iota(jnp.int32, (block,), 0)
            y_ref[:] = jnp.where(t < jnp.int32(np_true), acc,
                                 jnp.zeros_like(acc))

        @pl.when(row0 + block <= np_true)
        def _notail():
            y_ref[:] = acc

        yv = y_ref[:]     # the final (masked) block — read-back from VMEM
        for j in range(n_w):
            part = (w_refs[j][:] * yv).reshape(block // 128, 128)
            dot_ref[0, j, :] = jnp.sum(part, axis=0)
        if with_self:
            part = (yv * yv).reshape(block // 128, 128)
            dot_ref[0, n_w, :] = jnp.sum(part, axis=0)

    @pl.when((i == 0) | (i == g - 1))
    def _edge():
        y_ref[:] = jnp.zeros_like(y_ref)
        dot_ref[...] = jnp.zeros_like(dot_ref)


@partial(jax.jit, static_argnames=("terms", "np_true", "block", "sub",
                                   "with_self", "interpret"))
def const_stencil_spmv_dots_padded(x_pad: jax.Array, gapmask: jax.Array, ws,
                                   terms, np_true: int, block: int, sub: int,
                                   with_self: bool = False,
                                   interpret: bool = False, base=None):
    """``(y_pad, dots)`` where ``y_pad = A x_pad`` (identical values to
    :func:`const_stencil_spmv_padded`) and ``dots[j] = <ws[j], y>``, plus
    ``dots[-1] = <y, y>`` when ``with_self`` — reductions fused into the
    kernel's epilogue (per-block lane partials, tree-summed over blocks and
    lanes in XLA; reduction order still differs from ``jnp.dot``'s tree, an
    f32-chaos-level trajectory perturbation).  Padded/gap cells of both y
    and the
    (padded-protocol) weights are zero, so the partials equal the
    true-coordinate dots exactly."""
    npad = x_pad.shape[0] - 2 * block
    assert npad % block == 0 and block % sub == 0 and block % 128 == 0
    offs = [t[0] for t in terms]
    assert max(abs(min(offs)), abs(max(offs))) <= sub
    assert gapmask.shape == (block,)
    ws = tuple(ws)
    for w in ws:
        assert w.shape == x_pad.shape
    n_dots = len(ws) + (1 if with_self else 0)
    assert n_dots > 0
    g = npad // block + 2
    k = block // sub
    n_sub = (npad + 2 * block) // sub
    if base is None:
        base = jnp.zeros((1,), jnp.int32)

    def sub_map(j):
        return lambda i: (jnp.clip(i * k + j - 1, 0, n_sub - 1),)

    base_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    x_specs = [pl.BlockSpec((sub,), sub_map(j), memory_space=pltpu.VMEM)
               for j in range(k + 2)]
    gap_spec = pl.BlockSpec((block,), lambda i: (0,),
                            memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec((block,), lambda i: (i,),
                            memory_space=pltpu.VMEM) for _ in ws]
    kernel = partial(_const_stencil_dots_kernel, terms=terms, block=block,
                     sub=sub, np_true=np_true, n_w=len(ws),
                     with_self=with_self)
    y, lanes = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[base_spec] + x_specs + [gap_spec] + w_specs,
        out_specs=[pl.BlockSpec((block,), lambda i: (i,),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, n_dots, 128), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((npad + 2 * block,), x_pad.dtype),
                   jax.ShapeDtypeStruct((g, n_dots, 128), x_pad.dtype)],
        interpret=interpret,
    )(jnp.asarray(base, jnp.int32).reshape(1), *([x_pad] * (k + 2)), gapmask,
      *ws)
    return y, jnp.sum(lanes, axis=(0, 2))


def _msolve_series_interior(xs, d_refs, gap_ref, y_ref, u_ref, row0, *,
                            terms_l, terms_u, hpad, block, sub, np_true):
    # Shared interior of the fused msolve kernels: given the input window
    # ``xs`` ([row0 - sub, row0 + block + sub) in the padded layout), apply
    # u = (P_l xs)·gap·d on the extended region [row0 - hpad, row0 + block +
    # hpad) held in VMEM scratch, then y = (P_u u)·gap on the block.
    # Masking reproduces the sequential semantics bitwise: u = (acc·gap)·d
    # with the *extended* periodic gapmask, then zeroed outside the global
    # true rows [0, np_true) — exactly the values the P_l launch + XLA
    # multiply would have produced (pad blocks zero, tail zero, gaps zero).
    ext = block + 2 * hpad
    vdt = xs.dtype
    acc = None
    for (off, scal) in terms_l:
        xw = jax.lax.slice(xs, (sub - hpad + off,),
                           (sub - hpad + off + ext,))
        term = jnp.asarray(scal, vdt) * xw
        acc = term if acc is None else acc + term
    ds = jnp.concatenate([r[:] for r in d_refs])
    dw = jax.lax.slice(ds, (sub - hpad,), (sub - hpad + ext,))
    u_ref[:] = acc * gap_ref[:] * dw
    e0 = row0 - hpad                    # global strided row of u[0]

    @pl.when((e0 < 0) | (e0 + ext > np_true))
    def _u_edge():
        # zero u outside the global true rows: the sequential P_l launch
        # writes zeros to the pad blocks and the [np_true, npad) tail
        t = e0 + jax.lax.broadcasted_iota(jnp.int32, (ext,), 0)
        u_ref[:] = jnp.where((t >= 0) & (t < jnp.int32(np_true)),
                             u_ref[:], jnp.zeros_like(u_ref))

    u = u_ref[:]
    acc2 = None
    for (off, scal) in terms_u:
        uw = jax.lax.slice(u, (hpad + off,), (hpad + off + block,))
        term = jnp.asarray(scal, vdt) * uw
        acc2 = term if acc2 is None else acc2 + term
    acc2 = acc2 * jax.lax.slice(gap_ref[:], (hpad,), (hpad + block,))

    @pl.when(row0 + block > np_true)
    def _tail():
        t = row0 + jax.lax.broadcasted_iota(jnp.int32, (block,), 0)
        y_ref[:] = jnp.where(t < jnp.int32(np_true), acc2,
                             jnp.zeros_like(acc2))

    @pl.when(row0 + block <= np_true)
    def _notail():
        y_ref[:] = acc2


def _const_msolve_kernel(*refs, terms_l, terms_u, hpad, block, sub, np_true):
    # Fused Neumann msolve: y = P_u · (inv_d ∘ (P_l x)) in ONE launch.
    # refs = (base_ref [SMEM], x_sub_0..x_sub_{k+1}, d_sub_0..d_sub_{k+1},
    #         gapext_ref, y_ref, u_scratch) — u is computed on the extended
    #         region [row0 - hpad, row0 + block + hpad) held in VMEM scratch,
    #         so the sequential two-launch series' intermediate never touches
    #         HBM (~3 passes + 1 launch per msolve instead of ~7 + 2; the
    #         reference's msolve role is pbicgstab.cu:92-98).
    base_ref = refs[0]
    k = block // sub
    nv = k + 2
    x_refs = refs[1:1 + nv]
    d_refs = refs[1 + nv:1 + 2 * nv]
    gap_ref, y_ref, u_ref = refs[-3], refs[-2], refs[-1]
    i = pl.program_id(0)
    g = pl.num_programs(0)

    @pl.when((i > 0) & (i < g - 1))
    def _interior():
        xs = jnp.concatenate([r[:] for r in x_refs])
        row0 = base_ref[0] + (i - 1) * block  # global strided row of y[0]
        _msolve_series_interior(xs, d_refs, gap_ref, y_ref, u_ref, row0,
                                terms_l=terms_l, terms_u=terms_u, hpad=hpad,
                                block=block, sub=sub, np_true=np_true)

    @pl.when((i == 0) | (i == g - 1))
    def _edge():
        y_ref[:] = jnp.zeros_like(y_ref)


def _const_msolve_fma_kernel(*refs, terms_l, terms_u, hpad, block, sub,
                             np_true, nvec):
    # BLAS1-prologue variant of the fused msolve (VERDICT r3 next-round #5:
    # fold the p-update / r1-production axpys into the msolve kernel): the
    # input vector is computed IN the kernel as p = a + c1·(b + c2·c)
    # (``nvec=3``) or p = a + c1·b (``nvec=2`` — the r1-production axpy,
    # which would otherwise stream a dead c·0 operand through HBM) on the
    # whole windowed region, written out as the first output, and fed to the
    # same series interior — one launch replaces the XLA axpy node(s) + the
    # plain msolve launch, saving a full HBM write+read of p plus a dispatch
    # node per application (reference axpy sites pbicgstab.cu:86-88,:108).
    # refs = (base_ref [SMEM], coef_ref [SMEM (2,)], a_subs, b_subs,
    #         [c_subs,] d_subs, gapext_ref, p_ref, y_ref, u_scratch)
    base_ref, coef_ref = refs[0], refs[1]
    k = block // sub
    nv = k + 2
    a_refs = refs[2:2 + nv]
    b_refs = refs[2 + nv:2 + 2 * nv]
    c_refs = refs[2 + 2 * nv:2 + 3 * nv] if nvec == 3 else None
    d_refs = refs[2 + nvec * nv:2 + (nvec + 1) * nv]
    gap_ref, p_ref, y_ref, u_ref = refs[-4], refs[-3], refs[-2], refs[-1]
    i = pl.program_id(0)
    g = pl.num_programs(0)

    @pl.when((i > 0) & (i < g - 1))
    def _interior():
        c1 = coef_ref[0]
        av = jnp.concatenate([r[:] for r in a_refs])
        bv = jnp.concatenate([r[:] for r in b_refs])
        # zeros of the padded layout (gaps/pads/tail) are a fixed point of
        # the linear combination, so p needs no masking of its own
        if nvec == 3:
            cv = jnp.concatenate([r[:] for r in c_refs])
            xs = av + c1 * (bv + coef_ref[1] * cv)
        else:
            xs = av + c1 * bv
        p_ref[:] = jax.lax.slice(xs, (sub,), (sub + block,))
        row0 = base_ref[0] + (i - 1) * block
        _msolve_series_interior(xs, d_refs, gap_ref, y_ref, u_ref, row0,
                                terms_l=terms_l, terms_u=terms_u, hpad=hpad,
                                block=block, sub=sub, np_true=np_true)

    @pl.when((i == 0) | (i == g - 1))
    def _edge():
        p_ref[:] = jnp.zeros_like(p_ref)
        y_ref[:] = jnp.zeros_like(y_ref)


def msolve_halo(terms_u) -> int:
    """Lane-aligned extension width ``hpad`` of the fused msolve kernel's
    intermediate: P_u reads u at offsets up to max|off'_u|, rounded up so the
    scratch/extended-gapmask shapes stay tile-aligned (Mosaic 1-D constraint,
    CLAUDE.md)."""
    h_u = max((abs(t[0]) for t in terms_u), default=0)
    return _round_up(max(h_u, 1), 1024)


def extend_gapmask(gapmask: np.ndarray, hpad: int) -> np.ndarray:
    """Periodic extension of the per-block gapmask to
    [−hpad, block + hpad) — block % stride == 0 makes the mask block-periodic,
    so wrapping is exact.  Built once at preconditioner setup (host) and
    passed VMEM-resident like the gapmask itself."""
    gm = np.asarray(gapmask)
    block = gm.shape[0]
    assert hpad <= block
    return np.concatenate([gm[block - hpad:], gm, gm[:hpad]])


@partial(jax.jit, static_argnames=("terms_l", "terms_u", "np_true", "block",
                                   "sub", "interpret"))
def const_series_msolve_padded(x_pad: jax.Array, inv_d_pad: jax.Array,
                               gapmask_ext: jax.Array, terms_l, terms_u,
                               np_true: int, block: int, sub: int,
                               interpret: bool = False,
                               base=None) -> jax.Array:
    """One-launch fused Neumann-series msolve
    ``y = P_u · (inv_d ∘ (P_l x))`` on gap-strided block-halo padded vectors
    (bitwise-equal to ``P_u.matvec(inv_d * P_l.matvec(x))`` with the
    whole-series stencils of :func:`neumann_poly_terms`).

    ``terms_l``/``terms_u``: static (strided offset, scalar) tuples of the
    two series polynomials; ``inv_d_pad``: the exact 1/diag(U) vector in the
    same padded layout (zeros in gaps/pads); ``gapmask_ext``: the
    (block + 2·hpad,) extension from :func:`extend_gapmask` with
    ``hpad = msolve_halo(terms_u)``; ``base`` as in
    :func:`const_stencil_spmv_padded`.  Requires
    ``max|off_l| + hpad <= sub`` (plan via :func:`plan_const_neumann_layout`).
    """
    npad = x_pad.shape[0] - 2 * block
    assert npad % block == 0 and block % sub == 0
    hpad = msolve_halo(terms_u)
    h_l = max(abs(t[0]) for t in terms_l)
    assert h_l + hpad <= sub, (h_l, hpad, sub)
    assert hpad <= block
    assert gapmask_ext.shape == (block + 2 * hpad,)
    assert inv_d_pad.shape == x_pad.shape
    g = npad // block + 2
    k = block // sub
    n_sub = (npad + 2 * block) // sub
    if base is None:
        base = jnp.zeros((1,), jnp.int32)

    def sub_map(j):
        return lambda i: (jnp.clip(i * k + j - 1, 0, n_sub - 1),)

    base_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    sub_specs = [pl.BlockSpec((sub,), sub_map(j), memory_space=pltpu.VMEM)
                 for j in range(k + 2)]
    gap_spec = pl.BlockSpec((block + 2 * hpad,), lambda i: (0,),
                            memory_space=pltpu.VMEM)
    kernel = partial(_const_msolve_kernel, terms_l=terms_l, terms_u=terms_u,
                     hpad=hpad, block=block, sub=sub, np_true=np_true)
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[base_spec] + sub_specs + sub_specs + [gap_spec],
        out_specs=pl.BlockSpec((block,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad + 2 * block,), x_pad.dtype),
        scratch_shapes=[pltpu.VMEM((block + 2 * hpad,), x_pad.dtype)],
        interpret=interpret,
    )(jnp.asarray(base, jnp.int32).reshape(1), *([x_pad] * (k + 2)),
      *([inv_d_pad] * (k + 2)), gapmask_ext)


@partial(jax.jit, static_argnames=("terms_l", "terms_u", "np_true", "block",
                                   "sub", "interpret"))
def const_series_msolve_fma_padded(a_pad: jax.Array, c1, b_pad: jax.Array,
                                   c2=None, c_pad=None,
                                   inv_d_pad: jax.Array = None,
                                   gapmask_ext: jax.Array = None,
                                   terms_l=None, terms_u=None,
                                   np_true: int = 0, block: int = 0,
                                   sub: int = 0,
                                   interpret: bool = False, base=None):
    """BLAS1-prologue fused msolve (one launch, two outputs):

        p = a + c1·(b + c2·c)          (elementwise, in-kernel)
        y = P_u · (inv_d ∘ (P_l p))    (the fused Neumann series)

    returning ``(p_pad, y_pad)``.  Folds the BiCGSTAB p-update
    ``p = r + β(p − ω v)`` (c1=β, c2=−ω) and r1-production ``r1 = r − α v``
    (``c_pad=None`` → the two-stream form ``p = a + c1·b``, which skips the
    dead c operand's HBM stream entirely) into the msolve that immediately
    consumes them (reference axpy sites pbicgstab.cu:86-88,:108 feeding the
    L/U solves :94,:123) — saves the XLA axpy dispatch node and a full HBM
    write+read of p per application.  Same layout contract as
    :func:`const_series_msolve_padded`; scalars ride in SMEM.
    """
    npad = a_pad.shape[0] - 2 * block
    assert npad % block == 0 and block % sub == 0
    hpad = msolve_halo(terms_u)
    h_l = max(abs(t[0]) for t in terms_l)
    assert h_l + hpad <= sub, (h_l, hpad, sub)
    assert hpad <= block
    assert gapmask_ext.shape == (block + 2 * hpad,)
    nvec = 2 if c_pad is None else 3
    assert inv_d_pad.shape == a_pad.shape == b_pad.shape
    assert c_pad is None or c_pad.shape == a_pad.shape
    g = npad // block + 2
    k = block // sub
    n_sub = (npad + 2 * block) // sub
    if base is None:
        base = jnp.zeros((1,), jnp.int32)
    dt = a_pad.dtype
    coef = jnp.stack([jnp.asarray(c1, dt).reshape(()),
                      jnp.asarray(0.0 if c2 is None else c2,
                                  dt).reshape(())])

    def sub_map(j):
        return lambda i: (jnp.clip(i * k + j - 1, 0, n_sub - 1),)

    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    sub_specs = [pl.BlockSpec((sub,), sub_map(j), memory_space=pltpu.VMEM)
                 for j in range(k + 2)]
    gap_spec = pl.BlockSpec((block + 2 * hpad,), lambda i: (0,),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((block,), lambda i: (i,),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((npad + 2 * block,), dt)
    kernel = partial(_const_msolve_fma_kernel, terms_l=terms_l,
                     terms_u=terms_u, hpad=hpad, block=block, sub=sub,
                     np_true=np_true, nvec=nvec)
    streams = [a_pad, b_pad] + ([c_pad] if nvec == 3 else []) + [inv_d_pad]
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[smem_spec, smem_spec] + sub_specs * (nvec + 1)
        + [gap_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(out_shape, out_shape),
        scratch_shapes=[pltpu.VMEM((block + 2 * hpad,), dt)],
        interpret=interpret,
    )(jnp.asarray(base, jnp.int32).reshape(1), coef,
      *[v for s in streams for v in [s] * (k + 2)], gapmask_ext)


def detect_const_stencil(dia, dc_max: int = 8, dr_max: int = 8):
    """Detect constant-coefficient 2-D grid-stencil structure in a DIA matrix.

    Returns ``(c_grid, terms)`` with ``terms = ((off, dc, scal), ...)`` when
    the matrix is exactly ``A[(gi,gj),(gi+dr,gj+dc)] = scal_k`` on an R×C
    grid (entries whose neighbor leaves the grid are zero), else ``None``.
    Candidates for C are the |offsets| > dc_max (an offset too large to be a
    within-row step must be a row step); the grid interpretation is verified
    exactly against the stored diagonal data, so a successful detection is a
    proof, not a heuristic.
    """
    if dia.n != dia.m or dia.ndiag == 0:
        return None
    n = dia.n
    offs = [int(o) for o in dia.offsets]
    cands = sorted({abs(o) for o in offs if abs(o) > dc_max}, reverse=True)
    if cands:
        # cheap short-circuit before the exact O(ndiag*n) verification: every
        # diagonal of a constant stencil has at most two distinct values
        # (the scalar + boundary zeros) — a strided sample proves most
        # non-stencil matrices are not candidates in O(ndiag * n/step)
        step = max(1, n // 4096)
        for d in range(len(offs)):
            if np.unique(dia.data[d, ::step]).size > 2:
                return None
    idx = np.arange(n, dtype=np.int64)
    for c in cands:
        if n % c or n // c < 2:
            continue
        gj = idx % c
        terms = []
        ok = True
        for d, off in enumerate(offs):
            dr = int(np.rint(off / c))
            dc = off - dr * c
            if abs(dc) > dc_max or abs(dr) > dr_max:
                ok = False
                break
            data = dia.data[d]
            valid = (gj + dc >= 0) & (gj + dc < c)
            # row-direction validity: i + off in [0, n) is already implied by
            # row-aligned DIA construction (out-of-range slots are 0) — but
            # those zero slots must not break the constant check, so restrict
            # to in-range rows as well
            lo, hi = max(0, -off), min(n, n - off)
            valid = valid & (idx >= lo) & (idx < hi)
            vals = data[valid]
            if vals.size == 0 or np.any(vals != vals[0]) \
                    or np.any(data[~valid] != 0):
                ok = False
                break
            terms.append((off, dc, float(vals[0])))
        if ok:
            return c, tuple(terms)
    return None


def _lcm(a: int, b: int) -> int:
    import math

    return a * b // math.gcd(a, b)


def stencil_layout(c_grid: int, n: int, terms,
                   block_target: int = 262144, min_sub: int = 0):
    """Choose the gap-strided layout (stride, sub, block, np_true, npad) for
    a grid with row length C.  Constraints: stride >= C + max|dc| (seam reads
    land in zero gap cells) and a multiple of 128 (lanes); sub >= max strided
    offset and a multiple of 1024 (HBM DMA alignment); block a multiple of
    both sub (pipeline) and stride (per-block-identical gap mask).

    ``min_sub``: widen the halo sub-block so operators with larger offsets
    (e.g. a fused Neumann-series stencil, max offset ~(k-1)*stride) share the
    layout; costs only extra x overfetch (2*sub/block of n)."""
    dcmax = max((abs(t[1]) for t in terms), default=0)
    stride = _round_up(c_grid + dcmax, 128)
    r = n // c_grid
    np_true = r * stride
    if np_true >= 2 ** 31:
        # the kernel's tail-mask iota compares in int32
        raise ValueError(f"strided dimension {np_true} overflows the int32"
                         " tail mask; use PallasDIAOperator instead")
    # strided offsets: off' = dr*stride + dc
    soffs = [((t[0] - t[1]) // c_grid) * stride + t[1] for t in terms]
    sub = _round_up(max(max(abs(o) for o in soffs), min_sub, 1), 1024)
    base = _lcm(sub, stride)
    if base > (1 << 19):
        raise ValueError(
            f"stencil layout base block {base} exceeds the VMEM budget"
            f" (C={c_grid}); use PallasDIAOperator instead")
    m = max(1, min(block_target // base, -(-np_true // base)))
    block = base * m
    npad = _round_up(np_true, block)
    return stride, sub, block, np_true, npad, tuple(
        (so, float(t[2])) for so, t in zip(soffs, terms))


@dataclasses.dataclass(frozen=True)
class ConstStencilOperator:
    """Matrix-free device operator for constant-coefficient grid stencils in
    the gap-strided block-halo layout (see the module comment above for the
    measured design rationale).

    Pad protocol (``pad_vec``/``unpad_vec`` + padding as an iteration fixed
    point) matches :class:`~cuda_mat_tpu.ops.pallas_spmv.PallasDIAOperator`,
    so the solver loops run unchanged; the *internal* coordinates are
    strided, so factor operators built to compose with this one (Neumann
    series N_l/N_u) must be restrided to the same layout — see
    :func:`restride_dia`.
    """

    gapmask: jax.Array         # [block] 0/1, zeroes gap cells (VMEM-resident)
    terms: Tuple[Tuple[int, int, float], ...]  # static true-coord (off, dc, scal)
    strided_terms: Tuple[Tuple[int, float], ...]  # static (off', scal)
    c_grid: int                # static grid row length C
    stride: int                # static strided row length S >= C
    n: int                     # static true dimension (R*C)
    np_true: int               # static strided dimension (R*S)
    npad: int                  # static block-padded strided dimension
    block: int                 # static
    sub: int                   # static halo sub-block
    vec_dtype: str = "float32"
    interpret: bool = False

    @property
    def m(self) -> int:
        return self.n

    @property
    def r(self) -> int:
        return self.n // self.c_grid

    @property
    def nnz(self) -> int:
        nz = 0
        for off, dc, _ in self.terms:
            lo, hi = max(0, -off), min(self.n, self.n - off)
            cnt = hi - lo
            if dc:
                gj = np.arange(lo, hi, dtype=np.int64) % self.c_grid
                cnt = int(np.count_nonzero((gj + dc >= 0) & (gj + dc
                                                             < self.c_grid)))
            nz += cnt
        return nz

    @classmethod
    def from_dia(cls, dia, dtype=jnp.float32, block_target: int = 262144,
                 interpret: bool = False, min_sub: int = 0
                 ) -> "ConstStencilOperator":
        det = detect_const_stencil(dia)
        if det is None:
            raise ValueError(
                "matrix is not a constant-coefficient grid stencil; use"
                " PallasDIAOperator / make_operator instead")
        c_grid, terms = det
        stride, sub, block, np_true, npad, sterms = stencil_layout(
            c_grid, dia.n, terms, block_target, min_sub)
        gap = np.zeros(block, dtype=np.dtype(dtype))
        gap.reshape(block // stride, stride)[:, :c_grid] = 1.0
        return cls(jnp.asarray(gap), terms, sterms, c_grid, stride, dia.n,
                   np_true, npad, block, sub, str(np.dtype(dtype)), interpret)

    def pad_vec(self, v) -> jax.Array:
        dt = jnp.dtype(self.vec_dtype)
        v2 = jnp.asarray(v, dt).reshape(self.r, self.c_grid)
        g = jnp.zeros((self.r, self.stride), dt).at[:, : self.c_grid].set(v2)
        out = jnp.zeros(self.npad + 2 * self.block, dt)
        return out.at[self.block: self.block + self.np_true].set(
            g.reshape(-1))

    def unpad_vec(self, v_pad: jax.Array) -> jax.Array:
        g = v_pad[self.block: self.block + self.np_true].reshape(
            self.r, self.stride)
        return g[:, : self.c_grid].reshape(-1)

    def matvec(self, x_pad: jax.Array) -> jax.Array:
        return const_stencil_spmv_padded(x_pad, self.gapmask,
                                         self.strided_terms, self.np_true,
                                         self.block, self.sub,
                                         self.interpret)

    def matvec_dots(self, x_pad: jax.Array, ws, with_self: bool = False):
        """``(A x, (<w, Ax> for w in ws) [+ <Ax, Ax>])`` in one launch —
        see :func:`const_stencil_spmv_dots_padded`."""
        return const_stencil_spmv_dots_padded(
            x_pad, self.gapmask, ws, self.strided_terms, self.np_true,
            self.block, self.sub, with_self, self.interpret)


jax.tree_util.register_dataclass(
    ConstStencilOperator, data_fields=["gapmask"],
    meta_fields=["terms", "strided_terms", "c_grid", "stride", "n",
                 "np_true", "npad", "block", "sub", "vec_dtype", "interpret"])


def const_factor_terms(dia, c_grid: int, stride: int):
    """Deep-interior constant-stencil approximation of a banded matrix on an
    R×C grid: sample each diagonal at a row where every offset is in-range
    (grid center) and return ``(terms, strided_terms)`` in the formats of
    :class:`ConstStencilOperator` (``(off, dc, scal)`` / ``(off', scal)``).

    Used for ILU(0) Neumann factors of constant stencils, whose diagonals
    converge geometrically to interior fixed points away from the boundary
    (the approximation perturbs only a boundary layer of the
    *preconditioner*; see NeumannILUPreconditioner.from_csr)."""
    n = dia.n
    r = n // c_grid
    assert n % c_grid == 0
    i0 = (r // 2) * c_grid + c_grid // 2
    terms = []
    sterms = []
    for k, off in enumerate(int(o) for o in dia.offsets):
        dr = int(np.rint(off / c_grid))
        dc = off - dr * c_grid
        if abs(dc) > stride - c_grid and dc != 0:
            raise ValueError(f"offset {off}: |dc|={abs(dc)} exceeds the gap"
                             f" width {stride - c_grid}")
        if not (0 <= i0 + off < n and 0 <= (i0 % c_grid) + dc < c_grid):
            raise ValueError(f"offset {off} has no interior sample row on an"
                             f" {r}x{c_grid} grid")
        scal = float(dia.data[k, i0])
        terms.append((off, dc, scal))
        sterms.append((dr * stride + dc, scal))
    return tuple(terms), tuple(sterms)


def neumann_poly_terms(terms, k: int, c_grid: int, stride: int):
    """Expand the truncated Neumann series ``P = Σ_{j<k} (−N)^j`` of a
    constant-stencil ``N`` into a single constant stencil.

    Stencil composition is polynomial multiplication over (dr, dc) offsets:
    ``(N²)`` terms are all pairwise offset sums with coefficient products.
    On the gap-strided layout the composition is *exact* as long as every
    accumulated ``|dc| <= stride − c_grid``: a within-row offset that leaves
    the true columns lands in a zero gap cell, which is precisely the value
    the sequential application would have read after its gap re-masking
    (and row offsets beyond the grid land in the zero pad/tail).  One kernel
    launch then applies the whole series — x read once, y written once —
    replacing ``k−1`` matvecs plus their series adds.

    ``terms``: ((off, dc, scal), ...) of N.  Returns the same format for P,
    or raises ValueError when an accumulated |dc| exceeds the gap width.
    """
    gap = stride - c_grid
    acc = {(0, 0): 1.0}                      # I
    power = {(t[0], t[1]): t[2] for t in terms}   # N^1 keyed by (off, dc)
    cur = dict(power)
    for j in range(1, k):
        sign = -1.0 if j % 2 else 1.0
        for (off, dc), v in cur.items():
            acc[(off, dc)] = acc.get((off, dc), 0.0) + sign * v
        if j + 1 < k:
            nxt = {}
            for (o1, d1), v1 in cur.items():
                for (o2, d2), v2 in power.items():
                    key = (o1 + o2, d1 + d2)
                    nxt[key] = nxt.get(key, 0.0) + v1 * v2
            cur = nxt
    out = []
    for (off, dc), v in sorted(acc.items()):
        if abs(dc) > gap and dc != 0:
            raise ValueError(
                f"series term dc={dc} exceeds the gap width {gap}"
                f" (stride {stride}, C {c_grid}); apply the series"
                " term-by-term instead")
        if v != 0.0:
            out.append((off, dc, float(v)))
    return tuple(out)


def compose_stencil_terms(ta, tb, c_grid: int, stride: int):
    """Product stencil ``C = A·B`` of two constant stencils (polynomial
    multiplication over (dr, dc) offsets) — exact on the gap-strided layout
    while every accumulated ``|dc| <= stride − c_grid`` (see
    :func:`neumann_poly_terms` for why).  Raises ValueError past the gap."""
    gap = stride - c_grid
    out = {}
    for (o1, d1, v1) in ta:
        for (o2, d2, v2) in tb:
            k = (o1 + o2, d1 + d2)
            out[k] = out.get(k, 0.0) + v1 * v2
    res = []
    for (off, dc), v in sorted(out.items()):
        if abs(dc) > gap and dc != 0:
            raise ValueError(f"composed term dc={dc} exceeds the gap width"
                             f" {gap} (stride {stride}, C {c_grid})")
        if v != 0.0:
            res.append((off, dc, float(v)))
    return tuple(res)


def strided_offsets(terms, c_grid: int, stride: int):
    """((off', scal), ...) for :func:`const_stencil_spmv_padded` from
    true-coordinate ``(off, dc, scal)`` terms."""
    return tuple((((t[0] - t[1]) // c_grid) * stride + t[1], float(t[2]))
                 for t in terms)


# Mosaic's scoped-VMEM stack budget is 16 MiB; the const-stencil kernel's
# working set is ~(nterms + a few buffers) * block * 4 bytes (one shifted
# window per term plus xs/y/gapmask and double-buffering).  Keep a margin.
_VMEM_BUDGET = 12 << 20


def stencil_vmem_block_cap(nterms: int, itemsize: int = 4) -> int:
    """Largest kernel block for which an ``nterms``-term const stencil fits
    the scoped-VMEM budget (measured: 19 terms at block 262144 = 21.7 MiB >
    the 16 MiB limit)."""
    return _VMEM_BUDGET // (itemsize * (nterms + 6))


# Extra block-sized VMEM buffers each msolve kernel variant holds on top of
# the const-stencil matvec's own +6 (stencil_vmem_block_cap): the plain
# fused msolve adds the u scratch + d stream + extended mask + windowed x;
# the BLAS1-prologue (fma) variants add the extra input streams, the p
# output, and the combination temporaries.  These constants are THE single
# source for the layout planner AND the engagement gates
# (NeumannILUPreconditioner.from_csr, make_dist_bicgstab) — a drifted copy
# once made fma_fits unsatisfiable on every planner-constrained layout.
MSOLVE_EXTRA_BUFS = 4        # const_series_msolve_padded
# Both fma forms (two-stream p = a + c1*b and three-stream
# p = a + c1*(b + c2*c)) are gated on the three-stream working set: the two
# forms run through the SAME compiled kernel graph per solve (precond_core
# issues both within one iteration), so the conservative bound is the one
# that matters and a separate two-stream constant would be dead (ADVICE r4).
FMA3_MSOLVE_EXTRA_BUFS = 9   # fma variant, 3 input streams + p output


def plan_const_neumann_layout(terms, k: int, c_grid: int, stride: int,
                              prefer_mono: bool = False,
                              fuse_kernel: bool = True,
                              fuse_blas1: bool = False):
    """Symbolically expand the Neumann-series pattern on A's own offsets
    (ILU(0) factors share A's sparsity) and return
    ``(min_sub, block_target, terms_upper_bound)`` such that the fused
    series — plus the mono composition when ``prefer_mono`` and it fits the
    gap — obey the kernel's halo and scoped-VMEM constraints.  Returns None
    when the series cannot fuse at all (|dc| past the gap at the
    per-triangle level).

    ``fuse_kernel``: additionally size the layout for the one-launch fused
    msolve kernel (:func:`const_series_msolve_padded`): the halo sub-block
    must cover ``max|off_l| + hpad`` (the P_l window of the extended u
    region) and the scoped-VMEM working set holds both polynomials' shifted
    windows at once.  ``fuse_blas1``: size for the BLAS1-prologue variant's
    larger working set (:data:`FMA3_MSOLVE_EXTRA_BUFS` — three input
    streams + the p output) so ``msolve_fma`` can actually engage; the
    matvec is block-size-insensitive (CLAUDE.md measured facts), so the
    smaller block is free."""
    lower = tuple((o, d, 1.0) for (o, d, _) in terms if o < 0)
    upper = tuple((o, d, 1.0) for (o, d, _) in terms if o > 0)
    if not lower or not upper:
        return None
    try:
        pl = neumann_poly_terms(lower, k, c_grid, stride)
        pu = neumann_poly_terms(upper, k, c_grid, stride)
    except ValueError:
        return None
    nmax = max(len(pl), len(pu), len(terms))
    if prefer_mono:
        try:
            nmax = max(nmax,
                       len(compose_stencil_terms(pu, pl, c_grid, stride)))
        except ValueError:
            pass  # mono exceeds the gap; per-triangle series still fuses
    soffs_l = [((t[0] - t[1]) // c_grid) * stride + t[1] for t in pl]
    soffs_u = [((t[0] - t[1]) // c_grid) * stride + t[1] for t in pu]
    min_sub = max(abs(o) for o in soffs_l + soffs_u)
    if fuse_kernel:
        hpad = msolve_halo(tuple((o, 1.0) for o in soffs_u))
        min_sub = max(min_sub, max(abs(o) for o in soffs_l) + hpad)
        # the fused kernel holds P_l windows over (block + 2 hpad) plus P_u
        # windows, x/d streams, u scratch and the extended mask, modeled as
        # block-sized buffers on top of the matvec kernel's own +6; the
        # BLAS1-prologue variant adds its extra input streams + p output
        extra = FMA3_MSOLVE_EXTRA_BUFS if fuse_blas1 else MSOLVE_EXTRA_BUFS
        nmax = max(nmax, len(pl) + len(pu) + extra)
    return min_sub, stencil_vmem_block_cap(nmax), nmax


def restride_dia(dia, c_grid: int, stride: int):
    """Re-index an n = R·C banded matrix into the gap-strided coordinate
    system (n' = R·S): entry (i, j) moves to (i', j') with
    i' = (i//C)·S + i%C.  Gap rows/columns are structurally zero, so the
    result is again banded with offsets mapped dr·C + dc → dr·S + dc.

    Used to build factor operators (ILU(0) Neumann-series N_l / N_u) that
    compose with a :class:`ConstStencilOperator`'s padded vectors — the DIA
    data itself provides the gap/tail masking (zero slots), so a plain
    :class:`~cuda_mat_tpu.ops.pallas_spmv.PallasDIAOperator` over the
    restrided matrix preserves the fixed-point property.
    """
    from cuda_mat_tpu.formats.dia import DIAMatrix

    n = dia.n
    assert n % c_grid == 0
    r = n // c_grid
    np_true = r * stride
    offs = [int(o) for o in dia.offsets]
    new_offs = []
    for off in offs:
        dr = int(np.rint(off / c_grid))
        dc = off - dr * c_grid
        if abs(dc) > stride - c_grid and dc != 0:
            raise ValueError(f"offset {off}: |dc|={abs(dc)} exceeds the gap"
                             f" width {stride - c_grid}")
        new_offs.append(dr * stride + dc)
    order = np.argsort(new_offs)
    data = np.zeros((dia.ndiag, np_true), dtype=dia.data.dtype)
    idx = np.arange(n, dtype=np.int64)
    pos = (idx // c_grid) * stride + (idx % c_grid)
    for k, d in enumerate(order):
        data[k, pos] = dia.data[d]
    return DIAMatrix(np_true, np_true,
                     np.asarray([new_offs[d] for d in order], np.int32),
                     data, dia.nnz)
