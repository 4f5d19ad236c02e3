"""Distributed SpMV and BiCGSTAB over a 1-D device mesh.

The whole solver loop runs inside one ``shard_map`` region under ``jit``:

- **SpMV**: each shard's banded block multiplies an extended local x built
  from two neighbor ``ppermute`` exchanges of w-element halo segments (the
  SURVEY §2 "halo-exchange collective"; on hardware XLA schedules the
  ppermutes over ICI and overlaps them with the leading local diagonals).
- **Dots/norms**: local partial + ``lax.psum`` — replacing every
  ``cublasDdot``/``Dnrm2`` host sync of the reference (pbicgstab.cu:81,106,
  111,135-136,142) with an on-device replicated scalar.
- The scalar recurrences and convergence branches are the *same code* as the
  single-chip path (:func:`cuda_mat_tpu.solvers.bicgstab.hform_core` /
  :func:`precond_core`), closed over the distributed matvec/dot.
- **Carry layout** (Pallas engines): the loop vectors live per shard in the
  kernel-padded form ``[zero block | shard_rows | zero block]`` across the
  *whole* while_loop — the same zero-pad fixed-point protocol the single-chip
  operators use — so matvec/msolve applications launch straight on the carry
  instead of rebuilding a padded input with zeros + dynamic_update_slice +
  dynamic_slice each call (~3 dispatch nodes × 4 applications/iteration ≈ the
  entire 2x per-iteration overhead the r3 engine paid at mesh(1);
  VERDICT r3 #1).  See :func:`_to_carry`.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cuda_mat_tpu.config import SolverConfig, DEFAULT_CONFIG
from cuda_mat_tpu.parallel.mesh import ROWS_AXIS
from cuda_mat_tpu.parallel.partition import RowPartitionedBanded
from cuda_mat_tpu.solvers.bicgstab import hform_core, precond_core
from cuda_mat_tpu.solvers.result import SolveResult, SolverStatus

shard_map = jax.shard_map


def _make_local_matvec(offsets, halo, shard_rows, ndev, axis=ROWS_AXIS,
                       overlap: bool = True):
    """Build the per-shard banded matvec with neighbor halo exchange.

    Non-circular ppermute: edge devices receive zeros for the missing
    neighbor, which is exactly the global boundary condition (row-aligned DIA
    data is already zero where a diagonal runs off the matrix edge).

    ``overlap=True`` (default, requires shard_rows >= 2*halo) computes the
    interior rows ``[w, s-w)`` — which read only local x — as a separate
    dependency chain from the ppermutes, so XLA's latency-hiding scheduler
    can run the halo exchange over ICI *during* the bulk of the multiply
    (SURVEY §2 "overlapped with local-block SpMV").  The per-row operations
    and their order are identical to the unsplit form, so results match
    bitwise."""
    w = halo
    s = shard_rows
    send_right = [(i, i + 1) for i in range(ndev - 1)]
    send_left = [(i + 1, i) for i in range(ndev - 1)]
    split = overlap and w > 0 and ndev > 1 and s >= 2 * w

    def matvec(data_local, xl):
        if w > 0 and ndev > 1:
            left_halo = jax.lax.ppermute(xl[-w:], axis, send_right)
            right_halo = jax.lax.ppermute(xl[:w], axis, send_left)
        if not split:
            if w > 0 and ndev > 1:
                x_ext = jnp.concatenate([left_halo, xl, right_halo])
            else:
                x_ext = jnp.pad(xl, (w, w))
            y = jnp.zeros(s, xl.dtype)
            for k, off in enumerate(offsets):
                y = y + data_local[k] * jax.lax.dynamic_slice(
                    x_ext, (w + off,), (s,))
            return y
        # interior rows [w, s-w): row+off stays inside [0, s) for |off| <= w
        y_int = jnp.zeros(s - 2 * w, xl.dtype)
        for k, off in enumerate(offsets):
            y_int = y_int + data_local[k, w: s - w] * jax.lax.dynamic_slice(
                xl, (w + off,), (s - 2 * w,))
        # boundary rows: [0, w) reads x_ext rows [-w, 2w); [s-w, s) reads
        # [s-2w, s+w) — each needs one halo plus a 2w-deep local edge
        xe_l = jnp.concatenate([left_halo, xl[: 2 * w]])
        xe_r = jnp.concatenate([xl[s - 2 * w:], right_halo])
        y_l = jnp.zeros(w, xl.dtype)
        y_r = jnp.zeros(w, xl.dtype)
        for k, off in enumerate(offsets):
            y_l = y_l + data_local[k, :w] * jax.lax.dynamic_slice(
                xe_l, (w + off,), (w,))
            y_r = y_r + data_local[k, s - w:] * jax.lax.dynamic_slice(
                xe_r, (w + off,), (w,))
        return jnp.concatenate([y_l, y_int, y_r])

    return matvec


def _pallas_blocks(w: int, interpret: bool) -> Tuple[int, int]:
    """(block, sub) for the per-shard Pallas DIA kernel: ``sub`` must cover
    the bandwidth and satisfy Mosaic's 1024-element DMA alignment on real
    TPUs (relaxed to 8 in interpret mode so CPU-mesh tests stay small)."""
    unit = 8 if interpret else 1024
    sub = -(-max(w, 1) // unit) * unit
    base = 32 if interpret else 4096
    block = -(-max(base, sub) // sub) * sub
    return block, sub


def _to_carry(vpad: np.ndarray, ndev: int, shard_rows: int, block: int,
              fill: float = 0.0) -> np.ndarray:
    """Interleave a (ndev*shard_rows,) partition-padded host vector into the
    per-shard *carry* layout (ndev*(shard_rows + 2*block),): each shard's
    slice is ``[pad block | local rows | pad block]`` with ``fill`` in the
    pad blocks (0 for loop vectors — a fixed point of the kernels and of
    every BLAS1 op — and 1 for inverse-diagonal streams so ``inv_d * 0``
    stays an exact zero)."""
    m = np.asarray(vpad).reshape(ndev, shard_rows)
    return np.pad(m, ((0, 0), (block, block)),
                  constant_values=fill).reshape(-1)


def _from_carry(vc: np.ndarray, ndev: int, shard_rows: int, block: int
                ) -> np.ndarray:
    """Inverse of :func:`_to_carry` (drop the per-shard pad blocks)."""
    m = np.asarray(vc).reshape(ndev, shard_rows + 2 * block)
    return np.ascontiguousarray(
        m[:, block: block + shard_rows]).reshape(-1)


def _make_local_matvec_pallas(offsets, halo, shard_rows, ndev, axis,
                              block, sub, interpret, overlap: bool = True):
    """Per-shard banded matvec with the block-halo Pallas kernel
    (:func:`cuda_mat_tpu.ops.pallas_spmv.dia_spmv_block_padded` — the ROADMAP
    'per-shard Pallas SpMV inside shard_map' item), operating on the
    *carry layout*: in and out are (shard_rows + 2*block,) vectors whose
    zero pad blocks persist across the whole solver loop (:func:`_to_carry`,
    VERDICT r3 #1), so an application adds no relayout nodes.

    ``overlap=True`` (default, needs shard_rows >= 2*halo): the kernel is
    launched on the local-only carry (zero pad blocks), so it does not
    depend on the ppermutes and XLA's latency-hiding scheduler can fly the
    halo exchange over ICI during the kernel; the 2w boundary rows — the
    only rows that read halo values — are then recomputed in XLA from the
    halos plus a 2w-deep local edge and overwrite the kernel's edge rows.
    The per-row multiply-add sequence is identical (same offsets order), so
    the result matches the unsplit form bitwise (mirrors the XLA engine's
    interior/boundary split, SURVEY §2 'overlapped with local-block SpMV';
    VERDICT r2 next-round #2).

    ``overlap=False`` scatters the halos into the carry's pad blocks before
    the launch (the r2 serializing form, kept for the bitwise test)."""
    from cuda_mat_tpu.ops.pallas_spmv import dia_spmv_block_padded

    assert shard_rows % block == 0 and block % sub == 0
    w = halo
    s = shard_rows
    send_right = [(i, i + 1) for i in range(ndev - 1)]
    send_left = [(i + 1, i) for i in range(ndev - 1)]
    split = overlap and w > 0 and ndev > 1 and s >= 2 * w

    def _edge_rows(data_local, xe, row0):
        # same accumulation order as _dia_block_kernel's interior loop
        acc = data_local[0][row0: row0 + w] * jax.lax.dynamic_slice(
            xe, (w + offsets[0],), (w,))
        for k, off in enumerate(offsets[1:], start=1):
            acc = acc + data_local[k][row0: row0 + w] * jax.lax.dynamic_slice(
                xe, (w + off,), (w,))
        return acc

    def matvec(data_local, xc):
        if w > 0 and ndev > 1:
            left_halo = jax.lax.ppermute(
                jax.lax.slice(xc, (block + s - w,), (block + s,)),
                axis, send_right)
            right_halo = jax.lax.ppermute(
                jax.lax.slice(xc, (block,), (block + w,)), axis, send_left)
        x_in = xc
        if not split and w > 0 and ndev > 1:
            x_in = jax.lax.dynamic_update_slice(x_in, left_halo, (block - w,))
            x_in = jax.lax.dynamic_update_slice(x_in, right_halo,
                                                (block + s,))
        y = dia_spmv_block_padded(data_local, x_in, tuple(offsets),
                                  block, sub, interpret)
        if split:
            # rows [0, w) read x rows [-w, 2w); rows [s-w, s) read [s-2w, s+w)
            y_l = _edge_rows(data_local, jnp.concatenate(
                [left_halo, jax.lax.slice(xc, (block,), (block + 2 * w,))]),
                0)
            y_r = _edge_rows(data_local, jnp.concatenate(
                [jax.lax.slice(xc, (block + s - 2 * w,), (block + s,)),
                 right_halo]), s - w)
            y = jax.lax.dynamic_update_slice(y, y_l, (block,))
            y = jax.lax.dynamic_update_slice(y, y_r, (block + s - w,))
        return y

    return matvec


def _make_local_matvec_stencil(part, axis, interpret, overlap: bool = True,
                                sterms=None, halo=None):
    """Per-shard matvec for the gap-strided constant-stencil Pallas kernel
    (:func:`cuda_mat_tpu.ops.pallas_stencil.const_stencil_spmv_padded`) — the
    flagship single-chip matvec (2.06x the DIA kernel, BASELINE.md) made
    distributed (VERDICT r2 next-round #1).

    The coefficient field is compile-time scalars, so the only sharded state
    is x itself; the replicated ``(block,)`` gap mask rides along as the one
    array argument.  The kernel's tail mask takes the shard's global strided
    base row (``axis_index * shard_rows``) so every shard traces the same
    program and the strided tail [np_true, npad) stays an exact zero fixed
    point.

    Operates on the *carry layout* — (shard_rows + 2*block,) vectors with
    persistent zero pad blocks (:func:`_to_carry`, VERDICT r3 #1) — so an
    application is one kernel launch with no relayout nodes.

    ``overlap=True`` (default, needs shard_rows >= 2*halo): the kernel
    launches on the local-only carry (zero pad blocks) so the two halo
    ppermutes fly over ICI during the kernel; the w boundary rows at each
    end — the only rows that read halo values — are recomputed in XLA
    afterwards with the same multiply-add order, so the result matches the
    unsplit (scatter) form bitwise.  Replaces reference pbicgstab.cu:104,132.
    """
    from cuda_mat_tpu.ops.pallas_stencil import const_stencil_spmv_padded

    # custom ``sterms``/``halo`` let factor operators (e.g. the fused
    # Neumann-series polynomial, VERDICT r2 #6) reuse A's partition layout
    w = part.halo if halo is None else halo
    s = part.shard_rows
    block, sub = part.block, part.sub
    sterms = part.strided_terms if sterms is None else sterms
    np_true = part.np_true
    ndev = part.ndev
    assert s % block == 0 and block % sub == 0 and w <= sub
    send_right = [(i, i + 1) for i in range(ndev - 1)]
    send_left = [(i + 1, i) for i in range(ndev - 1)]
    split = overlap and w > 0 and ndev > 1 and s >= 2 * w

    def _edge_rows(xe, gap_slice, row0_global):
        # same accumulation order as _const_stencil_kernel's interior: terms
        # in order, then the gap multiply, then the tail select
        acc = None
        for (off, scal) in sterms:
            term = jnp.asarray(scal, xe.dtype) * jax.lax.dynamic_slice(
                xe, (w + off,), (w,))
            acc = term if acc is None else acc + term
        acc = acc * gap_slice
        t = row0_global + jax.lax.iota(jnp.int32, w)
        return jnp.where(t < jnp.int32(np_true), acc, jnp.zeros_like(acc))

    def matvec(gapmask, xc):
        base = (jax.lax.axis_index(axis) * s).astype(jnp.int32)
        if w > 0 and ndev > 1:
            left_halo = jax.lax.ppermute(
                jax.lax.slice(xc, (block + s - w,), (block + s,)),
                axis, send_right)
            right_halo = jax.lax.ppermute(
                jax.lax.slice(xc, (block,), (block + w,)), axis, send_left)
        x_in = xc
        if not split and w > 0 and ndev > 1:
            x_in = jax.lax.dynamic_update_slice(x_in, left_halo, (block - w,))
            x_in = jax.lax.dynamic_update_slice(x_in, right_halo,
                                                (block + s,))
        y = const_stencil_spmv_padded(x_in, gapmask, sterms, np_true,
                                      block, sub, interpret,
                                      base=base.reshape(1))
        if split:
            # rows [0, w) read x rows [-w, 2w); rows [s-w, s) read [s-2w, s+w)
            y_l = _edge_rows(jnp.concatenate(
                [left_halo, jax.lax.slice(xc, (block,), (block + 2 * w,))]),
                gapmask[:w], base)
            y_r = _edge_rows(jnp.concatenate(
                [jax.lax.slice(xc, (block + s - 2 * w,), (block + s,)),
                 right_halo]), gapmask[block - w:], base + (s - w))
            y = jax.lax.dynamic_update_slice(y, y_l, (block,))
            y = jax.lax.dynamic_update_slice(y, y_r, (block + s - w,))
        return y

    return matvec


def _make_local_msolve_kernel(part, axis, interpret, terms_l, terms_u,
                              overlap: bool = True, fma: bool = False):
    """Per-shard ONE-launch fused Neumann msolve
    (:func:`cuda_mat_tpu.ops.pallas_stencil.const_series_msolve_padded`):
    ``y = P_u (inv_d ∘ P_l x)`` with the intermediate held in VMEM scratch —
    one ppermute pair per application (like "mono") while keeping the exact
    diagonal (like "series").  ``terms_l``/``terms_u``: strided (off, scal)
    polynomials.  The inv_d stream with neighbor halos is static setup data
    (see the d_pad construction in :func:`dist_bicgstab`), so no second
    exchange is needed.  Operates on the carry layout (:func:`_to_carry`).
    Replaces the reference msolve role pbicgstab.cu:92-98 shard-parallel.

    ``overlap=True`` (default): the kernel launches on the local-only carry
    (zero pad blocks), taking its ppermute pair OFF the msolve critical path
    (VERDICT r3 #2 — the r3 form serialized two ICI round-trips per
    iteration); the boundary rows that read halo x are recomputed in XLA
    through the same two-stage composition — ``u = (P_l x · gap) · inv_d``
    over an extended edge window, masked to the global true rows, then
    ``y = (P_u u) · gap`` with the tail mask — reproducing the kernel's
    per-row multiply-add sequence.  Unlike the matvec splits (whose ±1/2^k
    stencil scalars make every multiply exact, hence FMA-insensitive), the
    series coefficients are general floats, so the compiler's
    fused-multiply-add contraction choice can differ between the two
    programs: the recomputed boundary rows match the scatter form to <= 1
    ulp, not bitwise (measured: interior rows bitwise-equal — the indexing
    proof — boundary diffs 1 ulp on ~10% of rows; see the CPU-mesh test).
    ``overlap=False`` scatters both halos into the pad blocks before the
    launch (kept for that test).

    ``fma=True`` returns the BLAS1-prologue form instead:
    ``msolve_fma(gap_ext, d_pad, a, c1, b, c2, c) -> (p, y)`` with
    ``p = a + c1·(b + c2·c)`` computed inside the kernel
    (:func:`~cuda_mat_tpu.ops.pallas_stencil.const_series_msolve_fma_padded`)
    — the distributed mirror of
    :meth:`~cuda_mat_tpu.precond.preconditioners.NeumannILUPreconditioner.
    msolve_fma` (VERDICT r3 #5).  p is elementwise, so it needs no exchange
    of its own: the halo strips the neighbors need are the *combination*
    computed in XLA on the O(w) edge rows and ppermuted — still ONE pair per
    application, still off the kernel's critical path."""
    from cuda_mat_tpu.ops.pallas_stencil import (
        const_series_msolve_fma_padded, const_series_msolve_padded,
        msolve_halo)

    hpad = msolve_halo(terms_u)
    lo_l = min(o for o, _ in terms_l)
    hi_l = max(o for o, _ in terms_l)
    lo_u = min(o for o, _ in terms_u)
    hi_u = max(o for o, _ in terms_u)
    h_l = max(abs(lo_l), abs(hi_l))
    w = h_l + hpad                       # scatter-form halo width
    s, block, sub = part.shard_rows, part.block, part.sub
    np_true, ndev = part.np_true, part.ndev
    stride = part.stride
    assert w <= sub and w <= s and hpad <= block
    send_right = [(i, i + 1) for i in range(ndev - 1)]
    send_left = [(i + 1, i) for i in range(ndev - 1)]
    # composition reach: y row j reads x rows [j+lo_u+lo_l, j+hi_u+hi_l], so
    # only rows [0, wl) and [s-wr, s) depend on halo x (for the interior, the
    # kernel's u values on those rows come from local x in both forms)
    wl = max(0, -(lo_u + lo_l))
    wr = max(0, hi_u + hi_l)
    wb = max(wl, wr, 1)                  # exchanged halo width (split form)
    split = (overlap and ndev > 1 and (wl or wr)
             and s >= 2 * (wl + wr) and wb <= s)
    gm = np.asarray(part.gapmask[:stride], np.float64)

    def _gap(idx0, nrows, dtype):
        # gapmask value at local row t is gm[t % stride] (shard bases and
        # shard_rows are stride multiples, so this is shard-independent and
        # a compile-time constant)
        return jnp.asarray(gm[np.arange(idx0, idx0 + nrows) % stride], dtype)

    def _edge_y(xe, d_pad, base, j0, nrows):
        # y rows [j0, j0+nrows) via the kernel's exact two-stage op order:
        # u = (Σ scal_l·x_win) * gap * d, masked to global [0, np_true);
        # y = (Σ scal_u·u_win) * gap, tail-masked (_const_msolve_kernel)
        dt = xe.dtype
        u0, u1 = lo_u, nrows + hi_u      # u rows [j0+u0, j0+u1)
        nu = u1 - u0                     # xe[0] is x row j0 + u0 + lo_l
        acc = None
        for (off, scal) in terms_l:
            win = jax.lax.slice(xe, (off - lo_l,), (off - lo_l + nu,))
            t = jnp.asarray(scal, dt) * win
            acc = t if acc is None else acc + t
        d_w = jax.lax.slice(d_pad, (block + j0 + u0,), (block + j0 + u1,))
        u = acc * _gap(j0 + u0, nu, dt) * d_w
        tu = base + j0 + u0 + jax.lax.iota(jnp.int32, nu)
        u = jnp.where((tu >= 0) & (tu < jnp.int32(np_true)), u,
                      jnp.zeros_like(u))
        acc2 = None
        for (off, scal) in terms_u:
            win = jax.lax.slice(u, (off - u0,), (off - u0 + nrows,))
            t = jnp.asarray(scal, dt) * win
            acc2 = t if acc2 is None else acc2 + t
        y = acc2 * _gap(j0, nrows, dt)
        ty = base + j0 + jax.lax.iota(jnp.int32, nrows)
        return jnp.where(ty < jnp.int32(np_true), y, jnp.zeros_like(y))

    def msolve(gap_ext, d_pad, xc):
        base = (jax.lax.axis_index(axis) * s).astype(jnp.int32)
        x_in = xc
        if ndev > 1:
            hw = wb if split else w
            left_halo = jax.lax.ppermute(
                jax.lax.slice(xc, (block + s - hw,), (block + s,)),
                axis, send_right)
            right_halo = jax.lax.ppermute(
                jax.lax.slice(xc, (block,), (block + hw,)), axis, send_left)
            if not split:
                x_in = jax.lax.dynamic_update_slice(x_in, left_halo,
                                                    (block - w,))
                x_in = jax.lax.dynamic_update_slice(x_in, right_halo,
                                                    (block + s,))
        y = const_series_msolve_padded(x_in, d_pad, gap_ext, terms_l,
                                       terms_u, np_true, block, sub,
                                       interpret, base=base.reshape(1))
        if split:
            if wl:
                # x rows [-wl, wl + wr): wl from the left halo + local edge
                xe_l = jnp.concatenate([
                    jax.lax.slice(left_halo, (wb - wl,), (wb,)),
                    jax.lax.slice(xc, (block,), (block + wl + wr,))])
                y_l = _edge_y(xe_l, d_pad, base, 0, wl)
                y = jax.lax.dynamic_update_slice(y, y_l, (block,))
            if wr:
                # x rows [s - wr - wl, s + wr): local edge + wr of the halo
                xe_r = jnp.concatenate([
                    jax.lax.slice(xc, (block + s - wr - wl,), (block + s,)),
                    jax.lax.slice(right_halo, (0,), (wr,))])
                y_r = _edge_y(xe_r, d_pad, base, s - wr, wr)
                y = jax.lax.dynamic_update_slice(y, y_r, (block + s - wr,))
        return y

    if not fma:
        return msolve

    def msolve_fma(gap_ext, d_pad, ac, c1, bc, c2=None, cc=None):
        base = (jax.lax.axis_index(axis) * s).astype(jnp.int32)

        def comb(lo, hi):
            # the BLAS1 combination on an edge window (XLA; may differ from
            # the kernel's in-VPU FMA by one contraction ulp — same band as
            # the matvec boundary recompute)
            bw = jax.lax.slice(bc, (lo,), (hi,))
            if cc is not None:
                bw = bw + c2 * jax.lax.slice(cc, (lo,), (hi,))
            return jax.lax.slice(ac, (lo,), (hi,)) + c1 * bw

        if ndev > 1 and not split:
            # scatter form (tiny shards): materialize p and reuse the plain
            # path — correct everywhere, just without the fold
            p = (ac + c1 * bc if cc is None
                 else ac + c1 * (bc + c2 * cc))
            return p, msolve(gap_ext, d_pad, p)
        if ndev > 1:
            left_halo = jax.lax.ppermute(comb(block + s - wb, block + s),
                                         axis, send_right)
            right_halo = jax.lax.ppermute(comb(block, block + wb), axis,
                                          send_left)
        p_c, y = const_series_msolve_fma_padded(
            ac, c1, bc, c2, cc, d_pad, gap_ext, terms_l, terms_u, np_true,
            block, sub, interpret, base=base.reshape(1))
        if ndev > 1:
            if wl:
                xe_l = jnp.concatenate([
                    jax.lax.slice(left_halo, (wb - wl,), (wb,)),
                    comb(block, block + wl + wr)])
                y_l = _edge_y(xe_l, d_pad, base, 0, wl)
                y = jax.lax.dynamic_update_slice(y, y_l, (block,))
            if wr:
                xe_r = jnp.concatenate([
                    comb(block + s - wr - wl, block + s),
                    jax.lax.slice(right_halo, (0,), (wr,))])
                y_r = _edge_y(xe_r, d_pad, base, s - wr, wr)
                y = jax.lax.dynamic_update_slice(y, y_r, (block + s - wr,))
        return p_c, y

    return msolve_fma


def _psum_dot(axis=ROWS_AXIS):
    def dot(u, v):
        return jax.lax.psum(jnp.dot(u, v), axis)

    return dot


def put_global(host_array: np.ndarray, sharding) -> jax.Array:
    """``device_put`` that also works when the sharding spans multiple
    processes (multi-host mesh): every process holds the full host array and
    contributes its addressable shards (SURVEY §2 distributed component 4 —
    the multi-host runtime path)."""
    if jax.process_count() > 1:
        return jax.make_array_from_callback(
            host_array.shape, sharding, lambda idx: host_array[idx])
    return jax.device_put(jnp.asarray(host_array), sharding)


def fetch_global(arr: jax.Array) -> np.ndarray:
    """Materialize a (possibly cross-process) sharded array on every host."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(arr, tiled=True))
    return np.asarray(arr)


def make_dist_spmv(part: RowPartitionedBanded, mesh: Mesh, dtype=jnp.float32,
                   local_engine: str = "xla", interpret: bool = False):
    """Jitted distributed SpMV ``y = A x`` over sharded (npad,) vectors.

    ``local_engine``: "xla" = shifted dynamic-slice formulation; "pallas" =
    the block-halo Pallas kernel per shard (build ``part`` with
    ``align=_pallas_blocks(w, interpret)[0]``); "stencil" = the gap-strided
    constant-stencil kernel (build ``part`` with
    :class:`~cuda_mat_tpu.parallel.partition.RowPartitionedStencil`).

    Returns ``(fn, put)`` where ``put(v)`` shards a host vector and
    ``fn(x_sharded)`` computes the product (used by tests and the weak-scaling
    bench).  For the Pallas engines both work in the carry layout
    (:func:`_to_carry`); recover the true vector with
    ``part.unpad_vector(_from_carry(...))`` (as :func:`dist_spmv` does)."""
    axis = mesh.axis_names[0]
    vec_sharding = NamedSharding(mesh, P(axis))
    carry_block = 0
    if local_engine == "stencil":
        data = (put_global(np.asarray(part.gapmask, np.dtype(dtype)),
                           NamedSharding(mesh, P())),)
        data_specs = (P(),)
        mv_st = _make_local_matvec_stencil(part, axis, interpret)
        local_mv = lambda d, xl: mv_st(d[0], xl)  # noqa: E731
        carry_block = part.block
    elif local_engine == "pallas":
        # per-diagonal 1-D streams: no sublane padding in the kernel's data
        # DMA (see PallasDIAOperator.data)
        data = tuple(put_global(np.asarray(part.data[k], np.dtype(dtype)),
                                vec_sharding)
                     for k in range(len(part.offsets)))
        data_specs = (P(axis),) * len(data)
        blk, sub = _pallas_blocks(part.halo, interpret)
        local_mv = _make_local_matvec_pallas(part.offsets, part.halo,
                                             part.shard_rows, part.ndev, axis,
                                             blk, sub, interpret)
        carry_block = blk
    else:
        data = (put_global(np.asarray(part.data, np.dtype(dtype)),
                           NamedSharding(mesh, P(None, axis))),)
        data_specs = (P(None, axis),)
        mv_stacked = _make_local_matvec(part.offsets, part.halo,
                                        part.shard_rows, part.ndev, axis)
        local_mv = lambda d, xl: mv_stacked(d[0], xl)  # noqa: E731

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=(data_specs, P(axis)),
             out_specs=P(axis),
             # pallas_call has no varying-manual-axes info; keep the check on
             # for the XLA engine (a useful correctness net on the common path)
             check_vma=(local_engine not in ("pallas", "stencil")))
    def spmv(data_l, xl):
        return local_mv(data_l, xl)

    def put(v: np.ndarray):
        vp = np.asarray(part.pad_vector(np.asarray(v)), np.dtype(dtype))
        if carry_block:
            vp = _to_carry(vp, part.ndev, part.shard_rows, carry_block)
        return put_global(vp, vec_sharding)

    return (lambda x: spmv(data, x)), put


def dist_spmv(a, x: np.ndarray, mesh: Mesh, dtype=jnp.float64,
              local_engine: str = "xla", interpret: bool = False
              ) -> np.ndarray:
    """One-shot distributed SpMV for a host matrix/vector (convenience)."""
    if local_engine == "stencil":
        from cuda_mat_tpu.parallel.partition import RowPartitionedStencil

        part = RowPartitionedStencil.from_matrix(a, mesh.devices.size)
        fn, put = make_dist_spmv(part, mesh, dtype, local_engine, interpret)
        y = _from_carry(fetch_global(fn(put(x))), part.ndev, part.shard_rows,
                        part.block)
        return part.unpad_vector(y)
    align = 1
    carry_block = 0
    if local_engine == "pallas":
        dia = a.to_dia(max_diags=128) if hasattr(a, "to_dia") else a
        align = carry_block = _pallas_blocks(dia.bandwidth, interpret)[0]
    part = RowPartitionedBanded.from_matrix(a, mesh.devices.size, align=align)
    fn, put = make_dist_spmv(part, mesh, dtype, local_engine, interpret)
    y = fetch_global(fn(put(x)))
    if carry_block:
        y = _from_carry(y, part.ndev, part.shard_rows, carry_block)
    return part.unpad_vector(y)


class DistBicgstabSolver:
    """A prepared (partitioned + jitted) distributed solver.

    Built once by :func:`make_dist_bicgstab`; :meth:`solve` may then be
    called for any number of right-hand sides without re-tracing or
    re-compiling (the jitted ``run`` closure is cached on this object —
    one-shot :func:`dist_bicgstab` pays the trace+compile on every call,
    which dominates dtAlg at bench scale).  Mirrors the reference's
    setup/solve phase split (pbicgstab.cu:335-363 vs :366)."""

    def __init__(self, a, part, run, mat_args, inv_diag, tol, btol,
                 tri_stacked, fac_args, vec_sharding, dt, config, dt_setup,
                 carry_block: int = 0):
        self.a = a
        self.part = part
        self._run = run
        self._mat_args = mat_args
        self._inv_diag = inv_diag
        self._tol = tol
        self._btol = btol
        self._tri_stacked = tri_stacked
        self._fac_args = fac_args
        self._vec_sharding = vec_sharding
        self._dt = dt
        self._config = config
        self.dt_setup = dt_setup
        # Pallas engines carry loop vectors in the per-shard kernel-padded
        # layout (see _to_carry); 0 = plain partition-padded layout
        self._carry_block = carry_block

    def _put_vec(self, v: np.ndarray) -> jax.Array:
        vp = np.asarray(self.part.pad_vector(np.asarray(v)), self._dt)
        if self._carry_block:
            vp = _to_carry(vp, self.part.ndev, self.part.shard_rows,
                           self._carry_block)
        return put_global(vp, self._vec_sharding)

    def solve(self, b: np.ndarray,
              x0: Optional[np.ndarray] = None) -> SolveResult:
        part = self.part
        bp = self._put_vec(b)
        # reference x0 = ones (pbicgstab.cu:827-832)
        x0p = self._put_vec(np.ones(part.n) if x0 is None else x0)
        # dtAlg excludes H2D transfers (reference pbicgstab.h:108-109):
        # finish the uploads before the solve timer starts, exactly like the
        # single-chip wrappers — without this the tunnel's ~MB-scale b/x0
        # transfer lands inside dtAlg and dominates it at bench scale.  Over
        # the axon tunnel block_until_ready can return early (CLAUDE.md), so
        # also fetch one element — a literal transfer cannot return early.
        jax.block_until_ready((bp, x0p))
        for v in (bp, x0p):
            np.asarray(v.addressable_shards[0].data[:1])
        t1 = time.perf_counter()
        out = jax.block_until_ready(self._run(
            *self._mat_args, x0p, bp, self._inv_diag, self._tol, self._btol,
            *self._tri_stacked, *self._fac_args))
        # fetch a scalar before stopping the dtAlg timer: over the axon
        # tunnel block_until_ready can return before completion (CLAUDE.md)
        residual = float(np.asarray(out[3]).reshape(-1)[0])
        t2 = time.perf_counter()
        x, status, iters, nrmr, nrmr0, hist = out
        status = int(np.asarray(status).reshape(-1)[0])
        if status == 0:
            status = SolverStatus.MAXIT
        xh = fetch_global(x)
        if self._carry_block:
            xh = _from_carry(xh, part.ndev, part.shard_rows,
                             self._carry_block)
        res = SolveResult(
            x=part.unpad_vector(xh),
            status=SolverStatus(status),
            iters=int(np.asarray(iters).reshape(-1)[0]),
            residual=residual,
            residual0=float(np.asarray(nrmr0).reshape(-1)[0]),
            dt_alg=t2 - t1, dt_setup=self.dt_setup,
            residual_history=np.asarray(hist).reshape(-1))
        from cuda_mat_tpu.solvers.bicgstab import _attach_true_residual

        return _attach_true_residual(res, self.a, b, self._config)


def dist_bicgstab(a, b: np.ndarray, mesh: Mesh,
                  config: SolverConfig = DEFAULT_CONFIG,
                  x0: Optional[np.ndarray] = None,
                  halo_mode: str = "auto",
                  local_engine: str = "auto") -> SolveResult:
    """One-shot row-partitioned BiCGSTAB over the mesh (partition + compile +
    solve; use :func:`make_dist_bicgstab` to reuse the compiled solver across
    right-hand sides)."""
    return make_dist_bicgstab(a, mesh, config, halo_mode,
                              local_engine).solve(b, x0)


def make_dist_bicgstab(a, mesh: Mesh,
                       config: SolverConfig = DEFAULT_CONFIG,
                       halo_mode: str = "auto",
                       local_engine: str = "auto") -> DistBicgstabSolver:
    """Partition ``a``, build the preconditioner state, and jit the solver
    loop for row-partitioned BiCGSTAB over the mesh.

    ``config.precond``: "none" runs the h-form loop (parity with
    :func:`cuda_mat_tpu.solvers.bicgstab.bicgstab`); "jacobi" runs the
    preconditioned loop with a sharded diagonal; "bjacobi_ilu0" runs it with
    the block-Jacobi ILU(0) preconditioner (per-shard local ILU solves, zero
    communication per application — see
    :mod:`cuda_mat_tpu.parallel.dist_precond`); "ilu0_neumann" applies the
    *global* ILU(0) factor through its truncated Neumann series — each term
    is a banded SpMV of N_l/N_u, row-partitioned exactly like A and applied
    through the same halo-exchange machinery, so the fastest single-chip
    preconditioner (BASELINE.md: 7.5x exact ILU at 1M rows) distributes with
    no new communication pattern (VERDICT r1 #3).  Exact global ILU(0) is a
    sequential recurrence — use the single-chip path for that.

    ``halo_mode``: "auto" picks neighbor-ppermute halos for banded matrices
    and an all-gather of x for general sparsity; "ppermute"/"allgather" force
    one (SURVEY §5 "ppermute/all-gather for halo x segments").

    ``local_engine``: the per-shard SpMV — "xla" (shifted dynamic-slices),
    "pallas" (block-halo Pallas DIA kernel, interpreted off-TPU), "stencil"
    (the gap-strided constant-stencil Pallas kernel — the flagship
    single-chip matvec, 2.06x the DIA kernel on the 10M-row Laplacian,
    distributed per VERDICT r2 #1; requires a constant-coefficient grid
    stencil and precond none/jacobi/ilu0_neumann), or "auto" (on a TPU
    backend: stencil when detection proves the structure, else pallas).
    """
    t0 = time.perf_counter()
    dt = jnp.dtype(config.dtype)
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    auto_engine = local_engine == "auto"
    if auto_engine:
        local_engine = "pallas" if jax.default_backend() == "tpu" else "xla"
    interpret = jax.default_backend() != "tpu"

    mode = config.precond or "none"
    if mode == "identity":
        mode = "none"
    if mode not in ("none", "jacobi", "bjacobi_ilu0", "ilu0_neumann"):
        raise ValueError(
            f"distributed solver supports precond none/jacobi/bjacobi_ilu0/"
            f"ilu0_neumann, got {config.precond!r}")

    banded = None
    stencil = False
    align = 1
    blk = sub = None
    if local_engine == "stencil" or (auto_engine and local_engine == "pallas"):
        # gap-strided constant-stencil engine: the preconditioners that
        # compose with its strided coordinates are none/jacobi/ilu0_neumann
        # (bjacobi_ilu0's blocked trisolve works in true coordinates)
        if mode == "bjacobi_ilu0" or halo_mode == "allgather":
            if local_engine == "stencil":
                raise ValueError(
                    "local_engine='stencil' requires ppermute halos and"
                    " precond none/jacobi/ilu0_neumann")
            local_engine = "pallas"
        else:
            from cuda_mat_tpu.parallel.partition import RowPartitionedStencil

            try:
                part = RowPartitionedStencil.from_matrix(a, ndev)
                if mode == "ilu0_neumann" and config.neumann_const_factors:
                    # re-plan for the fused series stencils: widen the halo
                    # sub-block to the polynomial offsets and cap the block
                    # to the scoped-VMEM budget of the widest kernel
                    from cuda_mat_tpu.ops.pallas_stencil import (
                        plan_const_neumann_layout)

                    plan = plan_const_neumann_layout(
                        part.terms, config.neumann_terms, part.c_grid,
                        part.stride, prefer_mono=True,
                        fuse_blas1=config.fuse_blas1)
                    if plan is not None and (plan[0] > part.sub
                                             or part.block > plan[1]):
                        try:
                            part = RowPartitionedStencil.from_matrix(
                                a, ndev, min_sub=plan[0],
                                block_target=plan[1])
                        except ValueError:
                            pass  # sequential restrided factors still apply
                banded = True
                stencil = True
                local_engine = "stencil"
                blk, sub = part.block, part.sub
            except ValueError:
                if local_engine == "stencil":
                    raise
                local_engine = "pallas"  # auto: not a stencil — DIA kernel
    if banded is None and halo_mode in ("auto", "ppermute"):
        try:
            if local_engine == "pallas":
                dia = a.to_dia(max_diags=128) if hasattr(a, "to_dia") else a
                blk, sub = _pallas_blocks(dia.bandwidth, interpret)
                align = blk
            part = RowPartitionedBanded.from_matrix(a, ndev, align=align)
            banded = True
        except ValueError:
            if halo_mode == "ppermute":
                raise
    if banded is None:
        from cuda_mat_tpu.parallel.partition import RowPartitionedELL

        part = RowPartitionedELL.from_matrix(a, ndev)
        banded = False

    # Pallas engines carry the loop vectors in the per-shard kernel-padded
    # layout across the whole while_loop (VERDICT r3 #1; see _to_carry)
    carry_block = 0
    if banded and local_engine in ("pallas", "stencil"):
        carry_block = part.block if stencil else blk
    vec_sharding = NamedSharding(mesh, P(axis))

    def put_diagvec(v):
        """Shard a partition-padded diagonal stream, fill 1.0 in the carry
        pad blocks (the loop vectors there are exact zeros, so inv_d * 0
        stays zero and padding remains a fixed point)."""
        v = np.asarray(v, dt)
        if carry_block:
            v = _to_carry(v, ndev, part.shard_rows, carry_block, fill=1.0)
        return put_global(v, vec_sharding)

    if banded:
        if stencil:
            mat_args = (put_global(np.asarray(part.gapmask, dt),
                                   NamedSharding(mesh, P())),)
            mat_specs = (P(),)
            mv_stencil = _make_local_matvec_stencil(part, axis, interpret)

            def make_mv(mat_l):
                return lambda xl: mv_stencil(mat_l[0], xl)

            # a constant stencil's diagonal is its offset-0 scalar everywhere
            # (dc=0 never leaves the grid); gap/tail cells get 1 so padding
            # stays a fixed point of the Jacobi multiply
            d0 = next((t[2] for t in part.terms if t[0] == 0), 0.0)
            diag = part.strided_scatter(np.full(part.n, d0), fill=1.0)
        elif local_engine == "pallas":
            # per-diagonal 1-D streams (no sublane padding in the kernel DMA)
            mat_args = tuple(put_global(np.asarray(part.data[k], dt),
                                        vec_sharding)
                             for k in range(len(part.offsets)))
            mat_specs = (P(axis),) * len(mat_args)
            local_mv_banded = _make_local_matvec_pallas(
                part.offsets, part.halo, part.shard_rows, ndev, axis,
                blk, sub, interpret)

            def make_mv(mat_l):
                return lambda xl: local_mv_banded(mat_l, xl)
        else:
            mat_args = (put_global(np.asarray(part.data, dt),
                                   NamedSharding(mesh, P(None, axis))),)
            mat_specs = (P(None, axis),)
            local_mv_banded = _make_local_matvec(part.offsets, part.halo,
                                                 part.shard_rows, ndev, axis)

            def make_mv(mat_l):
                return lambda xl: local_mv_banded(mat_l[0], xl)

        if not stencil:
            diag = part.data[part.offsets.index(0)]
    else:
        mat_args = (put_global(np.asarray(part.values, dt),
                               NamedSharding(mesh, P(axis, None))),
                    put_global(np.asarray(part.cols),
                               NamedSharding(mesh, P(axis, None))))
        mat_specs = (P(axis, None), P(axis, None))

        def make_mv(mat_l):
            vals_l, cols_l = mat_l

            def mv(xl):
                xg = jax.lax.all_gather(xl, axis, axis=0, tiled=True)
                return jnp.sum(vals_l * jnp.take(xg, cols_l, axis=0), axis=1)

            return mv

        diag = part.diag

    dot = _psum_dot(axis)
    tol = jnp.asarray(config.tol, dt)
    btol = jnp.asarray(config.breakdown_tol, dt)
    if mode == "jacobi":
        if np.any(diag == 0):
            raise ValueError("Jacobi preconditioner requires a nonzero diagonal")
        inv_diag = put_diagvec(1.0 / diag)
    elif mode == "ilu0_neumann":
        if not banded:
            raise ValueError("ilu0_neumann requires a banded (DIA) partition;"
                             " use jacobi for general sparsity")
        from cuda_mat_tpu.formats.csr import CSRMatrix

        if not isinstance(a, CSRMatrix):
            # neumann_factors needs the CSR pattern (row_lengths/indices)
            raise ValueError(
                "ilu0_neumann needs a CSRMatrix input (the ILU(0)"
                f" factorization runs on the CSR pattern); got {type(a).__name__}")
        from cuda_mat_tpu.precond.preconditioners import neumann_factors

        low, up, diag_m = neumann_factors(a, config.milu_omega)
        fac_args = []
        fac_specs = []
        fac_slices = []
        fac_mvs = []
        fac_fused = False
        if stencil and config.neumann_const_factors:
            # fused whole-series factors: each triangular series collapses to
            # ONE matrix-free stencil launch per application (measured 2.0x
            # e2e over restrided exact-pattern factors at 10M rows) — no
            # factor data to shard at all; same layout/halos as A.  Best:
            # the whole msolve P_u·(inv_d ∘ P_l·x) as ONE per-shard launch +
            # one ppermute pair with the intermediate in VMEM scratch
            # ("kernel" — exact diagonal, mono's collective count); fallbacks
            # mono (const-d* composition) then per-triangle series.
            try:
                from cuda_mat_tpu.ops.pallas_stencil import (
                    FMA3_MSOLVE_EXTRA_BUFS, MSOLVE_EXTRA_BUFS,
                    compose_stencil_terms, const_factor_terms, msolve_halo,
                    neumann_poly_terms, stencil_vmem_block_cap,
                    strided_offsets)

                def _fits(nterms, w_s):
                    return (w_s <= part.sub and w_s <= part.shard_rows
                            and (interpret or part.block
                                 <= stencil_vmem_block_cap(nterms)))

                polys = []
                sts = []
                mvs = []
                for f in (low, up):
                    t, _ = const_factor_terms(f.to_dia(max_diags=128),
                                              part.c_grid, part.stride)
                    pt = neumann_poly_terms(t, config.neumann_terms,
                                            part.c_grid, part.stride)
                    st = strided_offsets(pt, part.c_grid, part.stride)
                    w_s = max(abs(o) for o, _ in st)
                    if not _fits(len(pt), w_s):
                        raise ValueError("series exceeds the layout")
                    polys.append(pt)
                    sts.append(st)
                    mvs.append(_make_local_matvec_stencil(
                        part, axis, interpret, sterms=st, halo=w_s))
                fac_mvs = mvs
                fac_fused = "series"
                r_grid = part.n // part.c_grid
                d_star = float(diag_m[(r_grid // 2) * part.c_grid
                                      + part.c_grid // 2])
                hpad = msolve_halo(sts[1])
                h_l = max(abs(o) for o, _ in sts[0])
                w_k = h_l + hpad
                n_poly = len(polys[0]) + len(polys[1])
                if (hpad <= part.block
                        and _fits(n_poly + MSOLVE_EXTRA_BUFS, w_k)):
                    from cuda_mat_tpu.ops.pallas_stencil import extend_gapmask

                    fac_mvs = [_make_local_msolve_kernel(
                        part, axis, interpret, sts[0], sts[1])]
                    if config.fuse_blas1 and _fits(
                            n_poly + FMA3_MSOLVE_EXTRA_BUFS, w_k):
                        # BLAS1-prologue form (p-update / r1-production fold,
                        # VERDICT r3 #5) — needs headroom for the extra
                        # input streams + the p output in scoped VMEM
                        fac_mvs.append(_make_local_msolve_kernel(
                            part, axis, interpret, sts[0], sts[1], fma=True))
                    fac_fused = "kernel"
                    fac_args.append(put_global(
                        np.asarray(extend_gapmask(part.gapmask, hpad), dt),
                        NamedSharding(mesh, P())))
                    fac_specs.append(P())
                    # inv_d stream with neighbor halos baked in at setup (the
                    # kernel reads d over [row0-hpad, row0+block+hpad), which
                    # crosses shard boundaries): per shard the (s + 2*block,)
                    # window of the global strided inv_d, fill 1.0 outside
                    # (gap/pad u cells are already zero before the multiply)
                    invd_g = np.concatenate([
                        np.ones(part.block),
                        part.strided_scatter(1.0 / diag_m, fill=1.0),
                        np.ones(part.block)])
                    s_r, blk_ = part.shard_rows, part.block
                    d_pad = np.stack([
                        invd_g[i * s_r: i * s_r + s_r + 2 * blk_]
                        for i in range(ndev)])
                    fac_args.append(put_global(
                        np.asarray(d_pad.reshape(-1), dt), vec_sharding))
                    fac_specs.append(P(axis))
                else:
                    try:
                        mt = compose_stencil_terms(
                            polys[1],
                            tuple((o, d, v / d_star)
                                  for (o, d, v) in polys[0]),
                            part.c_grid, part.stride)
                        stm = strided_offsets(mt, part.c_grid, part.stride)
                        w_m = max(abs(o) for o, _ in stm)
                        if _fits(len(mt), w_m):
                            fac_mvs = [_make_local_matvec_stencil(
                                part, axis, interpret, sterms=stm, halo=w_m)]
                            fac_fused = "mono"
                    except ValueError:
                        pass
            except ValueError:
                fac_args = []
                fac_specs = []
                fac_mvs = []
                fac_fused = False
        for f in () if fac_fused else (low, up):
            if stencil:
                # re-index the factor into the stencil's gap-strided
                # coordinates; the restrided DIA data's zero slots mask
                # gaps/tail, so padding stays a fixed point of each term
                # (mirrors NeumannILUPreconditioner.from_csr pad_like)
                from cuda_mat_tpu.ops.pallas_stencil import restride_dia

                fd = restride_dia(f.to_dia(max_diags=128), part.c_grid,
                                  part.stride)
                pf = RowPartitionedBanded.from_matrix(fd, ndev,
                                                      align=part.shard_rows)
            else:
                pf = RowPartitionedBanded.from_matrix(f, ndev, align=align)
            assert pf.npad == part.npad and pf.shard_rows == part.shard_rows
            lo = len(fac_args)
            if local_engine in ("pallas", "stencil"):
                fac_args.extend(put_global(np.asarray(pf.data[k], dt),
                                           vec_sharding)
                                for k in range(len(pf.offsets)))
                fac_specs.extend([P(axis)] * len(pf.offsets))
                mv_p = _make_local_matvec_pallas(
                    pf.offsets, pf.halo, pf.shard_rows, ndev, axis, blk, sub,
                    interpret)
                fac_mvs.append(lambda d, xl, _mv=mv_p: _mv(d, xl))
            else:
                fac_args.append(put_global(
                    np.asarray(pf.data, dt),
                    NamedSharding(mesh, P(None, axis))))
                fac_specs.append(P(None, axis))
                mv_x = _make_local_matvec(pf.offsets, pf.halo, pf.shard_rows,
                                          ndev, axis)
                fac_mvs.append(lambda d, xl, _mv=mv_x: _mv(d[0], xl))
            fac_slices.append(slice(lo, len(fac_args)))
        # padded/gap cells: inv_d = 1 (the factors' identity padding / zero
        # slots keep zero pad entries a fixed point of every series term)
        if stencil:
            invd = part.strided_scatter(1.0 / diag_m, fill=1.0)
        else:
            invd = np.ones(part.npad)
            invd[: part.n] = 1.0 / diag_m
        inv_diag = put_diagvec(invd)
    else:
        inv_diag = put_diagvec(np.ones(part.npad))
    if mode != "ilu0_neumann":
        fac_args = []
        fac_specs = []
        fac_slices = []
        fac_mvs = []

    if mode == "bjacobi_ilu0":
        if not banded:
            raise ValueError("bjacobi_ilu0 requires a banded (DIA) partition;"
                             " use jacobi for general sparsity")
        from cuda_mat_tpu.parallel.dist_precond import (
            build_block_jacobi_ilu, local_solver_from_stacked)

        tb = min(config.trisolve_block, part.shard_rows)
        stacked = build_block_jacobi_ilu(part, tb, dt,
                                         milu_omega=config.milu_omega)
        shard_leading = NamedSharding(mesh, P(axis))
        tri_stacked = tuple(put_global(np.asarray(s), shard_leading)
                            for s in stacked)
        tri_specs = (P(axis),) * 6
    else:
        tb = 0
        tri_stacked = ()
        tri_specs = ()

    from cuda_mat_tpu.solvers.bicgstab import effective_debug

    maxit, debug = config.maxit, effective_debug(config.debug)
    check_halves = config.check_halves
    nterms = config.neumann_terms
    n_mat = len(mat_args)
    n_tri = len(tri_stacked)

    @jax.jit
    @partial(shard_map, mesh=mesh,
             in_specs=mat_specs + (P(axis), P(axis), P(axis), P(), P())
             + tri_specs + tuple(fac_specs),
             out_specs=(P(axis), P(), P(), P(), P(), P()),
             # see make_dist_spmv: only the Pallas local engine lacks vma
             check_vma=(local_engine not in ("pallas", "stencil")))
    def run(*args):
        mat_l = args[:n_mat]
        x0_l, b_l, inv_diag_l, tol_, btol_ = args[n_mat:n_mat + 5]
        tri_l = args[n_mat + 5: n_mat + 5 + n_tri]
        fac_l = args[n_mat + 5 + n_tri:]
        mv = make_mv(mat_l)
        if mode == "jacobi":
            return precond_core(mv, lambda f: inv_diag_l * f, dot, x0_l, b_l,
                                tol_, maxit, debug,
                                check_halves=check_halves)
        if mode == "bjacobi_ilu0":
            tri = local_solver_from_stacked(*tri_l, part.shard_rows, tb)
            msolve_b = tri.msolve
            if carry_block:
                s_ = part.shard_rows

                def msolve_b(f, _m=tri.msolve):
                    # the blocked trisolve works on the (s,) local region;
                    # re-entering the carry costs one slice + one pad node
                    # per msolve (vs 3 relayout nodes saved on every matvec)
                    return jnp.pad(_m(jax.lax.slice(
                        f, (carry_block,), (carry_block + s_,))),
                        (carry_block, carry_block))
            return precond_core(mv, msolve_b, dot, x0_l, b_l, tol_, maxit,
                                debug, check_halves=check_halves)
        if mode == "ilu0_neumann":
            if fac_fused == "kernel":
                kernel_mv = fac_mvs[0]
                gap_ext_l, d_pad_l = fac_l
                mfma = None
                if len(fac_mvs) > 1:
                    kernel_fma = fac_mvs[1]
                    mfma = (lambda a_, c1, b_, c2=None, c_=None:
                            kernel_fma(gap_ext_l, d_pad_l, a_, c1, b_, c2,
                                       c_))
                return precond_core(
                    mv, lambda f: kernel_mv(gap_ext_l, d_pad_l, f), dot,
                    x0_l, b_l, tol_, maxit, debug, msolve_fma=mfma,
                    check_halves=check_halves)
            if fac_fused == "mono":
                mono_mv = fac_mvs[0]
                return precond_core(mv, lambda f: mono_mv(mat_l[0], f), dot,
                                    x0_l, b_l, tol_, maxit, debug,
                                    check_halves=check_halves)
            if fac_fused:
                pl_mv, pu_mv = fac_mvs

                def msolve_fused(f):
                    # x = P_u(D^-1 * P_l(f)) — same expansion as the
                    # single-chip fused NeumannILUPreconditioner.msolve
                    return pu_mv(mat_l[0], inv_diag_l * pl_mv(mat_l[0], f))

                return precond_core(mv, msolve_fused, dot, x0_l, b_l, tol_,
                                    maxit, debug,
                                    check_halves=check_halves)
            nl_data = fac_l[fac_slices[0]]
            nu_data = fac_l[fac_slices[1]]
            nl_mv, nu_mv = fac_mvs

            def msolve(f):
                # truncated series L^-1 ~ sum (-N_l)^j, U^-1 ~ sum (-N_u)^j D^-1
                # — same update order as the single-chip
                # NeumannILUPreconditioner.msolve, every term a halo-exchange
                # banded SpMV
                y = f
                term = f
                for _ in range(nterms - 1):
                    term = -nl_mv(nl_data, term)
                    y = y + term
                g = inv_diag_l * y
                x = g
                term = g
                for _ in range(nterms - 1):
                    term = -nu_mv(nu_data, term)
                    x = x + term
                return x

            return precond_core(mv, msolve, dot, x0_l, b_l, tol_, maxit,
                                debug, check_halves=check_halves)
        return hform_core(mv, dot, x0_l, b_l, tol_, btol_, maxit, debug)

    return DistBicgstabSolver(a, part, run, mat_args, inv_diag, tol, btol,
                              tri_stacked, fac_args, vec_sharding, dt,
                              config, time.perf_counter() - t0,
                              carry_block=carry_block)
