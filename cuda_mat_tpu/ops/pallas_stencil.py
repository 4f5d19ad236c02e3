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
