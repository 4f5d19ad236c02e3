"""Pallas TPU kernel for banded (DIA) SpMV — the hand-written replacement for
the reference's ``cusparseDcsrmv`` on its banded workloads (reference
pbicgstab.cu:104 etc.).

Design (TPU-first):

- Row-aligned DIA data (see :mod:`cuda_mat_tpu.formats.dia`): diagonal ``d``
  contributes ``data[d, i] * x[i + off_d]`` — no gather, pure VPU multiply-add
  at HBM bandwidth.
- **Block-halo layout**: vectors live in *padded* form with one zero block of
  ``B`` rows on each side (``B >= bandwidth``).  The x window needed by out
  block ``i`` is then exactly the three consecutive x blocks ``i-1, i, i+1``,
  which are passed as three ``BlockSpec`` views of the same array with
  shifted index maps — so the Mosaic pipeline streams and double-buffers
  every operand automatically; no manual DMA, no semaphores.
- Edge grid steps write the zero padding, so the kernel maps padded→padded
  vectors and *chains*: the whole BiCGSTAB loop runs on padded vectors with
  zero repacking (padding is a fixed point of all BLAS1 ops and of this
  kernel, and contributes nothing to dot products).

The plain-XLA formulation of the same contraction reaches ~12-15% of the
chip's copy roofline (misaligned 1-D shifts relayout across vector lanes);
this kernel exists to close that gap.
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


def _dia_block_kernel(*refs, offsets: Tuple[int, ...], block: int, sub: int):
    # refs = (x_sub_0 .. x_sub_{k+1}, data_ref_0 .. data_ref_{ndiag-1}, y_ref)
    nd = len(offsets)
    x_refs = refs[: len(refs) - nd - 1]
    data_refs = refs[len(refs) - nd - 1: -1]
    y_ref = refs[-1]
    i = pl.program_id(0)
    g = pl.num_programs(0)

    @pl.when((i > 0) & (i < g - 1))
    def _interior():
        # xs covers padded x rows [i*B - S, i*B + B + S); out row j (true row
        # (i-1)*B + j) with offset `off` reads xs[j + S + off].  Each diagonal
        # is its own 1-D stream: a stacked (ndiag, B) f32 block wastes
        # ceil(ndiag/8)*8/ndiag of its DMA on sublane padding (measured 1.4x
        # end-to-end for ndiag=5 — BASELINE.md r2); 1-D blocks have no
        # sublane dimension to pad.
        xs = jnp.concatenate([r[:] for r in x_refs])
        vdt = xs.dtype
        acc = data_refs[0][:].astype(vdt) * jax.lax.slice(
            xs, (sub + offsets[0],), (sub + offsets[0] + block,))
        for d, off in enumerate(offsets[1:], start=1):
            acc = acc + data_refs[d][:].astype(vdt) * jax.lax.slice(
                xs, (sub + off,), (sub + off + block,))
        y_ref[:] = acc

    @pl.when((i == 0) | (i == g - 1))
    def _edge():
        y_ref[:] = jnp.zeros_like(y_ref)


@partial(jax.jit, static_argnames=("offsets", "block", "sub", "interpret"))
def dia_spmv_block_padded(data, x_pad: jax.Array,
                          offsets: Tuple[int, ...], block: int, sub: int,
                          interpret: bool = False) -> jax.Array:
    """``y_pad = A x_pad`` on block-halo padded vectors.

    ``data``: tuple of ndiag row-aligned ``(npad,)`` diagonal streams (or a
    stacked ``[ndiag, npad]`` array, split here — prefer the tuple: splitting
    inside jit costs a copy); ``x_pad [npad + 2*block]`` with zero pad
    blocks; returns the same padded layout with zero pads intact.

    ``sub`` is the halo sub-block size (bandwidth <= sub <= block,
    block % sub == 0): x is streamed as ``k+2 = block/sub + 2`` sub-block
    views instead of 3 full-block views, cutting the x overfetch from 3x to
    (1 + 2/k)x of n.
    """
    if not isinstance(data, (tuple, list)):
        data = tuple(data[d] for d in range(data.shape[0]))
    npad = data[0].shape[0]
    assert len(data) == len(offsets)
    assert npad % block == 0 and block % sub == 0
    assert max(abs(offsets[0]), abs(offsets[-1])) <= sub
    assert x_pad.shape[0] == npad + 2 * block
    g = npad // block + 2          # grid includes the two pad blocks
    k = block // sub
    n_sub = (npad + 2 * block) // sub
    nd_blocks = npad // block

    # out block i covers padded rows [i*B, (i+1)*B) = true rows starting
    # (i-1)*B; its x window [i*B - S, i*B + B + S) = sub-blocks
    # (i*B/S - 1) .. (i*B/S + k), clipped at the edges (edge programs write
    # zeros, so clipped reads are dead values)
    def sub_map(j):
        return lambda i: (jnp.clip(i * k + j - 1, 0, n_sub - 1),)

    x_specs = [pl.BlockSpec((sub,), sub_map(j), memory_space=pltpu.VMEM)
               for j in range(k + 2)]
    d_specs = [pl.BlockSpec((block,),
                            lambda i: (jnp.clip(i - 1, 0, nd_blocks - 1),),
                            memory_space=pltpu.VMEM)
               for _ in range(len(offsets))]
    kernel = partial(_dia_block_kernel, offsets=offsets, block=block, sub=sub)
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=x_specs + d_specs,
        out_specs=pl.BlockSpec((block,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad + 2 * block,), x_pad.dtype),
        interpret=interpret,
    )(*([x_pad] * (k + 2)), *data)


@dataclasses.dataclass(frozen=True)
class PallasDIAOperator:
    """Device operator backed by the block-halo Pallas kernel.

    ``matvec`` maps *padded* vectors to padded vectors; use :meth:`pad_vec` /
    :meth:`unpad_vec` at the boundary.  Solver loops run entirely in the
    padded space (padding is invariant under the whole iteration).
    """

    data: Tuple[jax.Array, ...]  # ndiag separate (npad,) diagonal streams —
                                 # 1-D so the DMA has no sublane padding (a
                                 # stacked (ndiag, B) f32 block wastes
                                 # 8/ndiag-rounding of its bandwidth;
                                 # measured 1.4x for ndiag=5, BASELINE.md r2)
    offsets: Tuple[int, ...]   # static
    n: int                     # static true dimension
    block: int                 # static
    sub: int                   # static halo sub-block (bandwidth <= sub <= block)
    vec_dtype: str = "float32" # static: dtype of the padded vectors
    interpret: bool = False    # static (CPU testing)

    @property
    def m(self) -> int:
        return self.n

    @property
    def npad(self) -> int:
        return self.data[0].shape[0]

    @classmethod
    def from_dia(cls, dia, dtype=jnp.float32, block: int = 32768,
                 data_dtype=None, interpret: bool = False
                 ) -> "PallasDIAOperator":
        # data_dtype kept for experimentation; bf16 measured slower than f32
        # in both stacked and per-diagonal layouts (convert cost > bandwidth
        # saved — BASELINE.md r1/r2), so f32 is the default
        offsets = tuple(int(o) for o in dia.offsets)
        w = max(abs(offsets[0]), abs(offsets[-1])) if offsets else 1
        sub = _round_up(w, 1024)
        block = max(block, sub)
        block = _round_up(block, sub)
        npad = _round_up(dia.n, block)
        dt = np.dtype(data_dtype or dtype)
        data = tuple(jnp.asarray(np.pad(np.asarray(dia.data[d], dt),
                                        (0, npad - dia.n)))
                     for d in range(len(offsets)))
        return cls(data, offsets, dia.n, block, sub,
                   str(np.dtype(dtype)), interpret)

    def pad_vec(self, v) -> jax.Array:
        dt = jnp.dtype(self.vec_dtype)
        out = jnp.zeros(self.npad + 2 * self.block, dt)
        return out.at[self.block: self.block + v.shape[0]].set(
            jnp.asarray(v, dt))

    def unpad_vec(self, v_pad: jax.Array) -> jax.Array:
        return v_pad[self.block: self.block + self.n]

    def matvec(self, x_pad: jax.Array) -> jax.Array:
        return dia_spmv_block_padded(self.data, x_pad, self.offsets,
                                     self.block, self.sub, self.interpret)


jax.tree_util.register_dataclass(
    PallasDIAOperator, data_fields=["data"],
    meta_fields=["offsets", "n", "block", "sub", "vec_dtype", "interpret"])
