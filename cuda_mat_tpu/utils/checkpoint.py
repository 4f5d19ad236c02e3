"""Solver checkpoint/resume.

The reference has no checkpointing — solver state lives in device memory for
one call (SURVEY §5).  Because BiCGSTAB is restartable from its current
iterate, checkpointing here is simply (x, iteration count, residual) — the
restart re-derives the Krylov state from ``r = b - A x``.  Useful for very
long multi-host runs; format is a plain ``.npz``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class SolverCheckpoint:
    x: np.ndarray
    iters: int
    residual: float
    meta: dict


def save_checkpoint(path: str, result_or_x, iters: Optional[int] = None,
                    residual: Optional[float] = None, **meta) -> None:
    """Save a solve's iterate.  Accepts a SolveResult or a raw x vector."""
    if hasattr(result_or_x, "x"):
        x = np.asarray(result_or_x.x)
        iters = result_or_x.iters if iters is None else iters
        residual = (result_or_x.residual if residual is None else residual)
    else:
        x = np.asarray(result_or_x)
        iters = 0 if iters is None else iters
        residual = float("nan") if residual is None else residual
    np.savez(path, x=x, iters=np.int64(iters), residual=np.float64(residual),
             **{f"meta_{k}": np.asarray(v) for k, v in meta.items()})


def load_checkpoint(path: str) -> SolverCheckpoint:
    with np.load(path) as z:
        meta = {k[5:]: z[k] for k in z.files if k.startswith("meta_")}
        return SolverCheckpoint(x=z["x"], iters=int(z["iters"]),
                                residual=float(z["residual"]), meta=meta)
