"""Device (JAX) operators and kernels: SpMV variants, triangular solves.

This layer replaces the reference's vendor kernel layer (cuSPARSE csrmv /
csrsv_solve / csrilu0 + cuBLAS BLAS1, SURVEY §2 C5): SpMV is hand-written
(XLA gather/segment-sum formulations + a Pallas DIA kernel for the banded hot
path), BLAS1 vector ops are plain jnp — XLA fuses them between SpMV calls.
"""

from cuda_mat_tpu.ops.operators import (
    CSROperator,
    ELLOperator,
    DIAOperator,
    SplitOperator,
    DenseOperator,
    make_operator,
)
from cuda_mat_tpu.ops.trisolve import BlockTriangularSolver

__all__ = [
    "CSROperator",
    "ELLOperator",
    "DIAOperator",
    "SplitOperator",
    "DenseOperator",
    "make_operator",
    "BlockTriangularSolver",
]
