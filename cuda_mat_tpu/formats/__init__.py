"""Host-side sparse matrix containers (numpy) and conversions.

The reference works exclusively with raw CSR triplets ``(A, iA, jA)`` in
base-0 or base-1 indexing (reference pbicgstab.h:96-110).  Here each format is
a small dataclass; all indices are normalized to base 0 at construction.
Formats:

- :class:`COOMatrix` — load-time format (Matrix Market is COO on disk)
- :class:`CSRMatrix` — the canonical compute format (reference's only format)
- :class:`ELLMatrix` — row-padded layout for regular TPU lanes
- :class:`DIAMatrix` — diagonal (banded) layout, the speed-of-light TPU path
- :class:`BSRMatrix` — block CSR (north-star "COO/BSR variants")
"""

from cuda_mat_tpu.formats.coo import COOMatrix
from cuda_mat_tpu.formats.csr import CSRMatrix, verify_pattern
from cuda_mat_tpu.formats.ell import ELLMatrix
from cuda_mat_tpu.formats.dia import DIAMatrix
from cuda_mat_tpu.formats.bsr import BSRMatrix

__all__ = [
    "COOMatrix",
    "CSRMatrix",
    "ELLMatrix",
    "DIAMatrix",
    "BSRMatrix",
    "verify_pattern",
]
