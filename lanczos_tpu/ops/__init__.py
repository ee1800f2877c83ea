from lanczos_tpu.ops.operator import LinearOperator, MatrixOperator
from lanczos_tpu.ops.formats import (
    EllMatrix,
    CsrMatrix,
    CooMatrix,
    BsrMatrix,
    DiaMatrix,
    ell_from_scipy,
    csr_from_scipy,
    coo_from_scipy,
    bsr_from_scipy,
    dia_from_scipy,
)

__all__ = [
    "LinearOperator",
    "MatrixOperator",
    "EllMatrix",
    "CsrMatrix",
    "CooMatrix",
    "BsrMatrix",
    "DiaMatrix",
    "ell_from_scipy",
    "csr_from_scipy",
    "coo_from_scipy",
    "bsr_from_scipy",
    "dia_from_scipy",
]
