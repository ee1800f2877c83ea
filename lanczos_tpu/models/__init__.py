from lanczos_tpu.models.maxwell import (
    MaxwellOperator,
    maxwell_component_shapes,
    maxwell_scipy,
    assemble_maxwell_A,
)
from lanczos_tpu.models.laplacian import laplacian_2d_scipy, laplacian_3d_scipy
from lanczos_tpu.models.rhs import (
    gaussian_vector_b,
    random_vector_b,
    gaussian_matrix_B,
    random_matrix_B,
)

__all__ = [
    "MaxwellOperator",
    "maxwell_component_shapes",
    "maxwell_scipy",
    "assemble_maxwell_A",
    "laplacian_2d_scipy",
    "laplacian_3d_scipy",
    "gaussian_vector_b",
    "random_vector_b",
    "gaussian_matrix_B",
    "random_matrix_B",
]
