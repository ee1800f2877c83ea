"""lanczos_tpu — TPU-native single-vector and block Lanczos framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the CUDA
reference ``ibrohimmn1994/GPU-implementation-of-signle-and-block-Lanczos``
(see SURVEY.md): Lanczos tridiagonalization of large sparse symmetric
operators, used both for eigenvalue extraction (Ritz values) and to
approximate the action of a matrix exponential ``u(T) = expm(T*A) @ b``
at a receiver location, validated against an explicit forward-Euler FDTD
oracle on a 3-D staggered-grid Maxwell semi-discretization.

Design stance (TPU-first, not a port):
  * functional core: `lax.scan` recurrences, pytree matrix containers;
  * SpMV/SpMM as contiguous stencil ops (Pallas / fused XLA) instead of the
    reference's float4-gather ELL kernels (`source/kernels/spmv_spmm.hpp`);
  * all block-dense math (Gram products, tall x small updates) on the MXU,
    completing the reference's abandoned tensor-core direction
    (`source/tensor_core_unfinished_work/`);
  * small-block sqrtm via an in-graph batched Jacobi eigensolver (replaces
    the warp-level Householder+QL kernel `source/kernels/my_sqrtm_cusolver.hpp`);
  * multi-chip scaling via `jax.sharding.Mesh` + `shard_map` with psum /
    all_gather / ppermute collectives (the reference is single-GPU).
"""

from lanczos_tpu.version import __version__

__all__ = ["__version__"]
