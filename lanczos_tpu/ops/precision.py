"""Matmul precision policy for numerically critical contractions.

JAX's DEFAULT matmul precision on TPU (and on this build, even under the
CPU emulation path) rounds matmul inputs to bfloat16: a plain
`jnp.einsum` Gram product or QR recombine carries a ~1e-3 relative
error floor.  For a Lanczos library that is fatal — basis orthogonality
degrades to bf16 level, the computed T drifts off V^T A V, and Ritz
values acquire 1e-3*||A|| errors with *tiny claimed residual bounds*
(measured: 2.5e-2 basis overlap and 0.4-absolute T errors on a
20k-row SPD fixture before this policy was applied).

The reference is fp32 CUDA end to end (every kernel in
`source/kernels/*.hpp` accumulates in float), so full-f32 contractions
are also the parity-correct semantics.  `HIGHEST` on TPU runs the MXU
in the multi-pass f32 mode; the affected ops (p x n Gram/update
products, p x p small-eig rotations) are bandwidth- or latency-bound at
Lanczos block widths, so the FLOP-rate penalty does not move wall-clock
(verified: mm_tt at p=16/10M rows is HBM-bound at either precision).

Elementwise/VPU paths (stencil, DIA, gathers, Pallas kernels) are
unaffected — they never round through bf16.
"""

from __future__ import annotations

import jax

# use as: jnp.einsum(..., precision=HIGHEST) on every contraction whose
# result feeds orthogonality, T coefficients, or operator application.
HIGHEST = jax.lax.Precision.HIGHEST
