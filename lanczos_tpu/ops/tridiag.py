"""(Block-)tridiagonal T assembly from Lanczos alpha/beta coefficients.

Replaces the reference's `Assemble_T` kernels
(`source/objects/tridiagonal_matrix.hpp:91-205`).  Note the reference's
scalar overload has two copy-paste bugs (subdiag copied into the diag
buffer at :177; host branch writes diag values to the subdiagonal at
:196-202) — documented in SURVEY.md §7 and fixed here by construction.
"""

from __future__ import annotations

import jax.numpy as jnp


def assemble_tridiagonal(alphas: jnp.ndarray, betas: jnp.ndarray) -> jnp.ndarray:
    """Dense symmetric tridiagonal T (m x m).

    alphas: (m,) diagonal; betas: (m-1,) off-diagonal (beta_1..beta_{m-1}
    in the recurrence's numbering — the subdiagonal norms).
    """
    m = alphas.shape[0]
    t = jnp.zeros((m, m), alphas.dtype)
    i = jnp.arange(m)
    t = t.at[i, i].set(alphas)
    if m > 1:
        j = jnp.arange(m - 1)
        t = t.at[j + 1, j].set(betas)
        t = t.at[j, j + 1].set(betas)
    return t


def assemble_block_tridiagonal(alphas: jnp.ndarray, betas: jnp.ndarray) -> jnp.ndarray:
    """Dense symmetric block-tridiagonal T (m*p x m*p).

    alphas: (m, p, p) diagonal blocks (each symmetric);
    betas: (m-1, p, p) subdiagonal blocks (beta_j = sqrtm(W^T W), symmetric,
    so the superdiagonal is beta_j^T = beta_j; we place the transpose to be
    exact for non-symmetric inputs).
    """
    m, p, _ = alphas.shape
    t = jnp.zeros((m * p, m * p), alphas.dtype)
    for j in range(m):
        t = t.at[j * p : (j + 1) * p, j * p : (j + 1) * p].set(alphas[j])
    for j in range(m - 1):
        t = t.at[(j + 1) * p : (j + 2) * p, j * p : (j + 1) * p].set(betas[j])
        t = t.at[j * p : (j + 1) * p, (j + 1) * p : (j + 2) * p].set(
            jnp.swapaxes(betas[j], -1, -2)
        )
    return t
