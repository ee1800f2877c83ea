"""Tall-skinny QR (TSQR) — communication-avoiding tall QR factorization.

The north-star block-Lanczos variant (BASELINE.json config 3) normalizes
each Krylov block with a QR factorization instead of the reference's
sqrtm(W^T W) (`block_lanczos.hpp:28-34`): numerically stronger when W is
ill-conditioned, since it never squares the condition number.

TSQR structure (two-level tree): split the n rows into c chunks, QR each
chunk on the MXU in parallel (vmapped Householder), stack the c small R
factors, QR the (c*p, p) stack, and recombine.  On a row-sharded state
the same tree maps onto per-shard local QRs + one gathered (c*p, p)
reduction — O(p^2) communication instead of O(n).

Signs are normalized (diag(R) >= 0) so the factorization is unique and
deterministic across chunkings.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _fix_signs(q, r):
    d = jnp.sign(jnp.diagonal(r, axis1=-2, axis2=-1))
    d = jnp.where(d == 0, 1.0, d).astype(r.dtype)
    return q * d[..., None, :], r * d[..., :, None]


@partial(jax.jit, static_argnames=("n_chunks",))
def tsqr(a: jax.Array, n_chunks: int = 8):
    """QR of a tall-skinny (n, p) matrix via a two-level reduction tree.

    Returns (q, r): q (n, p) with orthonormal columns, r (p, p) upper
    triangular with non-negative diagonal, a = q @ r.
    """
    n, p = a.shape
    c = max(1, min(n_chunks, n // max(p, 1)))
    rows = -(-n // c) * c
    a_pad = jnp.pad(a, ((0, rows - n), (0, 0)))
    blocks = a_pad.reshape(c, rows // c, p)

    q1, r1 = jax.vmap(partial(jnp.linalg.qr, mode="reduced"))(blocks)
    q2, r = jnp.linalg.qr(r1.reshape(c * p, p), mode="reduced")
    q2b = q2.reshape(c, p, p)
    q = jnp.einsum(
        "cij,cjk->cik", q1, q2b, preferred_element_type=a.dtype
    ).reshape(rows, p)[:n]
    q, r = _fix_signs(q, r)
    return q, r
