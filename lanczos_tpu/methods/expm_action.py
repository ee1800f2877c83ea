"""Matrix-exponential action via Lanczos: u(T) = expm(T*A) b at a receiver.

The end-to-end pipeline of the reference driver:
  vector: solution = beta_0 * dot(expm(T_end*T) e_1, q_trace)
          (test_lanczos.cu:102-113)
  block:  solution = q_trace^T (expm(T_end*T)[:, :p] @ sqrtm(B^T B))
          (test_lanczos.cu:270-287)
where T is the (block-)tridiagonal Lanczos matrix and q_trace holds the
receiver row of each Krylov block (the basis itself is never stored —
the reference's key memory-saving trick, test_lanczos.cu:56-60).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lanczos_tpu.ops.precision import HIGHEST

from lanczos_tpu.methods.block_lanczos import block_lanczos
from lanczos_tpu.methods.vector_lanczos import vector_lanczos
from lanczos_tpu.ops.smalleig import expm_sym
from lanczos_tpu.ops.tridiag import (
    assemble_block_tridiagonal,
    assemble_tridiagonal,
)


@partial(jax.jit, static_argnames=("m", "reorth", "breakdown_tol", "trace_fn",
                                   "fused"))
def lanczos_expm_action(
    a,
    b: jax.Array,
    m: int,
    t_end: float,
    lc: jax.Array | int,
    *,
    reorth: str = "none",
    breakdown_tol: float = 0.0,
    trace_fn=None,
    fused: bool | None = None,
):
    """Scalar approximation of [expm(t_end*A) b]_{lc} via m-step Lanczos.
    For non-flat operator states pass trace_fn (see vector_lanczos).
    fused forces/forbids the traffic-minimal recurrence (ADVICE r4: the
    CLI's --no-fused was silently ignored on the vector driver)."""
    res = vector_lanczos(a, b, m, lc, reorth=reorth,
                         breakdown_tol=breakdown_tol, trace_fn=trace_fn,
                         fused=fused)
    t = assemble_tridiagonal(res.alphas, res.betas[1:])
    e = expm_sym(t_end * t, backend="lax")
    # beta_0 * (expm(T) e1) . trace
    return res.betas[0] * jnp.sum(e[:, 0] * res.trace)


@partial(jax.jit, static_argnames=("m", "reorth", "eig_backend",
                                   "breakdown_tol", "trace_fn", "normalize",
                                   "breakdown_eps", "replace_dead",
                                   "fused", "compensated"))
def block_lanczos_expm_action(
    a,
    b: jax.Array,
    m: int,
    t_end: float,
    lc: jax.Array | int,
    *,
    reorth: str = "none",
    eig_backend: str = "jacobi",
    breakdown_tol: float = 0.0,
    trace_fn=None,
    normalize: str = "sqrtm",
    breakdown_eps: float = 0.0,
    replace_dead: bool = False,
    fused: bool | None = None,
    compensated: bool = False,
):
    """Row lc (length p) of expm(t_end*A) B via m-step block Lanczos.
    B is BLOCK-MAJOR (p, n); for non-flat operator states pass trace_fn.
    breakdown_eps / replace_dead forward to block_lanczos (deflation /
    adaptive restart of collapsed directions); fused / compensated select
    the traffic-minimal and error-free-transform Gram paths."""
    res = block_lanczos(a, b, m, lc, reorth=reorth, eig_backend=eig_backend,
                        breakdown_tol=breakdown_tol,
                        trace_fn=trace_fn, normalize=normalize,
                        breakdown_eps=breakdown_eps,
                        replace_dead=replace_dead, fused=fused,
                        compensated=compensated)
    p = b.shape[0]  # block-major (p, n)
    t = assemble_block_tridiagonal(res.alphas, res.betas[1:])
    e = expm_sym(t_end * t, backend="lax")
    f1 = jnp.matmul(e[:, :p], res.betas[0],
                    precision=HIGHEST)  # expm(T) E_1 sqrtm(B^T B)
    q = res.trace.reshape(-1)  # (m*p,)
    return jnp.matmul(q, f1, precision=HIGHEST)
