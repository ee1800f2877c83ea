"""Checkpoint/resume: chunked runs must match the monolithic scans exactly,
and resuming from a mid-run checkpoint must reproduce the same result."""

import jax.numpy as jnp
import numpy as np

from lanczos_tpu.methods.checkpoint import (
    LanczosCheckpoint,
    fdtd_checkpointed,
    vector_lanczos_checkpointed,
)
from lanczos_tpu.methods.fdtd import fdtd_vector
from lanczos_tpu.methods.vector_lanczos import vector_lanczos
from lanczos_tpu.models.laplacian import laplacian_2d_scipy
from lanczos_tpu.ops.operator import MatrixOperator


def _op(rng):
    a = laplacian_2d_scipy(9, 8)
    return MatrixOperator(jnp.asarray(a.toarray())), a.shape[0]


def test_chunked_matches_monolithic(rng, tmp_path):
    op, n = _op(rng)
    b = jnp.asarray(rng.standard_normal(n))
    m, lc = 17, 5
    # fused=False: the chunked path implements the classic materialized
    # recurrence step for step (the fused path agrees only to rounding)
    ref = vector_lanczos(op, b, m, lc, fused=False)
    got = vector_lanczos_checkpointed(
        op, b, m, lc, chunk=4, path=str(tmp_path / "ck.npz")
    )
    np.testing.assert_allclose(np.asarray(got.alphas), np.asarray(ref.alphas),
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(got.betas), np.asarray(ref.betas),
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(got.trace), np.asarray(ref.trace),
                               rtol=1e-12, atol=1e-13)


def test_resume_from_partial(rng, tmp_path):
    op, n = _op(rng)
    b = jnp.asarray(rng.standard_normal(n))
    m, lc = 12, 3
    path = str(tmp_path / "ck.npz")

    # simulate a crash: run only the first chunks by asking for fewer steps
    partial = vector_lanczos_checkpointed(op, b, 6, lc, chunk=3, path=path)
    ck = LanczosCheckpoint.load(path)
    assert ck.j == 6
    # grow the checkpoint to the full target and resume
    ck.m = m
    for name in ("alphas", "betas", "trace"):
        arr = np.zeros(m, ck.alphas.dtype)
        arr[:6] = getattr(ck, name)
        setattr(ck, name, arr)
    ck.save(path)
    resumed = vector_lanczos_checkpointed(op, b, m, lc, chunk=3, path=path)
    # fused=False: the chunked path implements the classic materialized
    # recurrence step for step (the fused path agrees only to rounding)
    ref = vector_lanczos(op, b, m, lc, fused=False)
    np.testing.assert_allclose(
        np.asarray(resumed.alphas), np.asarray(ref.alphas), rtol=1e-12,
        atol=1e-13,
    )
    np.testing.assert_allclose(
        np.asarray(resumed.betas), np.asarray(ref.betas), rtol=1e-12,
        atol=1e-13,
    )


def test_fdtd_checkpointed(rng, tmp_path):
    op, n = _op(rng)
    u0 = jnp.asarray(rng.standard_normal(n)) * 1e-3
    ref = fdtd_vector(op, u0, 1000, 1e-3)
    path = str(tmp_path / "fdtd.npz")
    got = fdtd_checkpointed(op, u0, 1000, 1e-3, chunk=256, path=path)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-12)
    # resume from the finished checkpoint is a no-op
    again = fdtd_checkpointed(op, u0, 1000, 1e-3, chunk=256, path=path)
    np.testing.assert_allclose(np.asarray(again), np.asarray(got), rtol=0)


def test_block_chunked_matches_monolithic(rng, tmp_path):
    """block_lanczos_checkpointed == block_lanczos(reorth='none'), and a
    run interrupted mid-way resumes to the identical result."""
    from lanczos_tpu.methods.block_lanczos import block_lanczos
    from lanczos_tpu.methods.checkpoint import block_lanczos_checkpointed
    from lanczos_tpu.models.maxwell import MaxwellOperator
    from lanczos_tpu.models.rhs import gaussian_matrix_B

    op = MaxwellOperator.create(3, 3, 3, dtype=jnp.float64)
    b = jnp.asarray(
        np.asarray(gaussian_matrix_B(3, op.n, 3), np.float64)
    )
    m, lc = 9, 17
    # fused=False: the chunked path implements the MATERIALIZED recurrence
    # step for step, so it matches that path exactly (the fused fast path
    # agrees only to rounding, ~1e-10 in f64)
    ref = block_lanczos(op, b, m, lc, fused=False)

    path = str(tmp_path / "blk.npz")
    got = block_lanczos_checkpointed(op, b, m, lc, chunk=2, path=path)
    np.testing.assert_allclose(np.asarray(got.alphas), np.asarray(ref.alphas),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.betas), np.asarray(ref.betas),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.trace), np.asarray(ref.trace),
                               rtol=1e-10, atol=1e-12)

    # simulate an interruption: run only 2 chunks' worth, then resume
    path2 = str(tmp_path / "blk2.npz")
    from lanczos_tpu.methods.checkpoint import BlockLanczosCheckpoint

    block_lanczos_checkpointed(op, b, m, lc, chunk=3, path=path2)
    ck = BlockLanczosCheckpoint.load(path2)
    ck.j = 4  # pretend only 4 iterations survived
    ck.alphas[4:] = 0
    ck.betas[4:] = 0
    ck.trace[4:] = 0
    ck.save(path2)
    resumed = block_lanczos_checkpointed(op, b, m, lc, chunk=3, path=path2)
    np.testing.assert_allclose(np.asarray(resumed.trace)[:4],
                               np.asarray(ref.trace)[:4], rtol=1e-10, atol=1e-12)
    # alphas resumed from iteration 4 onward must still match
    np.testing.assert_allclose(np.asarray(resumed.alphas),
                               np.asarray(ref.alphas), rtol=1e-8, atol=1e-10)
