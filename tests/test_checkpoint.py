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
    ref = vector_lanczos(op, b, m, lc)
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
    ref = vector_lanczos(op, b, m, lc)
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
