"""Distributed layer on the 8-device virtual CPU mesh (SURVEY.md §4d).

Validates the shard_map halo-exchange SpMV/SpMM against scipy, and full
distributed Lanczos runs (vector + block) against the single-device path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanczos_tpu.methods.block_lanczos import block_lanczos
from lanczos_tpu.methods.eigs import lanczos_eigsh
from lanczos_tpu.methods.expm_action import lanczos_expm_action
from lanczos_tpu.methods.vector_lanczos import vector_lanczos
from lanczos_tpu.models.laplacian import laplacian_2d_scipy
from lanczos_tpu.models.maxwell import assemble_maxwell_A
from lanczos_tpu.ops.operator import MatrixOperator
from lanczos_tpu.parallel import (
    gather_sharded_ell,
    halo_sharded_ell,
    make_mesh,
)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    return make_mesh(8)


@pytest.mark.parametrize("builder", [halo_sharded_ell, gather_sharded_ell])
def test_sharded_spmv_matches_scipy(builder, mesh, rng):
    a = laplacian_2d_scipy(13, 11)  # n=143, not a multiple of 8*8
    op = builder(a, mesh, dtype=jnp.float64)
    x = rng.standard_normal(a.shape[0])
    xs = op.pad_vector(x)
    y = op.mv(xs)
    if builder is halo_sharded_ell:
        y = op.unpad_vector(y)
    np.testing.assert_allclose(np.asarray(y)[: a.shape[0]], a @ x, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("builder", [halo_sharded_ell, gather_sharded_ell])
def test_sharded_spmm_matches_scipy(builder, mesh, rng):
    # Maxwell [E;H] ordering is NOT banded (E rows couple to H columns
    # half the matrix away) -> the halo path must auto-apply RCM.
    a = assemble_maxwell_A(3, 3, 3)
    op = builder(a, mesh, dtype=jnp.float64)
    if builder is halo_sharded_ell:
        assert op.perm is not None  # auto-RCM kicked in
    x = rng.standard_normal((5, a.shape[0]))  # block-major (p, n)
    xs = op.pad_vector(x)
    y = op.mm(xs)
    if builder is halo_sharded_ell:
        y = op.unpad_vector(y)
    np.testing.assert_allclose(
        np.asarray(y)[:, : a.shape[0]], (a @ x.T).T, rtol=1e-12, atol=1e-12
    )


def test_halo_multihop_dense_coupling(mesh, rng):
    # an arrow matrix couples row 0 to every column -> not banded; the
    # multi-hop exchange reaches k-th neighbors for k = 1..n_dev-1, so it
    # is still representable (hops == n_dev-1: each shard's halo window
    # spans nearly the whole vector).  Correctness of that worst case:
    import scipy.sparse as sp

    n = 256
    a = sp.lil_matrix((n, n))
    a.setdiag(2.0)
    a[0, :] = 1.0
    a[:, 0] = 1.0
    a = a.tocsr()
    op = halo_sharded_ell(a, mesh, dtype=jnp.float64, reorder="none")
    x = rng.standard_normal(n)
    y = op.unpad_vector(op.mv(op.pad_vector(x)))
    np.testing.assert_allclose(np.asarray(y)[:n], a @ x, rtol=1e-12, atol=1e-12)


def test_distributed_vector_lanczos_matches_local(mesh, rng):
    a_sp = laplacian_2d_scipy(12, 10)
    n = a_sp.shape[0]
    b = rng.standard_normal(n)
    m = 12

    ref = vector_lanczos(
        MatrixOperator(jnp.asarray(a_sp.toarray())), jnp.asarray(b), m
    )

    op = halo_sharded_ell(a_sp, mesh, dtype=jnp.float64)
    bs = op.pad_vector(b)
    res = vector_lanczos(op, bs, m)

    np.testing.assert_allclose(
        np.asarray(res.alphas), np.asarray(ref.alphas), rtol=1e-11, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(res.betas), np.asarray(ref.betas), rtol=1e-11, atol=1e-12
    )


def test_distributed_block_lanczos_matches_local(mesh, rng):
    a_sp = laplacian_2d_scipy(12, 10)
    n = a_sp.shape[0]
    p, m = 4, 6
    b = rng.standard_normal((p, n))  # block-major

    ref = block_lanczos(
        MatrixOperator(jnp.asarray(a_sp.toarray())), jnp.asarray(b), m,
        eig_backend="lax",
    )
    op = halo_sharded_ell(a_sp, mesh, dtype=jnp.float64)
    bs = op.pad_vector(b)
    res = block_lanczos(op, bs, m, eig_backend="lax")

    np.testing.assert_allclose(
        np.asarray(res.alphas), np.asarray(ref.alphas), rtol=1e-9, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(res.betas), np.asarray(ref.betas), rtol=1e-9, atol=1e-10
    )


def test_distributed_reorth_and_eigsh(mesh, rng):
    from scipy.sparse.linalg import eigsh as scipy_eigsh

    a_sp = laplacian_2d_scipy(16, 15)
    op = gather_sharded_ell(a_sp, mesh, dtype=jnp.float64)
    b = op.pad_vector(rng.standard_normal(a_sp.shape[0]))
    vals, _, _ = lanczos_eigsh(op, b, m=110, k=4, which="LA", reorth="full")
    want = scipy_eigsh(a_sp, k=4, which="LA", return_eigenvectors=False)[::-1]
    np.testing.assert_allclose(np.asarray(vals), want, rtol=1e-9)


def test_distributed_expm_action_receiver_on_any_shard(mesh, rng):
    """lc may live on any shard (SURVEY.md §7 'dynamic lc under shard_map')."""
    from scipy.linalg import expm as scipy_expm

    a_sp = assemble_maxwell_A(3, 3, 3)
    n = a_sp.shape[0]
    b = rng.standard_normal(n)
    exact = scipy_expm(a_sp.toarray()) @ b

    op = halo_sharded_ell(a_sp, mesh, dtype=jnp.float64)
    bs = op.pad_vector(b)
    for lc in (3, n // 2, n - 1):
        sol = float(lanczos_expm_action(op, bs, 10, 1.0, op.local_index(lc)))
        assert abs(sol - exact[lc]) / (abs(exact[lc]) + 1e-300) < 1e-7
