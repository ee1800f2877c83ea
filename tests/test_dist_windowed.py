"""HaloShardedWindowed: distributed windowed-ELL vs scipy and vs the
single-chip kernel, on the 8-device CPU mesh (conftest)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from lanczos_tpu.models.laplacian import laplacian_2d_scipy
from lanczos_tpu.parallel.dist_windowed import halo_sharded_windowed
from lanczos_tpu.parallel.mesh import make_mesh

RNG = np.random.default_rng(7)


def _mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh(8)


def test_mm_matches_scipy():
    a = laplacian_2d_scipy(60, 60).astype(np.float32)
    A = halo_sharded_windowed(a, _mesh8(), cpb=2, spg=2)
    X = RNG.standard_normal((4, a.shape[0])).astype(np.float32)
    Y = np.asarray(A.unpad_vector(A.mm(A.pad_vector(X))))
    ref = (a @ X.T).T
    np.testing.assert_allclose(Y, ref, rtol=1e-5, atol=1e-5)


def test_chain_preserves_zero_halos():
    """The padded-halo state invariant: halos stay zero across chained
    calls, so global dots never double-count boundary rows."""
    a = laplacian_2d_scipy(40, 40).astype(np.float32)
    A = halo_sharded_windowed(a, _mesh8(), cpb=2, spg=2)
    X = RNG.standard_normal((2, a.shape[0])).astype(np.float32)
    Y2p = A.mm(A.mm(A.pad_vector(X)))
    ref2 = (a @ (a @ X.T)).T
    np.testing.assert_allclose(
        np.asarray(A.unpad_vector(Y2p)), ref2, rtol=1e-4, atol=1e-4
    )
    # dot over the padded state == dot over the unpadded rows
    full = float(jnp.sum(Y2p * Y2p))
    trim = float(np.sum(ref2 * ref2))
    assert full == pytest.approx(trim, rel=1e-4)


def test_matches_single_chip_windowed():
    from lanczos_tpu.ops.pallas.window_ell import windowed_from_scipy

    n = 900
    # banded random noise (multi-hop halo: band ~300 > rows_loc 128)
    d = sp.random(n, n, density=0.002, random_state=3, format="coo")
    keep = np.abs(d.row - d.col) <= 300
    d = sp.coo_matrix(
        (d.data[keep], (d.row[keep], d.col[keep])), shape=(n, n)
    )
    a = (laplacian_2d_scipy(30, 30) + d + d.T).tocsr().astype(np.float32)
    Ad = halo_sharded_windowed(a, _mesh8(), cpb=2, spg=2, reorder="none")
    As = windowed_from_scipy(a, cpb=2, spg=2, reorder="none")
    x = RNG.standard_normal(n).astype(np.float32)
    yd = np.asarray(Ad.unpad_vector(Ad.mv(Ad.pad_vector(x))))
    ys = np.asarray(As.mv(jnp.asarray(x)))
    np.testing.assert_allclose(yd, ys, rtol=1e-5, atol=1e-5)


def test_rcm_reorder_roundtrip():
    n2 = 200
    B = sp.diags([np.ones(n2), 0.5 * np.ones(n2 - 1)], [0, 1],
                 shape=(n2, n2))
    a = sp.bmat([[None, B], [B.T, None]]).tocsr().astype(np.float32)
    A = halo_sharded_windowed(a, _mesh8(), cpb=2, spg=2, reorder="rcm")
    assert A.is_permuted
    x = RNG.standard_normal(2 * n2).astype(np.float32)
    y = np.asarray(A.unpad_vector(A.mv(A.pad_vector(x))))
    np.testing.assert_allclose(y, a @ x, rtol=1e-5, atol=1e-5)


def test_block_lanczos_eigsh_distributed():
    """Config 4/5 shape: sharded windowed operator through the unchanged
    block-Lanczos eigsh — Ritz values match the dense spectrum."""
    from lanczos_tpu.methods.eigs import block_lanczos_eigsh

    spikes = np.zeros(1600)
    spikes[:3] = [10.0, 8.0, 6.0]
    a = (laplacian_2d_scipy(40, 40) + sp.diags(spikes)).tocsr().astype(
        np.float32
    )
    A = halo_sharded_windowed(a, _mesh8(), cpb=2, spg=2)
    b = A.pad_vector(
        RNG.standard_normal((4, 1600)).astype(np.float32)
    )
    vals, _, _ = block_lanczos_eigsh(A, b, 12, 3, reorth="full")
    ref = np.sort(np.linalg.eigvalsh(a.toarray()))[::-1][:3]
    np.testing.assert_allclose(np.asarray(vals), ref, rtol=1e-3)


def test_local_index_receiver():
    a = laplacian_2d_scipy(40, 40).astype(np.float32)
    A = halo_sharded_windowed(a, _mesh8(), cpb=2, spg=2)
    x = RNG.standard_normal(1600).astype(np.float32)
    xp = np.asarray(A.pad_vector(x))
    for i in (0, 511, 512, 1599):
        assert xp[A.local_index(i)] == pytest.approx(x[i])
