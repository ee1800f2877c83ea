"""Windowed-ELL Pallas SpMM: planner + kernel correctness vs scipy.

Runs in interpret mode on the CPU mesh (conftest pins JAX_PLATFORMS=cpu);
the same code path compiles natively on TPU (benchmarks/kernel_bench.py).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from lanczos_tpu.ops.pallas.window_ell import (
    PlanError,
    WindowedEllMatrix,
    windowed_from_ell,
    windowed_from_scipy,
)

RNG = np.random.default_rng(42)


def _check(a, p=4, tol=2e-5, **kw):
    kw.setdefault("cpb", 2)
    kw.setdefault("spg", 2)
    A = windowed_from_scipy(a, **kw)
    X = RNG.standard_normal((p, a.shape[1])).astype(np.float32)
    Y = np.asarray(A.mm(jnp.asarray(X)))
    Yref = (a @ X.T).T
    scale = max(np.abs(Yref).max(), 1e-30)
    assert np.abs(Y - Yref).max() / scale < tol
    return A


def _band(n, k=1):
    return sp.diags(
        [np.ones(n - abs(o)) * (2.0 if o == 0 else -1.0) for o in range(-k, k + 1)],
        list(range(-k, k + 1)),
        format="csr",
    ).astype(np.float32)


def test_tridiagonal():
    _check(_band(1000))


def test_non_multiple_of_128_rows():
    _check(_band(999)[:997, :999].tocsr())


def test_wide_band():
    _check(_band(2000, k=5))


def test_banded_plus_random_noise():
    n = 1200
    d = sp.random(n, n, density=0.003, random_state=1, format="csr")
    a = (_band(n) + d + d.T).tocsr().astype(np.float32)
    _check(a, ppc_cap=128)


def test_fully_random_unstructured():
    a = sp.random(500, 500, density=0.02, random_state=2,
                  format="csr").astype(np.float32)
    _check(a, ppc_cap=256)


def test_rectangular():
    a = sp.random(300, 900, density=0.01, random_state=3,
                  format="csr").astype(np.float32)
    _check(a, p=3, ppc_cap=128)


def test_laplacian_2d_vs_scipy():
    from lanczos_tpu.models.laplacian import laplacian_2d_scipy

    a = laplacian_2d_scipy(30, 30).astype(np.float32)
    A = _check(a)
    # 5-point Laplacian packs with no plane splitting: ppc == max row nnz
    # rounded to the sublane-divisibility pad
    assert A.ppc <= 8


def test_mv_matches_mm():
    a = _band(700, k=2)
    A = windowed_from_scipy(a, cpb=2, spg=2)
    x = RNG.standard_normal(700).astype(np.float32)
    y = np.asarray(A.mv(jnp.asarray(x)))
    np.testing.assert_allclose(y, a @ x, rtol=1e-5, atol=1e-5)


def test_padded_chain_zero_copy():
    a = _band(600)
    A = windowed_from_scipy(a, cpb=2, spg=2)
    X = RNG.standard_normal((4, 600)).astype(np.float32)
    Xp = A.pack(jnp.asarray(X))
    assert Xp.shape == (8, A.n128)
    Y2 = A.unpack(A.padded_mm(A.padded_mm(Xp)), 4)
    ref = ((a @ (a @ X.T))).T
    np.testing.assert_allclose(np.asarray(Y2), ref, rtol=1e-4, atol=1e-4)


def test_from_ell_roundtrip():
    from lanczos_tpu.ops.formats import ell_from_scipy

    a = _band(500, k=3)
    ell = ell_from_scipy(a)
    A = windowed_from_ell(ell, cpb=2, spg=2)
    X = RNG.standard_normal((4, 500)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(A.mm(jnp.asarray(X))),
        np.asarray(ell.mm(jnp.asarray(X))),
        rtol=1e-5, atol=1e-5,
    )


def test_to_dense():
    a = (_band(400) + sp.random(400, 400, density=0.002, random_state=5,
                                format="csr")).tocsr().astype(np.float32)
    A = windowed_from_scipy(a, cpb=2, spg=2, ppc_cap=128)
    np.testing.assert_allclose(
        np.asarray(A.to_dense()), a.toarray(), rtol=1e-6, atol=1e-6
    )


def test_plan_error_on_cap():
    a = sp.random(1000, 1000, density=0.05, random_state=6,
                  format="csr").astype(np.float32)
    with pytest.raises(PlanError):
        windowed_from_scipy(a, ppc_cap=4)


def test_duplicate_entries_sum():
    rows = np.array([0, 0, 5, 5, 5])
    cols = np.array([3, 3, 7, 7, 7])
    vals = np.array([1.0, 2.0, 1.0, 1.0, 1.0], np.float32)
    a = sp.coo_matrix((vals, (rows, cols)), shape=(200, 200)).tocsr()
    # tocsr + sum_duplicates collapses, but build from COO keeps split
    A = windowed_from_scipy(a, cpb=2, spg=2)
    x = np.zeros(200, np.float32)
    x[3], x[7] = 1.0, 1.0
    y = np.asarray(A.mv(jnp.asarray(x)))
    assert y[0] == pytest.approx(3.0)
    assert y[5] == pytest.approx(3.0)


def test_pytree_jittable():
    import jax

    a = _band(300)
    A = windowed_from_scipy(a, cpb=2, spg=2)

    @jax.jit
    def f(A, x):
        return A.mv(x)

    x = jnp.asarray(RNG.standard_normal(300).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(f(A, x)), a @ np.asarray(x), rtol=1e-5, atol=1e-5
    )


def test_lanczos_end_to_end_windowed():
    """The windowed operator drives the block-Lanczos eigsh end to end."""
    from lanczos_tpu.methods.eigs import block_lanczos_eigsh

    # separated extreme eigenvalues (a bare 1-D Laplacian's top gaps are
    # O(1/n^2) — unresolvable in a short run)
    spikes = np.zeros(400)
    spikes[:3] = [10.0, 8.0, 6.0]
    a = (_band(400) + sp.diags(spikes)).tocsr().astype(np.float32)
    A = windowed_from_scipy(a, cpb=2, spg=2)
    b = jnp.asarray(RNG.standard_normal((4, 400)).astype(np.float32))
    vals, _, resid = block_lanczos_eigsh(A, b, 12, 3, reorth="full")
    ref = np.sort(np.linalg.eigvalsh(a.toarray()))[::-1][:3]
    np.testing.assert_allclose(np.asarray(vals), ref, rtol=1e-3)
