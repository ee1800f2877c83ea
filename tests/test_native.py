"""Native (C++) assembly engine vs the pure-Python/scipy paths."""

import jax.numpy as jnp
import numpy as np
import pytest

from lanczos_tpu import native
from lanczos_tpu.models.laplacian import laplacian_2d_scipy
from lanczos_tpu.models.maxwell import (
    assemble_maxwell_A,
    maxwell_ell_operator,
)
from lanczos_tpu.ops.formats import ell_from_scipy

needs_native = pytest.mark.skipif(
    native.load() is None, reason="native toolchain unavailable"
)


@needs_native
def test_native_ell_from_csr_matches_python(rng, monkeypatch):
    a = laplacian_2d_scipy(9, 7).tocsr()
    ours = ell_from_scipy(a, dtype=jnp.float32)
    # force the Python fallback for comparison
    monkeypatch.setattr(native, "ell_from_csr", lambda *a_, **k: None)
    ref = ell_from_scipy(a, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(ours.data), np.asarray(ref.data))
    np.testing.assert_array_equal(
        np.asarray(ours.indices), np.asarray(ref.indices)
    )


@needs_native
def test_native_ell_f64(rng):
    a = laplacian_2d_scipy(6).tocsr()
    mat = ell_from_scipy(a, dtype=jnp.float64)
    x = rng.standard_normal(a.shape[0])
    np.testing.assert_allclose(
        np.asarray(mat.mv(jnp.asarray(x))), a @ x, rtol=1e-13
    )


@needs_native
def test_native_maxwell_ell_matches_scipy(rng):
    a_ref = assemble_maxwell_A(4, 3, 5)
    mat = maxwell_ell_operator(4, 3, 5)
    assert mat.width == 4
    dense_native = np.zeros(a_ref.shape, np.float64)
    data = np.asarray(mat.data)
    idx = np.asarray(mat.indices)
    for i in range(a_ref.shape[0]):
        for k in range(4):
            dense_native[i, idx[i, k]] += data[i, k]
    np.testing.assert_allclose(dense_native, a_ref.toarray(), rtol=2e-6,
                               atol=1e-9)


@needs_native
def test_native_maxwell_spmv(rng):
    a_ref = assemble_maxwell_A(3, 3, 3)
    mat = maxwell_ell_operator(3, 3, 3)
    x = rng.standard_normal(mat.shape[0]).astype(np.float32)
    got = np.asarray(mat.mv(jnp.asarray(x)))
    np.testing.assert_allclose(got, a_ref @ x, rtol=2e-5, atol=2e-5)


@needs_native
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_native_window_pack_matches_python(monkeypatch, dtype):
    """The C++ two-pass windowed-ELL planner is BIT-compatible with the
    NumPy planner (`ops.pallas.window_ell._pack_planes`), including the
    multi-window greedy grouping on non-banded matrices."""
    import scipy.sparse as sp

    from lanczos_tpu.ops.pallas import window_ell as we

    cases = []
    cases.append(laplacian_2d_scipy(31, 23).tocsr())          # banded
    cases.append(sp.random(500, 500, density=0.02,            # scattered
                           random_state=1, format="csr"))
    arrow = sp.lil_matrix((300, 300))
    arrow.setdiag(2.0)
    arrow[0, :] = 1.0
    arrow[:, 0] = 1.0
    cases.append(arrow.tocsr())                               # multi-window
    cases.append(sp.random(260, 900, density=0.01,            # rectangular
                           random_state=2, format="csr"))
    for a in cases:
        a = a.tocsr()
        a.sum_duplicates()
        a.data = a.data.astype(dtype)
        got = we._pack_planes(a.indptr, a.indices, a.data, a.shape[0], 10**5)
        monkeypatch.setattr(native, "window_pack_count",
                            lambda *a_, **k: None)
        ref = we._pack_planes(a.indptr, a.indices, a.data, a.shape[0], 10**5)
        monkeypatch.undo()
        for g, r in zip(got, ref):
            assert g.dtype == r.dtype and g.shape == r.shape
            np.testing.assert_array_equal(g, r)


@needs_native
def test_native_window_pack_respects_ppc_cap():
    import scipy.sparse as sp

    from lanczos_tpu.ops.pallas import window_ell as we

    a = sp.random(400, 400, density=0.05, random_state=4, format="csr")
    a.data = a.data.astype(np.float32)
    with pytest.raises(we.PlanError, match="exceeds cap"):
        we._pack_planes(a.indptr, a.indices, a.data, a.shape[0], 1)
