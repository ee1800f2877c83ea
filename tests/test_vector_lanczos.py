"""Single-vector Lanczos: recurrence parity, Ritz accuracy, FDTD oracle.

Mirrors the reference's validation strategy (SURVEY.md §4): the physics
oracle (Lanczos-expm vs forward-Euler) plus eigsh cross-checks the
reference lacks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanczos_tpu.methods.expm_action import lanczos_expm_action
from lanczos_tpu.methods.fdtd import fdtd_vector
from lanczos_tpu.methods.vector_lanczos import vector_lanczos
from lanczos_tpu.methods.eigs import lanczos_eigsh
from lanczos_tpu.models.laplacian import laplacian_2d_scipy
from lanczos_tpu.models.maxwell import MaxwellOperator
from lanczos_tpu.models.rhs import gaussian_vector_b
from lanczos_tpu.ops import csr_from_scipy
from lanczos_tpu.ops.operator import MatrixOperator


def _numpy_lanczos(a, b, m):
    """Plain NumPy transcription of the recurrence (vector_lanczos.hpp:9-67)."""
    alphas, betas = np.zeros(m), np.zeros(m)
    betas[0] = np.linalg.norm(b)
    q0 = b / betas[0]
    w = a @ q0
    alphas[0] = w @ q0
    w = w - alphas[0] * q0
    for j in range(1, m):
        betas[j] = np.linalg.norm(w)
        q1 = w / betas[j]
        w = a @ q1 - betas[j] * q0
        alphas[j] = w @ q1
        w = w - alphas[j] * q1
        q0 = q1
    return alphas, betas


def test_recurrence_matches_numpy(rng):
    a = laplacian_2d_scipy(8)
    b = rng.standard_normal(a.shape[0])
    m = 10
    res = vector_lanczos(MatrixOperator(jnp.asarray(a.toarray())), jnp.asarray(b), m)
    al, be = _numpy_lanczos(a.toarray(), b, m)
    np.testing.assert_allclose(np.asarray(res.alphas), al, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.betas), be, rtol=1e-12, atol=1e-12)


def test_trace_records_receiver(rng):
    a = laplacian_2d_scipy(6)
    b = rng.standard_normal(a.shape[0])
    m, lc = 6, 17
    res = vector_lanczos(
        MatrixOperator(jnp.asarray(a.toarray())), jnp.asarray(b), m, lc,
        store_basis=True,
    )
    np.testing.assert_allclose(
        np.asarray(res.trace), np.asarray(res.basis)[:, lc], atol=1e-14
    )


@pytest.mark.parametrize("reorth", ["none", "full", "selective"])
def test_orthogonality(reorth, rng):
    # diag matrix with huge spread loses orthogonality fast without reorth
    n, m = 300, 60
    d = np.geomspace(1, 1e6, n)
    a = MatrixOperator(jnp.asarray(np.diag(d)))
    b = jnp.asarray(rng.standard_normal(n))
    res = vector_lanczos(a, b, m, reorth=reorth, store_basis=True)
    q = np.asarray(res.basis)
    gram = q @ q.T
    err = np.abs(gram - np.eye(m)).max()
    if reorth == "none":
        assert err > 1e-4  # the bare recurrence must have lost it
    else:
        assert err < 1e-8, f"{reorth} reorth failed: {err}"


def test_ritz_values_vs_scipy(rng):
    from scipy.sparse.linalg import eigsh

    # rectangular grid -> simple spectrum (a square grid is doubly
    # degenerate and a single-vector Krylov space only sees one copy)
    a_sp = laplacian_2d_scipy(20, 19)
    b = rng.standard_normal(a_sp.shape[0])
    a = csr_from_scipy(a_sp, dtype=jnp.float64)
    vals, vecs, resid = lanczos_eigsh(
        a, jnp.asarray(b), m=140, k=5, which="LA", reorth="full",
        compute_vectors=True,
    )
    want = eigsh(a_sp, k=5, which="LA", return_eigenvectors=False)[::-1]
    np.testing.assert_allclose(np.asarray(vals), want, rtol=1e-10)
    # Ritz vectors satisfy the eigen equation
    v = np.asarray(vecs)
    for i in range(5):
        r = a_sp @ v[:, i] - np.asarray(vals)[i] * v[:, i]
        assert np.linalg.norm(r) < 1e-8


def test_breakdown_detection():
    # start in an eigenvector: Krylov space is 1-dimensional
    a = MatrixOperator(jnp.diag(jnp.asarray([1.0, 2.0, 3.0, 4.0])))
    b = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    res = vector_lanczos(a, b, m=4, breakdown_tol=1e-12)
    assert bool(res.breakdown)
    assert np.all(np.isfinite(np.asarray(res.alphas)))
    assert np.asarray(res.betas)[1] == 0.0


def test_expm_action_convergence(rng):
    """The reference's headline physics oracle (lanczos_plots.m:168-169):
    rel. error vs m on the N=3 Maxwell problem (size 252), T_end=1.

    We validate against the exact dense expm (sharper than the reference's
    10^6-step Euler oracle) and separately check the FDTD integrator
    against the same exact value below."""
    from scipy.linalg import expm as scipy_expm

    from lanczos_tpu.models.maxwell import assemble_maxwell_A

    op = MaxwellOperator.create(3, 3, 3, dtype=jnp.float64)
    b = np.asarray(gaussian_vector_b(3, op.n))
    lc = 20  # inside the Gaussian RHS support (first 36 entries)
    a_dense = assemble_maxwell_A(3, 3, 3).toarray()
    exact = scipy_expm(a_dense) @ b
    ref_val = exact[lc]

    errs = {}
    for m in (1, 2, 4, 6, 8):
        sol = float(lanczos_expm_action(op, jnp.asarray(b), m, 1.0, lc))
        errs[m] = abs(sol - ref_val) / abs(ref_val)
    # shape matches the reference table: large at m=1, plateau ~1e-9 by m>=6
    assert errs[1] > errs[2] > errs[4] > errs[6]
    assert errs[2] < 1e-1
    assert errs[4] < 1e-4
    assert errs[6] < 1e-8
    assert errs[8] < 1e-10


def test_fdtd_integrator_vs_dense_expm(rng):
    """Forward-Euler oracle itself converges to the exact expm action."""
    from scipy.linalg import expm as scipy_expm

    from lanczos_tpu.models.maxwell import assemble_maxwell_A

    op = MaxwellOperator.create(2, 2, 2, dtype=jnp.float64)
    b = np.asarray(gaussian_vector_b(2, op.n))
    a_dense = assemble_maxwell_A(2, 2, 2).toarray()
    exact = scipy_expm(a_dense) @ b
    u1 = np.asarray(fdtd_vector(op, jnp.asarray(b), 20_000, 1.0))
    u2 = np.asarray(fdtd_vector(op, jnp.asarray(b), 80_000, 1.0))
    e1 = np.linalg.norm(u1 - exact) / np.linalg.norm(exact)
    e2 = np.linalg.norm(u2 - exact) / np.linalg.norm(exact)
    assert e1 < 1e-3
    # first-order method: 4x the steps -> ~4x less error
    assert e2 < e1 / 2.5
