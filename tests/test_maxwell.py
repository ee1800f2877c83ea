"""Maxwell operator assembly: symmetry, structure, and matrix-free parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from lanczos_tpu.models.maxwell import (
    MaxwellOperator,
    assemble_maxwell_A,
    maxwell_component_shapes,
    maxwell_scipy,
)


def total_size(nx, ny, nz):
    return sum(int(np.prod(s)) for s in maxwell_component_shapes(nx, ny, nz))


@pytest.mark.parametrize("n", [2, 3, 4])
def test_sizes_match_reference(n):
    # Reference problem sizes: N=3 -> 252 (lanczos_plots.m convergence run),
    # N=10 -> 6930 (default driver).
    sizes = {3: 252, 10: 6930}
    t = total_size(n, n, n)
    if n in sizes:
        assert t == sizes[n]
    a = assemble_maxwell_A(n, n, n)
    assert a.shape == (t, t)


def test_size_n10():
    assert total_size(10, 10, 10) == 6930


@pytest.mark.parametrize("dims", [(3, 3, 3), (2, 3, 4)])
def test_A_symmetric(dims):
    a = assemble_maxwell_A(*dims)
    diff = (a - a.T).toarray()
    assert np.max(np.abs(diff)) < 1e-14


@pytest.mark.parametrize("dims", [(3, 3, 3), (2, 3, 4)])
def test_ell_width_4(dims):
    a = assemble_maxwell_A(*dims)
    per_row = np.diff(a.indptr)
    assert per_row.max() == 4  # the reference's width-4 ELL assumption


@pytest.mark.parametrize("dims", [(2, 2, 2), (3, 3, 3), (2, 3, 4)])
def test_matrix_free_matches_scipy(dims, rng):
    a = assemble_maxwell_A(*dims)
    op = MaxwellOperator.create(*dims, dtype=jnp.float64)
    n = a.shape[0]
    x = rng.standard_normal(n)
    got = np.asarray(op.mv(jnp.asarray(x)))
    want = a @ x
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_matrix_free_mm(rng):
    dims = (3, 3, 3)
    a = assemble_maxwell_A(*dims)
    op = MaxwellOperator.create(*dims, dtype=jnp.float64)
    X = rng.standard_normal((a.shape[0], 4))
    got = np.asarray(op.mm(jnp.asarray(X.T))).T
    np.testing.assert_allclose(got, a @ X, rtol=1e-12, atol=1e-12)


def test_operator_is_jittable(rng):
    import jax

    dims = (2, 3, 2)
    op = MaxwellOperator.create(*dims, dtype=jnp.float64)
    x = jnp.asarray(rng.standard_normal(op.n))
    f = jax.jit(lambda o, v: o.mv(v))
    got = f(op, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(op.mv(x)), rtol=1e-12
    )
