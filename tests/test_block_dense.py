"""Fused block-dense Pallas kernels (`ops/pallas/block_dense.py`) vs
einsum oracles, and the fused (traffic-minimal) block-Lanczos path vs the
materialized recurrence.

TPU counterparts of the reference's mm_ts / mm_tt / mm_tt2 kernel A/B
checks (`kernels/measurements/mm_tt.cu:210-248` etc.), run in Pallas
interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanczos_tpu.methods.block_lanczos import block_lanczos
from lanczos_tpu.ops.operator import MatrixOperator
from lanczos_tpu.ops.pallas.block_dense import block_grams, block_mix


@pytest.mark.parametrize(
    "state", [(6, 16, 256), (4096,), (3, 5, 16, 128)]
)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_block_mix_matches_einsum(rng, state, dtype):
    key = jax.random.PRNGKey(0)
    ps = [4, 4, 4]
    xs = [
        jnp.asarray(rng.standard_normal((p,) + state), dtype) for p in ps
    ]
    c = jnp.asarray(rng.standard_normal((sum(ps), 5)), dtype)
    out = block_mix(c, xs)
    ref = sum(
        jnp.einsum("kj,k...->j...", c[i * 4 : (i + 1) * 4], xs[i])
        for i in range(3)
    )
    tol = 1e-5 if dtype == jnp.float32 else 1e-12
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=tol, atol=tol
    )
    assert out.dtype == dtype


@pytest.mark.parametrize("state", [(6, 16, 256), (4096,)])
def test_block_grams_matches_einsum(rng, state):
    xs = [
        jnp.asarray(rng.standard_normal((p,) + state), jnp.float32)
        for p in (4, 6)
    ]
    z = jnp.asarray(rng.standard_normal((3,) + state), jnp.float32)
    g = block_grams(xs, z, include_zz=True)
    zf = np.asarray(z, np.float64).reshape(3, -1)
    ref = np.concatenate(
        [
            np.asarray(x, np.float64).reshape(x.shape[0], -1) @ zf.T
            for x in list(xs) + [z]
        ]
    )
    assert g.shape == (13, 3)
    np.testing.assert_allclose(np.asarray(g), ref, rtol=1e-4, atol=1e-4)


def test_block_mix_fallback_unaligned(rng):
    # state length not divisible by 128 -> jnp fallback path
    xs = [jnp.asarray(rng.standard_normal((4, 97)), jnp.float32)]
    c = jnp.asarray(rng.standard_normal((4, 4)), jnp.float32)
    out = block_mix(c, xs)
    ref = jnp.einsum("kj,k...->j...", c, xs[0])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)
    g = block_grams(xs, xs[0], include_zz=True)
    assert g.shape == (8, 4)


@pytest.mark.parametrize("dtype,tol", [(jnp.float64, 1e-12), (jnp.float32, 5e-5)])
def test_fused_matches_materialized(rng, dtype, tol):
    """block_lanczos auto-fused == fused=False on a generic symmetric
    operator, to rounding (exact in f64 up to O(eps) algebra shuffles)."""
    n, p, m = 640, 4, 9
    A = rng.standard_normal((n, n))
    A = jnp.asarray((A + A.T) / np.sqrt(n), dtype)
    b = jnp.asarray(rng.standard_normal((p, n)), dtype)
    op = MatrixOperator(A)
    r_std = block_lanczos(op, b, m, lc=3, fused=False)
    r_fus = block_lanczos(op, b, m, lc=3, fused=True)
    for name in ("alphas", "betas", "trace", "beta_final"):
        x = np.asarray(getattr(r_std, name))
        y = np.asarray(getattr(r_fus, name))
        scale = np.abs(x).max()
        np.testing.assert_allclose(y, x, rtol=0, atol=tol * scale, err_msg=name)


def test_fused_store_basis_and_breakdown(rng):
    """store_basis returns the full orthonormal basis; breakdown_tol
    freezes on an (approximately) invariant start block."""
    n, p, m = 320, 3, 6
    A = rng.standard_normal((n, n))
    A = jnp.asarray((A + A.T) / np.sqrt(n), jnp.float64)
    b = jnp.asarray(rng.standard_normal((p, n)), jnp.float64)
    op = MatrixOperator(A)
    r = block_lanczos(op, b, m, store_basis=True, fused=True)
    basis = np.asarray(r.basis).reshape(m * p, n)
    g = basis @ basis.T
    np.testing.assert_allclose(g, np.eye(m * p), atol=5e-7)

    # invariant subspace: b spans 3 exact eigenvectors -> freeze
    d = np.arange(1.0, n + 1)
    opd = MatrixOperator(jnp.asarray(np.diag(d)))
    be = np.zeros((p, n))
    be[0, 0] = be[1, 1] = be[2, 2] = 1.0
    rf = block_lanczos(
        opd, jnp.asarray(be), 4, breakdown_tol=1e-8, breakdown_eps=1e-10,
        fused=True,
    )
    assert bool(rf.breakdown)
    # frozen steps emit zero blocks
    assert float(jnp.abs(rf.alphas[-1]).max()) == 0.0
    assert float(jnp.abs(rf.beta_final).max()) == 0.0


def test_fused_trace_fn_maxwell(rng):
    """Fused path with the Maxwell stacked-state trace_fn override."""
    from lanczos_tpu.models.maxwell import MaxwellOperator
    from lanczos_tpu.models.rhs import gaussian_matrix_B

    op = MaxwellOperator.create(3, 3, 3, dtype=jnp.float64)
    b = jnp.asarray(np.asarray(gaussian_matrix_B(3, op.n, 3), np.float64))
    r0 = block_lanczos(op, b, 7, 11, fused=False)
    r1 = block_lanczos(op, b, 7, 11, fused=True)
    np.testing.assert_allclose(
        np.asarray(r1.trace), np.asarray(r0.trace), atol=1e-10
    )


def test_compensated_gram_f64_oracle(rng):
    """`block_grams_compensated` reaches O(eps_f32) of the f64 oracle on
    inputs whose plain-f32 accumulation error is ~10x larger (the
    reference's all-f64 block driver accuracy from f32 storage,
    `test_lanczos.cu:349-356` / SURVEY.md §7 'f32 + compensated
    reductions')."""
    from lanczos_tpu.ops.pallas.block_dense import (
        block_grams_compensated,
    )

    p, n = 4, 1 << 20
    x = (
        rng.standard_normal((p, n)) * np.exp(rng.uniform(-6, 6, (p, n)))
    ).astype(np.float32)
    z = (
        rng.standard_normal((p, n)) * np.exp(rng.uniform(-6, 6, (p, n)))
    ).astype(np.float32)
    exact = x.astype(np.float64) @ z.astype(np.float64).T
    g = np.asarray(
        block_grams_compensated((jnp.asarray(x),), jnp.asarray(z))
    )[:p]
    scale = np.abs(exact).max()
    assert np.abs(g - exact).max() / scale < 5e-7  # ~4 eps_f32

    gz = np.asarray(
        block_grams_compensated(
            (jnp.asarray(x),), jnp.asarray(z), include_zz=True
        )
    )
    exact_zz = z.astype(np.float64) @ z.astype(np.float64).T
    assert (
        np.abs(gz[p:] - exact_zz).max() / np.abs(exact_zz).max() < 5e-7
    )


def test_compensated_block_lanczos_t_coefficients(rng):
    """fused + compensated=True from f32 storage tracks the f64 oracle
    recurrence's T coefficients more closely than the plain-f32 path."""
    n, p, m = 2048, 4, 6
    A = rng.standard_normal((n, n))
    A = (A + A.T) / np.sqrt(n)
    b = rng.standard_normal((p, n))
    # f64 oracle
    op64 = MatrixOperator(jnp.asarray(A))
    r64 = block_lanczos(op64, jnp.asarray(b), m, fused=False)
    op32 = MatrixOperator(jnp.asarray(A, jnp.float32))
    b32 = jnp.asarray(b, jnp.float32)
    r32c = block_lanczos(op32, b32, m, compensated=True)
    r32p = block_lanczos(op32, b32, m, fused=True)
    a64 = np.asarray(r64.alphas)
    err_c = np.abs(np.asarray(r32c.alphas) - a64).max()
    err_p = np.abs(np.asarray(r32p.alphas) - a64).max()
    # both are f32-storage-limited at later steps, but the compensated
    # first-step coefficients must be at f32-representation level
    a0_err_c = np.abs(np.asarray(r32c.alphas[0]) - a64[0]).max()
    assert a0_err_c < 5e-6 * np.abs(a64[0]).max()
    assert err_c <= err_p * 1.5  # never meaningfully worse overall


def test_lane_tiled_plan(rng, monkeypatch):
    """Wide-p blocks must lane-tile instead of blowing the VMEM budget
    (p=6 on the Maxwell state OOMed the 100 MiB scoped limit before the
    planner learned to split the plane axis)."""
    import lanczos_tpu.ops.pallas.block_dense as bd

    monkeypatch.setattr(bd, "_VMEM_BUDGET", 256 * 1024)
    state = (6, 16, 512)
    plan = bd._plan_blocks(state, jnp.float32, 4, [4, 4, 4, 6])
    assert plan[0] == "tiled" and plan[3] < 512  # lanes were split
    xs = [
        jnp.asarray(rng.standard_normal((4,) + state), jnp.float32)
        for _ in range(3)
    ]
    c = jnp.asarray(rng.standard_normal((12, 6)), jnp.float32)
    out = bd.block_mix(c, xs)
    ref = sum(
        jnp.einsum("kj,k...->j...", c[i * 4 : (i + 1) * 4], xs[i])
        for i in range(3)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    g = bd.block_grams((xs[0],), xs[1], include_zz=True)
    zf = np.asarray(xs[1], np.float64).reshape(4, -1)
    ref_g = np.concatenate(
        [np.asarray(x, np.float64).reshape(4, -1) @ zf.T for x in (xs[0], xs[1])]
    )
    np.testing.assert_allclose(np.asarray(g), ref_g, rtol=1e-4, atol=1e-4)
    # real-shape plans stay under the scoped limit for every sweep width
    monkeypatch.setattr(bd, "_VMEM_BUDGET", 56 * 1024 * 1024)
    for p in (2, 4, 6, 8, 10, 12, 14, 16, 18):
        plan = bd._plan_blocks((6, 176, 26624), jnp.float32, 4, [p] * 4)
        assert plan is not None
        _, lead, bm, pt = plan
        assert p * bm * pt * 4 * 4 * 2 <= 56 * 1024 * 1024


@pytest.mark.parametrize("m", [1, 2, 3])
def test_fused_small_m_edges(rng, m):
    """m=1 (prologue only), m=2 (peeled step, no scan), m=3 (scan length
    1) all match the materialized recurrence — the fused path's peeled
    structure makes these genuinely different code paths."""
    n, p = 320, 4
    A = rng.standard_normal((n, n))
    A = jnp.asarray((A + A.T) / np.sqrt(n), jnp.float64)
    b = jnp.asarray(rng.standard_normal((p, n)), jnp.float64)
    op = MatrixOperator(A)
    r0 = block_lanczos(op, b, m, lc=5, fused=False)
    r1 = block_lanczos(op, b, m, lc=5, fused=True)
    for name in ("alphas", "betas", "trace", "beta_final"):
        np.testing.assert_allclose(
            np.asarray(getattr(r1, name)), np.asarray(getattr(r0, name)),
            atol=1e-11, err_msg=f"m={m} {name}",
        )


def test_vector_fused_route_matches_classic(rng):
    """vector_lanczos fused=True (the p=1 fused route with the scalar
    sqrt fast path) == the classic scan, including beta_final and basis."""
    from lanczos_tpu.methods.vector_lanczos import vector_lanczos

    n, m = 512, 10
    A = rng.standard_normal((n, n))
    A = jnp.asarray((A + A.T) / np.sqrt(n), jnp.float64)
    b = jnp.asarray(rng.standard_normal(n), jnp.float64)
    op = MatrixOperator(A)
    r0 = vector_lanczos(op, b, m, lc=7, fused=False, store_basis=True)
    r1 = vector_lanczos(op, b, m, lc=7, fused=True, store_basis=True)
    for name in ("alphas", "betas", "trace", "beta_final", "basis"):
        np.testing.assert_allclose(
            np.asarray(getattr(r1, name)), np.asarray(getattr(r0, name)),
            atol=1e-11, err_msg=name,
        )


def test_compensated_scratch_shrink_keeps_compensation(rng):
    """ADVICE r4 (medium): when the two-float scratch would overflow its
    VMEM budget at the planner's lane tile, the lane tile must SHRINK and
    compensation must survive — the old path silently fell back to an
    astype(float64) einsum that computes plain f32 without x64."""
    from lanczos_tpu.ops.pallas.block_dense import block_grams_compensated

    import lanczos_tpu.ops.pallas.block_dense as bd

    # small shapes + a shrunk budget (test-patchable module constant)
    # force the lane-tile shrink path cheaply: p=4 -> K*p = 32 pairs,
    # default tile 8192 lanes -> scratch 2.1 MB > the patched 1 MB cap.
    n, p = 1 << 13, 4
    bd_orig = bd._COMP_SCRATCH_BUDGET
    bd._COMP_SCRATCH_BUDGET = 1 * 1024 * 1024
    try:
        x = rng.standard_normal((p, n)).astype(np.float32) * 0.1
        z = rng.standard_normal((p, n)).astype(np.float32) * 0.1
        g = block_grams_compensated((jnp.asarray(x),), jnp.asarray(z),
                                    include_zz=True)
    finally:
        bd._COMP_SCRATCH_BUDGET = bd_orig
    oracle = np.concatenate([
        x.astype(np.float64) @ z.astype(np.float64).T,
        z.astype(np.float64) @ z.astype(np.float64).T,
    ])
    scale = np.abs(oracle).max()
    np.testing.assert_allclose(np.asarray(g), oracle, atol=4e-7 * scale)


def test_compensated_non_tileable_raises(rng):
    """Non-lane-tileable state without x64: loud error, never a silent
    uncompensated result (ADVICE r4)."""
    import pytest

    from lanczos_tpu.ops.pallas.block_dense import block_grams_compensated

    if jax.config.read("jax_enable_x64"):
        pytest.skip("x64 enabled: the exact f64 fallback is legitimate")
    z = jnp.asarray(rng.standard_normal((2, 7, 33)), jnp.float32)
    with pytest.raises(ValueError, match="lane-tileable"):
        block_grams_compensated((), z, include_zz=True)
