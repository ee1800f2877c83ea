"""Round-5 fused-iteration kernels: stencil+Gram with destination
aliasing (`ops/pallas/stencil_gram.py`) and the in-place `block_mix`,
plus the mono-path dispatch inside `block_lanczos_fused`.

Reference parity: the fused call covers `ell::SpMM`
(`spmv_spmm.hpp:138-199`) + `mm_tt`/`mm_tt2` (`mm_tt.hpp`, `mm_tt2.hpp`)
in one pass; correctness is checked against the materialized
recurrence, the reference semantics path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanczos_tpu.methods.block_lanczos import block_lanczos
from lanczos_tpu.models.maxwell_pallas import PallasMaxwellOperator
from lanczos_tpu.ops.pallas.block_dense import block_mix


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("n,p", [(6, 3), (10, 2), (6, 1)])
def test_stencil_gram_matches_mm_plus_grams(rng, n, p):
    op = PallasMaxwellOperator.create(n, n, n, dtype=jnp.float32, tz=16)
    q = op.pack(jnp.asarray(rng.standard_normal((p, op.n)), jnp.float32))
    dst = op.pack(jnp.asarray(rng.standard_normal((p, op.n)), jnp.float32))
    v_ref = op.mm(q)
    v, g3 = op.stencil_gram(q, dst)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=1e-6)
    qf = np.asarray(q).reshape(p, -1).astype(np.float64)
    vf = np.asarray(v_ref).reshape(p, -1).astype(np.float64)
    df = np.asarray(dst).reshape(p, -1).astype(np.float64)
    g_ref = np.concatenate([qf @ vf.T, vf @ vf.T, df @ qf.T])
    scale = np.abs(g_ref).max()
    np.testing.assert_allclose(np.asarray(g3), g_ref, atol=3e-5 * scale)


def test_block_mix_inplace_matches(rng):
    op = PallasMaxwellOperator.create(6, 6, 6, dtype=jnp.float32, tz=16)
    p = 2
    xs = tuple(
        op.pack(jnp.asarray(rng.standard_normal((p, op.n)), jnp.float32))
        for _ in range(3)
    )
    e = jnp.asarray(rng.standard_normal((3 * p, p)), jnp.float32)
    out = block_mix(e, xs)
    out_ip = block_mix(e, xs, inplace=True)
    np.testing.assert_allclose(np.asarray(out_ip), np.asarray(out), atol=1e-6)
    with pytest.raises(ValueError, match="inplace"):
        block_mix(jnp.zeros((3 * p, p + 1), jnp.float32), xs, inplace=True)


@pytest.mark.parametrize("n,p,m", [(6, 3, 5), (6, 1, 5), (6, 2, 2), (6, 2, 3)])
def test_mono_fused_matches_materialized(rng, n, p, m):
    """The two-call aliased iteration (mono path, auto-dispatched for
    PallasMaxwellOperator) reproduces the reference-semantics
    materialized recurrence, including the odd/even double-step split."""
    import lanczos_tpu.methods.block_lanczos_fused as blf

    op = PallasMaxwellOperator.create(n, n, n, dtype=jnp.float32, tz=16)
    b = op.pack(jnp.asarray(rng.standard_normal((p, op.n)), jnp.float32) * 0.3)
    assert op.supports_stencil_gram(p)
    r_old = block_lanczos(op, b, m, lc=5, fused=False)
    r_new = blf.block_lanczos_fused(op, b, m, 5)
    for name in ("alphas", "betas", "trace", "beta_final"):
        a_ = np.asarray(getattr(r_old, name))
        bv = np.asarray(getattr(r_new, name))
        err = np.max(np.abs(a_ - bv)) / max(np.max(np.abs(a_)), 1e-30)
        assert err < 5e-4, (name, err)


def test_mono_chunked_plane_path(rng, monkeypatch):
    """Force nc > 1 (lane-chunked halo-stream path) by shrinking the
    planner's VMEM budget; n=19 gives plane=512=2x256 with halo 256."""
    import lanczos_tpu.ops.pallas.stencil_gram as sg

    op = PallasMaxwellOperator.create(19, 19, 4, dtype=jnp.float32, tz=16)
    assert op.spec.plane == 512, op.spec.plane
    p = 2
    plan_full = sg.plan_stencil_gram(p, op.spec_e, jnp.float32)
    assert plan_full[0] == 512  # unchunked at the real budget
    monkeypatch.setattr(sg, "_VMEM_BUDGET", 1)
    with pytest.raises(ValueError):
        # budget of 1 byte: no plan at all -> loud error
        op.stencil_gram(
            op.pack(jnp.zeros((p, op.n), jnp.float32)),
            op.pack(jnp.zeros((p, op.n), jnp.float32)),
        )
    # budget that admits pc=256 but not the full plane
    pc_budget = 2 * (3 * p * 6 * 16 * 256 * 4 + 2 * p * 6 * 16 * 256 * 4
                     + 4 * p * 8 * 256 * 4)
    monkeypatch.setattr(sg, "_VMEM_BUDGET", pc_budget)
    plan = sg.plan_stencil_gram(p, op.spec_e, jnp.float32)
    assert plan[0] == 256, plan
    q = op.pack(jnp.asarray(rng.standard_normal((p, op.n)), jnp.float32))
    dst = op.pack(jnp.asarray(rng.standard_normal((p, op.n)), jnp.float32))
    v, g3 = op.stencil_gram(q, dst)
    v_ref = op.mm(q)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=1e-6)
    qf = np.asarray(q).reshape(p, -1).astype(np.float64)
    vf = np.asarray(v_ref).reshape(p, -1).astype(np.float64)
    df = np.asarray(dst).reshape(p, -1).astype(np.float64)
    g_ref = np.concatenate([qf @ vf.T, vf @ vf.T, df @ qf.T])
    np.testing.assert_allclose(
        np.asarray(g3), g_ref, atol=3e-5 * np.abs(g_ref).max()
    )


@pytest.mark.parametrize("n,p", [(6, 1), (10, 2)])
def test_fdtd_inplace_step_matches_two_pass(rng, n, p):
    """u <- u + (dt A) u via the aliased one-pass kernel == the two-pass
    kernel+axpy (reference fdtd.hpp semantics), over many chained steps
    so the delay ring and write-behind schedule are fully exercised."""
    from lanczos_tpu.methods.fdtd import fdtd_block, fdtd_vector

    op = PallasMaxwellOperator.create(n, n, n, dtype=jnp.float32, tz=16)
    assert op.supports_fdtd_inplace(p)
    nst = 12  # enough chained steps to exercise the ring + write-behind
    dt = jnp.float32(0.5 / nst)
    ops = op.scaled(dt)
    if p == 1:
        u0 = op.pack(jnp.asarray(rng.standard_normal(op.n), jnp.float32))
        got = fdtd_vector(op, u0, nst, 0.5)
        ref = u0
        for _ in range(nst):
            ref = ref + ops.mv(ref)
    else:
        u0 = op.pack(
            jnp.asarray(rng.standard_normal((p, op.n)), jnp.float32)
        )
        got = fdtd_block(op, u0, nst, 0.5)
        ref = u0
        for _ in range(nst):
            ref = ref + ops.mm(ref)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
