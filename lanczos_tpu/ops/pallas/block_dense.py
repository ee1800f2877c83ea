"""Fused block-dense Pallas kernels: multi-operand mix and multi-Gram.

The dense block math around the SpMM — Gram products (reference
`kernels/mm_tt.hpp` / `mm_tt2.hpp`) and tall x small basis updates
(`mm_ts.hpp`) — is memory-bound: p <= 18 columns over 10^7..10^8-row
states.  Issued as separate XLA einsums each op costs a full HBM pass
and measures at only 25-60% of the chip's copy bandwidth (profiled:
gram 227 GB/s, mix 445 GB/s vs 650 GB/s copy).  These two kernels read
every operand exactly once:

* ``block_mix(coeffs, xs)``   — out[j] = sum_k coeffs[k, j] * cat(xs)[k]
  (the reference's fused ``mm_ts2`` subtract-update generalized to an
  arbitrary linear recombination of several block operands,
  `mm_ts.hpp:110`), one read of each x + one write of out.
* ``block_grams(xs, z)``      — gram(cat(xs), z)[k, j] = <cat(xs)[k], z[j]>
  (the reference's ``mm_tt``/``mm_tt2`` Gram kernels, `mm_tt.hpp:3`,
  `mm_tt2.hpp:12`), one read of each x and of z, accumulating the
  (K, p) result in VMEM across sequential grid steps — the TPU analogue
  of the reference's shared-memory block reduction + atomicAdd
  (`mm_tt.hpp:77-148`), which TPUs do by revisiting the same output
  block instead of global atomics.

Both kernels are layout-polymorphic over the state: operands are
(p_i, *state) with the two minor state dims tiled ((bm, P) blocks) and
any leading state dims walked by the grid, so the stacked folded-plane
Maxwell state (p, 6, Zc, P) is processed in its native tiling with no
reshape/relayout traffic.  Rank-2 flat states (p, n) use (p, nt) blocks.

Shapes that don't divide into legal tiles fall back to jnp einsums.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# target VMEM bytes for all double-buffered operand blocks of one call
_VMEM_BUDGET = 80 * 1024 * 1024


def _plan_blocks(state_shape, dtype, n_streams, ps):
    """Pick (lead, bm, pt) tiling of a state shape: leading dims walked by
    the grid, minor-2 dims split into (bm, pt) blocks.  Returns None if no
    legal tiling exists (caller falls back to jnp)."""
    itemsize = jnp.dtype(dtype).itemsize
    sub = 16 if itemsize == 2 else 8
    if len(state_shape) == 1:
        (n,) = state_shape
        if n % 128:
            return None
        # flat (p, n): block (p, pt); p occupies (padded) sublanes
        per_lane_cost = max(ps + [sub]) * itemsize * n_streams * 2
        target = max(_VMEM_BUDGET // per_lane_cost, 128)
        q = n // 128
        tq = max(min(target // 128, q), 1)
        while q % tq:
            tq -= 1
        return ("flat", tq * 128)
    m, p_minor = state_shape[-2], state_shape[-1]
    lead = state_shape[:-2]
    if p_minor % 128 or m % sub:
        return None
    bm = sub
    maxp = max(ps)
    # grow bm while VMEM fits and it divides m
    while (
        bm * 2 <= m
        and m % (bm * 2) == 0
        and maxp * (bm * 2) * p_minor * itemsize * n_streams * 2 <= _VMEM_BUDGET
    ):
        bm *= 2
    if m % bm:
        return None
    return ("tiled", lead, bm)


def _as2d(ref_val):
    """(p, *ones, bm, P) block value -> (p, bm*P)."""
    v = ref_val
    return v.reshape(v.shape[0], -1)


def block_mix(coeffs: jax.Array, xs, interpret: bool | None = None) -> jax.Array:
    """out[j] = sum_k coeffs[k, j] * cat(xs, axis=0)[k].

    coeffs: (K, p_out) with K = sum of the leading dims of xs; xs: tuple of
    (p_i, *state) arrays sharing state shape & dtype.  One HBM read per
    operand + one write of the (p_out, *state) output."""
    xs = tuple(xs)
    state = xs[0].shape[1:]
    dtype = xs[0].dtype
    p_out = coeffs.shape[1]
    ps = [x.shape[0] for x in xs]
    assert coeffs.shape[0] == sum(ps), (coeffs.shape, ps)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    plan = _plan_blocks(state, dtype, len(xs) + 1, ps + [p_out])
    if plan is None:
        out = jnp.zeros((p_out,) + state, dtype)
        o = 0
        for x, p_i in zip(xs, ps):
            out = out + jnp.einsum(
                "kj,k...->j...", coeffs[o : o + p_i].astype(dtype), x
            )
            o += p_i
        return out

    acc_dt = jnp.promote_types(jnp.float32, dtype)
    cf = coeffs.astype(acc_dt)
    offs = [0]
    for p_i in ps:
        offs.append(offs[-1] + p_i)

    if plan[0] == "flat":
        pt = plan[1]
        n = state[0]
        grid = (n // pt,)
        in_specs = [
            pl.BlockSpec((p_i, pt), lambda b: (0, b), memory_space=pltpu.VMEM)
            for p_i in ps
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)]
        out_spec = pl.BlockSpec(
            (p_out, pt), lambda b: (0, b), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((p_out, n), dtype)
    else:
        _, lead, bm = plan
        m, p_minor = state[-2], state[-1]
        r = len(lead)
        grid = tuple(lead) + (m // bm,)

        def imap(p_i):
            del p_i
            return lambda *g: (0,) + g[:-1] + (g[-1], 0)

        blk = lambda p_i: (p_i,) + (1,) * r + (bm, p_minor)
        in_specs = [
            pl.BlockSpec(blk(p_i), imap(p_i), memory_space=pltpu.VMEM)
            for p_i in ps
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)]
        out_spec = pl.BlockSpec(
            blk(p_out), imap(p_out), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((p_out,) + tuple(state), dtype)

    def kernel(*refs):
        out_ref = refs[-1]
        c_ref = refs[-2]
        acc = None
        for i, p_i in enumerate(ps):
            xv = _as2d(refs[i][...]).astype(acc_dt)
            ci = c_ref[offs[i] : offs[i + 1], :]  # (p_i, p_out)
            term = jax.lax.dot_general(
                ci,
                xv,
                (((0,), (0,)), ((), ())),
                preferred_element_type=acc_dt,
            )  # (p_out, bm*P)
            acc = term if acc is None else acc + term
        out_ref[...] = acc.reshape(out_ref.shape).astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*xs, cf)


def block_grams(
    xs, z: jax.Array, include_zz: bool = False, interpret: bool | None = None
) -> jax.Array:
    """gram(cat(xs), z): (K, p) with K = sum p_i — <cat(xs)[k], z[j]> summed
    over all state axes.  One HBM read per operand; the (K, p) accumulator
    lives in VMEM across the sequential grid (no atomics — the Pallas
    revisiting-output pattern).  f32 accumulation regardless of state dtype.

    include_zz=True appends gram(z, z) as the trailing p rows — computed
    from the z tiles already resident in VMEM, i.e. WITHOUT a second HBM
    read of z (the fused-iteration path needs gram(q, v) and gram(v, v)
    from one 2-operand pass)."""
    xs = tuple(xs)
    state = z.shape[1:]
    dtype = z.dtype
    p = z.shape[0]
    ps = [x.shape[0] for x in xs]
    K = sum(ps) + (p if include_zz else 0)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    plan = _plan_blocks(state, dtype, len(xs) + 1, ps + [p])
    acc_dt = jnp.promote_types(jnp.float32, dtype)
    if plan is None:
        ops = list(xs) + ([z] if include_zz else [])
        return jnp.concatenate(
            [
                jnp.einsum(
                    "k...,j...->kj",
                    x,
                    z,
                    preferred_element_type=acc_dt,
                    precision=jax.lax.Precision.HIGHEST,
                )
                for x in ops
            ]
        ).astype(acc_dt)

    offs = [0]
    for p_i in ps:
        offs.append(offs[-1] + p_i)

    if plan[0] == "flat":
        pt = plan[1]
        n = state[0]
        grid = (n // pt,)
        in_specs = [
            pl.BlockSpec((p_i, pt), lambda b: (0, b), memory_space=pltpu.VMEM)
            for p_i in ps
        ] + [pl.BlockSpec((p, pt), lambda b: (0, b), memory_space=pltpu.VMEM)]
    else:
        _, lead, bm = plan
        m, p_minor = state[-2], state[-1]
        r = len(lead)
        grid = tuple(lead) + (m // bm,)
        imap = lambda *g: (0,) + g[:-1] + (g[-1], 0)
        blk = lambda p_i: (p_i,) + (1,) * r + (bm, p_minor)
        in_specs = [
            pl.BlockSpec(blk(p_i), imap, memory_space=pltpu.VMEM)
            for p_i in ps
        ] + [pl.BlockSpec(blk(p), imap, memory_space=pltpu.VMEM)]

    out_spec = pl.BlockSpec(
        (K, p), lambda *g: (0, 0), memory_space=pltpu.VMEM
    )

    def kernel(*refs):
        out_ref = refs[-1]
        z_ref = refs[-2]
        zv = _as2d(z_ref[...]).astype(acc_dt)
        first = functools.reduce(
            jnp.logical_and,
            [pl.program_id(d) == 0 for d in range(len(grid))],
        )
        parts = []
        for i in range(len(ps)):
            xv = _as2d(refs[i][...]).astype(acc_dt)
            parts.append(
                jax.lax.dot_general(
                    xv,
                    zv,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=acc_dt,
                )
            )  # (p_i, p)
        if include_zz:
            parts.append(
                jax.lax.dot_general(
                    zv, zv, (((1,), (1,)), ((), ())),
                    preferred_element_type=acc_dt,
                )
            )
        acc = jnp.concatenate(parts, axis=0)  # (K, p)

        @pl.when(first)
        def _():
            out_ref[...] = acc

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[...] = out_ref[...] + acc

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((K, p), acc_dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*xs, z)
