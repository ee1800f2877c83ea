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

# two-float compensated-Gram scratch budget (test-patchable)
_COMP_SCRATCH_BUDGET = 48 * 1024 * 1024

# target VMEM bytes for all double-buffered operand blocks of one call
# the scoped-vmem limit is 100 MiB; real usage runs 1.8-2.9x the raw
# double-buffered block bytes depending on shape (in-kernel value
# copies, alignment, grid bookkeeping — measured 107.9 MiB scoped for
# 54.5 MiB raw at p=16, and 100.4 MiB for 35.1 MiB raw at p=1/bm=32),
# so plan against a conservative budget
_VMEM_BUDGET = 32 * 1024 * 1024


def _plan_blocks(state_shape, dtype, n_streams, ps):
    """Pick the tiling of a state shape: leading dims walked by the grid,
    minor-2 dims split into (bm, pt) blocks (pt | P: these kernels are
    elementwise across rows, so lanes tile freely — unlike the stencil).
    Returns ("flat", pt) or ("tiled", lead, bm, pt); None if no legal
    tiling exists (caller falls back to jnp)."""
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
    maxp = max(ps)

    def cost(bm_, pt_):
        return maxp * bm_ * pt_ * itemsize * n_streams * 2

    bm, pt = sub, p_minor
    # shrink lanes until the minimum block fits
    while cost(bm, pt) > _VMEM_BUDGET and pt % 2 == 0 and (pt // 2) % 128 == 0:
        pt //= 2
    if cost(bm, pt) > _VMEM_BUDGET:
        return None
    # grow bm while VMEM fits and it divides m
    while (
        bm * 2 <= m
        and m % (bm * 2) == 0
        and cost(bm * 2, pt) <= _VMEM_BUDGET
    ):
        bm *= 2
    return ("tiled", lead, bm, pt)


def _as2d(ref_val):
    """(p, *ones, bm, P) block value -> (p, bm*P)."""
    v = ref_val
    return v.reshape(v.shape[0], -1)


def block_mix(coeffs: jax.Array, xs, interpret: bool | None = None,
              inplace: bool = False) -> jax.Array:
    """out[j] = sum_k coeffs[k, j] * cat(xs, axis=0)[k].

    coeffs: (K, p_out) with K = sum of the leading dims of xs; xs: tuple of
    (p_i, *state) arrays sharing state shape & dtype.  One HBM read per
    operand + one write of the (p_out, *state) output.

    inplace=True aliases the output onto xs[0]'s buffer (requires
    p_out == xs[0].shape[0]; xs[0] must be DEAD afterwards — the caller
    promises no later use).  On this chip a Pallas kernel writing a fresh
    buffer caps at ~330-460 GB/s aggregate while the same kernel writing
    onto a genuinely-read input streams at ~690 (benchmarks/probes/
    PROBES_R5.md) — the measured basis of the round-5 fused path."""
    xs = tuple(xs)
    state = xs[0].shape[1:]
    dtype = xs[0].dtype
    p_out = coeffs.shape[1]
    ps = [x.shape[0] for x in xs]
    assert coeffs.shape[0] == sum(ps), (coeffs.shape, ps)
    if inplace and p_out != ps[0]:
        raise ValueError(
            f"inplace block_mix needs p_out == xs[0] rows ({p_out} != {ps[0]})"
        )
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
        _, lead, bm, pt = plan
        m, p_minor = state[-2], state[-1]
        r = len(lead)
        grid = tuple(lead) + (m // bm, p_minor // pt)

        def imap(p_i):
            del p_i
            return lambda *g: (0,) + g[:-2] + (g[-2], g[-1])

        blk = lambda p_i: (p_i,) + (1,) * r + (bm, pt)
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
        input_output_aliases={0: 0} if inplace else {},
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
        _, lead, bm, pt = plan
        m, p_minor = state[-2], state[-1]
        r = len(lead)
        grid = tuple(lead) + (m // bm, p_minor // pt)
        imap = lambda *g: (0,) + g[:-2] + (g[-2], g[-1])
        blk = lambda p_i: (p_i,) + (1,) * r + (bm, pt)
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


# ---------------------------------------------------------------------------
# Compensated (error-free-transform) Gram: f64-oracle accuracy from f32
# storage.  The reference runs its block driver in double
# (`test_lanczos.cu:349-356`); TPUs have no hardware f64, so the TPU-native
# answer (SURVEY.md §7 "f32 + compensated reductions") is a TwoProd/TwoSum
# accumulation on the VPU: every product is split into (hi, lo) exactly
# (Dekker), and a per-lane two-float running sum absorbs both the product
# rounding and the accumulation random walk (each eps*sqrt(n) ~ 3e-4
# relative at n ~ 3e7 in plain f32).
# ---------------------------------------------------------------------------


def _two_sum(a, b):
    """Knuth TwoSum: a + b = s + e exactly (6 flops, branchless)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _split(x):
    """Dekker split: x = hi + lo with 12-bit-mantissa halves (f32)."""
    c = x * jnp.float32(4097.0)  # 2^12 + 1
    hi = c - (c - x)
    return hi, x - hi


def _two_prod(x, y):
    """x * y = p + e exactly (no FMA on the VPU: Dekker, 17 flops)."""
    p = x * y
    xh, xl = _split(x)
    yh, yl = _split(y)
    e = ((xh * yh - p) + xh * yl + xl * yh) + xl * yl
    return p, e


def block_grams_compensated(
    xs, z: jax.Array, include_zz: bool = False, interpret: bool | None = None
) -> jax.Array:
    """Compensated gram(cat(xs), z) — same contract as `block_grams`, but
    every scalar product enters a two-float accumulator, so the result
    carries O(eps) relative error instead of O(eps * sqrt(n)).  Measured
    on chip: ~1e-7 of the f64 oracle on wide-dynamic-range inputs, at
    ~11-14 GB/s (p<=8, `kernels.json block_grams_compensated`) — the
    VPU TwoProd/TwoSum chains cost ~30-60x the MXU Gram's wall time but
    remain far cheaper than full f64 emulation (~82x an ENTIRE f32
    iteration, `kernels.json dtype_f64`).  The accuracy option, not the
    default.

    Requires a lane-tileable state; otherwise falls back to an f64 einsum
    (exact on CPU with x64; on TPU the fallback emulates in extended
    precision via the same two-float math at XLA level)."""
    xs = tuple(xs)
    state = z.shape[1:]
    dtype = z.dtype
    p = z.shape[0]
    ps = [x.shape[0] for x in xs]
    K = sum(ps) + (p if include_zz else 0)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    # the two-float scratch is (K*p, lanes)*2 f32: shrink the lane tile
    # until it fits the VMEM budget (any 128-multiple divisor works; the
    # compute is VPU-bound anyway, so small tiles only cost grid steps).
    # ADVICE r4: the old path fell back to astype(float64), which without
    # jax_enable_x64 silently computes PLAIN f32 — compensated=True then
    # returned uncompensated Grams with no warning.
    scratch_budget = _COMP_SCRATCH_BUDGET
    max_lanes = max(scratch_budget // (K * p * 4 * 2) // 128 * 128, 128)
    plan = _plan_blocks(state, dtype, len(xs) + 1, ps + [p])
    if plan is not None and plan[0] == "flat":
        n_flat = state[0]
        q = n_flat // 128
        tq = max(min(max_lanes // 128, 32768 // 128, q), 1)
        while q % tq:
            tq -= 1
        plan = ("flat", tq * 128)
        lane_count = plan[1]
    elif plan is not None:
        _, lead, bm, pt = plan
        pm = state[-1]
        q = pm // 128
        tq = max(min(max_lanes // 128, pt // 128, q), 1)
        while q % tq:
            tq -= 1
        plan = (plan[0], lead, bm, tq * 128)
        lane_count = plan[3]
    else:
        lane_count = 0
    scratch_ok = (
        plan is not None and K * p * lane_count * 4 * 2 <= scratch_budget
    )
    if not scratch_ok:
        # only hit for non-lane-tileable states or pathological K*p
        # (K*p*128*8 > 48 MiB needs p >= ~150).  With real f64 (x64
        # enabled) the einsum fallback is genuinely higher-precision;
        # otherwise refuse loudly instead of silently uncompensating.
        if jax.config.read("jax_enable_x64"):
            ops = list(xs) + ([z] if include_zz else [])
            zf = z.astype(jnp.float64)
            return jnp.concatenate(
                [
                    jnp.einsum(
                        "k...,j...->kj", x.astype(jnp.float64), zf,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    for x in ops
                ]
            ).astype(jnp.float32)
        raise ValueError(
            "block_grams_compensated: state is not lane-tileable (minor "
            f"dim of {state} not a multiple of 128) and no exact f64 "
            "fallback exists without jax_enable_x64; reshape/pad the "
            "state or use compensated=False"
        )

    offs = [0]
    for p_i in ps:
        offs.append(offs[-1] + p_i)
    pairs = []  # (x_operand_index or -1 for z, k_row, j_col)
    for i, p_i in enumerate(ps):
        for a_ in range(p_i):
            for j_ in range(p):
                pairs.append((i, a_, j_))
    if include_zz:
        for a_ in range(p):
            for j_ in range(p):
                pairs.append((-1, a_, j_))

    if plan[0] == "flat":
        pt = plan[1]
        n = state[0]
        grid = (n // pt,)
        in_specs = [
            pl.BlockSpec((p_i, pt), lambda b: (0, b), memory_space=pltpu.VMEM)
            for p_i in ps
        ] + [pl.BlockSpec((p, pt), lambda b: (0, b), memory_space=pltpu.VMEM)]
        lanes = pt
    else:
        _, lead, bm, pt = plan
        m, pm = state[-2], state[-1]
        r = len(lead)
        grid = tuple(lead) + (m // bm, pm // pt)
        imap = lambda *g: (0,) + g[:-2] + (g[-2], g[-1])
        blk = lambda p_i: (p_i,) + (1,) * r + (bm, pt)
        in_specs = [
            pl.BlockSpec(blk(p_i), imap, memory_space=pltpu.VMEM)
            for p_i in ps
        ] + [pl.BlockSpec(blk(p), imap, memory_space=pltpu.VMEM)]
        lanes = pt

    out_spec = pl.BlockSpec(
        (K, p), lambda *g: (0, 0), memory_space=pltpu.VMEM
    )

    def kernel(*refs):
        # pallas ref order: inputs..., outputs..., scratch...
        lo_s = refs[-1]  # scratch (K*p, lanes) lo
        hi_s = refs[-2]  # scratch (K*p, lanes) hi
        out_ref = refs[-3]
        z_ref = refs[-4]
        x_refs = refs[:-4]
        ng = len(grid)
        first = functools.reduce(
            jnp.logical_and, [pl.program_id(d) == 0 for d in range(ng)]
        )
        last = functools.reduce(
            jnp.logical_and,
            [pl.program_id(d) == pl.num_programs(d) - 1 for d in range(ng)],
        )
        zv = _as2d(z_ref[...]).astype(jnp.float32)  # (p, rows*lanes)?
        # reshape to (p, rows, lanes)
        rows = zv.shape[1] // lanes
        zv = zv.reshape(p, rows, lanes)
        xvs = [
            _as2d(xr[...]).astype(jnp.float32).reshape(-1, rows, lanes)
            for xr in x_refs
        ]

        @pl.when(first)
        def _():
            hi_s[...] = jnp.zeros_like(hi_s)
            lo_s[...] = jnp.zeros_like(lo_s)

        for pi, (i, a_, j_) in enumerate(pairs):
            xa = zv[a_] if i < 0 else xvs[i][a_]  # (rows, lanes)
            zj = zv[j_]
            sh = hi_s[pi]  # (lanes,)
            sl = lo_s[pi]
            for rrow in range(rows):
                ph, pe = _two_prod(xa[rrow], zj[rrow])
                sh, e1 = _two_sum(sh, ph)
                sl = sl + (e1 + pe)
            hi_s[pi] = sh
            lo_s[pi] = sl

        @pl.when(last)
        def _():
            # lane reduce: each lane's hi is ~result/lanes, so a plain sum
            # of his costs eps*sqrt(lanes)*|result|/lanes ~ eps*|result|/18.
            # Scatter-free (real TPUs: .at[].set lowers to an unsupported
            # Mosaic scatter, and stacking scalars needs an unsupported
            # shape cast — both only ran in interpret mode): place each
            # scalar via a broadcast-iota mask add on the tiny (K, p) tile.
            ri = jax.lax.broadcasted_iota(jnp.int32, (K, p), 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, (K, p), 1)
            acc = jnp.zeros((K, p), jnp.float32)
            for pi, (i, a_, j_) in enumerate(pairs):
                row = offs[i] + a_ if i >= 0 else sum(ps) + a_
                tot = jnp.sum(hi_s[pi], dtype=jnp.float32) + jnp.sum(
                    lo_s[pi], dtype=jnp.float32
                )
                acc = acc + jnp.where((ri == row) & (ci == j_), tot, 0.0)
            out_ref[...] = acc

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((K, p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((K * p, lanes), jnp.float32),
            pltpu.VMEM((K * p, lanes), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(*xs, z)
