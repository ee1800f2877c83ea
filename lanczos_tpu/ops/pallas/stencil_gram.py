"""Fused stencil + Gram kernel with destination aliasing.

The round-5 traffic-minimal Lanczos iteration (see
benchmarks/probes/PROBES_R5.md).  One pallas_call computes, for the
Maxwell curl pair on the folded-plane state,

    v  = A @ q                         (both halves in one grid)
    g3 = [gram(q, v); gram(v, v); gram(dst, q)]       (3p, p), f32

with the big output v **aliased onto the dst operand's buffer**.  In the
fused recurrence dst is v_{j-1} = u3 — dead after this call — and
gram(dst, q) = gram(v_{j-1}, q_j) is exactly the m13 Gram block the
deferred-Gram algebra otherwise derives indirectly, so streaming dst is
not a tax: it upgrades a derived quantity to a directly-measured one AND
legitimizes the alias (on this chip a Pallas kernel writing a fresh
buffer caps at ~330 GB/s aggregate; writing onto a genuinely-read input
streams at ~690 — probes A/C in PROBES_R5.md).

Per call: 3 state passes (read q, read dst, write v) + the in-kernel
Gram accumulation that previously cost a separate 2-pass kernel.

Layout/geometry are those of `apply_stencil_pair`
(`stencil_kernel.py`): z-blocks of tz rows; lane dimension split into
chunks of pc lanes (multiple of 256) with 256-aligned halo side-streams
so the lane-shifted taps become STATIC slices of a lane-extended block
(no pltpu.roll); z-shifted rows come from per-(component, direction)
edge-row operands.  Clamped edge reads at mesh/plane boundaries only
ever multiply the builder's zero weights.

Reference parity: this fuses the reference's hottest kernel `ell::SpMM`
(`spmv_spmm.hpp:138-199`) with its Gram products `mm_tt`/`mm_tt2`
(`mm_tt.hpp`, `mm_tt2.hpp`) into one pass — the step the reference's
abandoned tensor-core work was reaching for.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lanczos_tpu.ops.pallas.stencil_kernel import StencilSpec

# conservative raw-block budget; Mosaic's real scoped usage runs higher
_VMEM_BUDGET = 68 * 1024 * 1024


def _signed_shift(r: int, plane: int) -> int:
    """BlockSpec rolls are stored mod plane; recover the small signed
    lane shift (out[l] = in[l - s])."""
    return r if r <= plane // 2 else r - plane


def plan_stencil_gram(p: int, spec: StencilSpec, dtype) -> tuple | None:
    """(pc, halo, tz) or None if no legal plan exists.  pc | plane,
    pc % 256 == 0 (unless pc == plane), halo covers every lane shift."""
    if jnp.dtype(dtype) != jnp.float32:
        return None
    plane, zc = spec.plane, spec.zc
    tz = 16 if zc % 16 == 0 else 8
    smax = 1
    for (_, _, _, r) in spec.taps:
        if r:
            smax = max(smax, abs(_signed_shift(r, plane)))
    halo = 256 * (-(-(smax + 1) // 256))

    def vmem(pc, nchunks):
        unit = p * 6 * tz * pc * 4
        edge = p * 6 * tz * halo * 4
        zedge = p * 1 * 8 * pc * 4
        n_lane_edges = 0 if nchunks == 1 else 2
        # q main + lane edges + ~4 z-edges + dst + v out, double-buffered
        return 2 * (unit + n_lane_edges * edge + 4 * zedge + unit + unit)

    # chunk-width cap: Mosaic compile time explodes on many-tap kernels
    # with huge lane extents (a pc=13312 p=2 plan compiled for >9 min;
    # pc<=4096 shapes compile in ~1-2 min and pipeline finer)
    pc_cap = 4096
    if plane <= pc_cap and vmem(plane, 1) <= _VMEM_BUDGET:
        return (plane, halo, tz)
    if plane % 256:
        return None
    units = plane // 256
    for nc in range(2, units + 1):
        if units % nc:
            continue
        pc = plane // nc
        if pc < halo:
            return None
        if pc <= pc_cap and vmem(pc, nc) <= _VMEM_BUDGET:
            return (pc, halo, tz)
    return None


def apply_stencil_pair_gram(
    q: jax.Array,
    dst: jax.Array,
    wz_t: jax.Array,
    wplane: jax.Array,
    spec_a: StencilSpec,
    spec_b: StencilSpec,
    interpret: bool | None = None,
):
    """q, dst: (p, 6, Zc, P) f32.  Returns (v, g3): v = A q written into
    dst's donated buffer; g3 = [gram(q,v); gram(v,v); gram(dst,q)]
    (3p, p) f32, gram(x,y)[k,j] = <x_k, y_j> over the whole state.

    dst MUST be dead after this call (its buffer is aliased to v).
    """
    if q.ndim != 4 or q.shape != dst.shape:
        raise ValueError(f"q/dst must be (p,6,Zc,P), got {q.shape}/{dst.shape}")
    p = q.shape[0]
    tzg, zc, plane = spec_a.tz, spec_a.zc, spec_a.plane
    del tzg
    plan = plan_stencil_gram(p, spec_a, q.dtype)
    if plan is None:
        raise ValueError(
            f"no stencil_gram plan for p={p}, plane={plane}, dtype={q.dtype}"
        )
    pc, halo, tz = plan
    nc = plane // pc
    nb = zc // tz
    eb = 8
    nzb = zc // eb
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    # -- z-crossing inventory: (global input component, dz) pairs -------
    crossings = []
    for h, spec in ((0, spec_a), (1, spec_b)):
        base = 3 * (1 - h)  # half h reads the OPPOSITE half's components
        for (_, ic, dz, _) in spec.taps:
            key = (base + ic, dz)
            if dz and key not in crossings:
                crossings.append(key)
    n_edges = len(crossings)
    slot = {key: j for j, key in enumerate(crossings)}

    def zedge_imap(j):
        (comp, dz) = crossings[j]
        if dz == 1:

            def im(c, b):
                return (0, comp, jnp.minimum((b + 1) * (tz // eb), nzb - 1), c)

        else:

            def im(c, b):
                return (0, comp, jnp.maximum(b * (tz // eb) - 1, 0), c)

        return im

    in_specs = [
        pl.BlockSpec((p, 6, tz, pc), lambda c, b: (0, 0, b, c),
                     memory_space=pltpu.VMEM),
    ]
    operands = [q]
    ec = pc // halo  # chunk index scale in halo units
    if nc > 1:
        in_specs += [
            pl.BlockSpec(
                (p, 6, tz, halo),
                lambda c, b: (0, 0, b, jnp.maximum(c * ec - 1, 0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (p, 6, tz, halo),
                lambda c, b: (0, 0, b,
                              jnp.minimum((c + 1) * ec, plane // halo - 1)),
                memory_space=pltpu.VMEM,
            ),
        ]
        operands += [q, q]
    in_specs += [
        pl.BlockSpec((p, 1, eb, pc), zedge_imap(j), memory_space=pltpu.VMEM)
        for j in range(n_edges)
    ]
    operands += [q] * n_edges
    dst_idx = len(operands)
    in_specs.append(
        pl.BlockSpec((p, 6, tz, pc), lambda c, b: (0, 0, b, c),
                     memory_space=pltpu.VMEM)
    )
    operands.append(dst)
    n_taps = len(spec_a.taps)
    in_specs += [
        pl.BlockSpec((2, tz, n_taps), lambda c, b: (0, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, n_taps, pc), lambda c, b: (0, 0, c),
                     memory_space=pltpu.VMEM),
    ]
    operands += [wz_t, wplane]

    def kernel(*refs):
        qm_ref = refs[0]
        off = 1
        if nc > 1:
            ql_ref, qr_ref = refs[1], refs[2]
            off = 3
        zedge_refs = refs[off : off + n_edges]
        dst_ref = refs[off + n_edges]
        wzb_ref = refs[off + n_edges + 1]
        wp_ref = refs[off + n_edges + 2]
        v_ref, g3_ref = refs[-2], refs[-1]
        c_idx = pl.program_id(0)
        b_idx = pl.program_id(1)

        # lane-extended component planes (only built when chunked)
        def ext(ic):
            if nc == 1:
                return qm_ref[:, ic]
            return jnp.concatenate(
                [ql_ref[:, ic], qm_ref[:, ic], qr_ref[:, ic]], axis=-1
            )

        def value(icg, dz, r):
            """(p, tz, pc) tap input: component icg shifted by dz z-rows
            and r lanes (builder invariant: z-taps have r == 0)."""
            if dz:
                er = zedge_refs[slot[(icg, dz)]]
                if dz == 1:
                    return jnp.concatenate(
                        [qm_ref[:, icg, 1:, :], er[:, 0, 0:1, :]], axis=1
                    )
                return jnp.concatenate(
                    [er[:, 0, eb - 1 : eb, :], qm_ref[:, icg, : tz - 1, :]],
                    axis=1,
                )
            if not r:
                return qm_ref[:, icg]
            s = _signed_shift(r, plane)
            if nc == 1:
                # unchunked: wrap-rolls land on zero-weighted lanes,
                # exactly as in apply_stencil_pair
                return pltpu.roll(qm_ref[:, icg], r, axis=2)
            return ext(icg)[..., halo - s : halo - s + pc]

        comps = []
        for h, spec in ((0, spec_a), (1, spec_b)):
            base = 3 * (1 - h)
            for oc in range(3):
                idx = [t for t, tp in enumerate(spec.taps) if tp[0] == oc]
                acc = None
                if spec.paired:
                    for k in range(0, len(idx), 2):
                        t0, t1 = idx[k], idx[k + 1]
                        (_, ic0, dz0, r0) = spec.taps[t0]
                        (_, ic1, dz1, r1) = spec.taps[t1]
                        v0 = value(base + ic0, dz0, r0)
                        v1 = value(base + ic1, dz1, r1)
                        if dz0 != dz1:  # z-pair: shared wplane row
                            s_ = (
                                v0 * wzb_ref[h, :, t0 : t0 + 1]
                                + v1 * wzb_ref[h, :, t1 : t1 + 1]
                            )
                            term = s_ * wp_ref[h, t0][None, None, :]
                        else:  # plane-pair: shared wz row
                            s_ = (
                                v0 * wp_ref[h, t0][None, None, :]
                                + v1 * wp_ref[h, t1][None, None, :]
                            )
                            term = s_ * wzb_ref[h, :, t0 : t0 + 1]
                        acc = term if acc is None else acc + term
                else:
                    for t in idx:
                        (_, ic, dz, r) = spec.taps[t]
                        term = (
                            value(base + ic, dz, r)
                            * wp_ref[h, t][None, None, :]
                            * wzb_ref[h, :, t : t + 1]
                        )
                        acc = term if acc is None else acc + term
                comps.append(acc)
        vv = jnp.stack(comps, axis=1)  # (p, 6, tz, pc)
        v_ref[...] = vv

        # -- Gram accumulation (f32, VMEM-resident across the grid) -----
        qf = qm_ref[...].reshape(p, -1)
        vf = vv.reshape(p, -1)
        df = dst_ref[...].reshape(p, -1)
        dims = (((1,), (1,)), ((), ()))
        gqv = jax.lax.dot_general(qf, vf, dims,
                                  preferred_element_type=jnp.float32)
        gvv = jax.lax.dot_general(vf, vf, dims,
                                  preferred_element_type=jnp.float32)
        gdq = jax.lax.dot_general(df, qf, dims,
                                  preferred_element_type=jnp.float32)
        contrib = jnp.concatenate([gqv, gvv, gdq])

        @pl.when((c_idx == 0) & (b_idx == 0))
        def _():
            g3_ref[...] = jnp.zeros_like(g3_ref)

        g3_ref[...] = g3_ref[...] + contrib

    out_shapes = [
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct((3 * p, p), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((p, 6, tz, pc), lambda c, b: (0, 0, b, c),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * p, p), lambda c, b: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kernel,
        grid=(nc, nb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        input_output_aliases={dst_idx: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
