"""Generic separable-stencil Pallas TPU kernel.

Applies a set of "taps" to a stack of 3-D fields stored in the TPU-optimal
*folded-plane* layout: each field is (Zc, P) where P folds the (y, x)
plane into the lane dimension, padded to a multiple of 128 (0.2% physical
waste vs ~57% for a raw 161-lane minor axis).  In this layout

  * an x-shift by +-1   == a lane roll by -+1,
  * a y-shift by +-1    == a lane roll by -+Xc,
  * a z-shift by +-1    == a one-row shift across the z-block boundary,

so every shifted read is a `pltpu.roll` or a static row recombination —
no gathers, no relayouts, no index planes.  Separable coefficients enter
as one (Zc,) vector and one (P,) folded-plane vector per tap, with zeros
everywhere outside the tap's valid region; rolls therefore wrap data only
into zero-weighted positions.

This is the TPU-native realization of the reference's hottest kernel
(`ell::SpMV/SpMM`, reference `source/kernels/spmv_spmm.hpp:106-199`): the
reference gathers 4 nonzeros per row via `float4` loads from a reordered
ELL matrix; here the same 4-nonzero-per-row operator is computed from its
separable structure with zero index traffic.

Pipelining: the grid walks z-blocks of `tz` rows (a multiple of 8 — the
f32 sublane tile, which HBM block fetches must respect).  The input is
passed through TWO blocked specs — the current z-block and the
clamped-neighbor block — so z-shifted rows come from the neighbor's edge
row via an in-VMEM concatenate; Pallas double-buffers both streams
automatically (the async analogue of the reference's shared-memory
prefetch staging, `mm_ts.hpp:44-93`).

Edge handling: neighbor indices are clamped at the mesh edges, which
feeds wrong-but-finite rows ONLY into grid blocks the builder guarantees
are entirely zero-weighted padding (interior z-offset = tz, one trailing
all-pad block).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclasses.dataclass(frozen=True)
class StencilSpec:
    """Static stencil description (hashable: usable as a jit static arg).

    taps: tuple of (out_comp, in_comp, dz, roll) — dz in {-1,0,1} is the
    z-row offset; roll is the lane-roll amount within the folded plane
    (already reduced mod P; 0 for pure z-taps).
    """

    n_in: int
    n_out: int
    taps: tuple[tuple[int, int, int, int], ...]
    zc: int  # z capacity (multiple of tz; first & last block all-pad)
    plane: int  # folded-plane capacity P (multiple of 128)
    tz: int = 8  # z rows per grid step (multiple of 8: f32 sublane tile)
    # paired=True asserts taps come in adjacent 2-tuples per curl block
    # sharing (out, in) with EQUAL shared separable factors: a z-pair
    # (dz differs) shares its wplane row, a plane-pair (roll differs)
    # shares its wz row — enabling the factored 3-multiply form.
    paired: bool = False


def apply_stencil_pair(
    u: jax.Array,
    wz_t: jax.Array,
    wplane: jax.Array,
    spec_a: StencilSpec,
    spec_b: StencilSpec,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused two-half stencil: one `pallas_call` for a coupled pair of
    3-component half-operators (the Maxwell curl pair: E rows read the H
    fields, H rows read the E fields).

    u: (6, Zc, P) stacked state; half h of the grid writes components
    [3h, 3h+3) reading components [3(1-h), 3(1-h)+3).  wz_t: (2, Zc,
    n_taps) z-weights (transposed, stacked per half); wplane: (2, n_taps,
    P).  Returns (6, Zc, P).

    Single-pass HBM traffic: unlike two `apply_stencil` calls on slices
    (`u[3:]` / `u[:3]` materialize + concatenate of the halves + a full
    neighbor-block second input stream ~ 3.5 passes over the state), this
    reads the state ~(1 + 8*n_edges/(3*tz))x and writes it once.
    z-shifted rows across a block boundary come from per-(component,
    direction) 8-row "edge" operands — only the components a half
    actually z-shifts, in the one direction it shifts them — so a larger
    tz amortizes the edge traffic.

    Both halves must have the same tap count and geometry (pad with
    all-zero-weight taps if needed).  With `spec.paired` (see StencilSpec)
    each adjacent tap pair is computed in the factored 3-multiply form
    using its shared separable weight row.
    """
    tz, zc, plane = spec_a.tz, spec_a.zc, spec_a.plane
    if (spec_b.tz, spec_b.zc, spec_b.plane) != (tz, zc, plane):
        raise ValueError("halves must share tz/zc/plane geometry")
    n_taps = len(spec_a.taps)
    if len(spec_b.taps) != n_taps:
        raise ValueError("halves must have equal tap counts")
    if spec_a.n_in != 3 or spec_a.n_out != 3 or spec_b.n_in != 3 or spec_b.n_out != 3:
        raise ValueError("pair kernel is specialized to 3-in/3-out halves")
    # Edge operands are eb-row blocks; eb is the dtype's sublane tile
    # (8 for f32, 16 for bf16 — Mosaic requires sublane-divisible blocks).
    eb = 16 if u.dtype == jnp.bfloat16 else 8
    if zc % tz or tz % eb:
        raise ValueError(f"zc must be a multiple of tz, tz a multiple of {eb}")
    nb = zc // tz
    tb = tz // eb
    nzb = zc // eb
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    # Cross-block (component, direction) pairs per half.  Edge operand j
    # serves crossings[0][j] on half 0 and crossings[1][j] on half 1
    # (shorter list padded by repetition).  Global component index of the
    # INPUT half: half h reads components [3*(1-h), 3*(1-h)+3).
    crossings = []
    for hh, spec in ((0, spec_a), (1, spec_b)):
        seen = []
        for (_, ic, dz, _) in spec.taps:
            if dz and (ic, dz) not in seen:
                seen.append((ic, dz))
        crossings.append(seen)
    n_edges = max(len(crossings[0]), len(crossings[1]), 1)
    slot_map = []  # per half: {(ic, dz): slot}
    for hh in (0, 1):
        cr = crossings[hh] or [(0, 1)]
        cr = (cr * n_edges)[:n_edges]
        slot_map.append({key: j for j, key in reversed(list(enumerate(cr)))})
        crossings[hh] = cr

    def edge_index_map(j):
        (ca, dza) = crossings[0][j]
        (cb, dzb) = crossings[1][j]
        ca += 3  # half 0 reads global components 3..5
        # eb-row block index of the needed row: (b+1)*tz for dz=+1 (its
        # first row), b*tz-1 for dz=-1 (its last row).  Clamped at the
        # ends — clamped garbage only ever multiplies the all-zero
        # weights of the pad rows at z=0 / z=zc-1.
        def za(b):
            return (
                jnp.minimum((b + 1) * tb, nzb - 1)
                if dza == 1
                else jnp.maximum(b * tb - 1, 0)
            )

        def zb(b):
            return (
                jnp.minimum((b + 1) * tb, nzb - 1)
                if dzb == 1
                else jnp.maximum(b * tb - 1, 0)
            )

        def im(h, b):
            return (
                jnp.where(h == 0, ca, cb),
                jnp.where(h == 0, za(b), zb(b)),
                0,
            )

        return im

    in_specs = [
        # current input block: the OPPOSITE half's components
        pl.BlockSpec((3, tz, plane), lambda h, b: (1 - h, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tz, n_taps), lambda h, b: (h, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_taps, plane), lambda h, b: (h, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((1, eb, plane), edge_index_map(j),
                     memory_space=pltpu.VMEM)
        for j in range(n_edges)
    ]

    def kernel(cur_ref, wzb_ref, wp_ref, *rest):
        edge_refs = rest[:-1]
        out_ref = rest[-1]
        h = pl.program_id(0)

        def half_body(spec, slots):
            taps = spec.taps

            def rolled(v, r):
                # Mosaic's lane rotate is 32-bit only; sub-32-bit states
                # upcast first (the weight multiply promotes anyway).
                if v.dtype.itemsize < 4:
                    v = v.astype(jnp.float32)
                return pltpu.roll(v, r, axis=1)

            def shifted(ic, dz):
                if dz == 0:
                    return cur_ref[ic]
                er = edge_refs[slots[(ic, dz)]]
                if dz == 1:
                    return jnp.concatenate(
                        [cur_ref[ic, 1:, :], er[0, 0:1, :]], axis=0
                    )
                return jnp.concatenate(
                    [er[0, eb - 1 : eb, :], cur_ref[ic, : tz - 1, :]],
                    axis=0,
                )

            for oc in range(3):
                idx = [t for t, tp in enumerate(taps) if tp[0] == oc]
                acc = None
                if spec.paired:
                    for k in range(0, len(idx), 2):
                        t0, t1 = idx[k], idx[k + 1]
                        (_, ic0, dz0, r0) = taps[t0]
                        (_, ic1, dz1, r1) = taps[t1]
                        v0 = shifted(ic0, dz0)
                        v1 = shifted(ic1, dz1)
                        if r0:
                            v0 = rolled(v0, r0)
                        if r1:
                            v1 = rolled(v1, r1)
                        if dz0 != dz1:  # z-pair: shared wplane row
                            s = (
                                v0 * wzb_ref[0, :, t0 : t0 + 1]
                                + v1 * wzb_ref[0, :, t1 : t1 + 1]
                            )
                            term = s * wp_ref[0, t0][None, :]
                        else:  # plane-pair: shared wz row
                            s = (
                                v0 * wp_ref[0, t0][None, :]
                                + v1 * wp_ref[0, t1][None, :]
                            )
                            term = s * wzb_ref[0, :, t0 : t0 + 1]
                        acc = term if acc is None else acc + term
                else:
                    for t in idx:
                        (_, ic, dz, roll) = taps[t]
                        v = shifted(ic, dz)
                        if roll:
                            v = rolled(v, roll)
                        term = v * wp_ref[0, t][None, :]
                        term = term * wzb_ref[0, :, t : t + 1]
                        acc = term if acc is None else acc + term
                # bf16 states: v promotes to the f32 weights; accumulate
                # in f32 and cast once on store.
                out_ref[oc] = acc.astype(out_ref.dtype)

        @pl.when(h == 0)
        def _():
            half_body(spec_a, slot_map[0])

        @pl.when(h == 1)
        def _():
            half_body(spec_b, slot_map[1])

    operands = [u, wz_t, wplane] + [u] * n_edges
    return pl.pallas_call(
        kernel,
        grid=(2, nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (3, tz, plane), lambda h, b: (h, b, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((6, zc, plane), u.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)


def apply_stencil(
    u: jax.Array,
    wz: jax.Array,
    wplane: jax.Array,
    spec: StencilSpec,
    interpret: bool | None = None,
) -> jax.Array:
    """u: (n_in, Zc, P); wz: (n_taps, Zc); wplane: (n_taps, P).
    Returns (n_out, Zc, P)."""
    tz = spec.tz
    if spec.zc % tz or tz % 8:
        raise ValueError("zc must be a multiple of tz, tz a multiple of 8")
    nb = spec.zc // tz
    n_taps = len(spec.taps)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    has_zp = any(dz == 1 for (_, _, dz, _) in spec.taps)
    has_zm = any(dz == -1 for (_, _, dz, _) in spec.taps)

    # wz laid out as (Zc, n_taps): each grid step's (tz, n_taps) block is a
    # legal VMEM block (tz % 8 == 0; n_taps equals the full minor dim).
    wz_t = wz.T.reshape(spec.zc, n_taps)

    blk = (spec.n_in, tz, spec.plane)
    in_specs = [
        pl.BlockSpec(blk, lambda b: (0, b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tz, n_taps), lambda b: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # wplane, full
    ]
    operands = [u, wz_t, wplane]
    if has_zp:
        in_specs.append(
            pl.BlockSpec(
                blk, lambda b: (0, jnp.minimum(b + 1, nb - 1), 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(u)
    if has_zm:
        in_specs.append(
            pl.BlockSpec(
                blk, lambda b: (0, jnp.maximum(b - 1, 0), 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(u)

    def kernel(cur_ref, wzb_ref, wp_ref, *rest):
        refs = list(rest)
        out_ref = refs.pop()
        nxt_ref = refs.pop(0) if has_zp else None
        prv_ref = refs.pop(0) if has_zm else None

        for oc in range(spec.n_out):
            acc = None
            for t, (tc, ic, dz, roll) in enumerate(spec.taps):
                if tc != oc:
                    continue
                if dz == 0:
                    v = cur_ref[ic]
                elif dz == 1:
                    v = jnp.concatenate(
                        [cur_ref[ic, 1:, :], nxt_ref[ic, :1, :]], axis=0
                    )
                else:
                    v = jnp.concatenate(
                        [prv_ref[ic, tz - 1 :, :], cur_ref[ic, : tz - 1, :]],
                        axis=0,
                    )
                if roll:
                    v = pltpu.roll(v, roll, axis=1)
                term = v * wp_ref[t][None, :]
                term = term * wzb_ref[:, pl.ds(t, 1)]
                acc = term if acc is None else acc + term
            out_ref[oc] = acc

    def _kernel(*refs):
        # reorder: (cur, wz, wp, [nxt], [prv], out, )
        kernel(*refs)

    return pl.pallas_call(
        _kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (spec.n_out, tz, spec.plane), lambda b: (0, b, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (spec.n_out, spec.zc, spec.plane), u.dtype
        ),
        # Default scoped-VMEM limit is 16MB; the double-buffered
        # (cur, nbr, out) block streams need slightly more at tz=8 and
        # comfortably fit the chip's physical VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
