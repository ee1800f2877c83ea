"""True in-place FDTD step: u <- u + (dt A) u in ONE aliased Pallas pass.

The FDTD oracle (reference `methods/fdtd.hpp`, driven for 10^6 steps by
`test_lanczos.cu`) is the heaviest compute in the reference driver.  Its
step is genuinely in-place — u is dead after the update — so it can use
the round-5 aliasing discovery at full strength: a write-behind kernel
on the SAME buffer streams at ~680 GB/s on this chip, vs ~330 for any
fresh-output Pallas kernel (probe 5 in benchmarks/probes/PROBES_R5.md).

Schedule: grid step b reads u z-block b (read-ahead) and writes the
updated block b-1 (write-behind) into the same buffer; the overwritten
rows the stencil still needs live in a VMEM delay ring (previous block
+ the last 8 rows of the block before it).  dt is pre-folded into the
stencil weights by the caller (`PallasMaxwellOperator.scaled`), so the
kernel computes out = u + stencil(u) with no separate scale pass.

Full-plane blocks only (lane halos would require streaming u twice,
which conflicts with its donation): p <= 2 states fit VMEM; larger
block widths fall back to the two-pass path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lanczos_tpu.ops.pallas.stencil_kernel import StencilSpec

_VMEM_BUDGET = 64 * 1024 * 1024


def plan_fdtd_inplace(p: int, spec: StencilSpec, dtype) -> int | None:
    """Returns the z-block size tz, or None if the state cannot run the
    in-place kernel (needs f32 and full-plane blocks in VMEM)."""
    if jnp.dtype(dtype) != jnp.float32:
        return None
    plane, zc = spec.plane, spec.zc
    for tz in (16, 8):
        if zc % tz:
            continue
        unit = p * 6 * tz * plane * 4
        ring = p * 6 * (tz + 8) * plane * 4
        if 2 * unit + 2 * unit + ring <= _VMEM_BUDGET:
            return tz
    return None


def fdtd_step_inplace(
    u: jax.Array,
    wz_t: jax.Array,
    wplane: jax.Array,
    spec_a: StencilSpec,
    spec_b: StencilSpec,
    interpret: bool | None = None,
) -> jax.Array:
    """u: (p, 6, Zc, P) f32, DONATED.  Returns u + A u in u's buffer,
    where A is the (dt-scaled) curl pair described by the weights."""
    if u.ndim != 4:
        raise ValueError(f"state must be (p,6,Zc,P), got {u.shape}")
    p = u.shape[0]
    zc, plane = spec_a.zc, spec_a.plane
    tz = plan_fdtd_inplace(p, spec_a, u.dtype)
    if tz is None:
        raise ValueError(f"no in-place FDTD plan for p={p}, plane={plane}")
    nb = zc // tz
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n_taps = len(spec_a.taps)

    def kernel(u_ref, wzb_ref, wp_ref, out_ref, ring_ref, last8_ref):
        b = pl.program_id(0)
        cur = u_ref[...]  # block min(b, nb-1), old values

        @pl.when(b == 0)
        def _():
            # the dz=-1 taps at the first block read last8's final row;
            # its weights are zero there, but uninitialized VMEM can be
            # NaN and NaN * 0 == NaN — zero it once
            last8_ref[...] = jnp.zeros_like(last8_ref)

        @pl.when(b > 0)
        def _():
            prev = ring_ref[...]  # (p, 6, tz, P): block b-1, old

            def value(icg, dz, r):
                if dz == 0:
                    v = prev[:, icg]
                elif dz == 1:
                    v = jnp.concatenate(
                        [prev[:, icg, 1:, :], cur[:, icg, 0:1, :]], axis=1
                    )
                else:
                    v = jnp.concatenate(
                        [last8_ref[:, icg, 7:8, :], prev[:, icg, : tz - 1, :]],
                        axis=1,
                    )
                if r:
                    v = pltpu.roll(v, r, axis=2)
                return v

            comps = []
            for h, spec in ((0, spec_a), (1, spec_b)):
                base = 3 * (1 - h)
                for oc in range(3):
                    idx = [
                        t for t, tp in enumerate(spec.taps) if tp[0] == oc
                    ]
                    acc = prev[:, 3 * h + oc]  # the identity (+u) term
                    if spec.paired:
                        for k in range(0, len(idx), 2):
                            t0, t1 = idx[k], idx[k + 1]
                            (_, ic0, dz0, r0) = spec.taps[t0]
                            (_, ic1, dz1, r1) = spec.taps[t1]
                            v0 = value(base + ic0, dz0, r0)
                            v1 = value(base + ic1, dz1, r1)
                            if dz0 != dz1:
                                s_ = (
                                    v0 * wzb_ref[h, :, t0 : t0 + 1]
                                    + v1 * wzb_ref[h, :, t1 : t1 + 1]
                                )
                                acc = acc + s_ * wp_ref[h, t0][None, None, :]
                            else:
                                s_ = (
                                    v0 * wp_ref[h, t0][None, None, :]
                                    + v1 * wp_ref[h, t1][None, None, :]
                                )
                                acc = acc + s_ * wzb_ref[h, :, t0 : t0 + 1]
                    else:
                        for t in idx:
                            (_, ic, dz, r) = spec.taps[t]
                            acc = acc + (
                                value(base + ic, dz, r)
                                * wp_ref[h, t][None, None, :]
                                * wzb_ref[h, :, t : t + 1]
                            )
                    comps.append(acc)
            out_ref[...] = jnp.stack(comps, axis=1)

        # ring rotation: save the outgoing block's tail BEFORE overwriting
        # (at b == 0 the ring is uninitialized — last8 keeps its zeros)
        @pl.when((b > 0) & (b < nb))
        def _():
            last8_ref[...] = ring_ref[:, :, tz - 8 :, :]

        @pl.when(b < nb)
        def _():
            ring_ref[...] = cur

    # wz for the OUTPUT block (b-1): trailing index map like the output
    in_specs = [
        pl.BlockSpec((p, 6, tz, plane),
                     lambda b: (0, 0, jnp.minimum(b, nb - 1), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, tz, n_taps),
                     lambda b: (0, jnp.maximum(b - 1, 0), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, n_taps, plane), lambda b: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kernel,
        grid=(nb + 1,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (p, 6, tz, plane), lambda b: (0, 0, jnp.maximum(b - 1, 0), 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        input_output_aliases={0: 0},
        scratch_shapes=[
            pltpu.VMEM((p, 6, tz, plane), u.dtype),
            pltpu.VMEM((p, 6, 8, plane), u.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024
        ),
        interpret=interpret,
    )(u, wz_t, wplane)
