"""Probe: pure-XLA shifted-slice Maxwell SpMM vs the Pallas pair kernel.

VERDICT r4 #1: `spmm_dia` proves an XLA-lowered shifted-slice SpMM reaches
~99% of same-window copy bandwidth on this chip, while every Pallas
read+write kernel caps at ~330 GB/s.  The Maxwell curl pair is exactly a
set of shifted-slice multiply-adds on the folded-plane state, so an XLA
formulation may beat the Pallas kernel despite reading each input
component up to 3x (shift 0 / z-shift / plane-shift): XLA streams at
~650 GB/s aggregate vs Pallas ~330.

Run on the real chip:  python benchmarks/probes/xla_stencil_probe.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from lanczos_tpu.models.maxwell_pallas import PallasMaxwellOperator
from lanczos_tpu.utils.bench_loop import slope_time_chain


def mv_xla(u, wz_t, wplane_s, spec_e, spec_h):
    """Pure-XLA shifted-slice realization of the fused curl pair.

    Same math as `apply_stencil_pair` (taps/weights shared verbatim):
    per tap, the input component is rolled by `roll` lanes (x/y shifts in
    the folded plane) and/or by -dz z-rows, then scaled by the separable
    (Zc,) x (P,) weight outer product.  Wraps land only on zero-weighted
    pad rows/lanes, exactly as in the Pallas kernel.
    """
    outs = []
    for h, spec in ((0, spec_e), (1, spec_h)):
        src = u[3 * (1 - h) : 3 * (1 - h) + 3]
        for oc in range(3):
            idx = [t for t, tp in enumerate(spec.taps) if tp[0] == oc]
            acc = None
            for k in range(0, len(idx), 2):
                t0, t1 = idx[k], idx[k + 1]
                (_, ic0, dz0, r0) = spec.taps[t0]
                (_, ic1, dz1, r1) = spec.taps[t1]

                def shifted(ic, dz, r):
                    v = src[ic]
                    if dz:
                        v = jnp.roll(v, -dz, axis=0)
                    if r:
                        v = jnp.roll(v, r, axis=1)
                    return v

                v0 = shifted(ic0, dz0, r0)
                v1 = shifted(ic1, dz1, r1)
                if dz0 != dz1:  # z-pair: shared wplane row
                    s = (
                        v0 * wz_t[h, :, t0 : t0 + 1]
                        + v1 * wz_t[h, :, t1 : t1 + 1]
                    )
                    term = s * wplane_s[h, t0][None, :]
                else:  # plane-pair: shared wz row
                    s = (
                        v0 * wplane_s[h, t0][None, :]
                        + v1 * wplane_s[h, t1][None, :]
                    )
                    term = s * wz_t[h, :, t0 : t0 + 1]
                acc = term if acc is None else acc + term
            outs.append(acc)
    return jnp.stack(outs)


def main():
    n = 160
    op = PallasMaxwellOperator.create(n, n, n, dtype=jnp.float32, tz=16)
    damped = op.scaled(1e-2)
    rows = op.n
    key = jax.random.PRNGKey(0)
    print(f"rows={rows} state_shape={op.state_shape}", flush=True)

    for p in [1, 4, 8]:
        x = op.pack(
            jax.random.normal(key, (rows,) if p == 1 else (p, rows), jnp.float32)
        )
        step_pl = (lambda y, a: a.mv(y)) if p == 1 else (lambda y, a: a.mm(y))

        def step_xla(y, a):
            f = lambda u: mv_xla(u, a.wz_t, a.wplane_s, a.spec_e, a.spec_h)
            return f(y) if p == 1 else jax.vmap(f)(y)

        # correctness first (relative, small fixture is tested elsewhere)
        ya = step_pl(x, damped)
        yb = step_xla(x, damped)
        err = float(jnp.linalg.norm((ya - yb).ravel()) / jnp.linalg.norm(ya.ravel()))
        s_pl = slope_time_chain(step_pl, x, damped, damp=None)
        s_xla = slope_time_chain(step_xla, x, damped, damp=None)
        s_copy = slope_time_chain(lambda y: 1.0 - y, x, damp=None)
        state_bytes = 2 * x.nbytes
        eff = lambda s: state_bytes / s / 1e9
        print(
            f"p={p} rel_err={err:.2e} pallas={s_pl*1e3:.3f}ms ({eff(s_pl):.0f} GB/s eff) "
            f"xla={s_xla*1e3:.3f}ms ({eff(s_xla):.0f} GB/s eff) "
            f"copy={s_copy*1e3:.3f}ms ({eff(s_copy):.0f} GB/s) "
            f"xla_pct_of_copy={100*s_copy/s_xla:.1f} pallas_pct={100*s_copy/s_pl:.1f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
