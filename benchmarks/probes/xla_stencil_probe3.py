"""Probe 3: fusion-friendlier XLA formulations of the curl pair.

Variant A: all shifts as lax.pad + lax.slice (zero fill — wraps only ever
land on zero-weighted positions, so this is exact), no concatenate.
Variant B: same, but built per output component (6 separate fusions).
Variant C: shift the minimal set — one shifted read per pair — and let
the unshifted read be shared across pairs.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from lanczos_tpu.models.maxwell_pallas import PallasMaxwellOperator
from lanczos_tpu.utils.bench_loop import slope_time_chain


def shift2d(v, dz, r):
    """Zero-fill shift: output[z, p] = v[z + dz, p - r] (matches
    roll(v,-dz,axis=0) then roll(v,r,axis=1) up to wraps, which only hit
    zero-weighted positions)."""
    zc, plane = v.shape
    if dz:
        v = jnp.pad(v[max(dz, 0):] if dz > 0 else v[:dz],
                    ((max(-dz, 0), max(dz, 0)), (0, 0)))
    if r:
        rr = r if abs(r) <= plane // 2 else r - plane
        if rr > 0:
            v = jnp.pad(v[:, :-rr], ((0, 0), (rr, 0)))
        else:
            v = jnp.pad(v[:, -rr:], ((0, 0), (0, -rr)))
    return v


def mv_padslice(u, wz_t, wplane_s, spec_e, spec_h):
    outs = []
    for h, spec in ((0, spec_e), (1, spec_h)):
        src = u[3 * (1 - h): 3 * (1 - h) + 3]
        for oc in range(3):
            idx = [t for t, tp in enumerate(spec.taps) if tp[0] == oc]
            acc = None
            for k in range(0, len(idx), 2):
                t0, t1 = idx[k], idx[k + 1]
                (_, ic0, dz0, r0) = spec.taps[t0]
                (_, ic1, dz1, r1) = spec.taps[t1]
                v0 = shift2d(src[ic0], dz0, r0)
                v1 = shift2d(src[ic1], dz1, r1)
                if dz0 != dz1:
                    s = (v0 * wz_t[h, :, t0:t0 + 1]
                         + v1 * wz_t[h, :, t1:t1 + 1])
                    term = s * wplane_s[h, t0][None, :]
                else:
                    s = (v0 * wplane_s[h, t0][None, :]
                         + v1 * wplane_s[h, t1][None, :])
                    term = s * wz_t[h, :, t0:t0 + 1]
                acc = term if acc is None else acc + term
            outs.append(acc)
    return jnp.stack(outs)


def main():
    n = 160
    op = PallasMaxwellOperator.create(n, n, n, dtype=jnp.float32, tz=16)
    damped = op.scaled(1e-2)
    key = jax.random.PRNGKey(0)
    for p in [1, 4]:
        x = op.pack(jax.random.normal(
            key, (op.n,) if p == 1 else (p, op.n), jnp.float32))
        state_bytes = 2 * x.nbytes

        def step_ps(y, a):
            f = lambda u: mv_padslice(u, a.wz_t, a.wplane_s, a.spec_e,
                                      a.spec_h)
            return f(y) if p == 1 else jax.vmap(f)(y)

        ya = (damped.mv(x) if p == 1 else damped.mm(x))
        yb = step_ps(x, damped)
        err = float(jnp.linalg.norm((ya - yb).ravel())
                    / jnp.linalg.norm(ya.ravel()))
        s_ps = slope_time_chain(step_ps, x, damped, damp=None)
        s_pl = slope_time_chain(
            (lambda y, a: a.mv(y)) if p == 1 else (lambda y, a: a.mm(y)),
            x, damped, damp=None)
        s_copy = slope_time_chain(lambda y: 1.0 - y, x, damp=None)
        print(f"p={p} rel_err={err:.2e} padslice={s_ps*1e3:.3f}ms "
              f"({state_bytes/s_ps/1e9:.0f} GB/s eff) "
              f"pallas={s_pl*1e3:.3f}ms ({state_bytes/s_pl/1e9:.0f}) "
              f"copy={s_copy*1e3:.3f}ms ({state_bytes/s_copy/1e9:.0f})",
              flush=True)


if __name__ == "__main__":
    main()
