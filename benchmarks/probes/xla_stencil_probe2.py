"""Probe 2: why XLA cannot reach the stencil's minimal traffic.

Three measurements on the real chip, same window:
  1. Isolated shift-op streaming rates on the (6, Zc, P) state:
     sublane (z) shift via slice vs lane roll by 1 vs lane roll by xc.
  2. Flat-1D DIA-style full operator: every tap a contiguous 1-D shifted
     slice (the formulation `spmm_dia` streams at ~99% of copy), with
     per-tap FULL flat weight vectors (separable broadcasting is
     impossible in flat form) — measures the weight-traffic floor.
  3. XLA copy roofline, same window.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from lanczos_tpu.models.maxwell_pallas import PallasMaxwellOperator
from lanczos_tpu.utils.bench_loop import slope_time_chain


def build_flat(op):
    """Per-half flat-tap form: for each tap, a flat offset into the
    opposite half's flat component and a full flat weight vector."""
    zc, plane = op.spec.zc, op.spec.plane
    c = zc * plane
    wz_t = np.asarray(op.wz_t)  # (2, Zc, n_taps)
    wp_s = np.asarray(op.wplane_s)  # (2, n_taps, P)
    taps_flat = []  # (half, oc, ic, flat_off) per tap
    weights = []
    for h, spec in ((0, op.spec_e), (1, op.spec_h)):
        for t, (oc, ic, dz, roll) in enumerate(spec.taps):
            # jnp.roll(v, r, axis=1)[i] = v[i-r]; our kernel uses roll=r
            # meaning read v at lane (p - r) mod P; flat shift: output
            # flat f reads input flat f - r - dz... z: roll(v,-dz,axis=0)
            # reads v[z+dz]. Flat offset = dz*plane - roll (read position
            # relative to f). Verified against mv below.
            off = dz * plane - roll
            # reduce the (mod P) roll to a small signed shift
            if off > c // 2:
                off -= plane
            if roll > plane // 2:
                off += plane
            w = np.einsum("z,p->zp", wz_t[h, :, t], wp_s[h, t]).reshape(-1)
            taps_flat.append((h, oc, ic, int(off)))
            weights.append(w)
    return taps_flat, jnp.asarray(np.stack(weights), op.wz_t.dtype)


def mv_flat(u, weights, taps_flat, zc, plane):
    """u: (6, Zc, P) -> flat per-component (6, C); shifts via 1-D
    dynamic_slice on a halo-padded flat component (the spmm_dia
    pattern)."""
    c = zc * plane
    h = max(abs(off) for (_, _, _, off) in taps_flat)
    uf = u.reshape(6, c)
    up = jnp.pad(uf, ((0, 0), (h, h)))
    outs = [None] * 6
    for t, (half, oc, ic, off) in enumerate(taps_flat):
        gic = ic + 3 * (1 - half)
        goc = oc + 3 * half
        v = jax.lax.dynamic_slice(up[gic], (h + off,), (c,))
        term = weights[t] * v
        outs[goc] = term if outs[goc] is None else outs[goc] + term
    return jnp.stack(outs).reshape(6, zc, plane)


def main():
    n = 160
    op = PallasMaxwellOperator.create(n, n, n, dtype=jnp.float32, tz=16)
    damped = op.scaled(1e-2)
    key = jax.random.PRNGKey(0)
    x = op.pack(jax.random.normal(key, (op.n,), jnp.float32))
    state_bytes = 2 * x.nbytes
    zc, plane = op.spec.zc, op.spec.plane
    xc = op.xc

    # -- 1. isolated shift ops (self-maps on the full state) ------------
    def zshift(y):  # sublane shift by 1 with zero fill
        return jnp.pad(y[:, 1:, :], ((0, 0), (0, 1), (0, 0)))

    def roll1(y):
        return jnp.roll(y, 1, axis=2)

    def rollxc(y):
        return jnp.roll(y, xc, axis=2)

    def pslice(y):  # lane shift by 1 via pad+slice (no wrap)
        return jnp.pad(y, ((0, 0), (0, 0), (0, 1)))[:, :, 1:]

    for name, f in [("copy(1-y)", lambda y: 1.0 - y), ("zshift", zshift),
                    ("lane_roll1", roll1), ("lane_rollxc", rollxc),
                    ("lane_padslice1", pslice)]:
        s = slope_time_chain(f, x, damp=None)
        print(f"{name}: {s*1e3:.3f} ms ({state_bytes/s/1e9:.0f} GB/s r+w)",
              flush=True)

    # -- 2. flat DIA-style operator ------------------------------------
    taps_flat, weights = build_flat(op)
    wd = op.scaled(1e-2)
    taps_flat_d, weights_d = build_flat(wd)

    def step_flat(y, w):
        return mv_flat(y, w, taps_flat, zc, plane)

    ya = damped.mv(x)
    yb = step_flat(x, weights_d)
    err = float(jnp.linalg.norm((ya - yb).ravel()) /
                jnp.linalg.norm(ya.ravel()))
    s_flat = slope_time_chain(step_flat, x, weights_d, damp=None)
    print(f"flat_dia: rel_err={err:.2e} {s_flat*1e3:.3f} ms "
          f"({state_bytes/s_flat/1e9:.0f} GB/s effective-minimal)", flush=True)

    # traffic model: 24 weight streams + 24 shifted reads + 6 writes
    model = (24 + 24 + 6) / 12 * state_bytes
    print(f"flat_dia modeled traffic {model/1e9:.2f} GB -> aggregate "
          f"{model/s_flat/1e9:.0f} GB/s", flush=True)

    s_pl = slope_time_chain(lambda y, a: a.mv(y), x, damped, damp=None)
    print(f"pallas: {s_pl*1e3:.3f} ms ({state_bytes/s_pl/1e9:.0f} GB/s)",
          flush=True)


if __name__ == "__main__":
    main()
