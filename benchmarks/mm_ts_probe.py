"""Probe the mm_ts p>=10 cliff (kernels.json: 0.28 ms at p=8 ->
1.43 ms at p=10 on 3M rows — 4x past the fused-pass roofline).

Hypotheses: (a) sublane padding 10 -> 16 explains ~1.6x, not 4x;
(b) XLA switches the k<=8 contraction from a fused VPU broadcast-fma
to an 8%-utilized MXU dot at k >= ~10.  Tries layout/splitting
variants; whichever wins lands in methods.block_lanczos._mix.

Usage: python benchmarks/mm_ts_probe.py [--rows 3000000]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from lanczos_tpu.utils.bench_loop import slope_time_chain


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=3_000_000)
    args = ap.parse_args()
    key = jax.random.PRNGKey(0)

    def variants(p):
        s = jax.random.normal(key, (p, p), jnp.float32) * 1e-3
        pp = -(-p // 8) * 8

        def base(r, s=s):
            return r - jnp.einsum("kj,kn->jn", s, r,
                                  preferred_element_type=jnp.float32)

        def padded(r, s=s, p=p, pp=pp):
            sp_ = jnp.zeros((pp, pp), jnp.float32).at[:p, :p].set(s)
            rp = jnp.pad(r, ((0, pp - p), (0, 0)))
            out = rp - jnp.einsum("kj,kn->jn", sp_, rp,
                                  preferred_element_type=jnp.float32)
            return out[:p]

        def split8(r, s=s, p=p):
            out = r
            for k0 in range(0, p, 8):
                k1 = min(k0 + 8, p)
                out = out - jnp.einsum(
                    "kj,kn->jn", s[k0:k1], r[k0:k1],
                    preferred_element_type=jnp.float32)
            return out

        def dotgen(r, s=s):
            return r - jax.lax.dot_general(
                s, r, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        return {"einsum": base, "padded": padded, "split8": split8,
                "dot_general": dotgen}

    for p in (8, 10, 12, 16, 18):
        r = jax.random.normal(key, (p, args.rows), jnp.float32)
        out = []
        for name, fn in variants(p).items():
            sec = slope_time_chain(fn, r, damp=None)
            out.append(f"{name}={sec*1e3:.3f}ms")
        print(f"p={p}: " + "  ".join(out), flush=True)


if __name__ == "__main__":
    main()
