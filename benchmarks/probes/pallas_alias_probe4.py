"""Probe 4: aliasing rules needed for the mono-kernel Lanczos step.

 A. 3-input mix, out aliased to input 0 (which IS streamed + read):
    out = c0*a + c1*b + c2*c        -> 4 streams; expect ~650 aggregate?
 B. stencil-like: out[b] = 1 - x[b+1]; PLUS a dst input streamed at the
    out index but never read; alias dst -> out.  3 streams.
 C. dual aliased outputs (the mono-kernel pattern): reads a, b, c at
    block i; writes o1[i] = mix (alias a), o2[max(i-1,0)] = 1 - ring
    (alias c).  5 streams.
All compared against the same-window XLA copy.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SHAPE = (4, 6, 176, 26624)
BM = 16
NB = SHAPE[-2] // BM
BLK = (1, 1, BM, SHAPE[-1])
GRID = (SHAPE[0], SHAPE[1], NB)
IMAP = lambda p, c, b: (p, c, b, 0)


def _call(kernel, n_in, aliases, out_specs=None, n_out=1):
    specs = [pl.BlockSpec(BLK, IMAP, memory_space=pltpu.VMEM)] * n_in
    os = out_specs or pl.BlockSpec(BLK, IMAP, memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct(SHAPE, jnp.float32)
    if n_out > 1:
        os = [os] * n_out if not isinstance(os, list) else os
        oshape = [oshape] * n_out

    def f(*xs):
        return pl.pallas_call(
            kernel, grid=GRID, in_specs=specs, out_specs=os,
            out_shape=oshape, input_output_aliases=aliases,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(*xs)

    return f


def bench(fn, args, n_bufs_traffic, label, rotate=None, k1=2, k2=12,
          trials=3):
    if rotate is None:
        rotate = lambda c, r: (*r, *c[len(r):])

    @jax.jit
    def loop(k, *args):
        def body(i, c):
            r = fn(*c[: len(args)])
            r = r if isinstance(r, tuple) else (r,)
            return rotate(c, r)

        out = lax.fori_loop(0, k, body, args)
        return jnp.sum(out[0])

    float(loop(k1, *args))
    ks = [k2]
    while ks[-1] * 8 <= 25000:
        ks.append(ks[-1] * 8)
    for k2t in ks:
        best = {}
        for k in (k1, k2t):
            b = float("inf")
            for _ in range(trials):
                t0 = time.perf_counter()
                float(loop(k, *args))
                b = min(b, time.perf_counter() - t0)
            best[k] = b
        if best[k2t] - best[k1] >= 25e-3:
            break
    s = (best[k2t] - best[k1]) / (k2t - k1)
    sb = n_bufs_traffic * args[0].nbytes
    print(f"{label}: {s*1e3:.3f} ms ({sb/s/1e9:.0f} GB/s aggregate over "
          f"{n_bufs_traffic} streams)", flush=True)
    return s


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    a, b, c = (jax.random.normal(k, SHAPE, jnp.float32) * 0.1 for k in ks)

    # XLA copy reference
    s = bench(lambda y: 1.0 - y, (a,), 2, "xla copy ref")

    # A. 3-input mix in-place on input 0
    def k_mix(ar, br, cr, o):
        o[...] = 0.3 * ar[...] + 0.4 * br[...] + 0.2 * cr[...]

    bench(_call(k_mix, 3, {0: 0}), (a, b, c), 4, "A mix in-place")
    bench(_call(k_mix, 3, {}), (a, b, c), 4, "A' mix no-alias")

    # B. stencil-like with streamed-unused dst
    def k_sten(xr, dr, o):
        o[...] = 1.0 - xr[...]

    specs_b = [
        pl.BlockSpec(BLK, lambda p, c_, b_: (p, c_, jnp.minimum(b_ + 1, NB - 1), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(BLK, IMAP, memory_space=pltpu.VMEM),
    ]

    def f_b(x, d):
        return pl.pallas_call(
            k_sten, grid=GRID, in_specs=specs_b,
            out_specs=pl.BlockSpec(BLK, IMAP, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
            input_output_aliases={1: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, d)

    # correct rotation: the donated dst's buffer (now out) becomes the
    # next x; the old x (now dead) becomes the next dst
    bench(f_b, (a, b), 3, "B streamed-dead dst",
          rotate=lambda c, r: (r[0], c[0]))

    # C. dual aliased outputs, second write trailing
    def k_dual(ar, br, cr, o1, o2):
        o1[...] = 0.3 * ar[...] + 0.4 * br[...] + 0.2 * cr[...]
        o2[...] = 1.0 - br[...]

    specs_c_out = [
        pl.BlockSpec(BLK, IMAP, memory_space=pltpu.VMEM),
        pl.BlockSpec(BLK, lambda p, c_, b_: (p, c_, jnp.maximum(b_ - 1, 0), 0),
                     memory_space=pltpu.VMEM),
    ]

    def f_c(ar, br, cr):
        return pl.pallas_call(
            k_dual, grid=GRID,
            in_specs=[pl.BlockSpec(BLK, IMAP, memory_space=pltpu.VMEM)] * 3,
            out_specs=specs_c_out,
            out_shape=[jax.ShapeDtypeStruct(SHAPE, jnp.float32)] * 2,
            input_output_aliases={0: 0, 2: 1},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(ar, br, cr)

    # Lanczos carry rotation: (u1,u2,u3) -> (u2, q, v); donated u1/u3
    # buffers (now o1/o2) re-enter as q/v, u2 survives untouched
    bench(f_c, (a, b, c), 5, "C dual aliased outputs",
          rotate=lambda c, r: (c[1], r[0], r[1]))


if __name__ == "__main__":
    pass  # main()


def variants():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    a, b, c = (jax.random.normal(k, SHAPE, jnp.float32) * 0.1 for k in ks)

    def k_dual(ar, br, cr, o1, o2):
        o1[...] = 0.3 * ar[...] + 0.4 * br[...] + 0.2 * cr[...]
        o2[...] = 1.0 - br[...]

    def f_dual(out_specs, aliases):
        def f(ar, br, cr):
            return pl.pallas_call(
                k_dual, grid=GRID,
                in_specs=[pl.BlockSpec(BLK, IMAP, memory_space=pltpu.VMEM)] * 3,
                out_specs=out_specs,
                out_shape=[jax.ShapeDtypeStruct(SHAPE, jnp.float32)] * 2,
                input_output_aliases=aliases,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(ar, br, cr)
        return f

    same = pl.BlockSpec(BLK, IMAP, memory_space=pltpu.VMEM)
    trail = pl.BlockSpec(BLK, lambda p, c_, b_: (p, c_, jnp.maximum(b_ - 1, 0), 0),
                         memory_space=pltpu.VMEM)
    rot = lambda c_, r: (c_[1], r[0], r[1])
    bench(f_dual([same, same], {0: 0, 2: 1}), (a, b, c), 5,
          "C1 dual alias no-trail", rotate=rot)
    bench(f_dual([same, trail], {}), (a, b, c), 5,
          "C2 dual NO alias trail", rotate=rot)
    bench(f_dual([same, trail], {0: 0}), (a, b, c), 5,
          "C3 dual alias only o1", rotate=rot)

    # D: single output, written onto the THIRD (read) input, trailing
    def k_mix(ar, br, cr, o):
        o[...] = 0.3 * ar[...] + 0.4 * br[...] + 0.2 * cr[...]

    def f_d(ar, br, cr):
        return pl.pallas_call(
            k_mix, grid=GRID,
            in_specs=[pl.BlockSpec(BLK, IMAP, memory_space=pltpu.VMEM)] * 3,
            out_specs=trail,
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
            input_output_aliases={2: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(ar, br, cr)

    bench(f_d, (a, b, c), 4, "D mix alias input2 trail",
          rotate=lambda c_, r: (r[0], c_[0], c_[1]))


variants()


def double_step():
    """Two chained mono-kernel calls per loop body: the buffer
    permutation (u1,u2,u3)->(u2,q,v) composes to identity over two
    steps, so the while-loop carry slots keep stable buffers and XLA
    needs no defensive copies."""
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    x, y, z = (jax.random.normal(k, SHAPE, jnp.float32) * 0.1 for k in ks)

    def k_dual(ar, br, cr, o1, o2):
        o1[...] = 0.3 * ar[...] + 0.4 * br[...] + 0.2 * cr[...]
        o2[...] = 1.0 - br[...]

    same = pl.BlockSpec(BLK, IMAP, memory_space=pltpu.VMEM)
    trail = pl.BlockSpec(BLK, lambda p, c_, b_: (p, c_, jnp.maximum(b_ - 1, 0), 0),
                         memory_space=pltpu.VMEM)

    def f_c(ar, br, cr):
        return pl.pallas_call(
            k_dual, grid=GRID,
            in_specs=[same] * 3,
            out_specs=[same, trail],
            out_shape=[jax.ShapeDtypeStruct(SHAPE, jnp.float32)] * 2,
            input_output_aliases={0: 0, 2: 1},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(ar, br, cr)

    def body2(c_, _r):
        x, y, z = c_
        q1, v1 = f_c(x, y, z)
        q2, v2 = f_c(y, q1, v1)
        return (q1, q2, v2)

    bench(lambda x, y, z: body2((x, y, z), None), (x, y, z), 10,
          "E double-step mono", rotate=lambda c_, r: r)


double_step()
