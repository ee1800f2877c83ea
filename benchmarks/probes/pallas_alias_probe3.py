"""Probe 3: which aliasing patterns retain the 650 GB/s rate?

 1. plain 1-carry chain, no alias             (expect ~327)
 2. 1-carry chain, in-place alias {0:0}       (expect ~650)
 3. 2-carry ping-pong, dst via pl.ANY + alias {1:0}   (166 last time)
 4. 2-carry ping-pong, no alias               (216 last time)
 5. in-place alias with NEIGHBOR-block read (stencil access pattern):
    out[b] = 1 - next_block[b+1], input stream reads b+1, write trails.
 6. in-place alias {0:0} where the kernel reads the CURRENT block but
    the output index map TRAILS by one block (write-behind).
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


def _blk_grid():
    zc, plane = SHAPE[-2], SHAPE[-1]
    pt = plane
    while BM * pt * 4 > 4 * 1024 * 1024 and pt % 2 == 0 and (pt // 2) % 128 == 0:
        pt //= 2
    r = len(SHAPE) - 2
    grid = tuple(SHAPE[:r]) + (zc // BM, plane // pt)
    blk = (1,) * r + (BM, pt)
    return blk, grid


def simple_copy(alias):
    blk, grid = _blk_grid()
    imap = lambda *g: g[:-2] + (g[-2], g[-1])

    def k(c, o):
        o[...] = 1.0 - c[...]

    def f(y):
        return pl.pallas_call(
            k, grid=grid,
            in_specs=[pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
            input_output_aliases={0: 0} if alias else {},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(y)

    return f


def pingpong(alias):
    blk, grid = _blk_grid()
    imap = lambda *g: g[:-2] + (g[-2], g[-1])

    def k(c, d, o):
        o[...] = 1.0 - c[...]

    def f(y, z):
        return pl.pallas_call(
            k, grid=grid,
            in_specs=[pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
            input_output_aliases={1: 0} if alias else {},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(y, z)

    return f


def inplace_shifted():
    # stencil-like: out block b <- f(input block b+1), write trails read.
    zc, plane = SHAPE[-2], SHAPE[-1]
    nb = zc // BM
    blk = (1, 1, BM, plane)
    grid = (SHAPE[0], SHAPE[1], nb)

    def k(nxt, o):
        o[...] = 1.0 - nxt[...]

    def f(y):
        return pl.pallas_call(
            k, grid=grid,
            in_specs=[pl.BlockSpec(
                blk, lambda p, c, b: (p, c, jnp.minimum(b + 1, nb - 1), 0),
                memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(
                blk, lambda p, c, b: (p, c, b, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
            input_output_aliases={0: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(y)

    return f


def chain1(f, x, k1=2, k2=12, trials=3):
    @jax.jit
    def fn(x, k):
        return jnp.sum(lax.fori_loop(0, k, lambda i, y: f(y), x))

    float(fn(x, k1))
    ks = [k2]
    while ks[-1] * 8 <= 25000:
        ks.append(ks[-1] * 8)
    for k2t in ks:
        best = {}
        for k in (k1, k2t):
            b = float("inf")
            for _ in range(trials):
                t0 = time.perf_counter()
                float(fn(x, k))
                b = min(b, time.perf_counter() - t0)
            best[k] = b
        if best[k2t] - best[k1] >= 25e-3:
            break
    return (best[k2t] - best[k1]) / (k2t - k1)


def chain2(f, x, z, k1=2, k2=12, trials=3):
    @jax.jit
    def fn(x, z, k):
        def body(i, c):
            y, z = c
            return (f(y, z), y)

        y, _ = lax.fori_loop(0, k, body, (x, z))
        return jnp.sum(y)

    float(fn(x, z, k1))
    ks = [k2]
    while ks[-1] * 8 <= 25000:
        ks.append(ks[-1] * 8)
    for k2t in ks:
        best = {}
        for k in (k1, k2t):
            b = float("inf")
            for _ in range(trials):
                t0 = time.perf_counter()
                float(fn(x, z, k))
                b = min(b, time.perf_counter() - t0)
            best[k] = b
        if best[k2t] - best[k1] >= 25e-3:
            break
    return (best[k2t] - best[k1]) / (k2t - k1)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, SHAPE, jnp.float32)
    z = jnp.zeros_like(x)
    sb = 2 * x.nbytes

    s = chain1(simple_copy(False), x)
    print(f"1 plain no-alias:      {s*1e3:.3f} ms ({sb/s/1e9:.0f} GB/s)", flush=True)
    s = chain1(simple_copy(True), x)
    print(f"2 in-place alias:      {s*1e3:.3f} ms ({sb/s/1e9:.0f} GB/s)", flush=True)
    s = chain2(pingpong(True), x, z)
    print(f"3 pingpong alias ANY:  {s*1e3:.3f} ms ({sb/s/1e9:.0f} GB/s)", flush=True)
    s = chain2(pingpong(False), x, z)
    print(f"4 pingpong no-alias:   {s*1e3:.3f} ms ({sb/s/1e9:.0f} GB/s)", flush=True)
    s = chain1(inplace_shifted(), x)
    print(f"5 in-place shifted:    {s*1e3:.3f} ms ({sb/s/1e9:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
