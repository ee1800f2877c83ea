"""Probe: does input_output_aliasing lift the ~330 GB/s Pallas r+w ceiling?

The round-4 finding: ANY Pallas kernel that both reads and writes HBM
caps at ~330 GB/s total on this chip (XLA fused elementwise: ~650), with
reads-only at ~633 and writes-only ~580 — as if the Pallas pipeline's
input and output DMA streams cannot overlap.  This probe A/Bs the same
blocked copy kernel with and without input_output_aliases (in-place
update of a donated buffer), plus a variant with two parallel half-grids.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lanczos_tpu.utils.bench_loop import slope_time_chain


def make_copy(shape, dtype, alias: bool, bm=16, pt=None):
    zc = shape[-2]
    plane = shape[-1]
    if pt is None:
        pt = plane
        while bm * pt * 4 > 4 * 1024 * 1024 and pt % 2 == 0 and (pt // 2) % 128 == 0:
            pt //= 2

    def k(c, o):
        o[...] = 1.0 - c[...]

    r = len(shape) - 2
    grid = tuple(shape[:r]) + (zc // bm, plane // pt)
    blk = (1,) * r + (bm, pt)
    imap = lambda *g: g[:-2] + (g[-2], g[-1])

    def f(y):
        return pl.pallas_call(
            k, grid=grid,
            in_specs=[pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            input_output_aliases={0: 0} if alias else {},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(y)

    return f


def main():
    key = jax.random.PRNGKey(0)
    shape = (4, 6, 176, 26624)  # the p=4 stencil state, ~450 MB
    x = jax.random.normal(key, shape, jnp.float32)
    sb = 2 * x.nbytes

    s_xla = slope_time_chain(lambda y: 1.0 - y, x, damp=None)
    print(f"xla_copy: {s_xla*1e3:.3f} ms ({sb/s_xla/1e9:.0f} GB/s)", flush=True)

    for alias in (False, True):
        f = make_copy(shape, jnp.float32, alias)
        s = slope_time_chain(f, x, damp=None)
        print(f"pallas_copy alias={alias}: {s*1e3:.3f} ms "
              f"({sb/s/1e9:.0f} GB/s r+w)", flush=True)

    # block-size sweep with aliasing on
    for bm in (8, 32, 88):
        if 176 % bm:
            continue
        f = make_copy(shape, jnp.float32, True, bm=bm)
        s = slope_time_chain(f, x, damp=None)
        print(f"pallas_copy alias bm={bm}: {s*1e3:.3f} ms "
              f"({sb/s/1e9:.0f} GB/s r+w)", flush=True)


if __name__ == "__main__":
    main()
