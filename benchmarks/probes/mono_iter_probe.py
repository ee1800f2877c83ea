"""Per-iteration time of the fused block Lanczos: mono (aliased two-call)
vs round-4 three-call path, on the real chip, same window."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from lanczos_tpu.models.maxwell_pallas import PallasMaxwellOperator
import lanczos_tpu.methods.block_lanczos_fused as blf


def iter_time(op, b, m1=4, m2=12, trials=3):
    def run(m):
        r = blf.block_lanczos_fused(op, b, m, 0)
        # value fetch: the tunneled backend resolves block_until_ready
        # before execution finishes — only a transfer forces completion
        float(jnp.sum(r.alphas) + jnp.sum(r.beta_final))

    best = {}
    for m in (m1, m2):
        run(m)  # compile + warm
        t = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            run(m)
            t = min(t, time.perf_counter() - t0)
        best[m] = t
    return (best[m2] - best[m1]) / (m2 - m1)


def main():
    n = 160
    op = PallasMaxwellOperator.create(n, n, n, dtype=jnp.float32, tz=16)
    key = jax.random.PRNGKey(0)
    for p in [1, 2, 4, 8, 16]:
        b = op.pack(jax.random.normal(key, (p, op.n), jnp.float32))
        sup = op.supports_stencil_gram(p)
        s_mono = iter_time(op, b) if sup else float("nan")
        try:
            orig = PallasMaxwellOperator.supports_stencil_gram
            PallasMaxwellOperator.supports_stencil_gram = lambda *a, **k: False
            s_old = iter_time(op, b)
        finally:
            PallasMaxwellOperator.supports_stencil_gram = orig
        state_bytes = b.nbytes
        streams = lambda s, k: k * state_bytes / s / 1e9
        print(
            f"p={p} supports_mono={sup} mono={s_mono*1e3:.2f} ms/iter "
            f"({streams(s_mono, 7):.0f} GB/s over 7 passes) "
            f"old={s_old*1e3:.2f} ms/iter  speedup={s_old/s_mono:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
