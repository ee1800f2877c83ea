"""Headline benchmark: SpMM nnz/s on the reference's largest fixture.

Reproduces the reference's hottest-kernel measurement (`ell::SpMM`,
`source/kernels/measurements/spmv_spmm.cu`: the N=160 Maxwell operator,
~24.6M rows, ELL width 4, block width N_COL=4, float32) with the TPU-native
fast path: the Pallas separable-stencil operator on the stacked
folded-plane state (`lanczos_tpu/models/maxwell_pallas.py`) instead of a
gathered ELL SpMM.

Baseline (BASELINE.md "spmm" table, N_COL=4): 24.6M rows in 6.17e-3 s
-> 4 nnz/row * 24.6M rows / 6.17e-3 s = 1.60e10 nnz/s on the Tesla T4.

Timing protocol: the per-call time is the SLOPE between a k1-step and a
k2-step device-side `fori_loop` of data-dependent applications (each step
consumes the previous output, exactly like the Lanczos/FDTD loops), with
a scalar fetch as the sync point.  This cancels dispatch/tunnel latency
and makes elision impossible — `block_until_ready` on this environment's
tunneled TPU backend does NOT wait for execution, so naive wall-clock
timing reads absurdly fast.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax


def slope_seconds(step, x, k1=2, k2=12, trials=3):
    """Per-step seconds via the k2-vs-k1 loop-length slope."""
    fns = {}
    for k in (k1, k2):
        fns[k] = jax.jit(
            lambda x, k=k: jnp.sum(
                lax.fori_loop(0, k, lambda i, y: step(y) * 1e-2, x)
            )
        )
        float(fns[k](x))  # compile + warm
    best = {}
    for k in (k1, k2):
        b = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            float(fns[k](x))
            b = min(b, time.perf_counter() - t0)
        best[k] = b
    return (best[k2] - best[k1]) / (k2 - k1)


def main():
    from lanczos_tpu.models.maxwell_pallas import PallasMaxwellOperator

    # Reference geometry: N=160 => ~24.6M rows (spmv_spmm.cu:345), p=4.
    n_grid, p = 160, 4
    dev = jax.devices()[0]
    if dev.platform == "cpu":
        n_grid = 24  # smoke-test size for CI / CPU runs

    op = PallasMaxwellOperator.create(n_grid, n_grid, n_grid, dtype=jnp.float32)
    n = op.n
    key = jax.random.PRNGKey(0)
    u = op.pack(jax.random.normal(key, (p, n), jnp.float32))

    secs = slope_seconds(lambda y: op.mm(y), u)

    # Logical nnz of the assembled operator: ELL width 4 (2 curl blocks x
    # 2 taps per output row), matching the reference's flop model.
    nnz = 4 * n * p
    nnz_per_s = nnz / secs

    ref_nnz_per_s = 4 * 24.6e6 * 4 / 6.17e-3  # BASELINE.md spmm, N_COL=4
    print(
        json.dumps(
            {
                "metric": "maxwell_spmm_nnz_per_s",
                "value": nnz_per_s,
                "unit": "nnz/s (nnz x block-cols per second)",
                "vs_baseline": nnz_per_s / ref_nnz_per_s,
            }
        )
    )


if __name__ == "__main__":
    main()
