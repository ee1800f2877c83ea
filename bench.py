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
timing reads absurdly fast.  Anti-overflow damping of the chained
iteration is folded into the operator's weights (`op.scaled`): a separate
`* damp` XLA pass would re-read and re-write the whole state and double
the apparent time of this memory-bound kernel.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def main():
    from lanczos_tpu.models.maxwell_pallas import PallasMaxwellOperator
    from lanczos_tpu.utils.bench_loop import slope_time_chain

    # Reference geometry: N=160 => ~24.6M rows (spmv_spmm.cu:345), p=4.
    n_grid, p = 160, 4
    dev = jax.devices()[0]
    if dev.platform == "cpu":
        n_grid = 24  # smoke-test size for CI / CPU runs

    op = PallasMaxwellOperator.create(
        n_grid, n_grid, n_grid, dtype=jnp.float32, tz=16
    )
    n = op.n
    key = jax.random.PRNGKey(0)
    damped = op.scaled(1e-2)  # ||1e-2 * A|| ~ 6: 12 chained steps stay finite
    u = damped.pack(jax.random.normal(key, (p, n), jnp.float32))

    # The shared chip's deliverable bandwidth swings ~2x between windows
    # (same copy kernel measured 374-893 GB/s minutes apart; the round-3
    # "7% regression" was exactly this noise).  Take the best of several
    # slope measurements so the published number reflects the chip, not
    # the co-tenant (see benchmarks/results/headline_variance.json).
    secs = min(
        slope_time_chain(lambda y, a: a.mm(y), u, damped, damp=None)
        for _ in range(4)
    )

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
