"""Headline benchmark: SpMM nnz/s on the reference's largest fixture.

Reproduces the reference's hottest-kernel measurement (`ell::SpMM`,
`source/kernels/measurements/spmv_spmm.cu`: the N=160 Maxwell operator,
~24.6M rows, ELL width 4, block width N_COL=4, float32) with the TPU-native
fast path: the matrix-free separable-stencil Maxwell operator
(`lanczos_tpu/models/maxwell.py`) instead of a gathered ELL SpMM.

Baseline (BASELINE.md "spmm" table, N_COL=4): 24.6M rows in 6.17e-3 s
-> 4 nnz/row * 24.6M rows / 6.17e-3 s = 1.60e10 nnz/s on the Tesla T4.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def main():
    from lanczos_tpu.models.maxwell import MaxwellOperator
    from lanczos_tpu.utils.timing import benchmark_best, benchmark_chained

    # Reference geometry: N=160 => ~24.6M rows (spmv_spmm.cu:345), p=4.
    n_grid, p = 160, 4
    dev = jax.devices()[0]
    # Scale the problem down on small-memory backends (CI/CPU smoke runs).
    if dev.platform == "cpu":
        n_grid = 48

    op = MaxwellOperator.create(n_grid, n_grid, n_grid, dtype=jnp.float32)
    n = op.n
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, p), jnp.float32)

    # NB: pass the operator as an argument — closing over it embeds its
    # arrays as constants, which the tunneled backend re-uploads per call.
    # Chained protocol: y_{k+1} = A y_k, so no call can be elided or
    # pipelined — the sustained per-SpMM rate a Lanczos loop actually sees.
    mm = jax.jit(lambda v, op: op.mm(v))
    secs = benchmark_chained(mm, x, op, tests=5, reps=10)

    # Logical nnz of the assembled operator: ELL width 4 (2 curl blocks x
    # 2 taps per output row), matching the reference's byte/flop model.
    nnz = 4 * n
    nnz_per_s = nnz / secs

    ref_nnz_per_s = 4 * 24.6e6 / 6.17e-3  # BASELINE.md spmm, N_COL=4
    print(
        json.dumps(
            {
                "metric": "maxwell_spmm_nnz_per_s",
                "value": nnz_per_s,
                "unit": "nnz/s",
                "vs_baseline": nnz_per_s / ref_nnz_per_s,
            }
        )
    )


if __name__ == "__main__":
    main()
