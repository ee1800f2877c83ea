"""Per-kernel micro-benchmarks, mirroring the reference's measurement
drivers (`source/kernels/measurements/*.cu`, SURVEY.md §2 #23): Gram
products `mm_tt`/`mm_tt2`, tall x small `mm_ts`, SpMV/SpMM (ELL gather
path + matrix-free Maxwell stencil), and the small-eig `sqrtm`, swept over
the reference's N_COL = [2 4 6 8 10 12 14 16 18] where applicable.

Byte/flop models reproduce the reference's analytic formulas
(e.g. `measurements/mm_tt.cu:249-256`: T counted twice) so the GB/s
columns are comparable with BASELINE.md.

Usage: python benchmarks/kernel_bench.py [--rows 10000000] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from lanczos_tpu.utils.timing import benchmark_best

NCOLS = [2, 4, 6, 8, 10, 12, 14, 16, 18]


def bench_mm_tt(rows: int, dtype=jnp.float32):
    """R = T^T T (reference mm_tt.hpp; here one MXU dot_general)."""
    out = []
    key = jax.random.PRNGKey(0)
    for p in NCOLS:
        t = jax.random.normal(key, (rows, p), dtype)
        f = jax.jit(
            lambda t: jax.lax.dot_general(
                t, t, (((0,), (0,)), ((), ())), preferred_element_type=dtype
            )
        )
        s = benchmark_best(f, t, tests=5, reps=10)
        bs = jnp.dtype(dtype).itemsize
        bytes_moved = 2 * rows * p * bs  # reference model: T counted twice
        flops = 2.0 * rows * p * p
        out.append(
            {"n_col": p, "seconds": s, "gbps": bytes_moved / s / 1e9,
             "gflops": flops / s / 1e9}
        )
    return out


def bench_mm_tt2(rows: int, dtype=jnp.float32):
    """R = 1/2 (T1^T T2 + T2^T T1) (reference mm_tt2.hpp)."""
    out = []
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    for p in NCOLS:
        t1 = jax.random.normal(k1, (rows, p), dtype)
        t2 = jax.random.normal(k2, (rows, p), dtype)

        def f(t1, t2):
            g = jax.lax.dot_general(
                t1, t2, (((0,), (0,)), ((), ())), preferred_element_type=dtype
            )
            return 0.5 * (g + g.T)

        fj = jax.jit(f)
        s = benchmark_best(fj, t1, t2, tests=5, reps=10)
        bs = jnp.dtype(dtype).itemsize
        bytes_moved = 2 * rows * p * bs
        flops = 2.0 * rows * p * p
        out.append(
            {"n_col": p, "seconds": s, "gbps": bytes_moved / s / 1e9,
             "gflops": flops / s / 1e9}
        )
    return out


def bench_mm_ts(rows: int, dtype=jnp.float32):
    """R = T S and fused R -= T S (reference mm_ts.hpp)."""
    out = []
    key = jax.random.PRNGKey(0)
    for p in NCOLS:
        t = jax.random.normal(key, (rows, p), dtype)
        s_small = jax.random.normal(key, (p, p), dtype)
        r0 = jax.random.normal(key, (rows, p), dtype)
        f = jax.jit(lambda r, t, s: r - t @ s)  # fused subtract-update
        sec = benchmark_best(f, r0, t, s_small, tests=5, reps=10)
        bs = jnp.dtype(dtype).itemsize
        bytes_moved = 3 * rows * p * bs  # read T, read R, write R
        flops = 2.0 * rows * p * p
        out.append(
            {"n_col": p, "seconds": sec, "gbps": bytes_moved / sec / 1e9,
             "gflops": flops / sec / 1e9}
        )
    return out


def bench_sqrtm(dtype=jnp.float32, sweeps: int = 10):
    """sqrtm + inv-sqrtm of one N_COL x N_COL SPD matrix (reference
    my_sqrtm_cusolver.hpp / syevjBatched)."""
    from lanczos_tpu.ops.smalleig import sqrtm_invsqrtm

    out = []
    key = jax.random.PRNGKey(0)
    for p in NCOLS:
        g = jax.random.normal(key, (1024, p), dtype)
        a = jax.lax.dot_general(
            g, g, (((0,), (0,)), ((), ())), preferred_element_type=dtype
        ) + p * jnp.eye(p, dtype=dtype)
        f = jax.jit(lambda a: sqrtm_invsqrtm(a, backend="jacobi", sweeps=sweeps))
        s = benchmark_best(f, a, tests=5, reps=10)
        out.append({"n_col": p, "seconds": s})
    return out


def bench_spmm_ell(n_grid: int, dtype=jnp.float32):
    """Gathered ELL SpMM on the Maxwell matrix (reference ell::SpMM)."""
    from lanczos_tpu.models.maxwell import assemble_maxwell_A
    from lanczos_tpu.ops.formats import ell_from_scipy

    a = ell_from_scipy(assemble_maxwell_A(n_grid, n_grid, n_grid), dtype=dtype)
    rows = a.shape[0]
    out = []
    key = jax.random.PRNGKey(0)
    for p in NCOLS:
        x = jax.random.normal(key, (rows, p), dtype)
        f = jax.jit(lambda x: a.mm(x))
        s = benchmark_best(f, x, tests=3, reps=5)
        bs = jnp.dtype(dtype).itemsize
        nnz = a.padded_rows * a.width
        # reference model (spmv_spmm.cu): data + idx + x gathers + y write
        bytes_moved = nnz * (bs + 4) + rows * p * bs * 2
        flops = 2.0 * nnz * p
        out.append(
            {"n_col": p, "rows": rows, "seconds": s,
             "nnz_per_s": nnz / s, "gbps": bytes_moved / s / 1e9,
             "gflops": flops / s / 1e9}
        )
    return out


def bench_spmm_stencil(n_grid: int, dtype=jnp.float32):
    """Matrix-free Maxwell stencil SpMM (the TPU-native fast path)."""
    from lanczos_tpu.models.maxwell import MaxwellOperator

    op = MaxwellOperator.create(n_grid, n_grid, n_grid, dtype=dtype)
    rows = op.n
    out = []
    key = jax.random.PRNGKey(0)
    for p in [1] + NCOLS:
        x = jax.random.normal(
            key, (rows,) if p == 1 else (rows, p), dtype
        )
        f = jax.jit(op.mv if p == 1 else op.mm)
        s = benchmark_best(f, x, tests=3, reps=5)
        bs = jnp.dtype(dtype).itemsize
        nnz = 4 * rows  # logical ELL width 4
        bytes_moved = 2 * rows * max(p, 1) * bs  # read x + write y only
        flops = 2.0 * nnz * max(p, 1)
        out.append(
            {"n_col": p, "rows": rows, "seconds": s,
             "nnz_per_s": nnz / s, "gbps": bytes_moved / s / 1e9,
             "gflops": flops / s / 1e9}
        )
    return out


BENCHES = {
    "mm_tt": lambda args: bench_mm_tt(args.rows),
    "mm_tt2": lambda args: bench_mm_tt2(args.rows),
    "mm_ts": lambda args: bench_mm_ts(args.rows_ts),
    "sqrtm": lambda args: bench_sqrtm(),
    "spmm_ell": lambda args: bench_spmm_ell(args.grid_ell),
    "spmm_stencil": lambda args: bench_spmm_stencil(args.grid),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)  # mm_tt ref size
    ap.add_argument("--rows-ts", type=int, default=3_000_000)  # mm_ts ref size
    ap.add_argument("--grid", type=int, default=160)  # spmv ref N=160
    ap.add_argument("--grid-ell", type=int, default=64)
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated subset of " + ",".join(BENCHES))
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    names = args.only.split(",") if args.only else list(BENCHES)
    results = {}
    for name in names:
        print(f"== {name} ==", flush=True)
        rows = BENCHES[name](args)
        results[name] = rows
        for r in rows:
            cells = "  ".join(
                f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in r.items()
            )
            print("  " + cells, flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
