"""Benchmark timing + analytic roofline models.

TPU-native version of the reference's measurement protocol
(`source/kernels/measurements/mm_tt.cu:206-225`): best-of-`tests` over
`reps`-iteration batches, with `jax.block_until_ready` in place of
`cudaDeviceSynchronize` bracketing, and the same style of analytic
byte/flop models printed as achieved GB/s / GFLOPS (SURVEY.md §5
"Tracing / profiling").
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax


def benchmark_best(fn, *args, tests: int = 5, reps: int = 10) -> float:
    """Best per-call seconds over `tests` timed batches of `reps` calls.

    The first (compile) call is excluded, mirroring the reference protocol
    of synchronize-bracketed best-of-(10x100) batches.
    """
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(tests):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        best = min(best, dt)
    return best


def benchmark_chained(fn, x0, *extra, tests: int = 5, reps: int = 10) -> float:
    """Best per-call seconds for a self-map y = fn(y, *extra), timed as a
    data-dependent chain so no call can be elided or overlapped — the
    honest sustained-throughput protocol for iterative solvers (each
    Lanczos step consumes the previous step's output).  One host sync per
    `reps`-long chain keeps tunnel round-trip latency out of the figure.
    """
    y = fn(x0, *extra)
    jax.block_until_ready(y)
    best = float("inf")
    for _ in range(tests):
        y = x0
        t0 = time.perf_counter()
        for _ in range(reps):
            y = fn(y, *extra)
        jax.block_until_ready(y)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


@dataclass
class Roofline:
    seconds: float
    bytes_moved: float
    flops: float

    @property
    def gbps(self) -> float:
        return self.bytes_moved / self.seconds / 1e9

    @property
    def gflops(self) -> float:
        return self.flops / self.seconds / 1e9


def roofline(seconds: float, bytes_moved: float, flops: float) -> Roofline:
    """Analytic effective-bandwidth model in the reference's style
    (`measurements/spmv_spmm.cu:419-446`): the caller supplies the per-op
    byte/flop formula; we report achieved GB/s and GFLOPS."""
    return Roofline(seconds, bytes_moved, flops)
