"""Per-kernel micro-benchmarks, mirroring the reference's measurement
drivers (`source/kernels/measurements/*.cu`, SURVEY.md §2 #23): Gram
products `mm_tt`/`mm_tt2`, tall x small `mm_ts`, SpMV/SpMM (gathered ELL
path + the Pallas Maxwell stencil), and the small-eig `sqrtm`, swept over
the reference's N_COL = [2 4 6 8 10 12 14 16 18] where applicable.

Timing: loop-slope protocol (`lanczos_tpu.utils.bench_loop`) — dispatch-
latency-free and elision-proof on the tunneled TPU backend.

Byte/flop models reproduce the reference's analytic formulas
(e.g. `measurements/mm_tt.cu:249-256`: T counted twice) so the GB/s
columns are comparable with BASELINE.md.

Usage: python benchmarks/kernel_bench.py [--only mm_tt,sqrtm] [--json out]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from lanczos_tpu.utils.bench_loop import slope_time, slope_time_chain

NCOLS = [2, 4, 6, 8, 10, 12, 14, 16, 18]


def bench_mm_tt(rows: int, dtype=jnp.float32):
    """R = T^T T (reference mm_tt.hpp): one MXU contraction on the
    library's BLOCK-MAJOR (p, n) layout — the tall (n, p) layout the
    reference uses wastes 124/128 lanes of every tile on TPU (measured
    ~14x slower) and is exactly what the block-major convention avoids."""
    out = []
    key = jax.random.PRNGKey(0)
    for p in NCOLS:
        t = jax.random.normal(key, (p, rows), dtype)
        s = slope_time(
            lambda t: jnp.einsum(
                "pn,qn->pq", t, t, preferred_element_type=dtype
            ),
            t,
        )
        bs = jnp.dtype(dtype).itemsize
        bytes_moved = 2 * rows * p * bs  # reference model: T counted twice
        flops = 2.0 * rows * p * p
        out.append({"n_col": p, "seconds": s, "gbps": bytes_moved / s / 1e9,
                    "gflops": flops / s / 1e9})
    return out


def bench_mm_tt2(rows: int, dtype=jnp.float32):
    """R = 1/2 (T1^T T2 + T2^T T1) (reference mm_tt2.hpp), block-major."""
    out = []
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    for p in NCOLS:
        t1 = jax.random.normal(k1, (p, rows), dtype)
        t2 = jax.random.normal(k2, (p, rows), dtype)

        def f(t1, t2):
            g = jnp.einsum("pn,qn->pq", t1, t2, preferred_element_type=dtype)
            return 0.5 * (g + g.T)

        s = slope_time(f, t1, t2)
        bs = jnp.dtype(dtype).itemsize
        bytes_moved = 2 * rows * p * bs
        flops = 2.0 * rows * p * p
        out.append({"n_col": p, "seconds": s, "gbps": bytes_moved / s / 1e9,
                    "gflops": flops / s / 1e9})
    return out


def bench_mm_ts(rows: int, dtype=jnp.float32):
    """Fused update R -= S^T R (reference mm_ts.hpp mm_ts2), block-major:
    the library's `_mix` einsum on the MXU."""
    out = []
    key = jax.random.PRNGKey(0)
    for p in NCOLS:
        t = jax.random.normal(key, (p, rows), dtype)
        s_small = jax.random.normal(key, (p, p), dtype) * 1e-3

        def f(r, s_small=s_small):
            return r - jnp.einsum(
                "kj,kn->jn", s_small, r, preferred_element_type=dtype
            )

        sec = slope_time_chain(f, t, damp=None)
        bs = jnp.dtype(dtype).itemsize
        bytes_moved = 3 * rows * p * bs  # read T, read R, write R
        flops = 2.0 * rows * p * p
        out.append({"n_col": p, "seconds": sec, "gbps": bytes_moved / sec / 1e9,
                    "gflops": flops / sec / 1e9})
    return out


def bench_sqrtm(dtype=jnp.float32, backend: str = "jacobi"):
    """sqrtm + inv-sqrtm of one N_COL x N_COL SPD matrix (reference
    my_sqrtm_cusolver.hpp / cuSOLVER syevjBatched).  backend="newton"
    times the coupled Newton-Schulz path (VERDICT r1 #9)."""
    from lanczos_tpu.ops.smalleig import sqrtm_invsqrtm

    out = []
    key = jax.random.PRNGKey(0)
    for p in NCOLS:
        g = jax.random.normal(key, (256, p), dtype)
        a = jax.lax.dot_general(
            g, g, (((0,), (0,)), ((), ())), preferred_element_type=dtype
        ) + p * jnp.eye(p, dtype=dtype)
        a = a / jnp.trace(a)

        def step(a):
            sq, inv = sqrtm_invsqrtm(a, backend=backend)
            g = sq + inv
            return g / jnp.trace(g)  # stays SPD: chainable

        s = slope_time_chain(step, a, damp=1.0)
        out.append({"n_col": p, "seconds": s})
    return out


def bench_spmm_ell(n_grid: int, dtype=jnp.float32):
    """Gathered ELL SpMM on the Maxwell matrix (reference ell::SpMM),
    native-assembled at width 4."""
    from lanczos_tpu.models.maxwell import maxwell_ell_operator

    a = maxwell_ell_operator(n_grid, n_grid, n_grid)
    rows = a.shape[0]
    out = []
    key = jax.random.PRNGKey(0)
    for p in [1] + NCOLS:
        x = jax.random.normal(key, (rows,) if p == 1 else (p, rows), dtype)
        # operator passed as a pytree ARG (not a closure constant)
        step = (lambda y, a: a.mv(y)) if p == 1 else (lambda y, a: a.mm(y))
        s = slope_time_chain(step, x, a)
        bs = jnp.dtype(dtype).itemsize
        nnz = a.padded_rows * a.width
        # reference model (spmv_spmm.cu): data + idx + x gathers + y write
        bytes_moved = nnz * (bs + 4) + rows * max(p, 1) * bs * 2
        flops = 2.0 * nnz * max(p, 1)
        out.append({"n_col": p, "rows": rows, "seconds": s,
                    "nnz_per_s": nnz * max(p, 1) / s,
                    "gbps": bytes_moved / s / 1e9,
                    "gflops": flops / s / 1e9})
    return out


def bench_spmm_dia(n_grid: int, dtype=jnp.float32):
    """DIA (diagonal-offset) SpMV/SpMM on a 2-D Laplacian — the gather-
    free fast path for assembled banded matrices (5 static shifted-slice
    multiply-adds; compare spmm_ell's XLA gather at the same sizes)."""
    from lanczos_tpu.models.laplacian import laplacian_2d_scipy
    from lanczos_tpu.ops.formats import dia_from_scipy

    a_sp = laplacian_2d_scipy(n_grid, n_grid)
    a = dia_from_scipy(a_sp, dtype=dtype)
    rows = a.shape[0]
    nnz = a_sp.nnz
    out = []
    key = jax.random.PRNGKey(0)
    for p in [1, 2, 4, 8]:
        x = jax.random.normal(key, (rows,) if p == 1 else (p, rows), dtype)
        step = (lambda y, a: a.mv(y)) if p == 1 else (lambda y, a: a.mm(y))
        s = slope_time_chain(step, x, a, damp=1e-1)
        bs = jnp.dtype(dtype).itemsize
        ndiag = len(a.offsets)
        bytes_moved = (ndiag + 2) * rows * max(p, 1) * bs  # shifted reads + y
        flops = 2.0 * nnz * max(p, 1)
        out.append({"n_col": p, "rows": rows, "ndiag": ndiag, "seconds": s,
                    "nnz_per_s": nnz * max(p, 1) / s,
                    "gbps": bytes_moved / s / 1e9,
                    "gflops": flops / s / 1e9})
    return out


def _pallas_copy(y):
    """y <- 1 - y through a Pallas grid pipeline — the MOSAIC roofline.

    Measured (quiet windows, v5e): XLA's fused elementwise streams
    read+write at ~675 GB/s total, but EVERY Pallas kernel that both
    reads and writes HBM — including this trivial copy, with any block
    shape, stream count, buffer depth, or hand-written async-DMA
    pipeline — caps at ~330 GB/s total on this chip (reads alone: 633;
    writes alone: 580).  A compute kernel therefore cannot beat this
    number, and kernel efficiency must be judged against it, not against
    the XLA copy (the stencil sits at ~93% of this ceiling)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shp = y.shape
    bm = 16 if shp[-2] % 16 == 0 else 8

    def k(c, o):
        o[...] = 1.0 - c[...]

    # lane-tile wide minor dims (a flat (8, 10M) state would otherwise be
    # one 336 MB block); any 128-multiple divisor works for a copy
    pt = shp[-1]
    while bm * pt * 4 > 4 * 1024 * 1024 and pt % 2 == 0 and (pt // 2) % 128 == 0:
        pt //= 2

    r = len(shp) - 2
    grid = tuple(shp[:r]) + (shp[-2] // bm, shp[-1] // pt)
    blk = (1,) * r + (bm, pt)
    imap = lambda *g: g[:-2] + (g[-2], g[-1])
    return pl.pallas_call(
        k, grid=grid,
        in_specs=[pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shp, y.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=jax.default_backend() == "cpu",
    )(y)


def bench_spmm_stencil(n_grid: int, dtype=jnp.float32):
    """Pallas Maxwell stencil SpMM (the TPU-native fast path).

    The shared/tunneled chip's deliverable bandwidth swings ~2x between
    measurement windows (observed 374-893 GB/s for the SAME copy kernel
    minutes apart), so a kernel number divided by a copy number from a
    DIFFERENT window is meaningless — round 3 published "41% of
    roofline" exactly that way.  Each row therefore carries a copy
    measurement of the same state footprint taken back-to-back in the
    same window (`copy_gbps_same_window`) and the ratio
    (`pct_of_copy`), which is the honest roofline figure."""
    from lanczos_tpu.models.maxwell_pallas import PallasMaxwellOperator

    op = PallasMaxwellOperator.create(n_grid, n_grid, n_grid, dtype=dtype, tz=16)
    damped = op.scaled(1e-2)  # damping folded into weights: no extra pass
    rows = op.n
    out = []
    key = jax.random.PRNGKey(0)
    for p in [1, 2, 4, 8]:
        x = op.pack(
            jax.random.normal(key, (rows,) if p == 1 else (p, rows), dtype)
        )
        step = (lambda y, a: a.mv(y)) if p == 1 else (lambda y, a: a.mm(y))
        s = slope_time_chain(step, x, damped, damp=None)
        # same-window copies of the same state footprint (read + write);
        # 1 - y is exact in bf16 (a *1.0000001 factor rounds to 1 and the
        # loop gets elided) and bounded for any chain length.  Two
        # ceilings: the XLA fused-elementwise copy (what the chip's HBM
        # can do) and the Pallas-pipeline copy (what any Pallas kernel
        # can do — ~half of the former on this chip; see _pallas_copy)
        s_copy = slope_time_chain(lambda y: 1.0 - y, x, damp=None)
        s_pcopy = slope_time_chain(lambda y: _pallas_copy(y), x, damp=None)
        bs = jnp.dtype(dtype).itemsize
        nnz = 4 * rows  # logical ELL width 4
        bytes_moved = 2 * rows * max(p, 1) * bs  # read x + write y only
        state_bytes = 2 * x.nbytes  # physical padded state, read + write
        flops = 2.0 * nnz * max(p, 1)
        out.append({"n_col": p, "rows": rows, "seconds": s,
                    "nnz_per_s": nnz * max(p, 1) / s,
                    "gbps": bytes_moved / s / 1e9,
                    "gflops": flops / s / 1e9,
                    "copy_gbps_same_window": state_bytes / s_copy / 1e9,
                    "pct_of_copy": 100.0 * s_copy / s,
                    "pallas_copy_gbps_same_window": state_bytes / s_pcopy / 1e9,
                    "pct_of_pallas_copy": 100.0 * s_pcopy / s})
    return out


def bench_spmm_stencil_bf16(n_grid: int):
    """bfloat16-state Pallas stencil SpMM: halves the HBM traffic of the
    memory-bound kernel (weights stay f32, f32 accumulation, one cast on
    store — ~1e-2 relative operator error from input quantization; the
    FDTD/expm streaming use case, not the orthogonality-critical one)."""
    return bench_spmm_stencil(n_grid, dtype=jnp.bfloat16)


def bench_copy_bw(rows: int, dtype=jnp.float32):
    """Measured copy-bandwidth roofline: y = x + 1 (one read + one write
    of the state) at the reference's SpMM state sizes — the
    speed-of-light denominator for every nnz/s and GB/s figure in this
    file (the reference computes analytic GB/s against nominal DRAM BW,
    `measurements/spmv_spmm.cu:419-446`; we record the MEASURED ceiling)."""
    out = []
    key = jax.random.PRNGKey(0)
    for p in [1, 4, 8]:
        # a (rows,) f32 state (98 MB) can stay RESIDENT on-chip across
        # fori_loop iterations and measures on-chip (not HBM) bandwidth
        # — the earlier artifact rows claimed an impossible 5.5-5.8 TB/s.
        # Pad the 1-D case to the p=4 footprint so every row streams HBM;
        # `y * c` (not `y + 1`) so XLA cannot strength-reduce the chain.
        n = rows * 4 if p == 1 else rows
        x = jax.random.normal(key, (n,) if p == 1 else (p, n), dtype)
        # y <- 1 - y: an involution (values stay bounded for any chain
        # length), exactly representable in EVERY dtype (y * 1.0000001
        # rounds to y * 1.0 in bf16 and XLA elides the whole loop), and
        # not strength-reducible
        s = slope_time_chain(lambda y: 1.0 - y, x, damp=None)
        bs = jnp.dtype(dtype).itemsize
        bytes_moved = 2 * n * max(p, 1) * bs
        # 'rows' is always the REQUESTED logical row count; the p=1 case
        # streams a 4x-padded state, recorded separately (a prior version
        # wrote the padded length into 'rows', which made merged old/new
        # artifacts incomparable — ADVICE r3)
        out.append({"n_col": p, "rows": rows, "rows_streamed": n,
                    "seconds": s, "copy_gbps": bytes_moved / s / 1e9})
    return out


def bench_spmm_windowed(n_grid: int, dtype=jnp.float32):
    """Windowed-ELL Pallas SpMM (the TPU-native fast path for ASSEMBLED
    general matrices — reference ell::SpMM, `spmv_spmm.hpp:138`) on the
    2-D Laplacian and the width-4 Maxwell ELL operator."""
    from lanczos_tpu.models.laplacian import laplacian_2d_scipy
    from lanczos_tpu.models.maxwell import maxwell_ell_operator
    from lanczos_tpu.ops.pallas.window_ell import (
        windowed_from_ell,
        windowed_from_scipy,
    )
    import numpy as np

    out = []
    key = jax.random.PRNGKey(0)
    from lanczos_tpu.models.maxwell import maxwell_interleave_perm

    fixtures = [
        ("laplacian_2d", windowed_from_scipy(
            laplacian_2d_scipy(n_grid, n_grid).astype(np.float32))),
        # structure-aware ordering: planes/chunk == ELL width (plain RCM
        # scrambles the k-th nonzeros across 128-blocks -> ~34
        # planes/chunk, ~7x more plane traffic)
        ("maxwell_w4", windowed_from_ell(
            maxwell_ell_operator(64, 64, 64),
            perm=maxwell_interleave_perm(64, 64, 64))),
        # same matrix through plain RCM: the ordering-sensitivity row
        ("maxwell_w4_rcm", windowed_from_ell(
            maxwell_ell_operator(64, 64, 64), reorder="rcm")),
    ]
    for name, a in fixtures:
        rows = a.shape[0]
        nnz = a.nnz
        for p in [1, 4, 8, 16]:
            x = a.pack(jax.random.normal(
                key, (rows,) if p == 1 else (p, rows), dtype))
            s = slope_time_chain(lambda y, a: a.padded_mm(y), x, a, damp=None)
            bs = jnp.dtype(dtype).itemsize
            # actual traffic: plane value+index streams + padded state r/w
            pp = max(8 * -(-p // 8), 8)
            bytes_moved = (
                a.planes_data.size * (bs + 4) + 2 * pp * a.n128 * bs
            )
            out.append({
                "fixture": name, "n_col": p, "rows": rows, "ppc": a.ppc,
                "seconds": s, "nnz_per_s": nnz * max(p, 1) / s,
                "gbps": bytes_moved / s / 1e9,
                "gflops": 2.0 * nnz * max(p, 1) / s / 1e9,
            })
    return out


def bench_spmm_bsr(n_grid: int, dtype=jnp.float32):
    """BSR SpMM (BASELINE config 3's format), block-ELL layout: batched
    MXU block products, fixed-width sum (no scatter).

    Two fixtures: `blockstruct` is a block-tridiagonal matrix with
    genuinely dense bs x bs blocks (the workload BSR exists for — zero
    fill-in); `laplacian_2d` documents the format-mismatch cost on a
    point matrix (5-22x zero fill-in inside the blocks).  For scattered
    matrices the windowed-ELL kernel is the recommended path."""
    import numpy as np
    import scipy.sparse as sp

    from lanczos_tpu.models.laplacian import laplacian_2d_scipy
    from lanczos_tpu.ops.formats import bsr_from_scipy

    out = []
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    lap = laplacian_2d_scipy(n_grid, n_grid)

    def blockstruct(bs):
        nbr = max(lap.shape[0] // bs, 2)
        tri = sp.diags([np.ones(nbr - 1), np.ones(nbr), np.ones(nbr - 1)],
                       [-1, 0, 1], format="csr")
        dense = rng.standard_normal((tri.nnz, bs, bs)) * 0.1
        # (data, indices, indptr) BSR constructor: block k of row-block i
        # sits at dense[indptr[i]:indptr[i+1]] — the coo-pair form only
        # accepts 1-D scalar data
        return sp.bsr_matrix(
            (dense, tri.indices, tri.indptr),
            shape=(nbr * bs, nbr * bs),
        ).tocsr()

    fixtures = [("blockstruct", blockstruct), ("laplacian_2d", lambda bs: lap)]
    for name, make in fixtures:
        for bs in [8, 16, 32] if name == "blockstruct" else [8]:
            a_sp = make(bs)
            a = bsr_from_scipy(a_sp, block_size=bs, dtype=dtype)
            rows = a.shape[0]
            nnz = a_sp.nnz
            for p in [4, 8]:
                x = jax.random.normal(key, (p, rows), dtype)
                s = slope_time_chain(lambda y, a: a.mm(y), x, a, damp=1e-1)
                bsz = jnp.dtype(dtype).itemsize
                stored = int(a.data.size)
                bytes_moved = stored * bsz + a.block_cols.size * 4 \
                    + 2 * rows * p * bsz
                out.append({
                    "fixture": name, "block_size": bs, "n_col": p,
                    "rows": rows, "stored_nnz": stored, "seconds": s,
                    "nnz_per_s": nnz * p / s,
                    "stored_nnz_per_s": stored * p / s,
                    "gbps": bytes_moved / s / 1e9,
                })
    return out


BENCHES = {
    "mm_tt": lambda args: bench_mm_tt(args.rows),
    "mm_tt2": lambda args: bench_mm_tt2(args.rows),
    "mm_ts": lambda args: bench_mm_ts(args.rows_ts),
    "sqrtm": lambda args: bench_sqrtm(),
    "sqrtm_newton": lambda args: bench_sqrtm(backend="newton"),
    "spmm_ell": lambda args: bench_spmm_ell(args.grid_ell),
    "spmm_dia": lambda args: bench_spmm_dia(args.grid_dia),
    "spmm_stencil": lambda args: bench_spmm_stencil(args.grid),
    "spmm_stencil_bf16": lambda args: bench_spmm_stencil_bf16(args.grid),
    "spmm_windowed": lambda args: bench_spmm_windowed(args.grid_dia),
    "spmm_bsr": lambda args: bench_spmm_bsr(args.grid_dia),
    "copy_bw": lambda args: bench_copy_bw(args.rows_copy),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)  # mm_tt ref size
    ap.add_argument("--rows-ts", type=int, default=3_000_000)  # mm_ts ref size
    ap.add_argument("--grid", type=int, default=160)  # spmv ref N=160
    ap.add_argument("--grid-ell", type=int, default=64)
    ap.add_argument("--grid-dia", type=int, default=1268)  # ~1.6M rows
    ap.add_argument("--rows-copy", type=int, default=24_600_000)  # ref state
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated subset of " + ",".join(BENCHES))
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--merge", action="store_true",
                    help="merge into an existing --json file")
    args = ap.parse_args()

    names = args.only.split(",") if args.only else list(BENCHES)
    results = {}
    if args.json and args.merge and os.path.exists(args.json):
        with open(args.json) as f:
            results = json.load(f)
    # measured copy roofline for the physical-plausibility guard: prefer a
    # fresh measurement from this run, else the existing artifact
    def _roofline(res):
        ents = res.get("copy_bw", [])
        vals = [e["copy_gbps"] for e in ents if e.get("n_col", 0) >= 4]
        return max(vals) if vals else 651.0

    for name in names:
        print(f"== {name} ==", flush=True)
        try:
            rows = BENCHES[name](args)
        except Exception as e:  # OOM/contention on one bench: keep going
            print(f"  FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        # REFUSE physically impossible rows (model GB/s above the measured
        # copy roofline can only mean the timing failed to resolve —
        # VERDICT r3 weak #3).  Applies to the campaigns whose gbps field
        # is a PHYSICAL traffic model; the mm_tt/mm_tt2/mm_ts gbps columns
        # reproduce the reference's analytic formulas, which double-count
        # operands by design (BASELINE.md note) and legitimately exceed
        # copy bandwidth.  A row carrying its own same-window copy
        # measurement is judged against THAT (the shared chip's
        # deliverable bandwidth swings ~2x between windows); others
        # against the artifact.
        _phys = name.startswith("spmm_") or name == "copy_bw"
        if _phys and name != "copy_bw" and jax.devices()[0].platform != "cpu":
            art_ceil = 1.05 * _roofline(results)
            bad = [
                r for r in rows
                if r.get("gbps", 0.0) > (
                    1.10 * r["copy_gbps_same_window"]
                    if "copy_gbps_same_window" in r
                    else art_ceil
                )
            ]
            if bad:
                raise SystemExit(
                    f"ROOFLINE VIOLATION in {name}: {bad[0]} exceeds the "
                    "same-window (or artifact) copy bandwidth ceiling — "
                    "timing did not resolve; not publishing"
                )
        results[name] = rows
        for r in rows:
            cells = "  ".join(
                f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in r.items()
            )
            print("  " + cells, flush=True)
        if args.json:  # incremental dump: a late crash loses nothing
            with open(args.json, "w") as f:
                json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
