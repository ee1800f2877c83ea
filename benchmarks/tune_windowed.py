"""Geometry tuning sweep for the windowed-ELL Pallas SpMM.

Sweeps the kernel's static geometry — chunks per grid step (cpb) and
steps per group (spg, which with cpb fixes the band-window DMA
granularity) — on a banded fixture, and prints nnz/s + %-of-measured-
copy-BW per point.  The defaults (16, 16) were chosen on CPU interpret
timings in round 2; this finds the real-chip optimum.

Usage: python benchmarks/tune_windowed.py [--rows 2097152] [--p 8]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_097_152)
    ap.add_argument("--p", type=int, default=8)
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    from benchmarks.suitesparse_scale import synth_suitesparse_banded
    from lanczos_tpu.ops.pallas.window_ell import windowed_from_scipy
    from lanczos_tpu.utils.bench_loop import slope_time_chain

    a_sp = synth_suitesparse_banded(args.rows)
    print(f"{a_sp.shape[0]} rows, {a_sp.nnz} nnz", flush=True)
    rng = np.random.default_rng(0)
    X = rng.standard_normal((args.p, args.rows)).astype(np.float32)

    rows = []
    import dataclasses as _dc
    for cpb in (8, 16, 32):
        for spg in (4, 8, 16, 32):
            try:
                A = windowed_from_scipy(a_sp, cpb=cpb, spg=spg,
                                        reorder="none")
            except Exception as e:
                print(f"cpb={cpb} spg={spg}: plan failed {e}", flush=True)
                continue
            At = _dc.replace(A, planes_data=A.planes_data * (1.0 / 1024.0))
            Xp = A.pack(jnp.asarray(X))
            try:
                sec = slope_time_chain(
                    lambda y, A: A.padded_mm(y), Xp, At, damp=None
                )
            except Exception as e:
                print(f"cpb={cpb} spg={spg}: run failed "
                      f"{str(e)[:120]}", flush=True)
                continue
            copy_sec = slope_time_chain(lambda y: y * 1.0000001, Xp,
                                        damp=None)
            pp = Xp.shape[0]
            copy_gbps = 2 * pp * A.n128 * 4 / copy_sec / 1e9
            nnzs = a_sp.nnz * args.p / sec
            kernel_bytes = A.planes_data.size * 8 + 2 * pp * A.n128 * 4
            pct = 100.0 * (kernel_bytes / sec / 1e9) / copy_gbps
            row = {"cpb": cpb, "spg": spg, "ppc": A.ppc, "wsz": A.wsz,
                   "seconds": sec, "nnz_per_s": nnzs,
                   "pct_of_copy_bw": pct}
            rows.append(row)
            print(f"cpb={cpb} spg={spg} ppc={A.ppc} wsz={A.wsz}: "
                  f"{sec*1e3:.3f} ms  {nnzs:.3e} nnz/s  "
                  f"{pct:.0f}% of copy BW", flush=True)

    if rows:
        best = max(rows, key=lambda r: r["nnz_per_s"])
        print("best:", json.dumps(best))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
