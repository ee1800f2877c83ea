"""North-star configs 4-5: an assembled >=10M-row, >=100M-nnz
SuiteSparse-style banded SPD matrix through the windowed-ELL kernel and
block-Lanczos eigsh, end to end on one chip.

Reference counterpart: `measurements/spmv_spmm.cu:345` benchmarks the
gathered ELL SpMM at N=160 (24.6M rows); the whole-algorithm driver is
`tensor_core_unfinished_work/measure_lanczos.cu`.  This script records:

  * SpMM nnz/s on the padded chained path (the metric BASELINE.json
    judges against >=70%-of-roofline),
  * the measured copy-bandwidth roofline at the same state size (the
    denominator),
  * top-k Ritz values with true-beta_m residual bounds and the
    ITERATIONS-TO-CONVERGE curve (residual vs block steps, recovered
    from truncations of the block-tridiagonal T — no stored basis
    needed at this scale),
  * a .mtx round-trip proof on a small slab (io.py loaders).

The 8-device-mesh equivalence of the same operator is asserted in
`tests/test_dist_windowed.py` (CPU mesh); this script optionally runs the
distributed operator on a 1-device mesh to validate that code path on
real hardware (--dist).

Usage: python benchmarks/suitesparse_scale.py [--rows 10485760]
       [--json benchmarks/results/suitesparse_scale.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp


def synth_suitesparse_banded(n: int, seed: int = 0):
    """Synthetic SuiteSparse-style SPD matrix: 11 scattered diagonals
    (near + mid + far bands, like a high-order FD/FE discretization),
    random entries, diagonally dominant.  nnz ~ 11n."""
    rng = np.random.default_rng(seed)
    offsets = [0, 1, -1, 7, -7, 64, -64, 513, -513, 4999, -4999]
    offsets = [o for o in offsets if abs(o) < n]
    diags = []
    for o in offsets:
        ln = n - abs(o)
        if o == 0:
            diags.append(np.zeros(ln))  # filled below for dominance
        else:
            diags.append(rng.standard_normal(ln) * 0.5)
    a = sp.diags(diags, offsets, format="csr")
    a = 0.5 * (a + a.T)
    rowsum = np.abs(a).sum(axis=1).A1 if hasattr(np.abs(a).sum(axis=1), "A1") \
        else np.asarray(np.abs(a).sum(axis=1)).ravel()
    # separated dominant modes so top-k convergence is finite (a pure
    # random band has a clustered edge that no Krylov method resolves).
    # The spikes must clear the band continuum's edge (~2x the max row
    # sum) by a real gap, or the no-reorth f32 recurrence — the only
    # affordable mode at 10M rows — stalls before the tol is met.
    spikes = np.zeros(n)
    spikes[rng.choice(n, size=5, replace=False)] = [500, 450, 400, 350, 300]
    a = a + sp.diags(rowsum + 1.0 + spikes)
    return a.tocsr().astype(np.float32)


def convergence_curve(alphas, betas, beta_final, k, cluster_rtol=1e-4):
    """Residual bound of the top-k DISTINCT Ritz values for every
    truncation m' <= m, from the block-tridiagonal coefficients alone.

    With reorth='periodic' the basis stays orthogonal and the clustering
    is a no-op; it is kept so --reorth none runs (where converged
    eigenvalues spawn GHOST duplicates — loss of orthogonality, Paige's
    analysis) still report distinct values: cluster within `cluster_rtol`
    and keep each cluster's best-resid member."""
    from lanczos_tpu.ops.tridiag import assemble_block_tridiagonal

    m, p, _ = np.asarray(alphas).shape
    curve = []
    for mp in range(1, m + 1):
        t = np.asarray(
            assemble_block_tridiagonal(
                jnp.asarray(alphas[:mp]), jnp.asarray(betas[1:mp])
            )
        )
        w, s = np.linalg.eigh(t)
        bf = np.asarray(betas[mp]) if mp < m else np.asarray(beta_final)
        resid_all = np.linalg.norm(bf @ s[-p:, :], axis=0)
        order = np.argsort(w)[::-1]
        scale = abs(w[order[0]]) if len(order) else 1.0
        ritz, resid = [], []
        for i in order:
            if any(abs(w[i] - r) <= cluster_rtol * max(scale, 1.0)
                   for r in ritz):
                # ghost duplicate: keep the better residual for the cluster
                j = int(np.argmin([abs(w[i] - r) for r in ritz]))
                resid[j] = min(resid[j], float(resid_all[i]))
                continue
            ritz.append(float(w[i]))
            resid.append(float(resid_all[i]))
            if len(ritz) == k:
                break
        curve.append({"m": mp, "ritz": ritz, "resid": resid})
    return curve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_485_760)
    ap.add_argument("--p", type=int, default=8)
    ap.add_argument("--m", type=int, default=12)
    ap.add_argument("--reorth", default="full")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--tol", type=float, default=1e-3)
    ap.add_argument("--dist", action="store_true",
                    help="also run the sharded operator on a 1-device mesh")
    ap.add_argument("--json", type=str,
                    default="benchmarks/results/suitesparse_scale.json")
    args = ap.parse_args()

    from lanczos_tpu.methods.block_lanczos import block_lanczos
    from lanczos_tpu.ops.pallas.window_ell import (
        PaddedWindowedOperator,
        windowed_from_scipy,
    )
    from lanczos_tpu.utils.bench_loop import slope_time_chain

    out = {"rows": args.rows, "p": args.p, "m": args.m, "k": args.k}

    t0 = time.time()
    a = synth_suitesparse_banded(args.rows)
    out["nnz"] = int(a.nnz)
    print(f"assembled {a.shape[0]} rows, {a.nnz} nnz "
          f"({time.time()-t0:.1f}s)", flush=True)

    # .mtx round-trip proof on a small slab (config 4's file-based entry)
    from lanczos_tpu.io import load_sparse
    from scipy.io import mmwrite
    slab = a[:2000, :2000].tocoo()
    os.makedirs("benchmarks/results", exist_ok=True)
    mmwrite("benchmarks/results/_slab.mtx", slab)
    slab2 = load_sparse("benchmarks/results/_slab.mtx")
    assert abs(slab.tocsr() - slab2).max() < 1e-6
    os.remove("benchmarks/results/_slab.mtx")
    out["mtx_roundtrip"] = True
    print("mtx round-trip ok", flush=True)

    t0 = time.time()
    A = windowed_from_scipy(a, reorder="none")
    out["plan_seconds"] = time.time() - t0
    out["ppc"] = A.ppc
    out["wsz"] = A.wsz
    print(f"plan {out['plan_seconds']:.1f}s ppc={A.ppc} wsz={A.wsz} "
          f"ng={A.ng}", flush=True)

    rng = np.random.default_rng(0)
    X = rng.standard_normal((args.p, args.rows)).astype(np.float32)
    Xp = A.pack(jnp.asarray(X))

    # SpMM throughput + measured roofline at the same state size.  Fold
    # the anti-overflow scaling INTO the operator (scale its values once)
    # rather than damping the chain: ||A||~100 overflows f32 after ~20
    # undamped applications, while a `* damp` pass would add a full extra
    # read+write of the state per step and inflate the measurement.
    import dataclasses as _dc
    A_t = _dc.replace(A, planes_data=A.planes_data * (1.0 / 1024.0))
    sec = slope_time_chain(lambda y, A: A.padded_mm(y), Xp, A_t, damp=None)
    out["spmm_seconds"] = sec
    out["spmm_nnz_per_s"] = a.nnz * args.p / sec
    copy_sec = slope_time_chain(lambda y: 1.0 - y, Xp, damp=None)
    pp = Xp.shape[0]
    out["copy_gbps"] = 2 * pp * A.n128 * 4 / copy_sec / 1e9
    # the Pallas-pipeline ceiling at the same footprint (any Pallas
    # kernel that both reads and writes HBM caps at ~half the XLA copy
    # on this chip — see kernel_bench._pallas_copy)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from kernel_bench import _pallas_copy
    pcopy_sec = slope_time_chain(lambda y: _pallas_copy(y), Xp, damp=None)
    out["pallas_copy_gbps"] = 2 * pp * A.n128 * 4 / pcopy_sec / 1e9
    # kernel effective traffic vs those rooflines
    kernel_bytes = A.planes_data.size * 8 + 2 * pp * A.n128 * 4
    out["spmm_gbps"] = kernel_bytes / sec / 1e9
    out["spmm_pct_of_copy_bw"] = 100.0 * out["spmm_gbps"] / out["copy_gbps"]
    out["spmm_pct_of_pallas_copy"] = (
        100.0 * out["spmm_gbps"] / out["pallas_copy_gbps"]
    )
    print(f"spmm p={args.p}: {sec*1e3:.3f} ms  "
          f"{out['spmm_nnz_per_s']:.3e} nnz/s  "
          f"{out['spmm_gbps']:.0f} GB/s "
          f"({out['spmm_pct_of_copy_bw']:.0f}% of measured copy BW "
          f"{out['copy_gbps']:.0f} GB/s)", flush=True)

    # Whole-algorithm: m-step block Lanczos.  reorth='full' stores the
    # basis (m * p * n * 4B = 4 GB at the default 10.5M rows — fits HBM
    # next to the ~1.3 GB plane arrays) and is REQUIRED for correctness
    # here: with reorth='none' (or skipped-step 'periodic') the block
    # recurrence diverges once the well-separated top modes converge —
    # normalization amplifies the un-orthogonalized residual's noise and
    # Ritz values escape the spectrum (see block_lanczos's breakdown_tol
    # / replace_dead docstrings), unlike the scalar recurrence Paige's
    # analysis bounds.
    op = PaddedWindowedOperator(A)
    t0 = time.time()
    res = jax.block_until_ready(
        # TSQR normalization (never squares the condition number — the
        # sqrtm path diverges once the well-separated modes converge and
        # the residual Gram goes numerically singular), adaptive
        # dead-direction replacement (replace_dead: converged directions
        # are restarted as fresh basis-orthogonal vectors), newton sqrtm
        # only for the final-bound fallback paths.
        block_lanczos(op, Xp, args.m, reorth=args.reorth,
                      eig_backend="newton", normalize="qr",
                      breakdown_eps=1e-4, replace_dead=True)
    )
    out["lanczos_seconds"] = time.time() - t0
    curve = convergence_curve(
        np.asarray(res.alphas), np.asarray(res.betas),
        np.asarray(res.beta_final), args.k,
    )
    out["convergence"] = curve
    scale = max(abs(v) for v in curve[-1]["ritz"])
    iters = next(
        (c["m"] for c in curve if max(c["resid"]) < args.tol * scale),
        None,
    )
    out["iters_to_converge"] = iters
    out["top_ritz"] = curve[-1]["ritz"]
    out["final_resid_bound"] = curve[-1]["resid"]

    # MEASURED relative residuals ||A y - theta y|| / |theta| for the
    # published pairs (VERDICT r4 missing #3: the |beta_m S| numbers
    # above are BOUNDS from the T coefficients; after deflation/freeze
    # they can read 1e-22, which f32 cannot certify — this column is
    # the backward-error certificate, one extra SpMM per pair).
    # Computed from a SECOND run at m just past the convergence point:
    # the full-m basis (m * p * n * 4B ~ 4 GB at m=12) next to the
    # result copy blew the 16 GB HBM; m=6 > iters_to_converge=4 is where
    # the claim lives anyway and its basis is half the size.
    from lanczos_tpu.methods.eigs import ritz_residuals
    from lanczos_tpu.ops.tridiag import assemble_block_tridiagonal

    m_res = min(args.m, max((iters or args.m) + 2, 6))
    res2 = jax.block_until_ready(
        block_lanczos(op, Xp, m_res, reorth=args.reorth,
                      eig_backend="newton", normalize="qr",
                      breakdown_eps=1e-4, replace_dead=True,
                      store_basis=True)
    )
    t = np.asarray(assemble_block_tridiagonal(res2.alphas, res2.betas[1:]))
    w, s = np.linalg.eigh(t)
    order = np.argsort(w)[::-1]
    sel = []
    for i in order:
        if any(abs(w[i] - w[j]) <= 1e-4 * max(scale, 1.0) for j in sel):
            continue
        sel.append(i)
        if len(sel) == args.k:
            break
    basis_flat = np.asarray(res2.basis).reshape(m_res * Xp.shape[0], -1)
    vecs = jnp.asarray(
        basis_flat.T @ s[:, sel], jnp.float32
    )  # (n128, k)
    out["measured_resid_m"] = m_res
    op_meas = PaddedWindowedOperator(A)
    meas = np.asarray(
        ritz_residuals(op_meas, jnp.asarray(w[sel], jnp.float32), vecs)
    )
    out["measured_resid"] = [float(x) for x in meas]
    print(f"lanczos m={args.m}: {out['lanczos_seconds']:.1f}s  "
          f"top-{args.k} Ritz {out['top_ritz']}  "
          f"resid_bound {out['final_resid_bound']}  "
          f"measured_resid {out['measured_resid']}  "
          f"iters_to_{args.tol}rel: {iters}",
          flush=True)

    if args.dist:
        from lanczos_tpu.parallel.dist_windowed import halo_sharded_windowed
        from lanczos_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(min(len(jax.devices()), 8))
        Ad = halo_sharded_windowed(a, mesh, reorder="none")
        Xd = Ad.pad_vector(X[:, : args.rows])
        sec = slope_time_chain(lambda y, Ad: Ad.mm(y), Xd, Ad, damp=1e-2)
        out["dist_devices"] = int(np.prod(mesh.devices.shape))
        out["dist_spmm_nnz_per_s"] = a.nnz * args.p / sec
        print(f"dist({out['dist_devices']} dev) spmm: "
              f"{out['dist_spmm_nnz_per_s']:.3e} nnz/s", flush=True)

    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.json}", flush=True)


if __name__ == "__main__":
    main()
