"""Fast SpMM + eigsh on a GENERAL assembled sparse matrix.

The windowed-ELL Pallas kernel is the framework's fast path for matrices
that arrive assembled (CSR/.mtx/SuiteSparse downloads) rather than as a
separable stencil — the analogue of the reference's `change_order(4)` +
`ell::SpMM` pipeline (`source/kernels/spmv_spmm.hpp:106-199`), re-designed
for the TPU: the host-side planner (C++/OpenMP via ctypes, NumPy
fallback) re-packs the matrix into 128-lane planes over banded windows,
and the kernel streams one band window per group through VMEM with
double-buffered DMA.

    python examples/windowed_general_matrix.py [matrix.mtx]
"""

import sys

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np

import lanczos_tpu as lt


def main():
    if len(sys.argv) > 1:
        a_sp = lt.load_sparse(sys.argv[1]).tocsr()  # any .mtx / .npz
    else:  # synthetic banded SPD demo matrix
        import scipy.sparse as sp

        rng = np.random.default_rng(0)
        n = 200_000
        offs = [0, 1, -1, 7, -7, 64, -64]
        a_sp = sp.diags(
            [rng.standard_normal(n - abs(o)) * 0.3 for o in offs], offs
        ).tocsr()
        a_sp = 0.5 * (a_sp + a_sp.T)
        a_sp.setdiag(np.abs(a_sp).sum(axis=1).A1 + 1.0)
        a_sp = a_sp.tocsr()

    # RCM reordering is applied automatically when the band would blow the
    # VMEM window; the operator then represents P A P^T (same spectrum).
    a = lt.windowed_from_scipy(a_sp.astype(np.float32))
    print(f"{a_sp.shape[0]} rows, {a_sp.nnz} nnz -> "
          f"{a.ppc} planes/chunk, window {a.wsz}")

    x = np.random.default_rng(1).standard_normal(a_sp.shape[0])
    y = a.unpermute(a.mv(a.permute(jnp.asarray(x, jnp.float32))))
    err = np.linalg.norm(np.asarray(y) - a_sp @ x) / np.linalg.norm(a_sp @ x)
    print(f"SpMV vs scipy rel err: {err:.2e}")

    # top-5 eigenvalues by block Lanczos on the padded zero-copy path
    op = lt.PaddedWindowedOperator(a)
    b = a.pack(jnp.asarray(
        np.random.default_rng(2).standard_normal((8, a_sp.shape[0])),
        jnp.float32,
    ))
    vals, _, resid = lt.block_lanczos_eigsh(
        op, b, m=20, k=5, which="LA", reorth="periodic",
        eig_backend="newton",
    )
    print("top-5 Ritz values:", np.asarray(vals))
    print("residual bounds  :", np.asarray(resid))


if __name__ == "__main__":
    main()
