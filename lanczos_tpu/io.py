"""Matrix IO: load external sparse matrices into the framework.

The north-star configs (BASELINE.json 4-5) run block Lanczos on
SuiteSparse matrices; this module loads Matrix Market (`.mtx`, the
SuiteSparse interchange format) and scipy `.npz` files and builds any of
the containers or row-sharded distributed operators from them.

`scipy.io.mmread` in this environment is backed by the native
fast_matrix_market C++ parallel parser (measured ~0.8 s for a 10M-entry
file), so no custom loader is needed; a hand-rolled chunk-parallel C++
parser was benchmarked at 7x SLOWER and removed.
"""

from __future__ import annotations

import os

import numpy as np


def load_sparse(path: str):
    """Load a sparse matrix from .mtx/.mtx.gz (Matrix Market) or .npz
    (scipy.sparse.save_npz).  Returns scipy CSR."""
    import scipy.sparse as sp

    low = path.lower()
    if low.endswith(".npz"):
        return sp.load_npz(path).tocsr()
    if low.endswith((".mtx", ".mtx.gz")):
        from scipy.io import mmread

        a = mmread(path)
        # 'array'-format files come back as a dense ndarray (no .tocsr)
        return sp.csr_matrix(a) if not sp.issparse(a) else a.tocsr()
    raise ValueError(f"unknown sparse matrix format: {path}")


def operator_from_file(
    path: str,
    *,
    format: str = "ell",
    dtype=None,
    mesh=None,
    reorder: str = "auto",
):
    """Build a ready-to-use operator from a matrix file.

    format: "ell" | "csr" | "coo" | "bsr" | "dia" (single-chip XLA
    containers) | "windowed" (the Pallas band-window fast path for
    assembled matrices) | "auto" (performance-ordered selection, see
    below), or with `mesh` given: "halo" (banded row-sharded ELL,
    ppermute halo exchange) | "windowed" (row-sharded Pallas fast path)
    | "gather" (arbitrary sparsity, all-gather) | "auto".

    "auto" picks by measured TPU kernel rates: a matrix whose nonzeros
    lie on few distinct diagonals goes to DIA (gather-free shifted
    slices, ~at the copy-bandwidth roofline); anything else banded
    enough to plan goes to the windowed-ELL Pallas kernel; the gathered
    ELL container is the last resort (XLA gathers do not map to TPU
    tiles — orders of magnitude slower).
    """
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.float32
    a = load_sparse(path)

    if format == "auto":
        return auto_operator(a, dtype=dtype, mesh=mesh, reorder=reorder)

    if mesh is not None:
        from lanczos_tpu.parallel import gather_sharded_ell, halo_sharded_ell
        from lanczos_tpu.parallel.dist_windowed import halo_sharded_windowed

        if format in ("halo", "ell"):
            return halo_sharded_ell(a, mesh, dtype=dtype, reorder=reorder)
        if format == "windowed":
            return halo_sharded_windowed(
                a, mesh, dtype=dtype, reorder=reorder
            )
        if format == "gather":
            return gather_sharded_ell(a, mesh, dtype=dtype)
        raise ValueError(f"unknown distributed format {format!r}")

    if format == "windowed":
        from lanczos_tpu.ops.pallas.window_ell import windowed_from_scipy

        return windowed_from_scipy(a, dtype=dtype, reorder=reorder)

    from lanczos_tpu.ops import formats as F

    builders = {
        "ell": F.ell_from_scipy,
        "csr": F.csr_from_scipy,
        "coo": F.coo_from_scipy,
        "bsr": F.bsr_from_scipy,
        "dia": F.dia_from_scipy,
    }
    if format not in builders:
        raise ValueError(f"unknown format {format!r}")
    return builders[format](a, dtype=dtype)


def auto_operator(a, *, dtype=None, mesh=None, reorder: str = "auto",
                  max_diags: int = 32):
    """Performance-ordered operator selection for an assembled scipy
    matrix (see `operator_from_file(format="auto")`): DIA when the
    nonzeros lie on <= max_diags distinct diagonals, else the
    windowed-ELL Pallas kernel, else gathered ELL."""
    import jax.numpy as jnp

    import scipy.sparse as sp

    if dtype is None:
        dtype = jnp.float32
    a = a.tocsr() if sp.issparse(a) else sp.csr_matrix(np.asarray(a))

    coo = a.tocoo()
    ndiag = len(np.unique(coo.col.astype(np.int64) - coo.row)) if coo.nnz \
        else 1

    if mesh is None:
        from lanczos_tpu.ops import formats as F

        if a.shape[0] == a.shape[1] and ndiag <= max_diags:
            return F.dia_from_scipy(a, dtype=dtype)
        from lanczos_tpu.ops.pallas.window_ell import (
            PlanError,
            windowed_from_scipy,
        )

        try:
            return windowed_from_scipy(a, dtype=dtype, reorder=reorder)
        except PlanError:
            return F.ell_from_scipy(a, dtype=dtype)

    from lanczos_tpu.ops.pallas.window_ell import PlanError
    from lanczos_tpu.parallel import gather_sharded_ell, halo_sharded_ell
    from lanczos_tpu.parallel.dist_windowed import halo_sharded_windowed

    try:
        return halo_sharded_windowed(a, mesh, dtype=dtype, reorder=reorder)
    except (PlanError, ValueError):
        try:
            return halo_sharded_ell(a, mesh, dtype=dtype, reorder=reorder)
        except ValueError:
            return gather_sharded_ell(a, mesh, dtype=dtype)
