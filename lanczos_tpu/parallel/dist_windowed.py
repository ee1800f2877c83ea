"""Row-sharded windowed-ELL operator: the multi-chip fast path for
ASSEMBLED general sparse matrices (BASELINE configs 4-5).

Combines the two round-1/round-2 designs:

* the per-shard compute is the Pallas windowed-ELL SpMM
  (`ops/pallas/window_ell.py`) — plane gathers from a VMEM band window,
  ~30x the XLA gather path;
* the cross-shard communication is the one-`ppermute`-per-neighbor halo
  exchange of `parallel/dist_operator.py` (O(halo) traffic per step,
  independent of n — the weak-scaling property the reference, being
  single-GPU, never had; reference `spmv_spmm.hpp` is the single-chip
  counterpart).

Distributed state layout ("padded-halo"): each shard holds an
(p, n128_local) strip ``[h zeros | local rows | h zeros | pad]`` and the
GLOBAL Krylov state is their concatenation, sharded over the last axis.
The halo slots are kept ZERO in the persistent state, so global dot/Gram
products over the padded state are exact (no double-counted boundary
rows, no masking pass); `mv`/`mm` write the freshly exchanged neighbor
rows into the halo slots of a functional copy, run the local Pallas
kernel, and the kernel's output is the next padded state directly —
no repack/reslice passes in the hot loop.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lanczos_tpu.ops.operator import LinearOperator
from lanczos_tpu.ops.pallas.window_ell import (
    LANES,
    WindowedEllMatrix,
    _assemble,
    _pack_planes,
    _round_up,
)
from lanczos_tpu.parallel.dist_operator import _shard_halo
from lanczos_tpu.parallel.mesh import ROWS_AXIS


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class HaloShardedWindowed(LinearOperator):
    """Row-sharded windowed-ELL; SpMV = ppermute halo strips + local
    Pallas band kernel.  Plan arrays are the n_dev shards' plans stacked
    on the leading axis (identical static meta across shards by
    construction) and sharded over it."""

    planes_data: jax.Array   # (n_dev * C_pad * ppc, 128), row-sharded
    planes_lidx: jax.Array
    planes_off: jax.Array    # (n_dev * nsteps, 8, spb)
    wb: jax.Array            # (n_dev * ng,)
    perm: jax.Array          # (n,) int32 RCM permutation or (0,)
    mesh: Mesh               # static
    halo: int
    rows_loc: int
    n_rows_true: int
    ppc: int
    cpb: int
    spg: int
    wsz: int
    n128: int                # per-shard padded strip length
    nnz_true: int
    axis: str = ROWS_AXIS
    interpret: bool | None = None

    @property
    def shape(self):
        return (self.n_rows_true, self.n_rows_true)

    @property
    def state_pspec(self):
        """PartitionSpec of ONE (flat) state vector: row-sharded."""
        return P(self.axis)

    @property
    def dtype(self):
        return self.planes_data.dtype

    @property
    def nnz(self) -> int:
        return self.nnz_true

    @property
    def n_dev(self) -> int:
        return int(np.prod(self.mesh.devices.shape))

    @property
    def state_len(self) -> int:
        """Global padded-state length (all shards' strips)."""
        return self.n_dev * self.n128

    @property
    def is_permuted(self) -> bool:
        return self.perm.shape[0] > 0

    # -- local (per-shard) kernel ----------------------------------------

    def _local_matrix(self, pd, pl_, po, wb):
        return WindowedEllMatrix(
            planes_data=pd, planes_lidx=pl_, planes_off=po, wb=wb,
            perm=jnp.zeros((0,), jnp.int32),
            n_rows_true=self.halo + self.rows_loc,
            n_cols_true=self.rows_loc + 2 * self.halo,
            ppc=self.ppc, cpb=self.cpb, spg=self.spg, wsz=self.wsz,
            n128=self.n128, nnz_true=self.nnz_true,
            interpret=self.interpret,
        )

    def _body(self, pd, pl_, po, wb, x):
        """Per-shard: exchange halo strips, run the band kernel.
        x: (p, n128) padded strip with ZERO halos.

        Single-hop (halo <= rows_loc) sends exactly the `h` boundary
        columns each way; wider bands exchange whole local blocks from
        k-th neighbors (statically sliced into place) — mirroring
        `dist_operator._halo_exchange`."""
        h, rl = self.halo, self.rows_loc
        n_dev = jax.lax.axis_size(self.axis)
        if h and n_dev > 1:
            hops = -(-h // rl)
            if hops == 1:
                fwd = [(i, i + 1) for i in range(n_dev - 1)]
                bwd = [(i + 1, i) for i in range(n_dev - 1)]
                from_left = jax.lax.ppermute(
                    x[:, h + rl - h : h + rl], self.axis, fwd
                )
                from_right = jax.lax.ppermute(
                    x[:, h : 2 * h], self.axis, bwd
                )
                x = jax.lax.dynamic_update_slice(x, from_left, (0, 0))
                x = jax.lax.dynamic_update_slice(
                    x, from_right, (0, h + rl)
                )
            else:
                local = x[:, h : h + rl]
                for k in range(1, hops + 1):
                    fwd = [(i, i + k) for i in range(n_dev - k)]
                    blk = jax.lax.ppermute(local, self.axis, fwd)
                    lo = h - k * rl  # xin range [lo, lo + rl)
                    s = max(0, -lo)
                    x = jax.lax.dynamic_update_slice(
                        x, blk[:, s:], (0, max(lo, 0))
                    )
                    bwd = [(i + k, i) for i in range(n_dev - k)]
                    blk = jax.lax.ppermute(local, self.axis, bwd)
                    # right halo occupies xin[h+rl : 2h+rl); the k-th
                    # right neighbor's block covers [h+k*rl, h+(k+1)*rl)
                    start = h + k * rl
                    keep = min(rl, 2 * h + rl - start)
                    x = jax.lax.dynamic_update_slice(
                        x, blk[:, :keep], (0, start)
                    )
        p = x.shape[0]
        pp = _round_up(max(p, 1), 8)
        if pp != p:
            x = jnp.concatenate(
                [x, jnp.zeros((pp - p,) + x.shape[1:], x.dtype)], axis=0
            )
        a_loc = self._local_matrix(pd, pl_, po, wb)
        out = a_loc.padded_mm(x)
        return out[:p]

    def _mapped(self):
        return jax.shard_map(
            functools.partial(self._body),
            mesh=self.mesh,
            in_specs=(
                P(self.axis, None),
                P(self.axis, None),
                P(self.axis, None, None),
                P(self.axis),
                P(None, self.axis),
            ),
            out_specs=P(None, self.axis),
            # pallas_call's out_shape carries no varying-mesh-axes info;
            # correctness is covered by the equivalence tests
            check_vma=False,
        )

    def mv(self, x: jax.Array) -> jax.Array:
        return self.mm(x[None, :])[0]

    def mm(self, X: jax.Array) -> jax.Array:
        """X: (p, state_len) padded-halo GLOBAL state (see pad_vector)."""
        return self._mapped()(
            self.planes_data, self.planes_lidx, self.planes_off,
            self.wb, X,
        )

    # -- state helpers (host-side, setup/teardown only) -------------------

    def pad_vector(self, b) -> jax.Array:
        """Natural-ordering (n,) or (p, n) -> sharded padded-halo state."""
        b = np.asarray(b)
        vec = b.ndim == 1
        if vec:
            b = b[None]
        if self.is_permuted:
            b = b[:, np.asarray(self.perm)]
        p = b.shape[0]
        out = np.zeros((p, self.state_len), b.dtype)
        h, rl, n1 = self.halo, self.rows_loc, self.n128
        for d in range(self.n_dev):
            lo = d * rl
            hi = min(lo + rl, self.n_rows_true)
            if hi > lo:
                out[:, d * n1 + h : d * n1 + h + (hi - lo)] = b[:, lo:hi]
        arr = jnp.asarray(out)
        spec = P(None, self.axis)
        arr = jax.device_put(arr, NamedSharding(self.mesh, spec))
        return arr[0] if vec else arr

    def unpad_vector(self, y) -> jax.Array:
        """Inverse of pad_vector (back to natural ordering/length)."""
        y = np.asarray(y)
        vec = y.ndim == 1
        if vec:
            y = y[None]
        h, rl, n1 = self.halo, self.rows_loc, self.n128
        cols = []
        for d in range(self.n_dev):
            lo = d * rl
            hi = min(lo + rl, self.n_rows_true)
            if hi > lo:
                cols.append(y[:, d * n1 + h : d * n1 + h + (hi - lo)])
        out = np.concatenate(cols, axis=1)
        if self.is_permuted:
            inv = np.argsort(np.asarray(self.perm))
            out = out[:, inv]
        out = jnp.asarray(out)
        return out[0] if vec else out

    def local_index(self, i: int) -> int:
        """Padded-state position of natural-ordering index i (for lc)."""
        if self.is_permuted:
            i = int(np.argsort(np.asarray(self.perm))[i])
        d, r = divmod(i, self.rows_loc)
        return d * self.n128 + self.halo + r

    def tree_flatten(self):
        return (
            (
                self.planes_data, self.planes_lidx, self.planes_off,
                self.wb, self.perm,
            ),
            (
                self.mesh, self.halo, self.rows_loc, self.n_rows_true,
                self.ppc, self.cpb, self.spg, self.wsz, self.n128,
                self.nnz_true, self.axis, self.interpret,
            ),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def halo_sharded_windowed(
    a,
    mesh: Mesh,
    dtype=jnp.float32,
    axis: str = ROWS_AXIS,
    reorder: str = "auto",
    cpb: int = 16,
    spg: int = 16,
    ppc_cap: int = 48,
    wsz_cap: int = 1 << 20,
    interpret: bool | None = None,
) -> HaloShardedWindowed:
    """Build from a scipy matrix: RCM (optional) -> row blocks -> one
    windowed plan per shard with column coordinates in the halo-extended
    local window, unified to shared static meta."""
    import scipy.sparse as sp

    if not sp.issparse(a):
        a = sp.csr_matrix(np.asarray(a))
    a = a.tocsr()
    a.sum_duplicates()
    n, m = a.shape
    if n != m:
        raise ValueError("operator must be square")
    if reorder not in ("none", "rcm", "auto"):
        raise ValueError(f"unknown reorder={reorder!r}")
    n_dev = int(np.prod(mesh.devices.shape))
    rows_loc = _round_up(-(-n // n_dev), LANES)

    perm = None
    halo = _shard_halo(a, rows_loc)
    if reorder == "rcm" or (reorder == "auto" and halo > rows_loc):
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        perm = np.asarray(reverse_cuthill_mckee(a, symmetric_mode=True))
        a = a[perm][:, perm].tocsr()
        a.sum_duplicates()
        halo = _shard_halo(a, rows_loc)
    hops = -(-halo // rows_loc) if halo else 0
    # _body's exchange reaches k-th neighbors for k = 1..n_dev-1, so any
    # hops <= n_dev - 1 is feasible (hops == 1 on a 2-device mesh is the
    # ordinary nearest-neighbor ppermute).
    if hops >= n_dev:
        raise ValueError(
            f"halo={halo} needs {hops} neighbor hops on a {n_dev}-device "
            "mesh even after reordering — use gather_sharded_ell"
        )
    npdt = np.dtype(dtype)

    # per-shard packs (shared geometry: h zero rows + local block; column
    # space = halo-extended window)
    packs = []
    n_rows_plan = halo + rows_loc
    ext = rows_loc + 2 * halo
    for d in range(n_dev):
        lo, hi = d * rows_loc, min((d + 1) * rows_loc, n)
        blk = a[lo:hi] if hi > lo else sp.csr_matrix((0, m), dtype=npdt)
        blk = sp.vstack(
            [
                sp.csr_matrix((halo, m), dtype=npdt),
                blk,
                sp.csr_matrix((n_rows_plan - halo - (hi - lo), m),
                              dtype=npdt),
            ]
        ).tocsr()
        # shift columns into the extended-window coordinate system
        blk = blk.tocoo()
        cols = blk.col.astype(np.int64) - (lo - halo)
        assert cols.min(initial=0) >= 0 and cols.max(initial=0) < ext
        blk = sp.csr_matrix(
            (blk.data.astype(npdt), (blk.row, cols)),
            shape=(n_rows_plan, ext),
        )
        blk.sum_duplicates()
        packs.append(
            _pack_planes(blk.indptr, blk.indices, blk.data, n_rows_plan,
                         ppc_cap)
        )

    # unify ppc across shards (zero-plane padding)
    ppc = max(pd.shape[1] for pd, _, _ in packs)
    mats = []
    for pd, pl_, pf in packs:
        if pd.shape[1] < ppc:
            e = ppc - pd.shape[1]
            nc = pd.shape[0]
            pd = np.concatenate(
                [pd, np.zeros((nc, e, LANES), pd.dtype)], axis=1)
            pl_ = np.concatenate(
                [pl_, np.zeros((nc, e, LANES), pl_.dtype)], axis=1)
            pf = np.concatenate(
                [pf, np.full((nc, e), -1, pf.dtype)], axis=1)
        mats.append(
            _assemble(pd, pl_, pf, n_rows_plan, ext, int(a.nnz),
                      cpb, spg, wsz_cap, interpret)
        )
    # unify wsz/n128 across shards: _assemble derives them from each
    # shard's own band; re-run with the joint maxima via direct fix-up
    wsz = max(A.wsz for A in mats)
    n128 = max(A.n128 for A in mats)
    if len({A.ppc for A in mats}) != 1:
        raise AssertionError("ppc must be uniform after padding")
    if any(A.wsz != wsz or A.n128 != n128 for A in mats):
        # rebuild each shard at the shared window size: clamp wb against
        # the shared n128 and recompute offsets (cheap numpy fix-up)
        fixed = []
        for (pd, pl_, pf), A in zip(packs, mats):
            if pd.shape[1] < ppc:
                e = ppc - pd.shape[1]
                nc = pd.shape[0]
                pd = np.concatenate(
                    [pd, np.zeros((nc, e, LANES), pd.dtype)], axis=1)
                pl_ = np.concatenate(
                    [pl_, np.zeros((nc, e, LANES), pl_.dtype)], axis=1)
                pf = np.concatenate(
                    [pf, np.full((nc, e), -1, pf.dtype)], axis=1)
            fixed.append(
                _assemble(pd, pl_, pf, n_rows_plan, ext, int(a.nnz),
                          cpb, spg, wsz_cap, interpret,
                          force_wsz=wsz, force_n128=n128)
            )
        mats = fixed

    ref = mats[0]
    return HaloShardedWindowed(
        planes_data=jnp.asarray(
            np.concatenate([np.asarray(A.planes_data) for A in mats])),
        planes_lidx=jnp.asarray(
            np.concatenate([np.asarray(A.planes_lidx) for A in mats])),
        planes_off=jnp.asarray(
            np.concatenate([np.asarray(A.planes_off) for A in mats])),
        wb=jnp.asarray(np.concatenate([np.asarray(A.wb) for A in mats])),
        perm=jnp.asarray(
            np.zeros((0,), np.int32) if perm is None
            else perm.astype(np.int32)),
        mesh=mesh,
        halo=halo,
        rows_loc=rows_loc,
        n_rows_true=n,
        ppc=ref.ppc,
        cpb=cpb,
        spg=spg,
        wsz=wsz,
        n128=ref.n128,
        nnz_true=int(a.nnz),
        axis=axis,
        interpret=interpret,
    )
