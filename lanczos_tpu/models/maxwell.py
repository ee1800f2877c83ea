"""3-D staggered-grid ("Lee/Yee grid") Maxwell semi-discretization.

This is the reference's test operator (`source/matrix_a/build_A_ell.hpp:10`):
a curl-pair matrix ``D = [[0, Dh], [De, 0]]`` over the state ``u = [E; H]``
(six staggered field components), and a diagonal energy-weight matrix ``W``
such that ``A = D @ diag(w)`` is symmetric.  The reference assembles twelve
Kronecker-product curl blocks into one ELL matrix on the host and does a
gathered SpMV on the GPU.

TPU-native re-design: every block of ``A`` is ``sign * kron(F3, F2, F1)``
with exactly one bidiagonal 1-D factor (a scaled forward/backward
difference) and two diagonal factors.  So ``A @ u`` is a *separable stencil*
on six 3-D fields: two shifted-slice multiply-adds per block, no gather, no
index plane — contiguous VPU work with ~2.4x less HBM traffic than the
reference's ELL format (no 4-byte index per nonzero, and the separable
coefficients are O(N) instead of O(N^3)).

Two implementations are provided and cross-validated in tests:
  * `maxwell_scipy` / `assemble_maxwell_A`: explicit sparse assembly
    (NumPy/SciPy), the oracle, and the feed for the generic ELL/CSR/COO/BSR
    containers;
  * `MaxwellOperator`: the matrix-free stencil pytree (flagship fast path).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from lanczos_tpu.ops.operator import LinearOperator

# Component order: E1, E2, E3, H1, H2, H3 (matches reference state layout
# [E; H] produced by the `insert` calls in build_A_ell.hpp:190-212).
_E1, _E2, _E3, _H1, _H2, _H3 = range(6)


def _grids(nx: int, ny: int, nz: int, dtype=np.float64):
    """Primal/dual grid spacings (build_A_ell.hpp:22-45)."""

    def axis(n):
        npl = n + 2
        h = 1.0 / (npl - 1)
        xp = np.linspace(0.0, 1.0, npl, dtype=dtype)
        xd = np.linspace(0.0, 1.0 - h, npl - 1, dtype=dtype) + h / 2
        return np.diff(xp), np.diff(xd)  # (n+1,), (n,)

    dxp, dxd = axis(nx)
    dyp, dyd = axis(ny)
    dzp, dzd = axis(nz)
    return (dxp, dxd), (dyp, dyd), (dzp, dzd)


def maxwell_component_shapes(nx: int, ny: int, nz: int):
    """(z, y, x) shape of each of the six field components."""
    return (
        (nz, ny, nx + 1),      # E1
        (nz, ny + 1, nx),      # E2
        (nz + 1, ny, nx),      # E3
        (nz + 1, ny + 1, nx),  # H1
        (nz + 1, ny, nx + 1),  # H2
        (nz, ny + 1, nx + 1),  # H3
    )


def _component_weights(nx, ny, nz, dtype=np.float64):
    """Per-component separable energy weights (wz, wy, wx) with the H-field
    minus sign (build_A_ell.hpp:214-250, Wh.mult_scalar(-1) at :245) folded
    into the block signs by the caller."""
    (dxp, dxd), (dyp, dyd), (dzp, dzd) = _grids(nx, ny, nz, dtype)
    return [
        (dzd, dyd, dxp),  # E1
        (dzd, dyp, dxd),  # E2
        (dzp, dyd, dxd),  # E3
        (dzp, dyp, dxd),  # H1 (times -1)
        (dzp, dyd, dxp),  # H2 (times -1)
        (dzd, dyp, dxp),  # H3 (times -1)
    ]


# Each curl block of A: (out_comp, in_comp, sign, axis, kind)
#   axis: 0 = z, 1 = y, 2 = x — which 1-D factor is the bidiagonal
#   kind: "bwd" = X-type (out n+1, in n; taps at local offsets {0, -1},
#          values +-1/delta_p), "fwd" = X_hat-type (out n, in n+1; taps at
#          {0, +1}, values -+1/delta_d).  build_A_ell.hpp:85-97.
# The sign already includes the extra -1 for H-field column weights.
_BLOCKS = (
    # E rows  (Dh * (-wh)); Dh signs from build_A_ell.hpp:153-168
    (_E1, _H2, -1.0, 0, "fwd"),  # -Z_hat
    (_E1, _H3, +1.0, 1, "fwd"),  # +Y_hat
    (_E2, _H1, +1.0, 0, "fwd"),  # +Z_hat
    (_E2, _H3, -1.0, 2, "fwd"),  # -X_hat
    (_E3, _H1, -1.0, 1, "fwd"),  # -Y_hat
    (_E3, _H2, +1.0, 2, "fwd"),  # +X_hat
    # H rows  (De * we); De signs from build_A_ell.hpp:134-149
    (_H1, _E2, -1.0, 0, "bwd"),  # -Z
    (_H1, _E3, +1.0, 1, "bwd"),  # +Y
    (_H2, _E1, +1.0, 0, "bwd"),  # +Z
    (_H2, _E3, -1.0, 2, "bwd"),  # -X
    (_H3, _E1, -1.0, 1, "bwd"),  # -Y
    (_H3, _E2, +1.0, 2, "bwd"),  # +X
)


def _bidiag_taps(kind: str, delta_p: np.ndarray, delta_d: np.ndarray):
    """Taps (offset, coeff[out_len]) of the 1-D difference factor.

    "bwd": X = diag(1/delta_p) @ bidiag(n).T, shape (n+1, n):
        X[i, i]   = +1/delta_p[i]   (i < n)
        X[i, i-1] = -1/delta_p[i]   (i >= 1)
    "fwd": X_hat = -diag(1/delta_d) @ bidiag(n), shape (n, n+1):
        X_hat[i, i]   = -1/delta_d[i]
        X_hat[i, i+1] = +1/delta_d[i]
    (bidiag per build_ell_utils.hpp:123-138.)
    """
    if kind == "bwd":
        n = delta_d.shape[0]  # in-size
        out = n + 1
        c0 = np.zeros(out, delta_p.dtype)
        c0[:n] = 1.0 / delta_p[:n]
        cm = np.zeros(out, delta_p.dtype)
        cm[1:] = -1.0 / delta_p[1:]
        return ((0, c0), (-1, cm))
    else:
        n = delta_d.shape[0]  # out-size
        c0 = -1.0 / delta_d
        cp = 1.0 / delta_d
        return ((0, c0), (+1, cp))


def _build_taps(nx, ny, nz, dtype=np.float64):
    """Flatten the 12 blocks into 24 stencil taps.

    A tap is (out_comp, in_comp, axis, offset) static metadata plus three
    1-D weight arrays (wz, wy, wx) of the *output* component's axis sizes;
    the column weight of the input component is folded in:
    coeff_bidiag[i] *= w_in_axis[i + offset].
    """
    axes = _grids(nx, ny, nz, dtype)
    weights = _component_weights(nx, ny, nz, dtype)
    descs = []
    arrays = []
    for out_c, in_c, sign, ax, kind in _BLOCKS:
        dp, dd = axes[2 - ax]  # axes tuple is (x, y, z); ax 0 = z
        w_in = weights[in_c]
        for off, coef in _bidiag_taps(kind, dp, dd):
            per_axis = []
            for a in range(3):
                if a == ax:
                    c = coef.copy()
                    w = w_in[a]
                    # scale by input-column weight at shifted index
                    out_len = c.shape[0]
                    ii = np.arange(out_len) + off
                    valid = (ii >= 0) & (ii < w.shape[0])
                    c[valid] *= w[ii[valid]]
                    c[~valid] = 0.0
                    per_axis.append(c)
                else:
                    per_axis.append(w_in[a].copy())
            per_axis[0] = per_axis[0] * sign
            descs.append((out_c, in_c, ax, off))
            arrays.append(tuple(per_axis))
    return tuple(descs), arrays


@jax.tree_util.register_pytree_node_class
class MaxwellOperator(LinearOperator):
    """Matrix-free A = D @ diag(w) as 24 separable stencil taps."""

    def __init__(self, nx, ny, nz, descs, tap_arrays, dtype_name="float32"):
        self.nx, self.ny, self.nz = nx, ny, nz
        self.descs = descs
        self.tap_arrays = tap_arrays  # list of (wz, wy, wx) jnp arrays
        self.dtype_name = dtype_name
        self.comp_shapes = maxwell_component_shapes(nx, ny, nz)
        self.comp_sizes = tuple(int(np.prod(s)) for s in self.comp_shapes)
        self.n = int(sum(self.comp_sizes))

    @classmethod
    def create(cls, nx: int, ny: int, nz: int, dtype=jnp.float32) -> "MaxwellOperator":
        descs, arrays = _build_taps(nx, ny, nz, np.float64)
        jarrays = [
            tuple(jnp.asarray(a, dtype=dtype) for a in t) for t in arrays
        ]
        return cls(nx, ny, nz, descs, jarrays, np.dtype(dtype).name)

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def dtype(self):
        return jnp.dtype(self.dtype_name)

    # -- core stencil application ------------------------------------------

    def _split(self, u):
        parts = []
        o = 0
        extra = u.shape[1:]
        for s, sz in zip(self.comp_shapes, self.comp_sizes):
            parts.append(u[o : o + sz].reshape(s + extra))
            o += sz
        return parts

    def _apply(self, u):
        """Each input component is padded ONCE (all three spatial axes by
        one); every tap is then a static slice of that padded array, and
        each output component is a single fused 4-term multiply-add.

        TPU performance notes (measured on v5e):
          * the separable weights multiply the FULL-SIZE tap one axis at a
            time — forming the 3-D coefficient `wz*wy*wx` first creates
            lane-dim-1 broadcast intermediates that Mosaic handles ~100x
            slower than a fused chain of full-size x small multiplies;
          * callers must pass the operator as a jit ARGUMENT (all library
            methods do): closing over it turns the tap arrays into
            embedded constants, which this backend re-uploads per call.
        """
        xs = self._split(u)
        extra = u.shape[1:]
        nd_extra = len(extra)
        pad_width = [(1, 1)] * 3 + [(0, 0)] * nd_extra
        xpads: dict[int, jnp.ndarray] = {}
        contribs: list[list] = [[] for _ in range(6)]
        bshape = [
            (-1, 1, 1) + (1,) * nd_extra,
            (1, -1, 1) + (1,) * nd_extra,
            (1, 1, -1) + (1,) * nd_extra,
        ]
        for (out_c, in_c, ax, off), (wz, wy, wx) in zip(self.descs, self.tap_arrays):
            if in_c not in xpads:
                xpads[in_c] = jnp.pad(xs[in_c], pad_width)
            out_shape = self.comp_shapes[out_c]
            start = [1, 1, 1]
            start[ax] += off
            sl = tuple(
                slice(start[a], start[a] + out_shape[a]) for a in range(3)
            ) + (slice(None),) * nd_extra
            v = xpads[in_c][sl]
            v = v * wz.reshape(bshape[0])
            v = v * wy.reshape(bshape[1])
            v = v * wx.reshape(bshape[2])
            contribs[out_c].append(v)
        ys = [c[0] + c[1] + c[2] + c[3] for c in contribs]
        return jnp.concatenate(
            [y.reshape((-1,) + extra) for y in ys], axis=0
        )

    def mv(self, x):
        return self._apply(x)

    def mm(self, X):
        # Block-major (p, n): leading batch vmap keeps the spatial minor
        # dims' tiling intact per column.
        return jax.vmap(self._apply)(X)

    # -- pytree -------------------------------------------------------------

    def tree_flatten(self):
        flat = [a for t in self.tap_arrays for a in t]
        aux = (self.nx, self.ny, self.nz, self.descs, self.dtype_name)
        return flat, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        nx, ny, nz, descs, dtype_name = aux
        taps = [tuple(children[3 * i : 3 * i + 3]) for i in range(len(children) // 3)]
        return cls(nx, ny, nz, descs, taps, dtype_name)


# ---------------------------------------------------------------------------
# Explicit sparse assembly (oracle; feeds ELL/CSR/COO/BSR containers)
# ---------------------------------------------------------------------------


def _bidiag_dense(kind: str, dp: np.ndarray, dd: np.ndarray) -> np.ndarray:
    n = dd.shape[0]
    if kind == "bwd":
        m = np.zeros((n + 1, n))
        for i in range(n):
            m[i, i] = 1.0 / dp[i]
        for i in range(1, n + 1):
            m[i, i - 1] = -1.0 / dp[i]
        return m
    else:
        m = np.zeros((n, n + 1))
        for i in range(n):
            m[i, i] = -1.0 / dd[i]
            m[i, i + 1] = 1.0 / dd[i]
        return m


def maxwell_scipy(nx: int, ny: int, nz: int):
    """Assemble (D, w) with scipy: D the curl-pair matrix, w the signed
    diagonal weight vector; A = D @ diag(w).  Mirrors the *math* of
    build_A_ell.hpp:10-252 via Kronecker products."""
    import scipy.sparse as sp

    axes = _grids(nx, ny, nz, np.float64)
    weights = _component_weights(nx, ny, nz, np.float64)
    shapes = maxwell_component_shapes(nx, ny, nz)
    sizes = [int(np.prod(s)) for s in shapes]
    offsets = np.concatenate([[0], np.cumsum(sizes)])

    n = int(offsets[-1])
    blocks = []
    for out_c, in_c, sign, ax, kind in _BLOCKS:
        dp, dd = axes[2 - ax]
        bi = sp.csr_matrix(_bidiag_dense(kind, dp, dd))
        facs = []
        for a in range(3):
            if a == ax:
                facs.append(bi)
            else:
                facs.append(sp.identity(shapes[out_c][a], format="csr"))
        blk = sign * sp.kron(facs[0], sp.kron(facs[1], facs[2], format="csr"), format="csr")
        # raw D block (no column weights; sign here includes the -1 for H
        # columns, so compensate: D's own sign excludes the weight sign).
        blocks.append((out_c, in_c, blk))

    D = sp.lil_matrix((n, n))
    for (out_c, in_c, blk), (o2, i2, sgn, ax, kind) in zip(blocks, _BLOCKS):
        r0, c0 = offsets[out_c], offsets[in_c]
        # Undo the folded H-column sign to recover the raw D entries:
        s = -1.0 if in_c >= _H1 else 1.0
        D[r0 : r0 + blk.shape[0], c0 : c0 + blk.shape[1]] = blk * s

    w = np.concatenate(
        [
            (1.0 if c < _H1 else -1.0)
            * np.kron(weights[c][0], np.kron(weights[c][1], weights[c][2]))
            for c in range(6)
        ]
    )
    return D.tocsr(), w


def assemble_maxwell_A(nx: int, ny: int, nz: int):
    """A = D @ diag(w): the symmetric operator the Lanczos driver uses
    (test_lanczos.cu:45,191)."""
    import scipy.sparse as sp

    D, w = maxwell_scipy(nx, ny, nz)
    return (D @ sp.diags(w)).tocsr()


def maxwell_ell_operator(nx: int, ny: int, nz: int, row_pad: int = 8):
    """Assembled width-4 ELL Maxwell operator via the native (C++) engine
    — the gathered-SpMV counterpart of the matrix-free stencil, for
    benchmarking the generic ELL path at the reference's 24.6M-row sizes
    where the scipy Kron pipeline is impractical.  Falls back to scipy
    assembly + Python packing when the toolchain is unavailable."""
    import jax.numpy as jnp

    from lanczos_tpu import native
    from lanczos_tpu.ops.formats import EllMatrix, ell_from_scipy, _round_up

    shapes = maxwell_component_shapes(nx, ny, nz)
    n = int(sum(int(np.prod(s)) for s in shapes))
    rows_pad = _round_up(n, row_pad)
    descs, arrays = _build_taps(nx, ny, nz, np.float64)
    packed = native.maxwell_ell(descs, arrays, shapes, n, rows_pad)
    if packed is None:
        return ell_from_scipy(assemble_maxwell_A(nx, ny, nz), width=4,
                              row_pad=row_pad)
    data, idx = packed
    return EllMatrix(jnp.asarray(data), jnp.asarray(idx), n, n)


def maxwell_interleave_perm(nx: int, ny: int, nz: int) -> np.ndarray:
    """Symmetric z-interleaved ordering for the assembled Maxwell operator:
    unknowns sorted by (z, component, y, x) instead of the component-major
    natural layout.

    The natural layout puts each field component in its own contiguous
    block, so the curl coupling (E rows read H columns and vice versa,
    reference `build_A_ell.hpp:176-212` D = [0 Dh; De 0]) reaches ~n/2
    away — hopeless for any band-window kernel.  Plain RCM restores a
    small bandwidth but scrambles rows so the k-th nonzeros of adjacent
    rows land in different 128-blocks (measured ~34 planes/chunk in the
    windowed-ELL packing).  This analytic interleave gives BOTH: the
    band collapses to ~2 z-slabs AND 128 consecutive rows are one
    component's consecutive (y, x) run, so their k-th nonzeros share one
    window (planes/chunk == ELL width).  Use as
    `windowed_from_ell(ell, perm=maxwell_interleave_perm(...))`.
    """
    shapes = maxwell_component_shapes(nx, ny, nz)
    zs, cs, ys, xs = [], [], [], []
    for c, (sz, sy, sx) in enumerate(shapes):
        z, y, x = np.indices((sz, sy, sx)).reshape(3, -1)
        zs.append(z)
        ys.append(y)
        xs.append(x)
        cs.append(np.full(z.shape, c, np.int64))
    key = [np.concatenate(a) for a in (xs, ys, cs, zs)]
    return np.lexsort(key).astype(np.int64)  # last key (z) is primary
