"""Pallas-kernel Maxwell operator on the stacked folded-plane state.

The flagship TPU fast path.  The state vector is not a flat (n,) array but
a single stacked tensor ``(6, Zc, P)``: six field components, z as the
major axis, and the (y, x) plane folded into the lane axis (P a multiple
of 128 — 0.2% physical tile waste vs ~57% for a raw 161-lane minor dim).
Component interiors sit at offset (z=tz, y=1, x=1) inside zero pads; every
Lanczos axpy/dot runs on this tensor directly at full lane utilization,
and A @ u is the separable-stencil Pallas kernel
(`lanczos_tpu/ops/pallas/stencil_kernel.py`).

Replaces the reference's assembled-ELL + gathered SpMV/SpMM pipeline
(`build_A_ell.hpp:10` + `spmv_spmm.hpp:106-199`) with a zero-index-traffic
formulation; same operator A = D @ diag(w) to rounding (cross-validated
against `MaxwellOperator` / scipy in tests).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lanczos_tpu.models.maxwell import (
    _build_taps,
    maxwell_component_shapes,
)
from lanczos_tpu.ops.operator import LinearOperator
from lanczos_tpu.ops.pallas import StencilSpec, apply_stencil_pair


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


Z_OFF = 8  # z-storage row of the first interior plane (8 = f32 sublane tile)


@jax.tree_util.register_pytree_node_class
class PallasMaxwellOperator(LinearOperator):
    """A = D @ diag(w) as a Pallas separable stencil on stacked fields."""

    def __init__(self, nx, ny, nz, weights, specs, dtype_name="float32"):
        self.nx, self.ny, self.nz = nx, ny, nz
        # weights = (wz_t, wplane_s): stacked per half for the fused pair
        # kernel — wz_t (2, Zc, n_taps) transposed z-weights, wplane_s
        # (2, n_taps, P).  specs = (spec_e, spec_h)
        self.wz_t, self.wplane_s = weights
        self.spec_e, self.spec_h = specs
        self.spec = specs[0]  # geometry reference (zc/plane/tz shared)
        self.dtype_name = dtype_name
        self.comp_shapes = maxwell_component_shapes(nx, ny, nz)
        self.comp_sizes = tuple(int(np.prod(s)) for s in self.comp_shapes)
        self.n = int(sum(self.comp_sizes))
        self.xc = nx + 3
        self.yc = ny + 3

    @classmethod
    def create(
        cls, nx: int, ny: int, nz: int, dtype=jnp.float32, tz: int | None = None
    ) -> "PallasMaxwellOperator":
        """tz must be a multiple of the dtype's sublane tile (8 for f32,
        16 for bf16; default 16 — the measured single-chip sweet spot).

        dtype=bfloat16 halves the state's HBM traffic for SpMM/FDTD-style
        streaming; weights stay f32 and the kernel accumulates in f32,
        casting once on store (~1e-2 relative operator error from input
        quantization — use f32 when Lanczos orthogonality matters)."""
        eb = 16 if jnp.dtype(dtype) == jnp.bfloat16 else 8
        if tz is None:
            tz = 16
        if tz % eb:
            raise ValueError(f"tz must be a multiple of {eb} for {dtype}")
        wdtype = jnp.float32 if jnp.dtype(dtype) == jnp.bfloat16 else dtype
        descs, arrays = _build_taps(nx, ny, nz, np.float64)
        shapes = maxwell_component_shapes(nx, ny, nz)
        xc, yc = nx + 3, ny + 3
        plane = _round_up(yc * xc, 128)
        z_ext_max = nz + 1
        # Trimmed layout: interior at z-row Z_OFF with >=1 zero-weight row
        # before/after (the pair kernel's clamped edge reads only ever
        # multiply the zero weights at rows 0 / zc-1).
        zc = _round_up(Z_OFF + z_ext_max + 1, tz)

        halves = {"e": {"wz": [], "wp": [], "taps": []},
                  "h": {"wz": [], "wp": [], "taps": []}}
        for (out_c, in_c, ax, off), (wz_l, wy_l, wx_l) in zip(descs, arrays):
            zlen, ylen, xlen = shapes[out_c]
            row_z = np.zeros(zc, np.dtype(wdtype))
            row_z[Z_OFF : Z_OFF + zlen] = wz_l
            wp = np.zeros((yc, xc))
            wp[1 : 1 + ylen, 1 : 1 + xlen] = np.outer(wy_l, wx_l)
            row_p = np.zeros(plane, np.dtype(wdtype))
            row_p[: yc * xc] = wp.reshape(-1)
            if ax == 0:
                dz, roll = off, 0
            elif ax == 1:
                dz, roll = 0, (-off * xc) % plane
            else:
                dz, roll = 0, (-off) % plane
            half = halves["e"] if out_c < 3 else halves["h"]
            oc_local = out_c if out_c < 3 else out_c - 3
            ic_local = in_c - 3 if out_c < 3 else in_c  # E reads H, H reads E
            half["wz"].append(row_z)
            half["wp"].append(row_p)
            half["taps"].append((oc_local, ic_local, dz, roll))

        # Builder invariant behind `paired=True`: the two taps of each
        # curl block share their non-difference separable factors exactly.
        for k in ("e", "h"):
            tl, wzl, wpl = halves[k]["taps"], halves[k]["wz"], halves[k]["wp"]
            for i in range(0, len(tl), 2):
                assert tl[i][:2] == tl[i + 1][:2], "taps not block-paired"
                if tl[i][2] != tl[i + 1][2]:  # z-pair: shared plane row
                    assert np.array_equal(wpl[i], wpl[i + 1])
                else:  # plane-pair: shared z row
                    assert np.array_equal(wzl[i], wzl[i + 1])
        specs = tuple(
            StencilSpec(
                n_in=3, n_out=3, taps=tuple(halves[k]["taps"]),
                zc=zc, plane=plane, tz=tz, paired=True,
            )
            for k in ("e", "h")
        )
        # (2, Zc, n_taps) / (2, n_taps, P) stacks for the fused pair kernel
        wz_t = np.stack(
            [np.stack(halves[k]["wz"]).T for k in ("e", "h")]
        )
        wplane_s = np.stack(
            [np.stack(halves[k]["wp"]) for k in ("e", "h")]
        )
        weights = (jnp.asarray(wz_t), jnp.asarray(wplane_s))
        return cls(nx, ny, nz, weights, specs, np.dtype(dtype).name)

    # -- LinearOperator interface ------------------------------------------

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def dtype(self):
        return jnp.dtype(self.dtype_name)

    @property
    def state_shape(self):
        return (6, self.spec.zc, self.spec.plane)

    def mv(self, u: jax.Array) -> jax.Array:
        return apply_stencil_pair(
            u, self.wz_t, self.wplane_s, self.spec_e, self.spec_h
        )

    def mm(self, U: jax.Array) -> jax.Array:
        # Block-major (p, 6, Zc, P); vmap adds p as a leading grid dim to
        # the Pallas call (measured ~25% faster than an unrolled
        # loop+stack: no re-stack pass).
        return jax.vmap(self.mv)(U)

    # -- fused Lanczos-iteration support ------------------------------------

    def supports_stencil_gram(self, p: int, dtype=None) -> bool:
        from lanczos_tpu.ops.pallas.stencil_gram import plan_stencil_gram

        dt = self.dtype if dtype is None else dtype
        return plan_stencil_gram(p, self.spec_e, dt) is not None

    def supports_fdtd_inplace(self, p: int, dtype=None) -> bool:
        from lanczos_tpu.ops.pallas.stencil_fdtd import plan_fdtd_inplace

        dt = self.dtype if dtype is None else dtype
        return plan_fdtd_inplace(p, self.spec_e, dt) is not None

    def fdtd_step(self, u: jax.Array) -> jax.Array:
        """u <- u + A u in u's DONATED buffer (ONE ~680 GB/s aliased
        pass; `ops/pallas/stencil_fdtd.py`).  Call on an operator whose
        weights already fold dt (`.scaled(dt)`); u must be dead after.
        u: (6, Zc, P) or (p, 6, Zc, P)."""
        from lanczos_tpu.ops.pallas.stencil_fdtd import fdtd_step_inplace

        if u.ndim == 3:
            return fdtd_step_inplace(
                u[None], self.wz_t, self.wplane_s, self.spec_e, self.spec_h
            )[0]
        return fdtd_step_inplace(
            u, self.wz_t, self.wplane_s, self.spec_e, self.spec_h
        )

    def stencil_gram(self, q: jax.Array, dst: jax.Array):
        """(v, g3) = (A q, [gram(q,v); gram(v,v); gram(dst,q)]) in ONE
        Pallas pass, with v written into dst's DONATED buffer — the
        round-5 fused-iteration fast path (see
        `ops/pallas/stencil_gram.py`).  dst must be dead afterwards."""
        from lanczos_tpu.ops.pallas.stencil_gram import (
            apply_stencil_pair_gram,
        )

        return apply_stencil_pair_gram(
            q, dst, self.wz_t, self.wplane_s, self.spec_e, self.spec_h
        )

    def scaled(self, s) -> "PallasMaxwellOperator":
        """Operator computing (s*A) @ u: folds a scalar prefactor (FDTD
        dt, benchmark damping) into the z-weights so no separate XLA
        scaling pass — a full extra read+write of the state — is spent."""
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(self),
            [self.wz_t * jnp.asarray(s, self.wz_t.dtype), self.wplane_s],
        )

    # -- state packing ------------------------------------------------------

    def pack(self, b) -> jax.Array:
        """Flat logical vector(s) -> stacked state.  b: (n,) -> (6, Zc, P);
        block-major (p, n) -> (p, 6, Zc, P)."""
        b = jnp.asarray(b, self.dtype)
        if b.ndim == 2:
            return jax.vmap(self.pack)(b)
        spec = self.spec
        planes = []
        o = 0
        for (zl, yl, xl), sz in zip(self.comp_shapes, self.comp_sizes):
            comp = b[o : o + sz].reshape(zl, yl, xl)
            o += sz
            comp = jnp.pad(
                comp,
                ((Z_OFF, spec.zc - Z_OFF - zl), (1, self.yc - 1 - yl), (1, self.xc - 1 - xl)),
            )
            comp = comp.reshape(spec.zc, self.yc * self.xc)
            comp = jnp.pad(comp, ((0, 0), (0, spec.plane - self.yc * self.xc)))
            planes.append(comp)
        return jnp.stack(planes)

    def unpack(self, u: jax.Array) -> jax.Array:
        """Stacked state -> flat logical vector(s)."""
        if u.ndim == 4:
            return jax.vmap(self.unpack)(u)
        parts = []
        for c, (zl, yl, xl) in enumerate(self.comp_shapes):
            comp = u[c, :, : self.yc * self.xc].reshape(
                self.spec.zc, self.yc, self.xc
            )
            parts.append(
                comp[Z_OFF : Z_OFF + zl, 1 : 1 + yl, 1 : 1 + xl].reshape(-1)
            )
        return jnp.concatenate(parts)

    def state_index(self, lc: int) -> tuple[int, int, int]:
        """Stacked-state coordinates (comp, z_storage, plane_pos) of the
        logical flat index lc — feed to `trace_fn`."""
        lc = int(lc)
        for c, (shape, sz) in enumerate(zip(self.comp_shapes, self.comp_sizes)):
            if lc < sz:
                zl, yl, xl = shape
                z, r = divmod(lc, yl * xl)
                y, x = divmod(r, xl)
                return (c, Z_OFF + z, (1 + y) * self.xc + (1 + x))
            lc -= sz
        raise IndexError("lc out of range")

    def trace_fn(self, lc: int):
        """Receiver extractor for the Lanczos methods: q[..., c, zs, ps]."""
        c, zs, ps = self.state_index(lc)
        return lambda q: q[..., c, zs, ps]

    # -- pytree -------------------------------------------------------------

    def tree_flatten(self):
        return (self.wz_t, self.wplane_s), (
            self.nx, self.ny, self.nz, self.spec_e, self.spec_h,
            self.dtype_name,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        nx, ny, nz, spec_e, spec_h, dtype_name = aux
        return cls(nx, ny, nz, tuple(children), (spec_e, spec_h), dtype_name)
