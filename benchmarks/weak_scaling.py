"""Weak-scaling harness for the distributed operators (north-star metric:
BASELINE.md ">=80% weak-scaling efficiency at N>=2 hosts").

Holds the per-device problem size FIXED (a z-slab of `--z-per-device`
planes) while growing the mesh, and reports per-SpMM time and the
efficiency t(1)/t(d).  Communication per step is one `ppermute`d z-plane
per neighbor — O(plane), independent of the per-device volume — so ideal
weak scaling is flat.

On this environment only one real TPU chip is attached; the harness runs
on any mesh JAX exposes (use XLA_FLAGS=--xla_force_host_platform_device_count=N
JAX_PLATFORMS=cpu for a virtual mesh — validates the harness and the
collective schedule, not silicon bandwidth).  On a real pod slice, run
as-is.

Usage:
    python benchmarks/weak_scaling.py --devices 1 2 4 8 --n-xy 32
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=None,
                    help="mesh sizes to test (default: 1..device_count pow2)")
    ap.add_argument("--n-xy", type=int, default=16,
                    help="x/y grid extent (plane size)")
    ap.add_argument("--z-per-device", type=int, default=16,
                    help="interior z planes per device (weak scaling)")
    ap.add_argument("--p", type=int, default=4, help="block columns")
    ap.add_argument("--cpu-mesh", type=int, default=0,
                    help="force a virtual CPU mesh of this many devices")
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    import jax

    if args.cpu_mesh:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu_mesh)

    import jax.numpy as jnp
    import numpy as np

    from lanczos_tpu.parallel import DistributedPallasMaxwell, make_mesh
    from lanczos_tpu.utils.bench_loop import slope_time_chain

    avail = jax.device_count()
    sizes = args.devices or [d for d in (1, 2, 4, 8, 16, 32) if d <= avail]

    rows = []
    t1 = None
    for d in sizes:
        if d > avail:
            print(f"skip d={d}: only {avail} devices")
            continue
        mesh = make_mesh(d)
        nz = args.z_per_device * d  # FIXED volume per device
        op = DistributedPallasMaxwell.create(
            args.n_xy, args.n_xy, nz, mesh, dtype=jnp.float32
        )
        damped = op.scaled(1e-2)
        u = damped.pack(
            np.random.default_rng(0)
            .standard_normal((args.p, op.n))
            .astype(np.float32)
        )
        # operator threaded via *extra (protocol rule: a closed-over
        # operator becomes an embedded compile-time constant)
        sec = slope_time_chain(lambda y, a: a.mm(y), u, damped, damp=None)
        if t1 is None:
            t1 = sec
        row = {
            "devices": d, "n": op.n, "nz": nz, "p": args.p,
            "seconds_per_spmm": sec,
            "efficiency": t1 / sec,
            "nnz_per_s_total": 4 * op.n * args.p / sec,
        }
        rows.append(row)
        print("  ".join(
            f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
            for k, v in row.items()), flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
