"""Round-5 aliased fast paths: the mono Lanczos iteration and the
in-place FDTD step.

On this chip a Pallas kernel that writes a freshly allocated buffer
caps at ~330 GB/s aggregate; the same kernel writing onto a
genuinely-read (donated) input streams at ~650-690
(benchmarks/probes/PROBES_R5.md).  Two consumers of that discovery:

* block Lanczos at p >= 2 auto-dispatches the TWO-call aliased
  iteration (q_j = in-place block_mix onto u1; v_j + all Gram blocks =
  one stencil_gram call aliased onto u3): 1.6-1.9x per iteration,
  ~650 GB/s aggregate over its 7 state passes;
* the FDTD oracle step u <- u + (dt A) u is genuinely destructive and
  runs as ONE aliased pass: 2.7x per step (676 GB/s effective).

Both are exercised below and validated against each other; run on CPU
(interpret mode) or the real chip:

    python examples/inplace_fast_paths.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from lanczos_tpu.methods.block_lanczos import block_lanczos
from lanczos_tpu.methods.expm_action import block_lanczos_expm_action
from lanczos_tpu.methods.fdtd import fdtd_block
from lanczos_tpu.models.maxwell_pallas import PallasMaxwellOperator
from lanczos_tpu.models.rhs import gaussian_matrix_B

N = 16 if jax.default_backend() == "cpu" else 96
P, M, T_END = 4, 8, 1.0

op = PallasMaxwellOperator.create(N, N, N)
B = op.pack(jnp.asarray(np.asarray(gaussian_matrix_B(N, op.n, P)),
                        jnp.float32))
print(f"Maxwell N={N}: n={op.n}, block width p={P}")
print("mono iteration supported:", op.supports_stencil_gram(P))
print("in-place FDTD supported (p=1):", op.supports_fdtd_inplace(1))

# -- the mono iteration is the DEFAULT for bare block runs ------------
t0 = time.time()
res = jax.block_until_ready(block_lanczos(op, B, M))
print(f"\nblock_lanczos m={M} (mono fused): {time.time()-t0:.2f}s "
      f"(includes compile)")
print("alphas[0] diag:", np.asarray(res.alphas)[0].diagonal()[:3])

# reference-semantics path for comparison
res_ref = block_lanczos(op, B, M, fused=False)
err = np.abs(np.asarray(res.alphas) - np.asarray(res_ref.alphas)).max()
print(f"max |alpha - alpha_materialized| = {err:.2e}")

# -- expm action validated against the in-place FDTD oracle -----------
lc = 123
sol = block_lanczos_expm_action(op, B, M, T_END, 0,
                                trace_fn=op.trace_fn(lc))
steps = 20_000 if jax.default_backend() == "cpu" else 200_000
u = fdtd_block(op, B, steps, T_END)  # runs the aliased one-pass step
ref = np.asarray(op.unpack(u))[:, lc]
rel = np.linalg.norm(np.asarray(sol) - ref) / np.linalg.norm(ref)
print(f"\nexpm action vs in-place FDTD ({steps} steps): "
      f"rel err {rel:.2e}")
assert rel < 1e-2
print("ok")
