"""Honest device-time measurement for a single op.

This environment's tunneled TPU backend resolves `block_until_ready`
before execution finishes and has a ~30-45 ms host round-trip, so naive
wall-clock timing is meaningless.  The working instrument:

  time(k) = wall time of ONE dispatch running the op k times inside a
            device-side fori_loop, synced by fetching a scalar;
  per-op seconds = (time(k2) - time(k1)) / (k2 - k1).

The loop body threads a data dependency through the iterations (a one-
element update of the input driven by the previous output) so XLA cannot
hoist the loop-invariant op out of the loop, and the scalar fetch forces
real completion.

Fast ops (microseconds) cannot be resolved by a short chain against the
~ms-level host jitter: both helpers AUTO-ESCALATE the chain length k2
(x8 per round, up to `k2_max`) until the k2-k1 wall-time delta clears
`min_delta_s`, so no published artifact ever carries a noise-floor
sentinel (the 1e-09 rows round 1 shipped in kernels.json / file_*.csv).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax import lax

# the k2-k1 wall-clock delta must clear this to count as resolved
_MIN_DELTA_S = 25e-3
_K2_MAX = 25_000


def _escalating_ks(k1: int, k2: int, k2_max: int):
    ks = [k2]
    while ks[-1] * 8 <= k2_max:
        ks.append(ks[-1] * 8)
    if ks[-1] != k2_max:
        ks.append(k2_max)
    return ks


def _slope(fn, x, extra, k1, k2, trials):
    best = {}
    for k in (k1, k2):
        b = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            float(fn(x, k, *extra))
            b = min(b, time.perf_counter() - t0)
        best[k] = b
    return (best[k2] - best[k1]) / (k2 - k1), best[k2] - best[k1]


def slope_time(op, x, *extra, k1: int = 2, k2: int = 12,
               trials: int = 3, k2_max: int = _K2_MAX,
               min_delta_s: float = _MIN_DELTA_S) -> float:
    """Per-call seconds of `op(x, *extra)` for non-self-map ops (e.g.
    Gram products whose output shape differs from x).  Large secondary
    operands MUST go through `extra`, not a closure — closed-over arrays
    become embedded constants, which this environment's remote-compile
    service rejects above ~100 MB (HTTP 413) and re-uploads per call
    otherwise.

    Differential protocol: the loop body must thread a data dependency
    through the big operand so XLA cannot hoist the loop-invariant op;
    the cheapest correct dependency (`t += tiny`) still costs a full
    read+write of t per iteration, which would inflate a memory-bound
    op's time ~3x.  So we time the SAME loop with and without the op and
    subtract the two slopes.  (An earlier version used a one-element
    `.at[0].set` on a reshaped view instead — the reshape is a tiled-
    layout change, i.e. two full relayout copies per step, which made a
    0.3 ms Gram read as 28 ms.)"""

    def make(with_op):
        @jax.jit  # k is a traced loop bound: one compile per variant
        def fn(t, k, *extra):
            def body(i, carry):
                t, acc = carry
                if with_op:
                    acc = acc + jnp.sum(op(t, *extra)) * 1e-30
                else:
                    acc = acc + jnp.sum(t[..., 0]) * 1e-30
                t = t + (acc * 1e-30).astype(t.dtype)
                return t, acc

            _, acc = lax.fori_loop(0, k, body, (t, jnp.float32(0.0)))
            return acc

        return fn

    fns = {w: make(w) for w in (True, False)}
    for w in (True, False):
        float(fns[w](x, k1, *extra))  # compile + warm

    for k2_try in _escalating_ks(k1, k2, k2_max):
        slopes = {}
        deltas = {}
        for w in (True, False):
            slopes[w], deltas[w] = _slope(fns[w], x, extra, k1, k2_try, trials)
        # the WITH-op chain must itself be resolved; the subtracted
        # baseline loop is far cheaper and rides along
        if deltas[True] >= min_delta_s or k2_try >= k2_max:
            break
    return max(slopes[True] - slopes[False], 1e-12)


def slope_time_chain(step, x, *extra, k1: int = 2, k2: int = 12,
                     trials: int = 3, damp: float | None = 1e-2,
                     k2_max: int = _K2_MAX,
                     min_delta_s: float = _MIN_DELTA_S) -> float:
    """Per-call seconds for a self-map y = step(y, *extra) (SpMV/SpMM-
    style), chained directly: y_{k+1} = damp * step(y_k).

    damp=None chains raw (y = step(y)).  Prefer folding any anti-overflow
    scaling INTO the measured operator (e.g. scale its weights once) and
    passing damp=None: the `* damp` here is a separate XLA pass — a full
    extra read+write of the state per step — which for a memory-bound op
    roughly DOUBLES the apparent per-step time.  Pass large operands
    (e.g. an assembled sparse-operator pytree) via `extra`, not a
    closure: closed-over arrays become embedded constants, which the
    remote-compile service rejects above ~100 MB (HTTP 413)."""

    @jax.jit  # k is a traced loop bound: ONE compile serves both lengths
    def fn(x, k, *extra):
        def body(i, y):
            y = step(y, *extra)
            return y if damp is None else y * damp

        return jnp.sum(lax.fori_loop(0, k, body, x))

    float(fn(x, k1, *extra))  # compile + warm
    for k2_try in _escalating_ks(k1, k2, k2_max):
        slope, delta = _slope(fn, x, extra, k1, k2_try, trials)
        if delta >= min_delta_s or k2_try >= k2_max:
            break
    return max(slope, 1e-12)
