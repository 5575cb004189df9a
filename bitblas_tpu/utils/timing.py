"""Trustworthy on-device timing.

The counterpart of the reference's `time_evaluator` profiling
(/root/reference/bitblas/ops/operator.py:223,442-450), rebuilt for a remote
TPU runtime where naive timing lies three different ways:

  1. a fixed multi-ms tunnel/launch overhead dominates single calls,
  2. computations whose outputs are garbage-collected can be elided,
  3. XLA dead-code-eliminates or slices anything not data-dependent
     (e.g. consuming only out[0,0] of a dot lets XLA shrink the dot).

Strategy: run the kernel inside a jitted `lax.fori_loop` whose carry is
injected into one (small) input and fed from a reduction of the output —
forcing full, serialized execution — and report the *slope*
(T(n2) - T(n1)) / (n2 - n1), which cancels the fixed overhead.
"""

from __future__ import annotations

import time
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _default_inject(args):
    """Pick the smallest array arg to perturb (cheapest copy per
    iteration). Non-array args (None, lifted-weights lists, scalars)
    are skipped — the carry must ride a real device array."""
    best, best_size = None, None
    for i, a in enumerate(args):
        if not (hasattr(a, "size") and hasattr(a, "dtype")
                and hasattr(a, "ndim")):
            continue
        size = a.size * a.dtype.itemsize
        if best_size is None or size < best_size:
            best, best_size = i, size
    if best is None:
        raise ValueError("measure_kernel needs at least one array arg "
                         "(or pass inject= explicitly)")
    return best


def make_chained(fn: Callable, args: Sequence, inject: Optional[int] = None,
                 full_output_dep: bool = False):
    """Build chained(iters) that runs `fn(*args)` iters times, serialized.

    `inject`: index of the arg that receives a carry-dependent perturbation
    (defaults to the smallest arg). The perturbation is `x.at[(0,)*ndim]
    .set(x[0...] + 0*carry)` — value-preserving, so numerics are untouched.

    `full_output_dep`: reduce the whole output into the carry (needed for
    transparent XLA computations that could otherwise be sliced; Pallas calls
    are opaque so a single element suffices).
    """
    args = list(args)
    if inject is None:
        inject = _default_inject(args)

    @jax.jit
    def _chained(iters, x0, params):
        # The injected array rides in the loop carry so XLA aliases its
        # buffer across iterations and the perturbation is a true in-place
        # single-element store. (Perturbing a closure constant instead
        # forces a full copy of the array every iteration — for a 4 MB
        # packed-weight arg that silently added ~10 us/iter on v5e and
        # inflated every GEMV "measurement" by ~2x.)
        # The OTHER args are jit parameters, NOT closure constants: a
        # closed-over array is serialized into the HLO as a literal — two
        # 128 MB KV caches blew the remote-compile request past its body
        # limit (HTTP 413, flash-decode sweep 2026-08-19) — and a constant
        # also invites XLA to specialize on values, which a measurement
        # must not allow.
        def body(i, carry):
            x, dep = carry
            idx = (0,) * x.ndim
            eps = (dep * 0).astype(jnp.float32)
            x = x.at[idx].set((x[idx].astype(jnp.float32) + eps)
                              .astype(x.dtype))
            cur = list(params)
            cur[inject] = x
            out = fn(*cur)
            if isinstance(out, (tuple, list)):
                out = out[0]
            if full_output_dep:
                dep2 = jnp.sum(out.astype(jnp.float32))
            else:
                dep2 = out[(0,) * out.ndim].astype(jnp.float32)
            return (x, dep2 * 0 + dep + 1)
        _, d = lax.fori_loop(0, iters, body, (x0, jnp.float32(0)))
        return d

    # iters must be traced (jnp scalar), or every distinct count triggers a
    # full recompile — at ~40 s per remote Mosaic compile that dominated the
    # tuner's runtime.
    params = list(args)
    params[inject] = None  # rides the carry instead

    def chained(iters):
        return _chained(jnp.int32(iters), args[inject], params)

    return chained


def measure_chained(chained: Callable, *, est_iters: int = 32,
                    target_sec: float = 0.05, repeats: int = 2) -> float:
    """Slope-timed seconds per iteration of `chained(iters)`."""
    np.asarray(chained(2))  # compile + warm

    # Rough estimate to size the measurement run.
    t0 = time.perf_counter()
    np.asarray(chained(est_iters))
    rough_total = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(chained(2))
    overhead = time.perf_counter() - t0
    per_iter = max((rough_total - overhead) / (est_iters - 2), 1e-7)

    n1 = 4
    n2 = n1 + max(16, int(target_sec / per_iter))
    # Timing noise (tunnel hiccups, host GC) is strictly one-sided, so the
    # min of each point is the clean run; the slope of paired raw runs can
    # deflate badly (a +5 ms hiccup in the short run reads as -1.3 us/iter
    # and produced "measurements" beating the HBM bound). The rough per_iter
    # sizing can also be stall-inflated, leaving n2 far too small — grow n2
    # until the measured span dwarfs the dispatch-overhead noise floor.
    min_span = min(0.02, target_sec)
    for _ in range(6):
        t1s, t2s = [], []
        for _ in range(max(repeats, 3)):
            t0 = time.perf_counter()
            np.asarray(chained(n1))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(chained(n2))
            t2s.append(time.perf_counter() - t0)
        span = min(t2s) - min(t1s)
        if span >= min_span or n2 >= 1_000_000:
            break
        n2 = n1 + (n2 - n1) * 4
    slope = span / (n2 - n1)
    return max(float(slope), 1e-9)


def measure_kernel(fn: Callable, args: Sequence, *, inject: Optional[int] = None,
                   full_output_dep: bool = False, target_sec: float = 0.05,
                   repeats: int = 2) -> float:
    """One-call convenience: seconds per execution of fn(*args) on device."""
    chained = make_chained(fn, args, inject=inject,
                           full_output_dep=full_output_dep)
    return measure_chained(chained, target_sec=target_sec, repeats=repeats)
