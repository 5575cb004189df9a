"""Pipeline parallelism: GPipe-style microbatched stage execution.

The reference has no pipeline parallelism (SURVEY.md §2.11 — single-GPU
kernel library; the mesh dim was "reserved"). On TPU a pipeline stage is a
contiguous slice of layers resident on one mesh slice; activations hop
stage-to-stage over ICI with `jax.lax.ppermute` while every stage works on a
different microbatch — the classic GPipe schedule, expressed as a single
SPMD program under `shard_map` (no per-stage programs, no send/recv
runtime: the collective permute IS the pipe).

Schedule for pp stages and n_micro microbatches (bubble fraction
(pp-1)/(n_micro+pp-1)):

  tick t in [0, n_micro+pp-1):
    stage 0 ingests microbatch t (if any)
    every stage applies its layer slice to its current activation
    stage pp-1 emits microbatch t-(pp-1) (if any)
    activations ppermute s -> s+1

Stage weights live stacked on a leading [pp, ...] axis sharded over the
pipeline mesh axis, so the SPMD body just indexes its local slab — works
for arbitrary pytrees including packed quantized weights + scales.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def stack_stage_params(per_stage_params, mesh: Mesh, axis: str = "pp"):
    """Stack per-stage parameter pytrees along a new leading axis and shard
    it over the pipeline mesh axis (stage s's slab lands on mesh slice s)."""
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *per_stage_params)
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(*([axis] + [None] * (x.ndim - 1))))),
        stacked)


def make_gpipe_fn(stage_fn: Callable, mesh: Mesh, axis: str = "pp",
                  jit: bool = True) -> Callable:
    """Build pipeline(stacked_params, xs) -> ys.

    stage_fn(params, x) applies ONE stage's layer slice to one microbatch
    activation [B, ...] -> same shape (activations must keep one shape
    across stages — true of transformer blocks).

    xs: [n_micro, B, ...] microbatched inputs, replicated across the axis.
    Returns [n_micro, B, ...] outputs, replicated. The tick loop is a
    static unroll of n_micro + pp - 1 steps; off-schedule stages compute on
    zeros (the pipeline bubble) and their results are masked out.
    """
    pp = mesh.shape[axis]

    def local(params, xs):
        s = jax.lax.axis_index(axis)
        p = jax.tree.map(lambda a: a[0], params)   # this stage's slab
        n_micro = xs.shape[0]
        cur = jnp.zeros_like(xs[0])
        outs = jnp.zeros_like(xs)
        perm = [(i, (i + 1) % pp) for i in range(pp)]
        for t in range(n_micro + pp - 1):
            if t < n_micro:
                cur = jnp.where(s == 0, xs[t], cur)
            y = stage_fn(p, cur)
            emit = t - (pp - 1)
            if 0 <= emit < n_micro:
                outs = outs.at[emit].set(
                    jnp.where(s == pp - 1, y, outs[emit]))
            if t < n_micro + pp - 2:   # last tick's hop would be dead
                cur = jax.lax.ppermute(y, axis, perm)
        # outs is populated only on the last stage; psum broadcasts it
        # (every other stage contributes zeros).
        return jax.lax.psum(outs, axis)

    # P(axis) is a pytree-prefix spec: every param leaf shards its leading
    # (stage) axis over the pipeline axis.
    sm = shard_map(local, mesh=mesh, in_specs=(P(axis), P()),
                   out_specs=P(), check_vma=False)

    def pipeline(stacked_params, xs):
        return sm(stacked_params, xs)

    return jax.jit(pipeline) if jit else pipeline


def make_quant_stage_fn(config, m: int, layers_per_stage: int,
                        interpret: Optional[bool] = None) -> Callable:
    """Stage body: `layers_per_stage` fused dequant matmuls (+gelu between)
    per stage. Params pytree per stage: dict with 'qweight' [L, K, Nw]
    (+'scales' [L, G, 1, N] when scaling) — N == K so activations keep
    shape. The building block for pipelining a quantized MLP trunk."""
    from ..kernels.dequant_matmul import make_dequant_matmul
    from ..kernels.spec import KernelSpec
    from ..tuner import default_hint, get_arch

    assert config.N == config.K, "pipeline stage needs N == K"
    arch = get_arch()
    if interpret is None:
        interpret = arch.is_cpu
    spec = KernelSpec.from_config(config, m)
    kf = make_dequant_matmul(spec, default_hint(spec, arch),
                             interpret=interpret)

    def stage_fn(params, x):
        h = x
        for i in range(layers_per_stage):
            s = params["scales"][i] if "scales" in params else None
            h = kf(h, params["qweight"][i], scales=s)
            h = jax.nn.gelu(h).astype(x.dtype)
        return h

    return stage_fn
