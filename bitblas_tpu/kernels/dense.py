"""Dense (native-compute) matmul paths.

The reference hand-schedules dense FP16/INT8 tensor-core GEMMs to match
cuBLAS (SURVEY.md §6). On TPU the XLA dot is that baseline — `jnp.dot` under
jit IS the vendor-tuned path — so the dense operator simply lowers to
`lax.dot_general` with the right accumulation type. A Pallas variant exists
for the tuner to try explicit tiles where XLA's choice is suboptimal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quantization.formats import as_jax_dtype
from ..tuner.hint import TileHint
from .spec import KernelSpec

_PRECISION = {
    "default": lax.Precision.DEFAULT,
    "high": lax.Precision.HIGH,
    "highest": lax.Precision.HIGHEST,
}


def make_dense_matmul(spec: KernelSpec, hint: TileHint, *,
                      layout: str = "nt", interpret: bool = False):
    """XLA dense matmul over every reference layout
    (/root/reference/bitblas/ops/general_matmul/__init__.py:58-237
    legalizes all four):

      * A is [M, K] for ``n*`` layouts, [K, M] for ``t*``;
      * W is [N, K] for ``*t``, [K, N] for ``*n``.

    The contraction dims feed `dot_general` directly — XLA folds the
    logical transposes into the dot, so no copy is materialized.
    """
    del interpret
    if layout not in ("nn", "nt", "tn", "tt"):
        raise ValueError(f"unknown layout {layout!r}")
    acc = jnp.int32 if spec.is_int_activation else jnp.float32
    out_dtype = as_jax_dtype(spec.out_dtype)
    precision = _PRECISION[hint.precision]
    adim = 1 if layout[0] == "n" else 0
    wdim = 1 if layout[1] == "t" else 0

    def fn(A, W, scales=None, zeros=None, bias=None):
        del scales, zeros
        # sub-byte int activations (int4/uint4 native compute) run on the
        # int8 MXU path — XLA backends reject direct int4 dots.
        if A.dtype in (jnp.int4, jnp.uint4):
            A = A.astype(jnp.int8)
        if W.dtype in (jnp.int4, jnp.uint4):
            W = W.astype(jnp.int8)
        out = lax.dot_general(
            A, W,
            dimension_numbers=(((adim,), (wdim,)), ((), ())),
            preferred_element_type=acc,
            precision=precision,
        ).astype(out_dtype)
        if spec.with_bias and bias is not None:
            out = out + bias.astype(out.dtype)
        return out

    return fn


def make_dense_matmul_pallas(spec: KernelSpec, hint: TileHint, *,
                             interpret: bool = False):
    """Explicitly tiled Pallas dense matmul (nt layout), for tuner A/B runs."""
    M, N, K = spec.m, spec.n, spec.k
    BM, BN, BK = min(hint.block_m, max(M, 8)), hint.block_n, hint.block_k
    if N % BN or K % BK:
        raise ValueError(f"N={N} K={K} not divisible by tile ({BN},{BK})")
    acc_dtype = jnp.int32 if spec.is_int_activation else jnp.float32
    out_dtype = as_jax_dtype(spec.out_dtype)
    precision = _PRECISION[hint.precision]
    padded_m = pl.cdiv(max(M, 8), BM) * BM
    grid = (padded_m // BM, N // BN, K // BK)
    nk = grid[2]

    def kernel(a_ref, w_ref, out_ref, acc_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += lax.dot_general(
            a_ref[...], w_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc_dtype,
            precision=precision,
        )

        @pl.when(k == nk - 1)
        def _():
            out_ref[...] = acc_ref[...].astype(out_dtype)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BM, BK), lambda i, j, k: (i, k)),
            pl.BlockSpec((BN, BK), lambda i, j, k: (j, k)),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((padded_m, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), acc_dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=(M * K + N * K + M * N) * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    def fn(A, W, scales=None, zeros=None, bias=None):
        del scales, zeros
        if A.shape[0] != padded_m:
            A = jnp.pad(A, ((0, padded_m - A.shape[0]), (0, 0)))
        out = call(A, W)
        if spec.with_bias and bias is not None:
            out = out + bias.astype(out.dtype)
        return out[:M]

    return fn
