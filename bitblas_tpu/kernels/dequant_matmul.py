"""Fused dequantize-into-matmul Pallas TPU kernel.

This is the TPU-native replacement for the reference's TileLang dequant GEMM
schedulers (/root/reference/bitblas/ops/general_matmul/tilelang/dequantize/,
esp. matmul_dequantize_mma.py:200-510). Key design differences, chosen for
the TPU memory/compute model rather than translated from CUDA:

* Weights arrive in the *slot-strided N-packed* device layout
  (quantization/packing.pack_nslot): storage word [k, j] of an N-tile holds
  ``e`` weights for output columns ``i*BN/e + j``. Each slot ``i`` is
  extracted with one shift+mask — a pure VPU op with zero cross-lane
  movement — and contributes an MXU dot into its own contiguous output
  column range. This replaces ladder layout propagation + LOP3 interleave.
* The K-loop is the Pallas grid's innermost dimension; Mosaic double-buffers
  the HBM->VMEM block DMAs automatically (the reference emits explicit
  software pipelines + cp.async).
* Accumulation always happens in f32/i32 VMEM scratch (MXU native), not in
  the activation dtype.

Grid: (M/BM, N/BN, K/BK), K innermost. Blocks:
  A       [BM, BK]        activations (any float/int dtype)
  Wp      [BK, BN/e]      packed weights (int8/int16/int32 storage)
  scales  [BK/g | 1, BN]
  zeros   [BK/g | 1, BN]      (zeros_mode original/rescale)
  qzeros  [BK/g | 1, BN/e]    (zeros_mode quantized; slot-packed like Wp)
  bias    [1, BN]
  out     [BM, BN]
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quantization import numerics
from ..quantization.formats import NF4_TABLE, as_jax_dtype
from ..tuner.hint import TileHint
from .spec import KernelSpec

_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def _mma_jdtype(name: str):
    return {
        "bfloat16": jnp.bfloat16,
        "float16": jnp.float16,
        "float32": jnp.float32,
        "int8": jnp.int8,
    }[name]


def _decode_slot(spec: KernelSpec, hint: TileHint, words: jnp.ndarray,
                 slot: int, lut_vals=None) -> jnp.ndarray:
    """Extract + decode slot `slot` of a packed tile -> mma dtype.

    `words` is the packed tile as int32 (or the raw byte tile for 8-bit
    formats). Pure elementwise VPU ops.
    """
    mma = _mma_jdtype(hint.mma_dtype)
    bits, family = spec.bits, spec.family

    if bits >= 8:
        # 8-bit formats: no field extraction.
        if family == "int":
            return words.astype(mma)  # already sign-extended int32
        if family == "uint":
            return (words & 0xFF).astype(mma)
        if family == "fp_e4m3":
            return numerics.decode_f8e4m3_byte((words & 0xFF).astype(jnp.uint16),
                                               jnp.float16).astype(mma)
        if family == "fp_e5m2":
            return numerics.decode_f8e5m2_byte((words & 0xFF).astype(jnp.uint16),
                                               jnp.float16).astype(mma)
        raise ValueError(f"unsupported 8-bit family {family}")

    mask = (1 << bits) - 1
    field = (words >> (slot * bits)) & mask  # int32 in [0, 2^bits)

    if family == "uint":
        if spec.fast_decoding and hint.mma_dtype == "bfloat16":
            return numerics.fast_decode_uint_to_bf16(field.astype(jnp.uint16), bits)
        if spec.fast_decoding and hint.mma_dtype == "float16":
            return numerics.fast_decode_uint_to_f16(field.astype(jnp.uint16), bits)
        return field.astype(mma)
    if family == "int":
        bias = 1 << (bits - 1)
        if spec.fast_decoding and hint.mma_dtype == "bfloat16":
            return numerics.fast_decode_uint_to_bf16(
                field.astype(jnp.uint16), bits) - jnp.bfloat16(bias)
        return (field - bias).astype(mma)
    if family == "fp":  # fp4_e2m1
        return numerics.decode_fp4_field(field, jnp.float16).astype(mma)
    if family == "nf":
        if lut_vals is not None:
            # dynamic gather from the VMEM LUT input
            return jnp.take(lut_vals, field, axis=0).astype(mma)
        lut = [float(v) for v in NF4_TABLE]
        # Branchless mux over static scalar constants (15 selects).
        out = jnp.full(field.shape, lut[0], dtype=jnp.float32)
        for v in range(1, 16):
            out = jnp.where(field == v, jnp.float32(lut[v]), out)
        return out.astype(mma)
    raise ValueError(f"unsupported family {family}{bits}")


def _broadcast_groups(tile: jnp.ndarray, block_k: int, group_size: int):
    """[BK/g, BN] -> [BK, BN] by repeating each group row (static counts)."""
    rows = tile.shape[0]
    if rows * group_size == block_k:
        if group_size == 1:
            return tile
        return jnp.repeat(tile, group_size, axis=0)
    # g > BK: single row covers the whole tile.
    assert rows == 1, (rows, block_k, group_size)
    return tile


def make_dequant_matmul(spec: KernelSpec, hint: TileHint, *,
                        interpret: bool = False):
    """Build the jitted fused dequant-matmul for one (spec, hint).

    Returns fn(A, Wp, [scales], [zeros|qzeros], [bias]) -> out [M, N].
    """
    M, N, K = spec.m, spec.n, spec.k
    e = spec.elems_per_word
    BM, BN, BK = min(hint.block_m, M), hint.block_n, hint.block_k
    BM = max(BM, 8)
    if N % BN or K % BK:
        raise ValueError(f"N={N} K={K} not divisible by tile ({BN},{BK})")
    if BN % e:
        raise ValueError(f"block_n={BN} must be a multiple of e={e}")
    # (BN >= 128*e keeps every slot dot lane-aligned; smaller is allowed for
    # small-N cases and left to Mosaic to pad.)
    g = spec.group_size if spec.group_size > 0 else K
    if not (BK % g == 0 or g % BK == 0):
        raise ValueError(f"block_k={BK} incompatible with group_size={g}")
    sub = BN // e
    padded_m = pl.cdiv(M, BM) * BM
    grid = (padded_m // BM, N // BN, K // BK)
    nk = grid[2]

    mma = _mma_jdtype(hint.mma_dtype)
    int_path = spec.is_int_activation
    acc_dtype = jnp.int32 if (int_path and hint.mma_dtype == "int8") else jnp.float32
    out_dtype = as_jax_dtype(spec.out_dtype)
    precision = _PRECISION[hint.precision]
    quantized_zeros = spec.with_zeros and spec.zeros_mode == "quantized"

    # Group rows visible in one K tile.
    srows = BK // g if BK >= g else 1

    def scale_index(i, j, k):
        del i
        if BK >= g:
            return (k, j)
        return ((k * BK) // g, j)

    in_specs = [
        pl.BlockSpec((BM, BK), lambda i, j, k: (i, k)),
        pl.BlockSpec((BK, BN // e if spec.bits < 8 else BN),
                     lambda i, j, k: (k, j)),
    ]
    if spec.with_scaling:
        in_specs.append(pl.BlockSpec((srows, BN), scale_index))
    if spec.with_zeros:
        if quantized_zeros:
            in_specs.append(pl.BlockSpec((srows, BN // e), scale_index))
        else:
            in_specs.append(pl.BlockSpec((srows, BN), scale_index))
    if spec.with_bias:
        in_specs.append(pl.BlockSpec((1, BN), lambda i, j, k: (0, j)))
    is_nf_take = spec.family == "nf" and hint.lut_mode == "take"
    if is_nf_take:
        in_specs.append(pl.BlockSpec((1, 16), lambda i, j, k: (0, 0)))

    def kernel(*refs):
        idx = 0
        a_ref = refs[idx]; idx += 1
        w_ref = refs[idx]; idx += 1
        s_ref = z_ref = b_ref = None
        if spec.with_scaling:
            s_ref = refs[idx]; idx += 1
        if spec.with_zeros:
            z_ref = refs[idx]; idx += 1
        if spec.with_bias:
            b_ref = refs[idx]; idx += 1
        lut_ref = None
        if is_nf_take:
            lut_ref = refs[idx]; idx += 1
        out_ref = refs[idx]; idx += 1
        acc_ref = refs[idx]

        k = pl.program_id(2)

        @pl.when(k == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        a = a_ref[...]
        if a.dtype != mma:
            a = a.astype(mma)

        raw = w_ref[...]
        if spec.bits < 8:
            words = raw.astype(jnp.int32)
        else:
            words = raw.astype(jnp.int32) if spec.family == "int" else \
                raw.astype(jnp.uint8).astype(jnp.int32)

        if quantized_zeros:
            zwords = z_ref[...].astype(jnp.int32)

        lut_vals = lut_ref[0, :] if is_nf_take else None

        for slot in range(e):
            cols = slice(slot * sub, (slot + 1) * sub)
            if quantized_zeros:
                # integer-domain zero subtraction before the cast
                # (bit-exact vs _tir_packed_to_unsigned_convert_with_zeros).
                mask_v = (1 << spec.bits) - 1
                field = (words >> (slot * spec.bits)) & mask_v
                zfield = (zwords >> (slot * spec.bits)) & mask_v
                zb = _broadcast_groups(zfield, BK, g)
                w = (field - zb).astype(mma)
            else:
                w = _decode_slot(spec, hint, words, slot, lut_vals)

            if spec.with_scaling:
                s = _broadcast_groups(s_ref[...][:, cols], BK, g).astype(mma)
                if spec.with_zeros and not quantized_zeros:
                    z = _broadcast_groups(z_ref[...][:, cols], BK, g).astype(mma)
                    if spec.zeros_mode == "original":
                        w = (w - z) * s
                    else:  # rescale
                        w = w * s - z
                else:
                    w = w * s

            acc_ref[:, cols] += jax.lax.dot_general(
                a, w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype,
                precision=precision,
            )

        @pl.when(k == nk - 1)
        def _finish():
            res = acc_ref[...]
            if spec.with_bias:
                res = res + b_ref[...].astype(acc_dtype)
            out_ref[...] = res.astype(out_dtype)

    compiler_params = None
    if hint.vmem_limit_bytes is not None:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=hint.vmem_limit_bytes)

    wbytes = K * N * spec.bits // 8
    flops = 2 * M * N * K
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BM, BN), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((padded_m, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), acc_dtype)],
        compiler_params=compiler_params,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=M * K * 2 + wbytes + M * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    def fn(A, Wp, scales=None, zeros=None, bias=None):
        if A.shape[0] != padded_m:
            A = jnp.pad(A, ((0, padded_m - A.shape[0]), (0, 0)))
        args = [A, Wp]
        if spec.with_scaling:
            args.append(scales)
        if spec.with_zeros:
            args.append(zeros)
        if spec.with_bias:
            args.append(bias)
        if is_nf_take:
            args.append(jnp.asarray(NF4_TABLE, dtype=mma).reshape(1, 16))
        out = call(*args)
        return out[:M] if out.shape[0] != M else out

    return fn


def make_dequant_matmul_jit(spec: KernelSpec, hint: TileHint, *,
                            interpret: bool = False):
    return jax.jit(make_dequant_matmul(spec, hint, interpret=interpret))
