"""Reference (oracle) executors: dequantize + XLA dot_general.

This is the semantic ground truth every Pallas kernel is tested against
(build plan stage 2, SURVEY.md §7). Inputs use the *reference tensor layouts*
of BitBLAS checkpoints:

  qweight : [N, K*bits/storage_bits]  packed along K, LSB-first
            (general_compress; plain [N, K] for 8-bit formats)
  scales  : [N, K/group_size]
  zeros   : [N, K/group_size]              (zeros_mode original/rescale)
  qzeros  : [K/group_size, N*bits/8] int8  packed along N (zeros_mode quantized,
            reference module/__init__.py:183-192 buffer shapes)
  bias    : [N]

Dequant math is bit-exact vs the reference TIR decode
(tirscript/matmul_dequantize_impl.py:192-260); the contraction accumulates in
float32/int32 (MXU semantics) rather than the reference's optional f16
accumulation.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax

from ..quantization import numerics
from ..quantization.formats import as_jax_dtype, nf4_lut
from .matmul_config import MatmulConfig


def dequantize_weight(
    config: MatmulConfig,
    qweight: jnp.ndarray,
    scales: Optional[jnp.ndarray] = None,
    zeros: Optional[jnp.ndarray] = None,
    qzeros: Optional[jnp.ndarray] = None,
    lut: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Decode a reference-layout packed weight to dense [N, K] in A_dtype
    (float32 when activations are integer and scaling/zeros apply — the
    dequantized weight is a float tensor there)."""
    family, bits = config.source_format, config.bit
    N, K = config.N, config.K
    adt = as_jax_dtype(config.A_dtype)
    # Integer activations with scaling (W4A8-style): the dequantized weight
    # is a float tensor; casting it to the int activation dtype would
    # truncate every scaled value to 0. Decode to f32 instead — the fused
    # kernel dots raw integer fields and applies scales in its f32
    # epilogue, which is exactly this contraction.
    if jnp.issubdtype(jnp.dtype(adt), jnp.integer) and (
            config.with_scaling or config.with_zeros):
        adt = jnp.float32
    g = config.effective_group_size

    if bits < 8:
        fields = numerics.unpack_fields(qweight, bits)[..., :K]
    elif bits == 8:
        fields = jnp.asarray(qweight).astype(
            jnp.uint8 if family != "int" else jnp.int8)
        if family == "int":
            # 8-bit signed weights are stored unbiased.
            fields = fields.astype(jnp.int32)
    else:
        # Wide int16/int32 weights: natural-width values, no packing
        # (reference dtype map, general_matmul/__init__.py:324-345).
        q = jnp.asarray(qweight)
        if family == "int":
            fields = q.astype(jnp.int32)
        else:  # uint: reinterpret the signed container back to unsigned
            fields = q.view(jnp.uint16 if bits == 16 else jnp.uint32) \
                if jnp.issubdtype(q.dtype, jnp.signedinteger) else q
            fields = fields.astype(jnp.uint32)

    if family == "nf" and lut is None:
        lut = nf4_lut(adt)

    if config.with_zeros and config.zeros_mode == "quantized":
        # qzeros [K/g, N/e]: decode the zero for (n, k//g), subtract in the
        # integer domain, then cast (reference decode() first branch).
        zfields = numerics.unpack_fields(qzeros, bits)[..., :N]  # [K/g, N]
        z_nk = zfields.T  # [N, K/g]
        z_full = jnp.repeat(z_nk, g, axis=1)[:, :K]
        w = numerics.decode_uint_field_with_zeros(fields, z_full, adt)
    elif family == "int" and bits >= 8:
        w = fields.astype(adt)
    else:
        w = numerics.decode_field(fields, family, bits, adt, lut=lut)

    if config.with_scaling:
        s_full = jnp.repeat(scales.astype(adt), g, axis=1)[:, :K]
        z_full = None
        if config.with_zeros and config.zeros_mode != "quantized":
            z_full = jnp.repeat(zeros.astype(adt), g, axis=1)[:, :K]
        w = numerics.apply_scaling(w, s_full, z_full, config.zeros_mode)
    return w.astype(adt)


def matmul_dense_reference(config: MatmulConfig, A: jnp.ndarray,
                           W_dense_nk: jnp.ndarray,
                           bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """C = A @ W^T with MXU-style accumulation. W_dense_nk is [N, K]."""
    int_path = config.A_dtype in ("int8", "uint8", "int4", "uint4") and \
        config.source_format in ("int", "uint")
    if int_path and jnp.issubdtype(W_dense_nk.dtype, jnp.floating):
        # scaled-dequant weights (W4A8): float contraction of int8 act
        A = A.astype(W_dense_nk.dtype)
        int_path = False
    acc_dtype = jnp.int32 if int_path else jnp.float32
    if "int4" in str(A.dtype) or "int4" in str(W_dense_nk.dtype):
        # XLA's CPU backend rejects dots over ml_dtypes int4/uint4 operands;
        # upcast to int8 (exact) before contracting.
        A = A.astype(jnp.int8)
        W_dense_nk = W_dense_nk.astype(jnp.int8)
    out = lax.dot_general(
        A, W_dense_nk,
        dimension_numbers=(((A.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=acc_dtype,
    )
    if bias is not None:
        # Bias adds in f32 on int-accumulation paths (kernel semantics —
        # casting a fractional bias to int32 would truncate it).
        if jnp.issubdtype(out.dtype, jnp.integer):
            out = out.astype(jnp.float32) + bias.astype(jnp.float32)
        else:
            out = out + bias.astype(out.dtype)
    return cast_output(out, config.out_dtype)


def cast_output(out: jnp.ndarray, out_dtype: str) -> jnp.ndarray:
    """Accumulator -> out dtype. Narrow-int outputs saturate (round-to-
    nearest for float accumulators, clamp to the dtype range) — matches the
    kernel's documented semantics (kernels/dequant_matmul.py epilogue)."""
    return numerics.saturate_cast(out, as_jax_dtype(out_dtype))


def matmul_reference(
    config: MatmulConfig,
    A: jnp.ndarray,
    qweight: jnp.ndarray,
    scales: Optional[jnp.ndarray] = None,
    zeros: Optional[jnp.ndarray] = None,
    qzeros: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    lut: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full oracle: dequantize (if needed) then contract."""
    if config.is_native_compute():
        # layout[1] names the weight storage ("*t" = [N, K], "*n" = [K, N]);
        # A is [m, K] here regardless of layout[0] (the t* activation
        # convention is normalized away at the Matmul.forward boundary).
        W = qweight if config.layout[1] == "t" else qweight.T
        return matmul_dense_reference(config, A, W, bias)
    if config.layout != "nt":
        raise NotImplementedError(
            f"dequant path supports layout 'nt' only, got {config.layout}")
    W = dequantize_weight(config, qweight, scales, zeros, qzeros, lut)
    return matmul_dense_reference(config, A, W, bias)
