"""Activation-split plan: run a float-activation dequant GEMV on the int8 MXU.

At small M the binding limit of the W4A16/W2A16 GEMV is the MXU
weight-ingestion rate (BASELINE.md): ~1.5e12 elem/s for bf16/f32 operands vs
~1.85e12 for int8 — and the int8 telescope additionally ingests *storage
bytes* with plain shifts instead of decoded fields. The int-activation
kernel (tele_i8 in dequant_matmul.py) already exploits this for W2A8/W4A8;
this plan bridges float activations onto that path:

  1. Quantize A row-wise to 15-bit fixed point, split EXACTLY into two int8
     planes:  q = round(A * 16256 / s_row),  q = 128*hi + lo
     with hi in [-127, 127] and lo in [-64, 64] (both int8-exact).
  2. Stack [hi; lo] as a [2M, K] int8 activation and run the ordinary
     int8-MXU telescope kernel once — skinny MXU passes are element-count
     bound, so 2M rows cost the same weight ingestion as M rows while the
     operand rate rises ~1.23x and the decode drops to byte shifts.
  3. Combine in the epilogue: out = (O[:M]*128 + O[M:]) * s_row/16256.
     Every kernel stage (dots, rowsums, scale/zero epilogues) is linear in
     the activation, so the combine is exact over the kernel's own math.

Precision: the activation carries 15 significant bits vs bf16's 8 (f16's
11) — strictly MORE accurate than the bf16-MXU fused path the float route
otherwise uses at these shapes. Weight decode stays bit-exact (the int8
telescope is integer-exact; quantization/numerics.py formulas).

The reference has no analog: on GPU the f16 tensor core ingests f16
activations natively (/root/reference/bitblas/ops/general_matmul/tilelang/
dequantize/gemv_dequantize_simt.py handles GEMV with f16 MACs); the split is
a TPU-specific answer to the measured int8-vs-bf16 ingestion gap.

Timing: the plan keeps the opaque pallas_call as its body; the quantize
prologue/combine epilogue are transparent XLA but both depend on A (the
default chained-timer inject target), so `measure_kernel` defaults are
honest for it — no special controls needed.
"""

from __future__ import annotations

from dataclasses import replace

import jax.numpy as jnp

from ..quantization.formats import as_jax_dtype
from ..tuner.hint import TileHint
from .spec import KernelSpec

# 127 * 128: the largest magnitude whose (hi, lo) split keeps hi in
# [-127, 127] after round-to-nearest and lo in [-64, 64].
_QMAX = 16256.0


def supports_asplit(spec: KernelSpec, hint: TileHint) -> bool:
    """Whether the activation-split plan exists for this spec/hint.

    Half-precision activations × sub-byte int/uint weights only — exactly
    the specs whose int-activation twin runs the integer-exact tele_i8
    path. float32 activations are excluded: the 15-bit fixed-point split
    is strictly more accurate than an 8/11-bit bf16/f16 mantissa but
    strictly LESS than f32's 24 — the latency-only tuner must never be
    able to trade f32 callers' precision for speed.
    """
    if spec.native or spec.is_int_activation:
        return False
    if spec.a_dtype not in ("float16", "bfloat16"):
        return False
    if hint.mma_dtype != "int8":
        return False
    return (spec.family in ("uint", "int") and spec.bits < 8
            and spec.storage_bits == 8)


def _inner_spec_hint(spec: KernelSpec, hint: TileHint):
    """(spec, hint) of the int8-telescope kernel this plan wraps."""
    # Exact combine needs int32 accumulation out of the kernel when no f32
    # epilogue runs; with scales/zeros the kernel's epilogue is f32 anyway.
    inner_out = "float32" if (spec.with_scaling or spec.with_zeros) \
        else "int32"
    inner_spec = replace(spec, m=2 * spec.m, a_dtype="int8",
                         out_dtype=inner_out, with_bias=False,
                         fast_decoding=False)
    inner_hint = replace(hint, decode_mode="telescope", mma_dtype="int8")
    return inner_spec, inner_hint


def make_asplit_matmul(spec: KernelSpec, hint: TileHint, *,
                       interpret: bool = False):
    """Build the activation-split dequant matmul for one (spec, hint).

    Same call signature/layouts as make_dequant_matmul:
    fn(A, Wp, scales=None, zeros=None, bias=None) -> out [M, N].
    """
    if not supports_asplit(spec, hint):
        raise ValueError(f"asplit plan unsupported for {spec} "
                         f"(mma={hint.mma_dtype})")
    from .dequant_matmul import make_dequant_matmul

    M, N_out = spec.m, spec.n
    inner_spec, inner_hint = _inner_spec_hint(spec, hint)
    inner = make_dequant_matmul(inner_spec, inner_hint, interpret=interpret)
    out_dtype = as_jax_dtype(spec.out_dtype)

    def fn(A, Wp, scales=None, zeros=None, bias=None):
        Af = A.astype(jnp.float32)
        s = jnp.max(jnp.abs(Af), axis=1, keepdims=True)
        s = jnp.where(s > 0, s, jnp.float32(1.0))
        q = jnp.round(Af * (_QMAX / s))
        hi = jnp.round(q * (1.0 / 128.0))
        lo = q - hi * 128.0
        A2 = jnp.concatenate([hi, lo], axis=0).astype(jnp.int8)
        O = inner(A2, Wp, scales=scales, zeros=zeros).astype(jnp.float32)
        res = (O[:M] * 128.0 + O[M:]) * (s * (1.0 / _QMAX))
        if spec.with_bias and bias is not None:
            res = res + bias.reshape(1, -1)[:, :N_out].astype(jnp.float32)
        from ..quantization.numerics import saturate_cast
        return saturate_cast(res, out_dtype)

    return fn
