"""The reference support matrix, exhaustively (README.md:61-88 of the
reference): every W_dtype x A_dtype pair the reference advertises runs
through Matmul (operator surface) and matches the dequantize-then-contract
oracle. One small shape per pair — the per-dtype deep dives live in
test_dequant_matmul_kernel.py."""

import numpy as np
import pytest

import jax.numpy as jnp

from bitblas_tpu.ops.matmul import Matmul
from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.ops.reference import matmul_reference
from bitblas_tpu.testing import assert_close, random_reference_operands

N = K = 256
M = 16

# (A_dtype, W_dtype, with_scaling) — scaling exercised where the reference's
# quantization schemes use it (weight-only sub-byte formats).
PAIRS = [
    # native dense
    ("float16", "float16", False),
    ("bfloat16", "bfloat16", False),
    ("float32", "float32", False),
    ("int8", "int8", False),
    ("e4m3_float8", "e4m3_float8", False),
    ("e5m2_float8", "e5m2_float8", False),
    # fp16 activations x quantized weights
    ("float16", "uint4", True),
    ("float16", "uint2", True),
    ("float16", "uint1", True),
    ("float16", "int4", False),
    ("float16", "int2", False),
    ("float16", "int1", False),
    ("float16", "int8", False),
    ("float16", "nf4", True),
    ("float16", "fp4_e2m1", True),
    ("float16", "e4m3_float8", False),
    ("float16", "e5m2_float8", False),
    # bf16 activations
    ("bfloat16", "uint4", True),
    ("bfloat16", "int4", False),
    ("bfloat16", "nf4", True),
    # int4 activations (reference INT4xINT4 tensor-core path; int8-MXU
    # emulation on TPU — exact, both operands fit int8)
    ("int4", "int4", False),
    # int8 activations with grouped scales (W4A8/W2A8 GPTQ-style serving;
    # kernel dots raw int fields and scales in the f32 epilogue — exact)
    ("int8", "uint4", True),
    ("int8", "uint2", True),
    # int8 activations (BitNet-style)
    ("int8", "int8", False),
    ("int8", "uint4", False),
    ("int8", "int4", False),
    ("int8", "uint2", False),
    ("int8", "int2", False),
    ("int8", "uint1", False),
    ("int8", "int1", False),
]


@pytest.mark.parametrize("a_dtype,w_dtype,scaling", PAIRS)
def test_support_matrix(a_dtype, w_dtype, scaling):
    int_act = a_dtype in ("int8", "int4")
    cfg = MatmulConfig(
        M=M, N=N, K=K, A_dtype=a_dtype, W_dtype=w_dtype,
        with_scaling=scaling, group_size=64 if scaling else -1,
        accum_dtype="int32" if int_act and w_dtype not in (
            "e4m3_float8", "e5m2_float8") else "float32",
        out_dtype="float32")
    op = Matmul(cfg, enable_tuning=False)
    ops = random_reference_operands(cfg, M, seed=0)
    expected = matmul_reference(
        cfg, jnp.asarray(ops.A), jnp.asarray(ops.qweight),
        None if ops.scales is None else jnp.asarray(ops.scales))
    if cfg.is_native_compute():
        got = op.forward(jnp.asarray(ops.A), jnp.asarray(ops.qweight))
    else:
        from bitblas_tpu.ops.weight_transform import \
            transform_reference_operands
        dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
        got = op.forward(jnp.asarray(ops.A), jnp.asarray(dw.qweight),
                         scale=None if dw.scales is None
                         else jnp.asarray(dw.scales))
    assert got.shape == (M, N)
    # fp8 weights span +-448 so K-length dots carry larger absolute error;
    # bf16 activations have 8-bit mantissas. Same spirit as the reference's
    # torch_assert_close mismatch budgets (bitblas/testing/__init__.py:29).
    wide = ("e4m3_float8" in (a_dtype, w_dtype)
            or "e5m2_float8" in (a_dtype, w_dtype)
            or a_dtype == "bfloat16")
    rtol, atol, budget = ((5e-2, 4.0, 0.01) if wide
                          else (2e-2, 0.35, 0.001))
    assert_close(got, expected, rtol=rtol, atol=atol,
                 max_mismatched_ratio=budget, msg=f"{w_dtype}x{a_dtype}")
