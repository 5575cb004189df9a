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
    # bf16 activations (reference README.md:61-72 lists the full BF16
    # column as tested: FP4_E2M1, FP8_E4M3, INT8, UINT4/INT4, UINT2/INT2,
    # UINT1, NF4)
    ("bfloat16", "uint4", True),
    ("bfloat16", "int4", False),
    ("bfloat16", "nf4", True),
    ("bfloat16", "fp4_e2m1", True),
    ("bfloat16", "e4m3_float8", False),
    ("bfloat16", "int8", False),
    ("bfloat16", "uint2", True),
    ("bfloat16", "int2", False),
    ("bfloat16", "uint1", True),
    # fp8 cross pairs (reference README.md:77-78)
    ("e4m3_float8", "e5m2_float8", False),
    ("e5m2_float8", "e4m3_float8", False),
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


# Wide int/uint dequant weights (reference dtype map spans bits 1..32,
# /root/reference/bitblas/ops/general_matmul/__init__.py:324-345): stored
# as natural-width int16/int32 words, decode = cast (+scales).
WIDE_PAIRS = [
    ("float16", "int16", False), ("float16", "int16", True),
    ("float16", "uint16", False), ("float16", "uint16", True),
    ("float16", "int32", False), ("float16", "int32", True),
    ("float16", "uint32", False), ("float16", "uint32", True),
]


@pytest.mark.parametrize("a_dtype,w_dtype,scaling", WIDE_PAIRS)
def test_wide_int_formats(a_dtype, w_dtype, scaling):
    cfg = MatmulConfig(
        M=M, N=N, K=K, A_dtype=a_dtype, W_dtype=w_dtype,
        with_scaling=scaling, group_size=64 if scaling else -1,
        out_dtype="float32")
    assert cfg.storage_dtype == ("int16" if "16" in w_dtype else "int32")
    op = Matmul(cfg, enable_tuning=False)
    ops = random_reference_operands(cfg, M, seed=0)
    expected = matmul_reference(
        cfg, jnp.asarray(ops.A), jnp.asarray(ops.qweight),
        None if ops.scales is None else jnp.asarray(ops.scales))
    from bitblas_tpu.ops.weight_transform import transform_reference_operands
    dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
    got = op.forward(jnp.asarray(ops.A), jnp.asarray(dw.qweight),
                     scale=None if dw.scales is None
                     else jnp.asarray(dw.scales))
    assert got.shape == (M, N)
    # The f16 oracle rounds s*w products (weight magnitudes ~1e3); the
    # kernel's f32 path is MORE precise. Tolerance scales with the output
    # magnitude (same spirit as the reference mismatch budgets).
    scale = float(np.max(np.abs(np.asarray(expected, np.float32)))) or 1.0
    assert_close(got, expected, rtol=5e-2, atol=0.02 * scale,
                 max_mismatched_ratio=0.01, msg=f"{w_dtype}x{a_dtype}")


# Out/accum dtype matrix (reference README.md:80-83: INT8 activations
# advertise out in {FP32, INT32, FP16, INT8}). Narrow-int outputs use
# SATURATING semantics (round-to-nearest then clamp — documented in
# kernels/dequant_matmul.py epilogue + ops/reference.cast_output).
OUT_MATRIX = [
    ("int8", "int2", False, "float32"),
    ("int8", "int2", False, "float16"),
    ("int8", "int2", False, "int32"),
    ("int8", "int2", False, "int8"),
    ("int8", "uint4", False, "int32"),
    ("int8", "uint4", False, "int8"),
    ("int8", "uint4", False, "float16"),
    ("int8", "uint4", True, "float16"),
    ("int8", "uint4", True, "int8"),
    ("int8", "uint2", True, "float32"),
    ("float16", "uint4", True, "float16"),
    ("float16", "uint4", True, "float32"),
]


@pytest.mark.parametrize("a_dtype,w_dtype,scaling,out_dtype", OUT_MATRIX)
def test_out_dtype_matrix(a_dtype, w_dtype, scaling, out_dtype):
    int_act = a_dtype == "int8"
    cfg = MatmulConfig(
        M=M, N=N, K=K, A_dtype=a_dtype, W_dtype=w_dtype,
        with_scaling=scaling, group_size=64 if scaling else -1,
        accum_dtype="int32" if int_act and not scaling else "float32",
        out_dtype=out_dtype)
    op = Matmul(cfg, enable_tuning=False)
    ops = random_reference_operands(cfg, M, seed=1)
    expected = matmul_reference(
        cfg, jnp.asarray(ops.A), jnp.asarray(ops.qweight),
        None if ops.scales is None else jnp.asarray(ops.scales))
    from bitblas_tpu.ops.weight_transform import transform_reference_operands
    dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
    got = op.forward(jnp.asarray(ops.A), jnp.asarray(dw.qweight),
                     scale=None if dw.scales is None
                     else jnp.asarray(dw.scales))
    assert got.shape == (M, N)
    assert got.dtype == expected.dtype
    if out_dtype in ("int32", "int8") and not scaling:
        # Integer-exact path end to end: bitwise equality required.
        np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))
    elif out_dtype == "int8":
        # float accum -> saturating int8: allow off-by-one from f32 vs f16
        # oracle rounding near .5 boundaries.
        diff = np.abs(np.asarray(got, np.int32) -
                      np.asarray(expected, np.int32))
        assert diff.max() <= 1, f"int8 out diff {diff.max()}"
    else:
        assert_close(got, expected, rtol=2e-2, atol=0.5,
                     max_mismatched_ratio=0.005,
                     msg=f"{w_dtype}x{a_dtype}->{out_dtype}")
