"""Pallas dequant-matmul kernel vs the XLA oracle (interpret mode on CPU).

Mirrors the reference's per-dtype operator test ladder
(testing/python/operators/test_general_matmul_ops_backend_tl.py): every
supported W x A pair, scaling/zeros modes, M in {GEMV, GEMM} regimes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bitblas_tpu.kernels.dequant_matmul import make_dequant_matmul
from bitblas_tpu.kernels.spec import KernelSpec
from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.ops.reference import matmul_reference
from bitblas_tpu.ops.weight_transform import transform_reference_operands
from bitblas_tpu.testing import assert_close, random_reference_operands
from bitblas_tpu.tuner.hint import TileHint

N, K = 512, 512
# float16 mma: dequant arithmetic happens in f16 exactly like the reference
# TIR (in_dtype compute), so kernel == oracle bit-for-bit modulo dot order.
HINT = TileHint(block_m=64, block_n=256, block_k=128, mma_dtype="float16",
                precision="highest")


# Tolerances: field decode is bit-exact (tests/test_numerics.py), but XLA may
# fuse the f16 scale/zero arithmetic into a single f32-rounded op while the
# eager oracle rounds every f16 op — a 1-ulp-per-weight wiggle that
# accumulates to ~sqrt(K)*ulp*|a| in the contraction. The reference accepts
# the same class of error via a mismatch-ratio budget (bitblas/testing
# torch_assert_close).
def run_case(config: MatmulConfig, m: int, hint: TileHint = HINT, seed=0,
             rtol=2e-2, atol=0.35):
    ops = random_reference_operands(config, m, seed)
    expected = matmul_reference(
        config,
        jnp.asarray(ops.A),
        jnp.asarray(ops.qweight),
        None if ops.scales is None else jnp.asarray(ops.scales),
        None if ops.zeros is None else jnp.asarray(ops.zeros),
        None if ops.qzeros is None else jnp.asarray(ops.qzeros),
        None if ops.bias is None else jnp.asarray(ops.bias),
    )
    dw = transform_reference_operands(
        config, ops.qweight, ops.scales, ops.zeros, ops.qzeros, ops.bias)
    spec = KernelSpec.from_config(config, m)
    fn = make_dequant_matmul(spec, hint, interpret=True)
    j = lambda a: None if a is None else jnp.asarray(a)
    got = fn(jnp.asarray(ops.A), jnp.asarray(dw.qweight),
             scales=j(dw.scales), zeros=j(dw.zeros), bias=j(dw.bias))
    assert got.shape == (m, config.N)
    assert_close(got, expected, rtol=rtol, atol=atol,
                 msg=f"{config.W_dtype}x{config.A_dtype} m={m}")


class TestUint4Fp16:

    @pytest.mark.parametrize("m", [1, 32])
    def test_plain(self, m):
        cfg = MatmulConfig(M=m, N=N, K=K, A_dtype="float16", W_dtype="uint4",
                           fast_decoding=False)
        run_case(cfg, m)

    @pytest.mark.parametrize("zeros_mode", ["original", "rescale", "quantized"])
    def test_scaling_zeros(self, zeros_mode):
        cfg = MatmulConfig(M=32, N=N, K=K, A_dtype="float16", W_dtype="uint4",
                           with_scaling=True, with_zeros=True,
                           zeros_mode=zeros_mode, group_size=128,
                           fast_decoding=False)
        run_case(cfg, 32)

    def test_scaling_only(self):
        cfg = MatmulConfig(M=16, N=N, K=K, A_dtype="float16", W_dtype="uint4",
                           with_scaling=True, group_size=128,
                           fast_decoding=False)
        run_case(cfg, 16)

    def test_bias(self):
        cfg = MatmulConfig(M=16, N=N, K=K, A_dtype="float16", W_dtype="uint4",
                           with_bias=True, fast_decoding=False)
        run_case(cfg, 16)

    def test_fast_decoding_bf16(self):
        cfg = MatmulConfig(M=32, N=N, K=K, A_dtype="float16", W_dtype="uint4",
                           with_scaling=True, group_size=128,
                           fast_decoding=True)
        hint = TileHint(block_m=64, block_n=256, block_k=128,
                        mma_dtype="bfloat16")
        # bf16 mma: dequantized weights carry 2^-8 relative rounding, which
        # accumulates to ~sqrt(K)*0.03*|a| absolute error in the dot.
        run_case(cfg, 32, hint=hint, rtol=5e-2, atol=2.0)

    def test_group_size_full_k(self):
        cfg = MatmulConfig(M=16, N=N, K=K, A_dtype="float16", W_dtype="uint4",
                           with_scaling=True, group_size=-1,
                           fast_decoding=False)
        run_case(cfg, 16)


class TestOtherIntFormats:

    @pytest.mark.parametrize("wdtype", ["int4", "int2", "int1", "uint2", "uint1"])
    def test_sub_byte_int(self, wdtype):
        cfg = MatmulConfig(M=16, N=N, K=K, A_dtype="float16", W_dtype=wdtype,
                           fast_decoding=False)
        run_case(cfg, 16)

    def test_int8_weight_fp16_act(self):
        cfg = MatmulConfig(M=16, N=N, K=K, A_dtype="float16", W_dtype="int8")
        run_case(cfg, 16)

    def test_int2_int8_bitnet_bf16path(self):
        # BitNet W_INT2 x A_INT8 with bf16 MXU emulation: products <= 254 are
        # exactly representable in bf16, f32 accum exact -> integer-exact.
        cfg = MatmulConfig(M=16, N=N, K=K, A_dtype="int8", W_dtype="int2",
                           accum_dtype="int32", out_dtype="float32")
        hint = TileHint(block_m=64, block_n=256, block_k=128,
                        mma_dtype="bfloat16")
        run_case(cfg, 16, hint=hint, rtol=0, atol=0)

    def test_int2_int8_bitnet_int8path(self):
        cfg = MatmulConfig(M=16, N=N, K=K, A_dtype="int8", W_dtype="int2",
                           accum_dtype="int32", out_dtype="float32")
        hint = TileHint(block_m=64, block_n=256, block_k=128, mma_dtype="int8")
        run_case(cfg, 16, hint=hint, rtol=0, atol=0)


class TestFloatFormats:

    def test_nf4(self):
        cfg = MatmulConfig(M=16, N=N, K=K, A_dtype="float16", W_dtype="nf4",
                           with_scaling=True, group_size=128)
        run_case(cfg, 16)

    def test_nf4_select_mode(self):
        cfg = MatmulConfig(M=16, N=N, K=K, A_dtype="float16", W_dtype="nf4")
        hint = TileHint(block_m=64, block_n=256, block_k=128,
                        mma_dtype="float16", precision="highest",
                        lut_mode="select")
        run_case(cfg, 16, hint=hint)

    def test_fp4_e2m1(self):
        cfg = MatmulConfig(M=16, N=N, K=K, A_dtype="float16",
                           W_dtype="fp4_e2m1", with_scaling=True,
                           group_size=128)
        run_case(cfg, 16)

    def test_e4m3(self):
        cfg = MatmulConfig(M=16, N=N, K=K, A_dtype="float16",
                           W_dtype="e4m3_float8")
        run_case(cfg, 16)

    def test_e5m2(self):
        cfg = MatmulConfig(M=16, N=N, K=K, A_dtype="float16",
                           W_dtype="e5m2_float8")
        run_case(cfg, 16)


class TestShapes:

    def test_m_not_multiple_of_block(self):
        cfg = MatmulConfig(M=24, N=N, K=K, A_dtype="float16", W_dtype="uint4",
                           fast_decoding=False)
        run_case(cfg, 24)

    def test_gemv_m1_full_k_tile(self):
        cfg = MatmulConfig(M=1, N=N, K=K, A_dtype="float16", W_dtype="uint4",
                           with_scaling=True, group_size=128,
                           fast_decoding=False)
        hint = TileHint(block_m=8, block_n=512, block_k=512,
                        mma_dtype="float16", precision="highest")
        run_case(cfg, 1, hint=hint)


class TestTelescopeDecode:
    """decode_mode=telescope: slot recovery via linear combination of raw
    byte dots; must match the oracle for every int/uint format + modes."""

    @pytest.mark.parametrize("wdtype", ["uint4", "uint2", "uint1", "int4",
                                        "int2", "int1"])
    def test_plain(self, wdtype):
        cfg = MatmulConfig(M=16, N=N, K=K, A_dtype="float16", W_dtype=wdtype,
                           fast_decoding=False)
        hint = TileHint(block_m=64, block_n=512, block_k=128,
                        mma_dtype="float32", precision="highest",
                        decode_mode="telescope")
        run_case(cfg, 16, hint=hint)

    @pytest.mark.parametrize("zeros_mode", ["original", "rescale", "quantized"])
    def test_scaling_zeros(self, zeros_mode):
        cfg = MatmulConfig(M=32, N=N, K=K, A_dtype="float16", W_dtype="uint4",
                           with_scaling=True, with_zeros=True,
                           zeros_mode=zeros_mode, group_size=128,
                           fast_decoding=False)
        hint = TileHint(block_m=64, block_n=512, block_k=256,
                        mma_dtype="float32", precision="highest",
                        decode_mode="telescope")
        run_case(cfg, 32, hint=hint)

    def test_int2_int8_bitnet_exact(self):
        cfg = MatmulConfig(M=16, N=N, K=K, A_dtype="int8", W_dtype="int2",
                           accum_dtype="int32", out_dtype="float32")
        hint = TileHint(block_m=64, block_n=512, block_k=128,
                        mma_dtype="float32", precision="highest",
                        decode_mode="telescope")
        run_case(cfg, 16, hint=hint, rtol=0, atol=0)


class TestInt8MXUTelescope:
    """tele_i8: xor-offset int8-MXU telescope must be integer-exact."""

    @pytest.mark.parametrize("wdtype", ["int2", "int4", "int1", "uint2",
                                        "uint4"])
    def test_exact(self, wdtype):
        cfg = MatmulConfig(M=16, N=N, K=K, A_dtype="int8", W_dtype=wdtype,
                           accum_dtype="int32", out_dtype="float32")
        hint = TileHint(block_m=64, block_n=512, block_k=128,
                        mma_dtype="int8", decode_mode="telescope")
        run_case(cfg, 16, hint=hint, rtol=0, atol=0)

    def test_uint4_int8_with_scaling_exact(self):
        # tele_i8 with scaling is MORE exact than the oracle (the oracle
        # rounds each dequantized weight to f16; the kernel applies the
        # group scale to an exact integer dot) — compare against f64 truth.
        from bitblas_tpu.quantization import packing
        cfg = MatmulConfig(M=16, N=N, K=K, A_dtype="int8", W_dtype="uint4",
                           with_scaling=True, group_size=128,
                           accum_dtype="int32", out_dtype="float32")
        ops = random_reference_operands(cfg, 16, 0)
        codes = packing.general_decompress(ops.qweight, 4).astype(np.float64)
        s_full = np.repeat(np.asarray(ops.scales, np.float64), 128, axis=1)
        truth = ops.A.astype(np.float64) @ (codes * s_full).T
        dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
        spec = KernelSpec.from_config(cfg, 16)
        hint = TileHint(block_m=64, block_n=512, block_k=128,
                        mma_dtype="int8", decode_mode="telescope")
        fn = make_dequant_matmul(spec, hint, interpret=True)
        got = fn(jnp.asarray(ops.A), jnp.asarray(dw.qweight),
                 scales=jnp.asarray(dw.scales))
        assert_close(got, truth, rtol=1e-6, atol=1e-4)


def test_batched_group_mode():
    cfg = MatmulConfig(M=16, N=N, K=K, A_dtype="float16", W_dtype="uint4",
                       with_scaling=True, group_size=128, fast_decoding=False)
    hint = TileHint(block_m=64, block_n=512, block_k=512,
                    mma_dtype="float16", precision="highest",
                    group_mode="batched")
    run_case(cfg, 16, hint=hint)


@pytest.mark.parametrize("w_dtype", ["uint4", "int4", "int2"])
def test_batched_group_telescope(w_dtype):
    """Telescope decode with the 3D batched-group dot epilogue (one dot per
    shifted operand covering all k-groups) matches the per-group loop."""
    cfg = MatmulConfig(M=8, N=N, K=K, A_dtype="float16", W_dtype=w_dtype,
                       with_scaling=True, group_size=128, fast_decoding=False)
    hint = TileHint(block_m=8, block_n=512, block_k=512,
                    mma_dtype="float32", decode_mode="telescope",
                    group_mode="batched")
    run_case(cfg, 8, hint=hint)


@pytest.mark.parametrize("n", [320, 3200 // 4, 192])
def test_odd_n_padding(n):
    """N that is not a multiple of the 128*e pack tile pads transparently
    (BitNet-3B's 3200/8448 faulted on lane-misaligned fallback tiles)."""
    cfg = MatmulConfig(M=8, N=n, K=256, A_dtype="int8", W_dtype="int2",
                       accum_dtype="int32", out_dtype="float32")
    run_case(cfg, 8, hint=TileHint(block_m=8, block_n=512, block_k=128,
                                   mma_dtype="int8",
                                   decode_mode="telescope"))
    cfg2 = MatmulConfig(M=8, N=n, K=256, A_dtype="float16", W_dtype="uint4",
                        with_scaling=True, group_size=64)
    run_case(cfg2, 8, hint=TileHint(block_m=8, block_n=256, block_k=128,
                                    mma_dtype="float32", precision="highest",
                                    decode_mode="telescope"))


class TestIntAccumBias:

    def test_int2_int8_with_fractional_bias(self):
        """int32-accumulation path must add the (float) bias in f32 —
        casting it to int32 would truncate fractional values."""
        cfg = MatmulConfig(M=16, N=N, K=K, A_dtype="int8", W_dtype="int2",
                           accum_dtype="int32", out_dtype="float32",
                           with_bias=True)
        hint = TileHint(block_m=64, block_n=256, block_k=128,
                        mma_dtype="int8")
        run_case(cfg, 16, hint=hint, rtol=0, atol=1e-3)


class TestOddN8Bit:

    @pytest.mark.parametrize("wdtype", ["int8", "e4m3_float8"])
    def test_8bit_weights_odd_n(self, wdtype):
        """8-bit dequant formats pad N to a 128-lane tile (misaligned lane
        blocks fault on real hardware)."""
        cfg = MatmulConfig(M=16, N=272, K=256, A_dtype="float16",
                           W_dtype=wdtype, out_dtype="float16")
        spec = KernelSpec.from_config(cfg, 16)
        assert spec.n_padded == 384
        hint = TileHint(block_m=64, block_n=128, block_k=128,
                        mma_dtype="float16", precision="highest")
        run_case(cfg, 16)


class TestR5DecodeVariants:
    """r5 decode-floor campaign: the new fp_mode / lut_mode variants must be
    BIT-IDENTICAL to the established modes through the full kernel (same
    mma dtype, same inputs) — they are pure re-expressions of the decode."""

    def _pair(self, w_dtype, base_hint, new_hint, m=16):
        cfg = MatmulConfig(M=m, N=N, K=K, A_dtype="float16", W_dtype=w_dtype,
                           with_scaling=True, group_size=128)
        ops = random_reference_operands(cfg, m, 3)
        dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
        spec = KernelSpec.from_config(cfg, m)
        A = jnp.asarray(ops.A)
        W = jnp.asarray(dw.qweight)
        S = jnp.asarray(dw.scales)
        a = make_dequant_matmul(spec, base_hint, interpret=True)(A, W, scales=S)
        b = make_dequant_matmul(spec, new_hint, interpret=True)(A, W, scales=S)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.parametrize("w", ["e4m3_float8", "e5m2_float8", "fp4_e2m1"])
    def test_fp_fast_matches_legacy_bf16(self, w):
        base = TileHint(block_m=64, block_n=256, block_k=128,
                        mma_dtype="bfloat16", fp_mode="legacy")
        for mode in ("fast", "fast16"):
            self._pair(w, base, TileHint(block_m=64, block_n=256,
                                         block_k=128, mma_dtype="bfloat16",
                                         fp_mode=mode))

    @pytest.mark.parametrize("w", ["e4m3_float8", "e5m2_float8"])
    def test_fp_fast_matches_legacy_f32(self, w):
        base = TileHint(block_m=64, block_n=256, block_k=128,
                        mma_dtype="float32", fp_mode="legacy")
        self._pair(w, base, TileHint(block_m=64, block_n=256, block_k=128,
                                     mma_dtype="float32", fp_mode="fast"))

    @pytest.mark.parametrize("mode", ["mux4b", "selectn"])
    def test_nf4_new_lut_modes(self, mode):
        base = TileHint(block_m=64, block_n=256, block_k=128,
                        mma_dtype="bfloat16", lut_mode="mux4")
        self._pair("nf4", base, TileHint(block_m=64, block_n=256,
                                         block_k=128, mma_dtype="bfloat16",
                                         lut_mode=mode))
