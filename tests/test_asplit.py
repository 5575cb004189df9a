"""Activation-split plan (kernels/asplit.py) vs the XLA oracle.

The plan quantizes float activations to 15-bit fixed point (exact hi/lo int8
split) and feeds the int8-MXU telescope at 2M rows — strictly more activation
mantissa than the fused bf16 paths, so the fused budgets apply with margin.
"""

import numpy as np
import pytest

from bitblas_tpu.kernels.asplit import supports_asplit
from bitblas_tpu.kernels.spec import KernelSpec
from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.tuner import enumerate_hints, get_arch
from bitblas_tpu.tuner.hint import TileHint

from test_dequant_matmul_kernel import N, K, run_case

ASPLIT = TileHint(block_m=256, block_n=512, block_k=128,
                  mma_dtype="int8", decode_mode="asplit")


class TestNumerics:

    @pytest.mark.parametrize("m", [1, 16])
    def test_uint4_grouped_scales(self, m):
        # The W4A16 headline GEMV regime this plan targets.
        cfg = MatmulConfig(M=m, N=N, K=K, A_dtype="float16", W_dtype="uint4",
                           with_scaling=True, group_size=64,
                           fast_decoding=False, out_dtype="float32")
        run_case(cfg, m, hint=ASPLIT, rtol=2e-3, atol=0.05)

    @pytest.mark.parametrize("zeros_mode", ["original", "rescale",
                                            "quantized"])
    def test_uint4_zeros_modes(self, zeros_mode):
        cfg = MatmulConfig(M=16, N=N, K=K, A_dtype="float16",
                           W_dtype="uint4", with_scaling=True,
                           with_zeros=True, zeros_mode=zeros_mode,
                           group_size=64, fast_decoding=False,
                           out_dtype="float32")
        # the zero term scales rowsum(a): activation rounding accumulates
        # without the cancellation the main dot enjoys
        run_case(cfg, 16, hint=ASPLIT, rtol=5e-3, atol=0.2)

    def test_int4_codes_only(self):
        cfg = MatmulConfig(M=8, N=N, K=K, A_dtype="float16", W_dtype="int4",
                           fast_decoding=False, out_dtype="float32")
        run_case(cfg, 8, hint=ASPLIT, rtol=2e-3, atol=0.05)

    def test_uint2_scales_bias(self):
        cfg = MatmulConfig(M=16, N=N, K=K, A_dtype="float16", W_dtype="uint2",
                           with_scaling=True, with_bias=True, group_size=64,
                           fast_decoding=False, out_dtype="float32")
        run_case(cfg, 16, hint=ASPLIT, rtol=2e-3, atol=0.05)

    def test_bfloat16_activations(self):
        # bf16 rows far below the row max keep fewer fixed-point bits than
        # their 8-bit mantissa — budget accordingly (still ~bf16-class).
        cfg = MatmulConfig(M=16, N=N, K=K, A_dtype="bfloat16",
                           W_dtype="uint4", with_scaling=True, group_size=64,
                           fast_decoding=False, out_dtype="float32")
        # Fixed-point activation error is 3e-5*rowmax per element; through
        # a K-deep dot against |w*s|~O(10) weights the worst column
        # accumulates to O(0.5) absolute — the same class as the fused
        # path's bf16 operand rounding (2e-3*|a| per element), just
        # distributed differently. Budget on the absolute term.
        run_case(cfg, 16, hint=ASPLIT, rtol=2e-2, atol=1.0)

    def test_f16_out_dtype(self):
        cfg = MatmulConfig(M=16, N=N, K=K, A_dtype="float16", W_dtype="uint4",
                           with_scaling=True, group_size=64,
                           fast_decoding=False, out_dtype="float16")
        run_case(cfg, 16, hint=ASPLIT, rtol=1e-2, atol=0.1)


class TestSupportGating:

    def test_supported(self):
        cfg = MatmulConfig(M=16, N=N, K=K, A_dtype="float16", W_dtype="uint4",
                           with_scaling=True, group_size=64)
        spec = KernelSpec.from_config(cfg, 16)
        assert supports_asplit(spec, ASPLIT)

    @pytest.mark.parametrize("a_dtype,w_dtype", [
        ("int8", "uint4"),      # already int activations
        ("float16", "nf4"),     # non-linear code values
        ("float16", "fp4_e2m1"),
        ("float16", "float16"),  # native dense
    ])
    def test_unsupported(self, a_dtype, w_dtype):
        cfg = MatmulConfig(M=16, N=N, K=K, A_dtype=a_dtype, W_dtype=w_dtype,
                           with_scaling=w_dtype in ("nf4", "fp4_e2m1"),
                           group_size=64)
        spec = KernelSpec.from_config(cfg, 16)
        assert not supports_asplit(spec, ASPLIT)

    def test_enumerated_small_m_only(self):
        arch = get_arch()
        cfg = MatmulConfig(M=16, N=2048, K=2048, A_dtype="float16",
                           W_dtype="uint4", with_scaling=True,
                           group_size=128)
        hints = enumerate_hints(KernelSpec.from_config(cfg, 16), arch)
        assert any(h.decode_mode == "asplit" for h in hints)
        cfg_big = MatmulConfig(M=4096, N=2048, K=2048, A_dtype="float16",
                               W_dtype="uint4", with_scaling=True,
                               group_size=128)
        hints_big = enumerate_hints(KernelSpec.from_config(cfg_big, 4096),
                                    arch)
        assert not any(h.decode_mode == "asplit" for h in hints_big)

    def test_exact_split_roundtrip(self):
        # The hi/lo decomposition must reconstruct q exactly for every
        # representable magnitude.
        q = np.arange(-16256, 16257, dtype=np.float64)
        hi = np.round(q / 128.0)
        lo = q - hi * 128.0
        assert hi.min() >= -127 and hi.max() <= 127
        assert lo.min() >= -64 and lo.max() <= 64
        np.testing.assert_array_equal(hi * 128.0 + lo, q)
