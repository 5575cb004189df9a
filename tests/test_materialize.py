"""Two-pass materialize plan (kernels/materialize.py) vs the XLA oracle.

Same ladder as test_dequant_matmul_kernel.py but with decode_mode=
"materialize": decode the packed weights to a dense HBM operand once, then a
vendor dense dot. Numerics must match the oracle within the same budgets as
the fused bf16 paths (one rounding of the dequantized value into the MXU
dtype).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bitblas_tpu.kernels.materialize import supports_materialize
from bitblas_tpu.kernels.spec import KernelSpec
from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.tuner import enumerate_hints, get_arch
from bitblas_tpu.tuner.hint import TileHint

from test_dequant_matmul_kernel import N, K, run_case

MAT_BF16 = TileHint(block_m=64, block_n=256, block_k=128,
                    mma_dtype="bfloat16", decode_mode="materialize")
MAT_F32 = TileHint(block_m=64, block_n=256, block_k=128,
                   mma_dtype="float32", decode_mode="materialize",
                   precision="highest")
MAT_I8 = TileHint(block_m=64, block_n=256, block_k=128,
                  mma_dtype="int8", decode_mode="materialize")


class TestIntActivation:

    @pytest.mark.parametrize("m", [16, 512])
    def test_int2_codes_only(self, m):
        # The W2A8 bench row: exact integer arithmetic end to end.
        cfg = MatmulConfig(M=m, N=N, K=K, A_dtype="int8", W_dtype="int2",
                           accum_dtype="int32", out_dtype="float32")
        run_case(cfg, m, hint=MAT_I8, rtol=0, atol=0)

    def test_uint4_codes_only(self):
        cfg = MatmulConfig(M=64, N=N, K=K, A_dtype="int8", W_dtype="uint4",
                           accum_dtype="int32", out_dtype="float32")
        run_case(cfg, 64, hint=MAT_I8, rtol=0, atol=0)

    def test_int4_per_channel_scale(self):
        cfg = MatmulConfig(M=64, N=N, K=K, A_dtype="int8", W_dtype="int4",
                           with_scaling=True, group_size=-1,
                           out_dtype="float32")
        run_case(cfg, 64, hint=MAT_I8, rtol=1e-5, atol=1e-4)

    def test_int2_int8_out_saturates(self):
        cfg = MatmulConfig(M=32, N=N, K=K, A_dtype="int8", W_dtype="int2",
                           accum_dtype="int32", out_dtype="int8")
        run_case(cfg, 32, hint=MAT_I8, rtol=0, atol=0)

    def test_grouped_scale_unsupported(self):
        cfg = MatmulConfig(M=512, N=N, K=K, A_dtype="int8", W_dtype="int2",
                           with_scaling=True, group_size=128,
                           out_dtype="float32")
        spec = KernelSpec.from_config(cfg, 512)
        assert not supports_materialize(spec, MAT_I8)


class TestFloatActivation:
    # Tolerances: the materialize float path rounds each dequantized value
    # (w - z) * s ONCE into bf16 before the dot (the fused path dots exact
    # small-int bf16 codes and scales after). The reference's own compute
    # rounds w*s into f16 pre-dot (tirscript in_dtype compute) — same
    # structure, bf16 is just 3 mantissa bits coarser: error ~sqrt(K) *
    # 2^-9 * |row|, so the budget here is wider than the fused ladder's.
    RTOL, ATOL = 6e-2, 1.0

    @pytest.mark.parametrize("m", [16, 512])
    def test_uint4_grouped_scales(self, m):
        cfg = MatmulConfig(M=m, N=N, K=K, A_dtype="float16", W_dtype="uint4",
                           with_scaling=True, group_size=128,
                           fast_decoding=False)
        run_case(cfg, m, hint=MAT_BF16, rtol=self.RTOL, atol=self.ATOL)

    @pytest.mark.parametrize("zeros_mode",
                             ["original", "rescale", "quantized"])
    def test_uint4_zeros_modes(self, zeros_mode):
        cfg = MatmulConfig(M=32, N=N, K=K, A_dtype="float16", W_dtype="uint4",
                           with_scaling=True, with_zeros=True,
                           zeros_mode=zeros_mode, group_size=128,
                           fast_decoding=False)
        run_case(cfg, 32, hint=MAT_BF16, rtol=self.RTOL, atol=self.ATOL)

    def test_int4_plain(self):
        # bf16 holds the int codes exactly, but the f16 activations still
        # round into bf16 — same sqrt(K) budget as the scaled cases
        cfg = MatmulConfig(M=64, N=N, K=K, A_dtype="float16", W_dtype="int4",
                           fast_decoding=False)
        run_case(cfg, 64, hint=MAT_BF16, rtol=self.RTOL, atol=self.ATOL)

    def test_int2_scales(self):
        cfg = MatmulConfig(M=64, N=N, K=K, A_dtype="float16", W_dtype="int2",
                           with_scaling=True, group_size=128,
                           fast_decoding=False)
        run_case(cfg, 64, hint=MAT_BF16, rtol=self.RTOL, atol=self.ATOL)

    def test_nf4_scales(self):
        cfg = MatmulConfig(M=64, N=N, K=K, A_dtype="float16", W_dtype="nf4",
                           with_scaling=True, group_size=128)
        run_case(cfg, 64, hint=MAT_BF16, rtol=self.RTOL, atol=self.ATOL)

    def test_fp4(self):
        cfg = MatmulConfig(M=32, N=N, K=K, A_dtype="float16",
                           W_dtype="fp4_e2m1")
        run_case(cfg, 32, hint=MAT_BF16, rtol=self.RTOL, atol=self.ATOL)

    @pytest.mark.parametrize("wd", ["e4m3_float8", "e5m2_float8"])
    def test_fp8(self, wd):
        # f32 operands: decode is exact, only the f32 dot rounds
        cfg = MatmulConfig(M=32, N=N, K=K, A_dtype="float16", W_dtype=wd)
        run_case(cfg, 32, hint=MAT_F32)

    def test_bias(self):
        cfg = MatmulConfig(M=32, N=N, K=K, A_dtype="float16", W_dtype="uint4",
                           with_bias=True, fast_decoding=False)
        run_case(cfg, 32, hint=MAT_BF16, rtol=self.RTOL, atol=self.ATOL)

    def test_padded_n(self):
        # N=320 pads to a whole pack tile; padded columns must slice away.
        cfg = MatmulConfig(M=32, N=320, K=K, A_dtype="float16",
                           W_dtype="uint4", with_scaling=True,
                           group_size=128, fast_decoding=False)
        run_case(cfg, 32, hint=MAT_BF16, rtol=self.RTOL, atol=self.ATOL)


class TestTunerIntegration:

    def test_enumerated_for_large_m(self):
        cfg = MatmulConfig(M=4096, N=4096, K=4096, A_dtype="int8",
                           W_dtype="int2", accum_dtype="int32",
                           out_dtype="float32")
        spec = KernelSpec.from_config(cfg, 4096)
        hints = enumerate_hints(spec, get_arch("tpu_v5e"))
        mats = [h for h in hints if h.decode_mode == "materialize"]
        assert len(mats) == 1 and mats[0].mma_dtype == "int8"

    def test_not_enumerated_for_small_m(self):
        cfg = MatmulConfig(M=16, N=4096, K=4096, A_dtype="int8",
                           W_dtype="int2", accum_dtype="int32",
                           out_dtype="float32")
        spec = KernelSpec.from_config(cfg, 16)
        hints = enumerate_hints(spec, get_arch("tpu_v5e"))
        assert not any(h.decode_mode == "materialize" for h in hints)

    def test_roofline_prefers_fused_at_mid_m(self):
        # At m=256 the decode pass cannot amortize: fused must outrank it.
        from bitblas_tpu.tuner import roofline_seconds
        cfg = MatmulConfig(M=256, N=4096, K=4096, A_dtype="int8",
                           W_dtype="int2", accum_dtype="int32",
                           out_dtype="float32")
        spec = KernelSpec.from_config(cfg, 256)
        arch = get_arch("tpu_v5e")
        fused = TileHint(block_m=256, block_n=4096, block_k=512,
                         mma_dtype="int8", decode_mode="telescope")
        mat = TileHint(block_m=256, block_n=1024, block_k=1024,
                       mma_dtype="int8", decode_mode="materialize")
        assert roofline_seconds(spec, fused, arch) < \
            roofline_seconds(spec, mat, arch)


@pytest.mark.parametrize("kw", [
    dict(W_dtype="uint4", with_scaling=True, group_size=128),
    dict(W_dtype="uint4", with_scaling=True, with_zeros=True,
         zeros_mode="original", group_size=128),
    dict(W_dtype="uint4", with_scaling=True, with_zeros=True,
         zeros_mode="rescale", group_size=128),
    dict(W_dtype="uint4", with_scaling=True, with_zeros=True,
         zeros_mode="quantized", group_size=128),
    dict(W_dtype="int2"),
    dict(W_dtype="nf4", with_scaling=True, group_size=64),
    dict(W_dtype="fp4_e2m1", with_scaling=True, group_size=128),
    dict(W_dtype="e4m3_float8"),
], ids=lambda kw: f"{kw['W_dtype']}-{kw.get('zeros_mode', 'nz')}")
def test_pallas_decode_matches_xla_decode(kw):
    """make_weight_decode_pallas (in-register segment decode) must be
    bit-identical to make_weight_dequant (the XLA unpack) for every
    family/zeros-mode the float materialize path covers."""
    from bitblas_tpu.kernels.materialize import (make_weight_decode_pallas,
                                                 make_weight_dequant)
    from bitblas_tpu.ops.weight_transform import transform_reference_operands
    from bitblas_tpu.testing import random_reference_operands
    cfg = MatmulConfig(M=16, N=512, K=512, A_dtype="float16",
                       out_dtype="float16", **kw)
    spec = KernelSpec.from_config(cfg, 16)
    ops = random_reference_operands(cfg, 16, 0)
    dw = transform_reference_operands(cfg, ops.qweight, ops.scales,
                                      zeros=ops.zeros, qzeros=ops.qzeros)
    s = None if dw.scales is None else jnp.asarray(dw.scales)
    z = None if dw.zeros is None else jnp.asarray(dw.zeros)
    ref = make_weight_dequant(spec, "float32")(jnp.asarray(dw.qweight), s, z)
    got = make_weight_decode_pallas(spec, "float32", interpret=True)(
        jnp.asarray(dw.qweight), s, z)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_materialize_matmul_pallas_decode_parity():
    from bitblas_tpu.kernels.materialize import make_materialize_matmul
    from bitblas_tpu.ops.weight_transform import transform_reference_operands
    from bitblas_tpu.testing import random_reference_operands
    from bitblas_tpu.tuner.hint import TileHint
    cfg = MatmulConfig(M=64, N=512, K=512, A_dtype="float16",
                       W_dtype="uint4", with_scaling=True, group_size=128,
                       out_dtype="float16")
    spec = KernelSpec.from_config(cfg, 64)
    hint = TileHint(block_m=64, block_n=512, block_k=512,
                    mma_dtype="bfloat16", decode_mode="materialize")
    ops = random_reference_operands(cfg, 64, 1)
    dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
    a = jnp.asarray(ops.A)
    w = jnp.asarray(dw.qweight)
    s = jnp.asarray(dw.scales)
    ref = make_materialize_matmul(spec, hint, interpret=True)(a, w, scales=s)
    got = make_materialize_matmul(spec, hint, interpret=True,
                                  pallas_decode=True)(a, w, scales=s)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=0, atol=0)


def test_pallas_int8_decode_matches_xla():
    from bitblas_tpu.kernels.materialize import (
        make_weight_decode_int8, make_weight_decode_int8_pallas)
    from bitblas_tpu.ops.weight_transform import transform_reference_operands
    from bitblas_tpu.testing import random_reference_operands
    for w in ("int2", "uint2", "int4", "uint4", "int1"):
        cfg = MatmulConfig(M=16, N=512, K=512, A_dtype="int8", W_dtype=w,
                           accum_dtype="int32", out_dtype="float32")
        spec = KernelSpec.from_config(cfg, 16)
        ops = random_reference_operands(cfg, 16, 0)
        dw = transform_reference_operands(cfg, ops.qweight, None)
        wp = jnp.asarray(dw.qweight)
        ref = make_weight_decode_int8(spec)(wp)
        got = make_weight_decode_int8_pallas(spec, interpret=True)(wp)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got),
                                      err_msg=w)


def test_pallas_decode_rejects_non_pack_multiple_block_n():
    """A block_n that divides N but not the pack tile would silently
    truncate the slot-segment list (ADVICE r4) — must raise instead."""
    from bitblas_tpu.kernels.materialize import (
        make_weight_decode_int8_pallas, make_weight_decode_pallas)
    cfg = MatmulConfig(M=16, N=512, K=512, A_dtype="float16",
                       W_dtype="uint4", with_scaling=True, group_size=128,
                       out_dtype="float16")
    spec = KernelSpec.from_config(cfg, 16)
    with pytest.raises(ValueError, match="pack tile"):
        make_weight_decode_pallas(spec, "float32", interpret=True,
                                  block_n=64)
    cfg8 = MatmulConfig(M=16, N=512, K=512, A_dtype="int8", W_dtype="uint4",
                        out_dtype="float16")
    spec8 = KernelSpec.from_config(cfg8, 16)
    with pytest.raises(ValueError, match="pack tile"):
        make_weight_decode_int8_pallas(spec8, interpret=True, block_n=64)
