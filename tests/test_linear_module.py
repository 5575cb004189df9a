"""Linear module + GPTQ repack tests (reference testing/python/module/
test_bitblas_linear.py and test_repack_from_gptq.py)."""

import types

import jax.numpy as jnp
import numpy as np
import pytest

from bitblas_tpu import Linear, MatmulConfig
from bitblas_tpu.ops.reference import matmul_reference
from bitblas_tpu.quantization import packing
from bitblas_tpu.testing import assert_close


def _pack_gptq_v1(intweight, intzeros, bits):
    """Build an AutoGPTQ-style module: qweight [in, out] int32-packed along
    in; qzeros [in/g, out] packed storing z-1; scales [in/g, out]."""
    N, K = intweight.shape  # [out, in]
    e32 = 32 // bits
    w_in_out = intweight.T.astype(np.uint32)  # [in, out]
    qweight = np.zeros((K // e32, N), dtype=np.uint32)
    for i in range(e32):
        qweight |= w_in_out[i::e32] << np.uint32(bits * i)
    z = (intzeros.astype(np.uint32) - 1) & ((1 << bits) - 1)  # [in/g, out]
    qzeros = np.zeros((z.shape[0], N // e32), dtype=np.uint32)
    for i in range(e32):
        qzeros |= z[:, i::e32] << np.uint32(bits * i)
    return qweight.view(np.int32), qzeros.view(np.int32)


class TestLinear:

    def test_quantized_forward(self):
        K, N, g = 512, 512, 128
        lin = Linear(K, N, A_dtype="float16", W_dtype="uint4",
                     with_scaling=True, with_zeros=True,
                     zeros_mode="original", group_size=g,
                     opt_M=[1, 16], enable_tuning=False)
        rng = np.random.default_rng(0)
        codes = rng.integers(0, 16, (N, K)).astype(np.int8)
        scales = (rng.standard_normal((N, K // g)) * 0.1 + 0.5).astype(np.float16)
        zeros = rng.integers(0, 16, (N, K // g)).astype(np.float16)
        lin.load_and_transform_weight(codes, scales=scales, zeros=zeros)
        A = rng.standard_normal((4, K)).astype(np.float16)
        out = lin(jnp.asarray(A))
        cfg = lin.bitblas_matmul.config
        expected = matmul_reference(cfg, jnp.asarray(A),
                                    jnp.asarray(packing.general_compress(codes, 4)),
                                    jnp.asarray(scales), jnp.asarray(zeros))
        assert_close(out, expected, rtol=2e-2, atol=0.35)

    def test_consistent_forward(self):
        lin = Linear(256, 256, A_dtype="float16", W_dtype="float16",
                     opt_M=[16], enable_tuning=False)
        rng = np.random.default_rng(1)
        W = rng.standard_normal((256, 256)).astype(np.float16)
        lin.load_and_transform_weight(W)
        A = rng.standard_normal((8, 256)).astype(np.float16)
        out = lin(jnp.asarray(A))
        expected = A.astype(np.float32) @ W.T.astype(np.float32)
        assert_close(out, expected, rtol=1e-2, atol=5e-2)

    @pytest.mark.parametrize("zeros_mode", ["original", "rescale", "quantized"])
    def test_repack_from_gptq_v1(self, zeros_mode):
        K, N, g, bits = 512, 512, 128, 4
        rng = np.random.default_rng(2)
        intweight = rng.integers(0, 16, (N, K)).astype(np.int8)  # [out, in]
        intzeros = rng.integers(1, 15, (K // g, N)).astype(np.int32)
        scales = (rng.standard_normal((K // g, N)) * 0.05 + 0.4).astype(np.float16)
        qweight, qzeros = _pack_gptq_v1(intweight, intzeros, bits)
        gptq = types.SimpleNamespace(qweight=qweight, qzeros=qzeros,
                                     scales=scales, bias=None)
        lin = Linear(K, N, A_dtype="float16", W_dtype="uint4",
                     with_scaling=True, with_zeros=True,
                     zeros_mode=zeros_mode, group_size=g, opt_M=[16],
                     enable_tuning=False)
        lin.repack_from_gptq(gptq)
        A = rng.standard_normal((4, K)).astype(np.float16)
        out = lin(jnp.asarray(A))
        # Ground truth: (w - z) * s per GPTQ semantics.
        s_full = np.repeat(scales.T, g, axis=1).astype(np.float32)  # [N, K]
        z_full = np.repeat(intzeros.T, g, axis=1).astype(np.float32)
        W_deq = (intweight.astype(np.float32) - z_full) * s_full
        expected = A.astype(np.float32) @ W_deq.T
        assert_close(out, expected, rtol=2e-2, atol=0.5, msg=zeros_mode)

    def test_repack_from_gptq_v2(self):
        K, N, g, bits = 512, 512, 128, 4
        rng = np.random.default_rng(3)
        intweight = rng.integers(0, 16, (N, K)).astype(np.int8)
        intzeros = rng.integers(0, 16, (K // g, N)).astype(np.int32)
        scales = (rng.standard_normal((K // g, N)) * 0.05 + 0.4).astype(np.float16)
        e32 = 32 // bits
        w_in_out = intweight.T.astype(np.uint32)
        qweight = np.zeros((K // e32, N), dtype=np.uint32)
        for i in range(e32):
            qweight |= w_in_out[i::e32] << np.uint32(bits * i)
        qzeros = np.zeros((K // g, N // e32), dtype=np.uint32)
        for i in range(e32):
            qzeros |= (intzeros.astype(np.uint32)[:, i::e32]
                       & 0xF) << np.uint32(bits * i)
        gptq = types.SimpleNamespace(qweight=qweight.view(np.int32),
                                     qzeros=qzeros.view(np.int32),
                                     scales=scales, bias=None)
        lin = Linear(K, N, A_dtype="float16", W_dtype="uint4",
                     with_scaling=True, with_zeros=True,
                     zeros_mode="original", group_size=g, opt_M=[16],
                     enable_tuning=False)
        lin.repack_from_gptq_v2(gptq)
        A = rng.standard_normal((4, K)).astype(np.float16)
        out = lin(jnp.asarray(A))
        s_full = np.repeat(scales.T, g, axis=1).astype(np.float32)
        z_full = np.repeat(intzeros.T, g, axis=1).astype(np.float32)
        W_deq = (intweight.astype(np.float32) - z_full) * s_full
        expected = A.astype(np.float32) @ W_deq.T
        assert_close(out, expected, rtol=2e-2, atol=0.5)


def test_repack_accepts_torch_tensors():
    """Integration path: GPTQ modules hold torch tensors (reference
    integration/pytorch); _to_numpy must consume them directly."""
    torch = pytest.importorskip("torch")
    K, N, g, bits = 256, 256, 128, 4
    rng = np.random.default_rng(5)
    intweight = rng.integers(0, 16, (N, K)).astype(np.int8)
    intzeros = rng.integers(1, 15, (K // g, N)).astype(np.int32)
    scales = (rng.standard_normal((K // g, N)) * 0.05 + 0.4).astype(np.float16)
    qweight, qzeros = _pack_gptq_v1(intweight, intzeros, bits)
    gptq = types.SimpleNamespace(
        qweight=torch.from_numpy(qweight),
        qzeros=torch.from_numpy(qzeros),
        scales=torch.from_numpy(scales.astype(np.float32)).half(),
        bias=None)
    lin = Linear(K, N, A_dtype="float16", W_dtype="uint4",
                 with_scaling=True, with_zeros=True, zeros_mode="original",
                 group_size=g, opt_M=[16], enable_tuning=False)
    lin.repack_from_gptq(gptq)
    A = rng.standard_normal((4, K)).astype(np.float16)
    out = lin(jnp.asarray(A))
    s_full = np.repeat(scales.T, g, axis=1).astype(np.float32)
    z_full = np.repeat(intzeros.T, g, axis=1).astype(np.float32)
    W_deq = (intweight.astype(np.float32) - z_full) * s_full
    expected = A.astype(np.float32) @ W_deq.T
    assert_close(out, expected, rtol=2e-2, atol=0.5)


def test_linear_odd_out_features_padded_rows():
    """out_features not a multiple of the pack tile: buffers and loaded
    scales/zeros/bias must carry the device-layout padded N."""
    import numpy as np
    from bitblas_tpu import Linear
    from bitblas_tpu.ops.reference import matmul_reference
    lin = Linear(in_features=256, out_features=272, A_dtype="float16",
                 W_dtype="uint4", with_scaling=True, with_zeros=True,
                 zeros_mode="original", group_size=64, bias=True,
                 enable_tuning=False)
    assert lin.scales.shape[-1] == 512  # padded to the 256-wide pack tile
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 16, (272, 256)).astype(np.int8)
    scales = (np.abs(rng.standard_normal((272, 4))) * 0.1 + 0.1
              ).astype(np.float16)
    zeros = rng.integers(0, 16, (272, 4)).astype(np.float16)
    bb = rng.standard_normal(272).astype(np.float16)
    lin.load_and_transform_weight(codes, scales=scales, zeros=zeros, bias=bb)
    A = jnp.asarray(rng.standard_normal((8, 256)).astype(np.float16))
    out = lin(A)
    assert out.shape == (8, 272)
    import bitblas_tpu.quantization.packing as packing
    qref = packing.general_compress(codes.astype(np.uint8), 4)
    cfg = lin.bitblas_matmul.config
    ref = matmul_reference(cfg, A, jnp.asarray(qref), jnp.asarray(scales),
                           jnp.asarray(zeros), bias=jnp.asarray(bb))
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=5e-2, atol=0.5)
