"""Torch drop-in integration layer (reference
integration/pytorch/bitblas_quant_linear.py + integration/BitNet/
utils_quant.py): pack/forward parity against the fake-quantized torch
reference, state_dict interchange, and GPTQ repack mirroring."""

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from bitblas_tpu.integration.bitnet import (BitLinearBitBLAS,
                                            activation_quant, weight_quant)
from bitblas_tpu.integration.pytorch import QuantLinear
from bitblas_tpu.quantization import packing


def _fake_quant_linear(out_f, in_f, bits, group_size, bias, seed=0):
    """A fake-quantized nn.Linear + (scales, zeros) like AutoGPTQ hands the
    reference pack(): weights already on the quantization grid."""
    rng = np.random.default_rng(seed)
    groups = in_f // group_size
    scales = (rng.uniform(0.01, 0.1, size=(out_f, groups))
              .astype(np.float32))
    zeros = rng.integers(0, 2**bits, size=(out_f, groups)).astype(np.float32)
    codes = rng.integers(0, 2**bits, size=(out_f, in_f)).astype(np.float32)
    g_idx = np.arange(in_f) // group_size
    w = (codes - zeros[:, g_idx]) * scales[:, g_idx]
    lin = torch.nn.Linear(in_f, out_f, bias=bias)
    lin.weight.data = torch.from_numpy(w)
    if bias:
        lin.bias.data = torch.randn(out_f) * 0.1
    return lin, torch.from_numpy(scales), torch.from_numpy(zeros), codes


@pytest.mark.parametrize("bits,group_size,bias", [(4, 64, False),
                                                  (4, 64, True),
                                                  (2, 128, False)])
def test_pack_forward_matches_torch(bits, group_size, bias):
    out_f, in_f = 256, 256
    lin, scales, zeros, codes = _fake_quant_linear(out_f, in_f, bits,
                                                   group_size, bias)
    ql = QuantLinear(bits=bits, group_size=group_size, in_features=in_f,
                     out_features=out_f, bias=bias, enable_tuning=False)
    ql.pack(lin, scales, zeros)

    # pack() must reproduce the original codes exactly.
    unpacked = packing.unpack_qweight(ql.qweight.numpy(), bits)[:, :in_f]
    np.testing.assert_array_equal(unpacked, codes.astype(np.int8))

    x = torch.randn(8, in_f)
    got = ql(x)
    want = lin(x)
    err = (got.float() - want.float()).abs().max().item()
    scale = want.float().abs().max().item()
    assert err <= 0.02 * max(scale, 1.0), (err, scale)


def test_state_dict_round_trip():
    bits, group_size, out_f, in_f = 4, 64, 256, 256
    lin, scales, zeros, _ = _fake_quant_linear(out_f, in_f, bits, group_size,
                                               bias=False, seed=3)
    a = QuantLinear(bits=bits, group_size=group_size, in_features=in_f,
                    out_features=out_f, bias=False, enable_tuning=False)
    a.pack(lin, scales, zeros)

    b = QuantLinear(bits=bits, group_size=group_size, in_features=in_f,
                    out_features=out_f, bias=False, enable_tuning=False)
    b.load_state_dict(a.state_dict())
    b.post_init()

    x = torch.randn(4, in_f)
    np.testing.assert_allclose(a(x).float().numpy(), b(x).float().numpy(),
                               rtol=0, atol=1e-5)


def test_repack_from_gptq_mirrors_buffers():
    """After a GPTQ repack, save/load/post_init must reproduce the layer."""
    bits, group_size, out_f, in_f = 4, 64, 256, 256
    rng = np.random.default_rng(7)
    groups = in_f // group_size
    intweight = rng.integers(0, 16, size=(in_f, out_f)).astype(np.uint32)
    intzeros = rng.integers(0, 15, size=(groups, out_f)).astype(np.uint32)
    scales = rng.uniform(0.01, 0.1, size=(groups, out_f)).astype(np.float16)
    e32 = 32 // bits
    qweight = np.zeros((in_f // e32, out_f), dtype=np.uint32)
    for i in range(e32):
        qweight |= intweight[i::e32] << np.uint32(bits * i)
    qzeros = np.zeros((groups, out_f // e32), dtype=np.uint32)
    for i in range(e32):
        qzeros |= ((intzeros[:, i::e32] - 1) & 0xF).astype(np.uint32) \
            << np.uint32(bits * i)
    gptq = types.SimpleNamespace(qweight=qweight.view(np.int32),
                                 qzeros=qzeros.view(np.int32),
                                 scales=scales)

    a = QuantLinear(bits=bits, group_size=group_size, in_features=in_f,
                    out_features=out_f, bias=False, enable_tuning=False)
    a.repack_from_gptq(gptq)

    b = QuantLinear(bits=bits, group_size=group_size, in_features=in_f,
                    out_features=out_f, bias=False, enable_tuning=False)
    b.load_state_dict(a.state_dict())
    b.post_init()

    x = torch.randn(4, in_f)
    np.testing.assert_allclose(a(x).float().numpy(), b(x).float().numpy(),
                               rtol=0, atol=1e-5)


def test_quantlinear_rejects_unsupported():
    with pytest.raises(NotImplementedError):
        QuantLinear(bits=3, group_size=64, in_features=256, out_features=256,
                    bias=False)
    with pytest.raises(NotImplementedError):
        QuantLinear(bits=4, group_size=64, in_features=256, out_features=256,
                    bias=False, trainable=True)


# -- BitNet ----------------------------------------------------------------


def test_bitnet_fake_quant_helpers_match_reference_semantics():
    w = torch.randn(64, 64)
    wq = weight_quant(w)
    s = 1.0 / w.abs().mean().clamp(min=1e-5)
    assert set(torch.unique((wq * s).round()).tolist()) <= {-1.0, 0.0, 1.0}
    x = torch.randn(4, 64)
    xq = activation_quant(x)
    sx = 127.0 / x.abs().amax(dim=-1, keepdim=True)
    assert torch.all((xq * sx).round().abs() <= 127)


def test_bitlinear_from_bit_linear_forward():
    torch.manual_seed(0)
    lin = torch.nn.Linear(256, 128, bias=True)
    layer = BitLinearBitBLAS.from_bit_linear(lin)
    x = torch.randn(8, 256)

    got = layer(x).float()
    # torch-side reference: fake-quant weight + per-token int8 fake-quant
    # activation, dense matmul (reference BitLinear inference semantics).
    wq = weight_quant(lin.weight.data)
    xq = activation_quant(x)
    want = xq @ wq.t() + lin.bias.data
    err = (got - want).abs().max().item()
    assert err <= 0.05 * want.abs().max().item(), err


@pytest.mark.parametrize("bias", [False, True])
def test_bitlinear_state_dict_round_trip(bias):
    """Round-trip must work for biased layers too (review 2026-08-20: a
    None bias buffer made the saved 'bias' key unloadable)."""
    torch.manual_seed(1)
    lin = torch.nn.Linear(128, 128, bias=bias)
    a = BitLinearBitBLAS.from_bit_linear(lin)
    b = BitLinearBitBLAS(128, 128)
    b.load_state_dict(a.state_dict())
    b.post_init()
    x = torch.randn(4, 128)
    np.testing.assert_allclose(a(x).float().numpy(), b(x).float().numpy(),
                               rtol=0, atol=1e-5)


def test_repack_checkpoint_bias_handling():
    """A biased GPTQ checkpoint into a bias=False QuantLinear must raise
    loudly (the kernel was built without a bias operand — silently
    dropping it was the bug; review 2026-08-20). With bias=True the bias
    must survive the state_dict round trip."""
    bits, group_size, out_f, in_f = 4, 64, 256, 256
    rng = np.random.default_rng(11)
    groups = in_f // group_size
    intweight = rng.integers(0, 16, size=(in_f, out_f)).astype(np.uint32)
    intzeros = rng.integers(0, 15, size=(groups, out_f)).astype(np.uint32)
    scales = rng.uniform(0.01, 0.1, size=(groups, out_f)).astype(np.float16)
    e32 = 32 // bits
    qweight = np.zeros((in_f // e32, out_f), dtype=np.uint32)
    for i in range(e32):
        qweight |= intweight[i::e32] << np.uint32(bits * i)
    qzeros = np.zeros((groups, out_f // e32), dtype=np.uint32)
    for i in range(e32):
        qzeros |= ((intzeros[:, i::e32] - 1) & 0xF).astype(np.uint32) \
            << np.uint32(bits * i)
    gptq = types.SimpleNamespace(qweight=qweight.view(np.int32),
                                 qzeros=qzeros.view(np.int32),
                                 scales=scales,
                                 bias=rng.standard_normal(out_f)
                                 .astype(np.float16))

    bad = QuantLinear(bits=bits, group_size=group_size, in_features=in_f,
                      out_features=out_f, bias=False, enable_tuning=False)
    with pytest.raises(ValueError, match="bias"):
        bad.repack_from_gptq(gptq)

    a = QuantLinear(bits=bits, group_size=group_size, in_features=in_f,
                    out_features=out_f, bias=True, enable_tuning=False)
    a.repack_from_gptq(gptq)
    assert "bias" in a.state_dict()

    b = QuantLinear(bits=bits, group_size=group_size, in_features=in_f,
                    out_features=out_f, bias=True, enable_tuning=False)
    b.load_state_dict(a.state_dict())
    b.post_init()
    x = torch.randn(4, in_f)
    np.testing.assert_allclose(a(x).float().numpy(), b(x).float().numpy(),
                               rtol=0, atol=1e-5)
