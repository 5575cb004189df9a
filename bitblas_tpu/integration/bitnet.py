"""BitNet b1.58 torch integration over the W_INT2 x A_INT8 TPU kernel.

Counterpart of the reference `BitLinearBitBLAS`
(/root/reference/integration/BitNet/utils_quant.py:19-230): torch-side
`weight_quant`/`activation_quant` fake-quant helpers (QAT parity) and a
`torch.nn.Module` built via `from_bit_linear` that ternarizes the master
weight to {-1, 0, 1} codes with a single absmean scale `sw`, then serves
inference through `models.bitnet.BitLinearInference` (per-token int8
activation quantization and the int2xint8 fused kernel run on device; the
torch boundary only converts dtypes).

state_dict fields: `qweight` [out, in] int8 ternary codes (unpacked — the
device slot-packing is rebuilt by `post_init()`), `sw` scalar float, and
optional `bias`.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn

from ..models.bitnet import BitLinearInference, weight_quant_codes


def weight_quant(weight: torch.Tensor, num_bits: int = 1) -> torch.Tensor:
    """Absmean ternary fake-quant (reference utils_quant.py:19-24)."""
    dtype = weight.dtype
    w = weight.float()
    s = 1.0 / w.abs().mean().clamp(min=1e-5)
    return ((w * s).round().clamp(-1, 1) / s).to(dtype)


def activation_quant(x: torch.Tensor, num_bits: int = 8) -> torch.Tensor:
    """Per-token absmax int8 fake-quant (reference utils_quant.py:27-34)."""
    dtype = x.dtype
    xf = x.float()
    qn = -(2 ** (num_bits - 1))
    qp = 2 ** (num_bits - 1) - 1
    s = qp / xf.abs().max(dim=-1, keepdim=True).values.clamp(min=1e-5)
    return ((xf * s).round().clamp(qn, qp) / s).to(dtype)


class BitLinearBitBLAS(nn.Module):
    """Inference BitLinear: ternary weights on the int8 MXU."""

    def __init__(self, in_features: int, out_features: int,
                 weight_bits: int = 1, input_bits: int = 8, **kwargs):
        super().__init__()
        if input_bits != 8:
            raise NotImplementedError("Only int8 activations are supported.")
        self.in_features = in_features
        self.out_features = out_features
        self.weight_bits = weight_bits
        self.input_bits = input_bits
        self.inner = BitLinearInference(in_features=in_features,
                                        out_features=out_features)
        self.register_buffer(
            "qweight", torch.zeros((out_features, in_features),
                                   dtype=torch.int8))
        self.register_buffer("sw", torch.ones((), dtype=torch.float32))
        # Always materialized (zeros when absent) so state_dicts saved
        # from biased layers load into fresh modules — a None buffer is
        # excluded from load_state_dict's local state and the "bias" key
        # then raises as unexpected.
        self.register_buffer(
            "bias", torch.zeros((out_features,), dtype=torch.float32))
        self.format = "bitnet"

    @classmethod
    def from_bit_linear(cls, bitlinear: nn.Module) -> "BitLinearBitBLAS":
        """Convert a trained BitLinear (fp master weight) to the packed
        inference layer (reference from_bit_linear, utils_quant.py:110-121)."""
        layer = cls(bitlinear.in_features, bitlinear.out_features)
        w = bitlinear.weight.data.detach().cpu().float().numpy()
        codes, sw = weight_quant_codes(w)
        layer.qweight = torch.from_numpy(codes)
        layer.sw = torch.tensor(float(sw), dtype=torch.float32)
        if getattr(bitlinear, "bias", None) is not None:
            layer.bias = bitlinear.bias.data.detach().float().cpu()
        layer.post_init()
        return layer

    def post_init(self) -> None:
        """Rebuild device operands from the torch buffers (call after
        `load_state_dict`)."""
        import jax.numpy as jnp
        codes = self.qweight.detach().cpu().numpy().astype(np.int8)
        self.inner.qweight = self.inner.matmul.transform_weight(codes)
        self.inner.sw = jnp.float32(float(self.sw))
        self.format = "bitblas"

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        lead = x.shape[:-1]
        x2 = x.reshape(-1, self.in_features)
        out = self.inner(x2.detach().cpu().float().numpy())
        out = torch.from_numpy(np.array(out, dtype=np.float32))
        out = out.reshape(*lead, self.out_features) + \
            self.bias.detach().cpu().float()
        return out.to(dtype=x.dtype, device=x.device)


__all__ = ["BitLinearBitBLAS", "weight_quant", "activation_quant"]
