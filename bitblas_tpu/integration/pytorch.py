"""PyTorch drop-in quantized linear backed by the TPU Matmul operator.

Counterpart of the reference `QuantLinear`
(/root/reference/integration/pytorch/bitblas_quant_linear.py:33-220): a
`torch.nn.Module` whose state_dict fields follow the reference layout —
`qweight` [out, in*bits/8] int8 (codes bit-packed along `in`), `scales`
[out, in/groups] half, `zeros` [out, in/groups] half (integer zero-points
stored as floats, `zeros_mode="original"` semantics: w = (q - z) * s),
optional `bias` [out] half — so checkpoints are interchangeable with the
reference's torch integration.

The compute path is NOT torch: `forward` converts the activation at the
host boundary and dispatches the fused Pallas dequant matmul through
`bitblas_tpu.module.Linear` (operator cache, dynamic-M buckets, tuned
hints). Packed device operands are rebuilt from the torch buffers by
`post_init()` — call it after `load_state_dict`, exactly like AutoGPTQ's
own post-init contract.
"""

from __future__ import annotations

from typing import List, Optional, Union

import numpy as np
import torch
import torch.nn as nn

from ..module import Linear
from ..quantization import packing


class QuantLinear(nn.Module):
    QUANT_TYPE = "bitblas_tpu"

    def __init__(
        self,
        bits: int,
        group_size: int,
        in_features: int,
        out_features: int,
        bias: bool,
        enable_tuning: bool = False,
        fast_decoding: Optional[bool] = None,
        opt_M: Optional[Union[int, List[int]]] = None,
        layout: str = "nt",
        trainable: bool = False,
        A_dtype: str = "float16",
        **kwargs,
    ):
        super().__init__()
        if bits not in (1, 2, 4):
            raise NotImplementedError("Only 1/2/4 bits are supported.")
        if trainable:
            raise NotImplementedError(
                "QuantLinear is inference-only (reference parity).")
        if layout != "nt":
            raise NotImplementedError("Only the nt layout is supported.")
        if group_size == -1:
            group_size = in_features
        if in_features % group_size != 0:
            raise ValueError(
                "`in_features` must be divisible by `group_size`.")
        # The reference demands in%128==0/out%256==0 (CUDA tile shapes); the
        # TPU kernels pad internally so only the Linear %16 rule applies.
        self.bits = bits
        self.in_features = in_features
        self.out_features = out_features
        self.group_size = group_size
        self.opt_M = opt_M

        self.inner = Linear(
            in_features,
            out_features,
            bias=bias,
            A_dtype=A_dtype,
            W_dtype=f"uint{bits}",
            accum_dtype="float32",
            out_dtype=A_dtype,
            group_size=group_size,
            with_scaling=True,
            with_zeros=True,
            zeros_mode="original",
            opt_M=opt_M,
            enable_tuning=enable_tuning,
            fast_decoding=fast_decoding,
        )

        elems_per_byte = 8 // bits
        groups = in_features // group_size
        self.register_buffer(
            "qweight",
            torch.zeros((out_features, in_features // elems_per_byte),
                        dtype=torch.int8))
        self.register_buffer(
            "scales", torch.ones((out_features, groups), dtype=torch.half))
        self.register_buffer(
            "zeros", torch.zeros((out_features, groups), dtype=torch.half))
        if bias:
            self.register_buffer(
                "bias", torch.zeros((out_features,), dtype=torch.half))
        else:
            self.bias = None

    # -- weight ingestion -------------------------------------------------

    def post_init(self) -> None:
        """Rebuild the device operands from the torch buffers (call after
        `load_state_dict`; mirrors AutoGPTQ's post-init contract)."""
        codes = packing.unpack_qweight(
            self.qweight.detach().cpu().numpy(),
            self.bits)[:, :self.in_features]
        self.inner.load_and_transform_weight(
            codes,
            scales=self.scales.detach().cpu().float().numpy(),
            zeros=self.zeros.detach().cpu().float().numpy(),
            bias=None if self.bias is None else
            self.bias.detach().cpu().float().numpy(),
        )

    def pack(self, linear: nn.Linear, scales: torch.Tensor,
             zeros: Optional[torch.Tensor] = None) -> None:
        """Quantize a fake-quantized `nn.Linear` into this layer (reference
        pack(), bitblas_quant_linear.py:157-198): codes =
        round(w / s) + z clipped to the field, so w ~= (codes - z) * s.

        scales/zeros are [out_features, in_features // group_size].
        """
        w = linear.weight.data.detach().cpu().float().numpy()
        s = scales.detach().cpu().float().numpy()
        z = (np.zeros_like(s) if zeros is None else
             zeros.detach().cpu().float().numpy())
        g_idx = np.arange(self.in_features) // self.group_size
        codes = np.rint(w / s[:, g_idx] + z[:, g_idx])
        codes = np.clip(codes, 0, 2**self.bits - 1).astype(np.int8)

        self.qweight = torch.from_numpy(
            packing.general_compress(codes, self.bits)).to(torch.int8)
        self.scales = scales.detach().to(torch.half).contiguous()
        self.zeros = torch.from_numpy(z).to(torch.half)
        if self.bias is not None and linear.bias is not None:
            self.bias = linear.bias.data.detach().to(torch.half).contiguous()
        self.post_init()

    def repack_from_gptq(self, gptq_module) -> None:
        """Ingest an AutoGPTQ (v1) CudaOldQuantLinear directly (qzeros +1
        quirk handled by module.Linear.repack_from_gptq)."""
        codes, intz = self.inner.repack_from_gptq(gptq_module)
        self._mirror_buffers_from_gptq(gptq_module, codes, intz)

    def repack_from_gptq_v2(self, gptq_module) -> None:
        """Ingest a GPTQModel (v2) checkpoint (no off-by-one)."""
        codes, intz = self.inner.repack_from_gptq_v2(gptq_module)
        self._mirror_buffers_from_gptq(gptq_module, codes, intz)

    def _mirror_buffers_from_gptq(self, gptq_module, codes: np.ndarray,
                                  intz: np.ndarray) -> None:
        """Keep this module's state_dict fields in sync with what the
        device operands were built from (codes/intz come back from the
        inner repack — no re-unpacking), so a save/load round-trip after
        a GPTQ repack reproduces the same layer."""
        self.qweight = torch.from_numpy(
            packing.general_compress(np.ascontiguousarray(codes),
                                     self.bits)).to(torch.int8)
        sc = gptq_module.scales
        sc = sc.detach().cpu().numpy() if hasattr(sc, "detach") else \
            np.asarray(sc)
        self.scales = torch.from_numpy(
            np.ascontiguousarray(sc.T.astype(np.float16)))
        self.zeros = torch.from_numpy(
            np.ascontiguousarray(intz.T.astype(np.float16)))
        b = getattr(gptq_module, "bias", None)
        if b is not None:
            # bias=False + biased checkpoint already raised in the inner
            # repack (module.Linear), so self.bias exists here.
            b = b.detach().cpu().numpy() if hasattr(b, "detach") else \
                np.asarray(b)
            self.bias = torch.from_numpy(b.astype(np.float16))

    # -- forward ----------------------------------------------------------

    def forward(self, A: torch.Tensor) -> torch.Tensor:
        lead = A.shape[:-1]
        a2 = A.reshape(-1, self.in_features)
        out = self.inner.forward(a2.detach().cpu().float().numpy())
        out = torch.from_numpy(np.array(out, dtype=np.float32))
        return (out.reshape(*lead, self.out_features)
                .to(dtype=A.dtype, device=A.device))


__all__ = ["QuantLinear"]
