"""Flax NNX QuantLinear: the reference `bitblas.Linear` as an NNX module.

Quantized buffers (packed weight, scales, zeros, bias) are `nnx.Variable`s
so they serialize with the module state (orbax checkpoints), while the
compiled operator itself stays out of the pytree. `repack_from_gptq` /
`load_and_transform_weight` mirror /root/reference/bitblas/module/__init__.py.
"""

from __future__ import annotations

from typing import List, Optional, Union

import jax.numpy as jnp
import numpy as np
from flax import nnx

from . import Linear as _PlainLinear


class QuantParam(nnx.Variable):
    """Non-trainable quantized buffer."""


class QuantLinear(nnx.Module):
    """nn.Linear drop-in over the fused dequant matmul.

    Example:
        layer = QuantLinear(4096, 4096, A_dtype="float16", W_dtype="uint4",
                            with_scaling=True, with_zeros=True,
                            zeros_mode="quantized", group_size=128)
        layer.repack_from_gptq(gptq_module)
        y = layer(x)
    """

    def __init__(self, in_features: int, out_features: int, *,
                 bias: bool = False, A_dtype: str = "float16",
                 W_dtype: str = "uint4", accum_dtype: str = "float32",
                 out_dtype: str = "float16", group_size: int = -1,
                 with_scaling: Optional[bool] = None, with_zeros: bool = False,
                 zeros_mode: Optional[str] = None,
                 opt_M: Union[int, List[int], None] = None,
                 enable_tuning: bool = True,
                 fast_decoding: Optional[bool] = None,
                 target: Optional[str] = None):
        self._impl = _PlainLinear(
            in_features, out_features, bias=bias, A_dtype=A_dtype,
            W_dtype=W_dtype, accum_dtype=accum_dtype, out_dtype=out_dtype,
            group_size=group_size, with_scaling=with_scaling,
            with_zeros=with_zeros, zeros_mode=zeros_mode, opt_M=opt_M,
            enable_tuning=enable_tuning, fast_decoding=fast_decoding,
            target=target)
        impl = self._impl
        self.in_features = in_features
        self.out_features = out_features
        if impl.is_consistent:
            self.weight = QuantParam(impl.weight)
            self.qweight = None
        else:
            self.qweight = QuantParam(impl.qweight)
            self.weight = None
        self.scales = QuantParam(impl.scales) if impl.scales is not None else None
        self.zeros = QuantParam(impl.zeros) if impl.zeros is not None else None
        self.bias = QuantParam(impl.bias) if impl.bias is not None else None

    @property
    def bitblas_matmul(self):
        return self._impl.bitblas_matmul

    def _sync_from_impl(self):
        impl = self._impl
        if impl.is_consistent:
            self.weight.value = impl.weight
        else:
            self.qweight.value = impl.qweight
        if self.scales is not None and impl.scales is not None:
            self.scales.value = impl.scales
        if self.zeros is not None and impl.zeros is not None:
            self.zeros.value = impl.zeros
        if self.bias is not None and impl.bias is not None:
            self.bias.value = impl.bias

    def load_and_transform_weight(self, weight, scales=None, zeros=None,
                                  bias=None):
        self._impl.load_and_transform_weight(weight, scales, zeros, bias)
        self._sync_from_impl()

    def repack_from_gptq(self, gptq_module):
        self._impl.repack_from_gptq(gptq_module)
        self._sync_from_impl()

    def repack_from_gptq_v2(self, gptq_module):
        self._impl.repack_from_gptq_v2(gptq_module)
        self._sync_from_impl()

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        op = self._impl.bitblas_matmul
        W = (self.weight.value if self._impl.is_consistent
             else self.qweight.value)
        return op.forward(
            x, W,
            scale=None if self.scales is None else self.scales.value,
            zeros=None if self.zeros is None else self.zeros.value,
            bias=None if self.bias is None else self.bias.value)
