"""Conv2D operator (reference ops/impl/convolution2d_impl.py, 198 LoC TIR).

The reference emits im2col-style TIR conv kernels scheduled by the GPU rules
(dense only — it has no dequantized conv). On TPU:

* Dense `Conv2D`: `lax.conv_general_dilated` IS the vendor-tuned conv path
  (XLA maps it onto the MXU directly), so the operator is a thin config-ed
  wrapper with the same dtype/accum surface as Matmul.
* `QuantConv2D` (this build goes beyond the reference): weight-quantized
  conv as im2col patches (`lax.conv_general_dilated_patches`) feeding the
  *fused* dequant-GEMM Pallas kernel via a `Matmul` op — the packed filter
  is decoded in-kernel, never materialized in HBM. Patch features are
  channel-major (C, KH, KW), so `transform_weight` flattens the HWIO filter
  as [F, C*KH*KW] in that order.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from ..quantization.formats import as_jax_dtype
from .matmul_config import OperatorConfig


@dataclass(frozen=True)
class Conv2DConfig(OperatorConfig):
    N: Optional[int] = None          # batch
    C: Optional[int] = None          # in channels
    H: Optional[int] = None
    W: Optional[int] = None
    F: Optional[int] = None          # out channels
    K: Optional[int] = None          # kernel size (square)
    S: int = 1                       # stride
    D: int = 1                       # dilation
    P: int = 0                       # padding
    in_dtype: str = "float16"
    out_dtype: str = "float16"
    accum_dtype: str = "float32"

    def __post_init__(self):
        for f in ("N", "C", "H", "W", "F", "K"):
            if getattr(self, f) is None:
                raise ValueError(f"{f} must be specified")


class Conv2D:
    """NHWC x HWIO conv on the MXU via XLA."""

    def __init__(self, config: Conv2DConfig, name: str = "conv2d",
                 target: Optional[str] = None, enable_tuning: bool = False,
                 **_):
        del target, enable_tuning
        self.name = name
        self.config = config
        c = config
        acc = jnp.int32 if c.in_dtype in ("int8", "uint8") else jnp.float32
        out_dtype = as_jax_dtype(c.out_dtype)

        def fn(x, w):
            out = jax.lax.conv_general_dilated(
                x, w,
                window_strides=(c.S, c.S),
                padding=[(c.P, c.P), (c.P, c.P)],
                rhs_dilation=(c.D, c.D),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc,
            )
            return out.astype(out_dtype)

        self._fn = jax.jit(fn)

    def forward(self, x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        """x [N, H, W, C], w [K, K, C, F] -> [N, H', W', F]."""
        return self._fn(x, w)

    def __call__(self, *args: Any, **kw: Any) -> Any:
        return self.forward(*args, **kw)


@dataclass(frozen=True)
class QuantConv2DConfig(Conv2DConfig):
    """Weight-quantized conv: any dequant `W_dtype` the Matmul kernel
    supports (uint/int 1-8, nf4, fp4_e2m1, fp8), grouped scaling along the
    C*KH*KW contraction axis."""
    W_dtype: str = "uint4"
    group_size: int = -1
    with_scaling: bool = True
    with_zeros: bool = False
    zeros_mode: str = "original"


class QuantConv2D:
    """Fused dequant conv: im2col patches -> dequant-GEMM Pallas kernel.

    forward(x [N,H,W,C], *packed) with packed from `transform_weight`.
    The contraction K = C*KH*KW; output columns are the F filters.
    """

    def __init__(self, config: QuantConv2DConfig, name: str = "quant_conv2d",
                 target: Optional[str] = None, enable_tuning: bool = False,
                 **kw):
        self.name = name
        self.config = config
        c = config
        from .matmul import Matmul
        from .matmul_config import MatmulConfig
        kdim = c.C * c.K * c.K
        self._out_hw = (
            (c.H + 2 * c.P - (c.D * (c.K - 1) + 1)) // c.S + 1,
            (c.W + 2 * c.P - (c.D * (c.K - 1) + 1)) // c.S + 1,
        )
        m = c.N * self._out_hw[0] * self._out_hw[1]
        self._matmul = Matmul(MatmulConfig(
            M=m, N=c.F, K=kdim, A_dtype=c.in_dtype, W_dtype=c.W_dtype,
            out_dtype=c.out_dtype, accum_dtype=c.accum_dtype,
            group_size=c.group_size, with_scaling=c.with_scaling,
            with_zeros=c.with_zeros, zeros_mode=c.zeros_mode,
        ), name=f"{name}_mm", target=target, enable_tuning=enable_tuning,
            **kw)

    def transform_weight(self, weight, scale=None, zeros=None, bias=None):
        """weight [KH, KW, C, F] raw codes -> packed device tensors.
        scale/zeros follow Matmul conventions at [F, K/group] over the
        channel-major flattened contraction."""
        import numpy as np
        w = np.asarray(weight)
        kh, kw, cin, f = w.shape
        flat = w.transpose(3, 2, 0, 1).reshape(f, cin * kh * kw)
        return self._matmul.transform_weight(flat, scale=scale, zeros=zeros,
                                             bias=bias)

    def forward(self, x: jnp.ndarray, W, scale=None, zeros=None, bias=None):
        c = self.config
        patches = jax.lax.conv_general_dilated_patches(
            x, filter_shape=(c.K, c.K), window_strides=(c.S, c.S),
            padding=[(c.P, c.P), (c.P, c.P)], rhs_dilation=(c.D, c.D),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        n, ho, wo, kdim = patches.shape
        out = self._matmul.forward(patches.reshape(n * ho * wo, kdim), W,
                                   scale=scale, zeros=zeros, bias=bias)
        return out.reshape(n, ho, wo, c.F)

    def __call__(self, *args: Any, **kw: Any) -> Any:
        return self.forward(*args, **kw)
