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
    C*KH*KW contraction axis.

    `route` picks the compute plan:
      * "materialize" — dequantize the (tiny) packed filter in-graph, then
        XLA's native conv. At conv shapes the activation traffic dwarfs the
        filter, so the decode amortizes to ~nothing and the conv runs at
        the dense rate (measured v5e 2026-08-20: fused im2col was 1.6-4.8%
        of roofline at ResNet 3x3 shapes vs 85-90% dense — the M>>N,K
        regime re-decodes W per M-tile and starves the MXU).
      * "fused" — im2col patches into the fused dequant-GEMM Pallas kernel
        (never materializes W to HBM; the memory-bound choice).
      * "auto" — materialize when the decode supports the format, else
        fused.
    """
    W_dtype: str = "uint4"
    group_size: int = -1
    with_scaling: bool = True
    with_zeros: bool = False
    zeros_mode: str = "original"
    route: str = "auto"
    # Filter-decode implementation for the materialize route: "pallas"
    # (in-register segment decode, the default) or "xla" (elementwise
    # unpack fused into the conv graph). Measured (tpu_mat_decode_probe
    # 2026-08-20): the XLA unpack's lane relayouts cost 30-50us at
    # ResNet filter sizes — pallas took 512x7^2 from 94.1 to 51.8us
    # (78.6 -> 142.8 TF/s), 256x14^2 from 66.4 to 52.2, tie at 128x28^2.
    decode_impl: str = "pallas"


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
        mm_cfg = MatmulConfig(
            M=m, N=c.F, K=kdim, A_dtype=c.in_dtype, W_dtype=c.W_dtype,
            out_dtype=c.out_dtype, accum_dtype=c.accum_dtype,
            group_size=c.group_size, with_scaling=c.with_scaling,
            with_zeros=c.with_zeros, zeros_mode=c.zeros_mode,
        )
        from ..kernels.spec import KernelSpec
        self.route = self._resolve_route(
            c.route, KernelSpec.from_config(mm_cfg, 8))
        # The fused Matmul also provides transform_weight's layouts for
        # the materialize route — but only tune its kernels when they
        # will actually run (a materialize-route op would otherwise pay
        # a full on-chip fused-kernel sweep for a dead path).
        self._matmul = Matmul(
            mm_cfg, name=f"{name}_mm", target=target,
            enable_tuning=enable_tuning and self.route == "fused", **kw)
        self._conv_fn = (self._build_materialize_conv()
                         if self.route == "materialize" else None)

    def _resolve_route(self, route: str, spec) -> str:
        if route not in ("auto", "fused", "materialize"):
            raise ValueError(f"unknown route {route!r}")
        from ..kernels.materialize import supports_materialize_spec
        ok = supports_materialize_spec(spec)
        if route == "materialize" and not ok:
            raise ValueError(
                f"materialize route unsupported for W_dtype="
                f"{self.config.W_dtype} A_dtype={self.config.in_dtype} "
                f"(native compute, or zeros/grouped-scale limits on int "
                f"activations)")
        if route == "auto":
            return "materialize" if ok else "fused"
        return route

    def _build_materialize_conv(self):
        """Dequantize-filter + native XLA conv (see QuantConv2DConfig)."""
        from ..kernels.materialize import (make_weight_decode_int8,
                                           make_weight_dequant)
        c = self.config
        spec = self._matmul._make_spec(8)  # decode is M-independent
        n_pad = spec.n_padded
        out_dtype = as_jax_dtype(c.out_dtype)
        int_act = spec.is_int_activation

        def _to_hwio(w2d):
            # decoded [K, n_pad] rows are channel-major (C, KH, KW)
            return (w2d[:, :c.F]
                    .reshape(c.C, c.K, c.K, c.F)
                    .transpose(1, 2, 0, 3))

        conv_kw = dict(
            window_strides=(c.S, c.S),
            padding=[(c.P, c.P), (c.P, c.P)],
            rhs_dilation=(c.D, c.D),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

        if int_act:
            if c.decode_impl == "pallas" and not self._matmul.interpret:
                from ..kernels.materialize import \
                    make_weight_decode_int8_pallas
                decode = make_weight_decode_int8_pallas(spec)
            else:
                decode = make_weight_decode_int8(spec)

            def fn(x, Wp, scales=None, zeros=None, bias=None):
                del zeros
                hwio = _to_hwio(decode(Wp))
                out = jax.lax.conv_general_dilated(
                    x, hwio, preferred_element_type=jnp.int32, **conv_kw)
                if c.with_scaling:
                    out = out.astype(jnp.float32) * \
                        scales.reshape(1, 1, 1, n_pad)[..., :c.F]
                if bias is not None:
                    out = out.astype(jnp.float32) + \
                        bias.reshape(1, 1, 1, n_pad)[..., :c.F]
                return out.astype(out_dtype)

            return jax.jit(fn)

        mma = "bfloat16" if c.in_dtype in ("float16", "bfloat16") \
            else "float32"
        # pallas for every family incl. NF4 (phase-Q probe: the XLA
        # take-gather's unpack relayouts outweigh the in-kernel mux);
        # interpret mode keeps the lighter XLA path, matching
        # make_materialize_matmul's CPU default (the dedicated parity
        # tests cover the pallas kernel).
        if c.decode_impl == "pallas" and not self._matmul.interpret:
            from ..kernels.materialize import make_weight_decode_pallas
            dequant = make_weight_decode_pallas(
                spec, mma, interpret=self._matmul.interpret)
        else:
            dequant = make_weight_dequant(spec, mma)
        mma_jnp = as_jax_dtype("bfloat16" if mma == "bfloat16"
                               else "float32")

        def fn(x, Wp, scales=None, zeros=None, bias=None):
            hwio = _to_hwio(dequant(Wp, scales, zeros))
            out = jax.lax.conv_general_dilated(
                x.astype(mma_jnp), hwio,
                preferred_element_type=jnp.float32, **conv_kw)
            if bias is not None:
                out = out + bias.reshape(1, 1, 1, n_pad)[..., :c.F]
            return out.astype(out_dtype)

        return jax.jit(fn)

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
        if self._conv_fn is not None:
            return self._conv_fn(x, W, scale, zeros, bias)
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
