"""BatchMatmul operator (reference ops/impl/batch_matmul_impl.py, dense only).

`C[b] = A[b] @ W[b]^T` per batch. Dense batched matmuls are XLA's bread and
butter (one dot_general with batch dims); the dequant-batched variant (shared
packed weight across the batch) vmaps nothing — it reshapes into the fused
2-D kernel, which is exactly how the reference treats batch as part of M.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..quantization.formats import as_jax_dtype
from .matmul_config import OperatorConfig


@dataclass(frozen=True)
class BatchMatmulConfig(OperatorConfig):
    Batch: Optional[int] = None
    M: Optional[int] = None
    N: Optional[int] = None
    K: Optional[int] = None
    A_dtype: str = "float16"
    W_dtype: str = "float16"
    out_dtype: str = "float16"
    accum_dtype: str = "float32"
    layout: str = "nt"

    def __post_init__(self):
        for f in ("Batch", "M", "N", "K"):
            if getattr(self, f) is None:
                raise ValueError(f"{f} must be specified")
        if self.A_dtype != self.W_dtype:
            raise ValueError("BatchMatmul is dense-only (A_dtype == W_dtype); "
                             "use Matmul for weight-dequant batched shapes "
                             "(batch folds into M)")


class BatchMatmul:

    def __init__(self, config: BatchMatmulConfig, name: str = "batch_matmul",
                 target: Optional[str] = None, enable_tuning: bool = False,
                 **_):
        del target, enable_tuning
        self.name = name
        self.config = config
        c = config
        acc = jnp.int32 if c.A_dtype in ("int8", "uint8") else jnp.float32
        out_dtype = as_jax_dtype(c.out_dtype)
        wdim = 2 if c.layout == "nt" else 1

        def fn(a, w):
            out = lax.dot_general(
                a, w,
                dimension_numbers=(((2,), (wdim,)), ((0,), (0,))),
                preferred_element_type=acc)
            return out.astype(out_dtype)

        self._fn = jax.jit(fn)

    def forward(self, a: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        """a [B, M, K]; w [B, N, K] for nt / [B, K, N] for nn."""
        return self._fn(a, w)

    def __call__(self, *args: Any, **kw: Any) -> Any:
        return self.forward(*args, **kw)
