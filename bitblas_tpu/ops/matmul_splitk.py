"""MatmulWithSplitK: split the reduction across parallel partial outputs.

Reference: /root/reference/bitblas/ops/general_matmul_splitk.py:21-199 — adds
a `k_split` factor so skinny GEMMs fill more SMs, with partial results
combined by atomics. On TPU, grid steps already stream the full K through
one core's MXU, so split-K buys nothing intra-chip; the honest TPU analog
runs `k_split` fused kernels over K shards and sums the f32 partials (which
is also exactly the cross-chip tensor-parallel contraction pattern used by
parallel/, where the sum becomes a psum).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.spec import KernelSpec
from .matmul import Matmul
from .matmul_config import MatmulConfig


@dataclass(frozen=True)
class MatmulConfigWithSplitK(MatmulConfig):
    k_split: int = 1

    def __post_init__(self):
        super().__post_init__()
        if self.K % max(self.k_split, 1):
            raise ValueError(f"k_split={self.k_split} must divide K={self.K}")
        g = self.effective_group_size
        if (self.K // max(self.k_split, 1)) % g:
            raise ValueError("K/k_split must stay group-aligned")


class MatmulWithSplitK(Matmul):
    """Runs the fused kernel per K shard; partials summed in f32."""

    def __init__(self, config: MatmulConfigWithSplitK, name: str = "matmul_splitk",
                 **kwargs):
        self.k_split = max(config.k_split, 1)
        super().__init__(config, name=name, **kwargs)

    def _make_spec(self, m: int) -> KernelSpec:
        spec = KernelSpec.from_config(self.config, m)
        if self.k_split == 1:
            return spec
        import dataclasses
        return dataclasses.replace(spec, k=spec.k // self.k_split)

    def _build_kernel(self, spec: KernelSpec, hint):
        shard_fn = super()._build_kernel(spec, hint)
        if self.k_split == 1:
            return shard_fn
        ks = self.k_split
        kk = spec.k
        g = self.config.effective_group_size

        def fn(A, Wp, scales=None, zeros=None, bias=None):
            parts = []
            for s in range(ks):
                a_s = A[:, s * kk:(s + 1) * kk]
                w_s = Wp[s * kk:(s + 1) * kk]
                sc = None if scales is None else \
                    scales[s * kk // g:(s + 1) * kk // g]
                zz = None if zeros is None else \
                    zeros[s * kk // g:(s + 1) * kk // g]
                parts.append(shard_fn(a_s, w_s, scales=sc, zeros=zz,
                                      bias=bias if s == 0 else None)
                             .astype(jnp.float32))
            total = jnp.sum(jnp.stack(parts), axis=0)
            from ..quantization.formats import as_jax_dtype
            return total.astype(as_jax_dtype(self.config.out_dtype))

        return fn
