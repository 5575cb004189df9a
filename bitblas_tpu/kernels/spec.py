"""KernelSpec: static description of one compiled dequant-matmul kernel.

One spec = one (M bucket, N, K, dtype pair, quant mode) combination; the
operator layer owns the mapping from MatmulConfig + runtime M to specs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from ..ops.matmul_config import MatmulConfig
from ..quantization.formats import source_format_and_bits, storage_bits


@dataclass(frozen=True)
class KernelSpec:
    m: int
    n: int
    k: int
    a_dtype: str
    out_dtype: str
    family: str
    bits: int
    storage_bits: int = 8
    group_size: int = -1
    with_scaling: bool = False
    with_zeros: bool = False
    zeros_mode: str = "original"
    with_bias: bool = False
    fast_decoding: bool = False
    # True for native dense compute (XLA dot path) — no device-layout
    # padding applies there.
    native: bool = False

    @classmethod
    def from_config(cls, config: MatmulConfig, m: int) -> "KernelSpec":
        family, bits = source_format_and_bits(config.W_dtype)
        return cls(
            native=config.is_native_compute(),
            m=m,
            n=config.N,
            k=config.K,
            a_dtype=config.A_dtype,
            out_dtype=config.out_dtype,
            family=family,
            bits=bits,
            storage_bits=storage_bits(config.storage_dtype),
            group_size=config.effective_group_size,
            with_scaling=config.with_scaling,
            with_zeros=config.with_zeros,
            zeros_mode=config.zeros_mode,
            with_bias=config.with_bias,
            fast_decoding=bool(config.fast_decoding),
        )

    @property
    def elems_per_word(self) -> int:
        return max(1, self.storage_bits // self.bits)

    @property
    def is_int_activation(self) -> bool:
        return self.a_dtype in ("int8", "uint8", "int4", "uint4")

    @property
    def n_padded(self) -> int:
        """Device-layout N: rounded up to a whole 128*e pack tile so slot
        dots stay lane-aligned (misaligned fallback tiles fault on real
        hardware). 8-bit dequant formats pad to a 128-lane tile for the
        same reason; native dense compute (XLA dot) needs none. Kernels
        compute over n_padded and slice to n."""
        if self.native:
            return self.n
        t = 128 * self.elems_per_word if self.bits < 8 else 128
        return -(-self.n // t) * t

    @property
    def packed_k_major_shape(self):
        """Device weight layout shape: [K, N_padded*bits/storage_bits]."""
        return (self.k, self.n_padded // self.elems_per_word)
