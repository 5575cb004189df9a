"""QuantCompress: pack int8-unpacked low-bit weights into storage words.

Reference: /root/reference/bitblas/ops/quant_compress/ (TIR kernel compiled
for llvm/CPU, `QW[n, j] |= W[n, j*e+v] << bit*v`). On TPU this is a host-side
numpy transform (vectorized general_compress) — no kernel to compile.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..quantization import packing
from .matmul_config import OperatorConfig


@dataclass(frozen=True)
class QuantCompressConfig(OperatorConfig):
    M: Optional[int] = None        # rows (N of the weight) — reference naming
    N: Optional[int] = None        # cols (K of the weight)
    input_dtype: str = "int8"
    storage_dtype: str = "int8"
    dequantize_bits: int = 4

    def __post_init__(self):
        if self.M is None or self.N is None:
            raise ValueError("M and N must be specified")


class QuantCompress:

    def __init__(self, config: QuantCompressConfig, target: Optional[str] = None,
                 enable_tuning: bool = False, **_):
        del target, enable_tuning
        self.config = config

    def forward(self, weight: np.ndarray) -> np.ndarray:
        bits = self.config.dequantize_bits
        w = np.asarray(weight)
        assert w.shape == (self.config.M, self.config.N), w.shape
        return packing.general_compress(w, bits)

    __call__ = forward

    def retrieve_output_shape(self):
        bits = self.config.dequantize_bits
        return (self.config.M, self.config.N * bits // 8)
