"""LOP3Permutate: reference-format weight interleaving (compat shim).

Reference: /root/reference/bitblas/ops/lop3_permutate/ — interleaves packed
words so the CUDA LOP3 fast-decode reads contiguous nibbles. TPU kernels do
NOT use this layout (the slot-strided pack is the TPU fast-decode layout),
but the op is kept so that:
  * checkpoints already repacked for BitBLAS GPUs can be round-tripped
    (interleave is a pure bit permutation; `inverse()` undoes it), and
  * tooling that scripts against the reference op surface keeps working.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..quantization import packing
from .matmul_config import OperatorConfig


@dataclass(frozen=True)
class LOP3PermutateConfig(OperatorConfig):
    M: Optional[int] = None
    N: Optional[int] = None
    datatype: str = "float16"
    storage_dtype: str = "int8"
    dequantize_bits: int = 4

    def __post_init__(self):
        if self.M is None or self.N is None:
            raise ValueError("M and N must be specified")


class LOP3Permutate:

    def __init__(self, config: LOP3PermutateConfig,
                 target: Optional[str] = None, enable_tuning: bool = False,
                 **_):
        del target, enable_tuning
        self.config = config

    def forward(self, w: np.ndarray) -> np.ndarray:
        cfg = self.config
        w = np.asarray(w)
        target = "int8" if "int8" in cfg.datatype else "float16"
        shaped = w.reshape(cfg.M, -1)
        out = packing.interleave_weight(shaped.view(np.int8),
                                        cfg.dequantize_bits, target)
        return out.reshape(w.shape)

    def inverse(self, w: np.ndarray) -> np.ndarray:
        """Undo the interleave by brute-force index map (the permutation is
        static per (bits, dtype), so invert it once on a ramp)."""
        cfg = self.config
        bits = cfg.dequantize_bits
        target = "int8" if "int8" in cfg.datatype else "float16"
        elems = 32 // bits
        # Probe each source field with all-ones to find its destination.
        dest_of_src = []
        for i in range(elems):
            probe = np.array([((1 << bits) - 1) << (bits * i)], dtype=np.uint32)
            fwd = packing.interleave_weight(probe.view(np.int8), bits, target)
            word = int(fwd.view(np.uint32)[0])
            for j in range(elems):
                if (word >> (bits * j)) & ((1 << bits) - 1):
                    dest_of_src.append(j)
                    break
        w32 = np.asarray(w).reshape(-1).view(np.uint32)
        out = np.zeros_like(w32)
        for src, dst in enumerate(dest_of_src):
            field = (w32 >> np.uint32(bits * dst)) & np.uint32((1 << bits) - 1)
            out |= field << np.uint32(bits * src)
        return out.view(np.int8).reshape(np.asarray(w).shape)

    __call__ = forward
