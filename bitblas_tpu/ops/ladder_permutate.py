"""LadderPermutate: offline weight layout transform for the compute units.

Reference: /root/reference/bitblas/ops/ladder_permutate/ — produces the
ladder/ldmatrix register-friendly permutation for CUDA tensor cores (stages
1-3, scaled for sub-byte packing). The TPU equivalent of "permute weights
offline so the kernel never shuffles" is the slot-strided N-pack retile
(quantization/packing.pack_nslot with the canonical pack_tile_n): it plays
exactly the role of ladder stage-3 + LOP3 interleave combined, designed once
for the MXU/VPU instead of ldmatrix.

The op consumes an (optionally transposed) weight matrix of integer codes or
storage bytes and emits the K-major device tensor the fused kernels read.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal, Optional

import numpy as np

from ..quantization import packing
from ..quantization.packing import pack_tile_n
from .common import TransformKind
from .matmul_config import OperatorConfig


@dataclass(frozen=True)
class LadderPermutateConfig(OperatorConfig):
    M: Optional[int] = None              # output-feature dim (N of matmul)
    N: Optional[int] = None              # reduction dim (K of matmul)
    datatype: str = "float16"
    dequantize_bits: int = -1            # -1: dense values, else code width
    storage_dtype: str = "int8"
    propagate_kind: Literal["A", "B"] = "B"
    transpose_matrix: bool = True        # True: input is [M, N] (nt layout)
    transform_kind: TransformKind = TransformKind.LDMatrixTransform

    def __post_init__(self):
        if self.M is None or self.N is None:
            raise ValueError("M and N must be specified")
        if isinstance(self.transform_kind, int):
            object.__setattr__(self, "transform_kind",
                               TransformKind(self.transform_kind))


class LadderPermutate:

    def __init__(self, config: LadderPermutateConfig,
                 target: Optional[str] = None, enable_tuning: bool = False,
                 **_):
        del target, enable_tuning
        self.config = config

    def forward(self, w: np.ndarray) -> np.ndarray:
        cfg = self.config
        w = np.asarray(w)
        if cfg.transform_kind == TransformKind.NonTransform:
            return w
        if cfg.propagate_kind == "A":
            # Activations never need a runtime permute on TPU (the weight
            # slot layout absorbs it) — identity, kept for API parity with
            # reference transform_input (general_matmul/__init__.py:713-722).
            return w
        # Weight path: [M(out), N(red)] codes -> K-major slot-packed device
        # tensor, or a plain transpose for >= 8-bit storage.
        mat = w if cfg.transpose_matrix else np.ascontiguousarray(w.T)
        bits = cfg.dequantize_bits
        kn = np.ascontiguousarray(mat.T)  # [red, out]
        if bits is None or bits < 0 or bits >= 8:
            return kn.astype(np.int8 if "int" in cfg.storage_dtype else kn.dtype)
        e = 8 // bits
        return packing.pack_nslot(kn.astype(np.uint8), bits,
                                  pack_tile_n(kn.shape[1], e))

    __call__ = forward
