"""Operator-layer shared enums and small types.

TPU counterpart of the reference's ``bitblas/base/operator_common.py``
(TransformKind/OptimizeStrategy/BackendKind). TransformKind survives for API
compatibility but means something different here: on TPU the only offline
transform is the slot-strided weight retile (SURVEY.md §7 "ladder+lop3
interleave, designed once, offline"); activations are never permuted at
runtime.
"""

from __future__ import annotations

from enum import IntEnum


class TransformKind(IntEnum):
    NonTransform = 0
    InterWarpTransform = 1
    IntraWarpTransform = 2
    LDMatrixTransform = 3


class OptimizeStrategy(IntEnum):
    SingleBatchDecodeOnly = 0
    ContigousBatching = 1  # (sic) reference spelling kept for config parity


class BackendKind(IntEnum):
    Pallas = 0  # Pallas TPU kernel
    XLA = 1     # plain jax.lax.dot_general (dense fallback / oracle)


class QuantizationMemoryStage(IntEnum):
    # Where dequantization happens relative to the MXU feed, mirroring the
    # reference's Local/Shared/Global staging enum (operator_common.py:60-100).
    # On TPU: Local = decode in-registers inside the Pallas kernel (default);
    # Global = materialize the dequantized weight in HBM (oracle/debug path).
    Local = 0
    Shared = 1
    Global = 2
