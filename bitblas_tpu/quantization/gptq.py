"""Weight quantization algorithms: RTN and GPTQ (Hessian error feedback).

The reference framework consumes checkpoints produced by external GPU
tooling (AutoGPTQ/GPTQModel — it repacks them via
/root/reference/bitblas/module/__init__.py:315-363 and
/root/reference/integration/pytorch/bitblas_quant_linear.py:33-220, but
cannot create them). The TPU framework closes that loop in-repo: quantize
an fp16/bf16 checkpoint to the grouped formats the kernels serve with no
torch/CUDA toolchain in the path.

Conventions match the kernel/dequant contract exactly
(ops/reference.py, zeros_mode="original"):

    dequant[n, k] = (code[n, k] - zero[n, g(k)]) * scale[n, g(k)]

with `code` an unsigned integer in [0, 2^bits) and one (scale, zero) pair
per `group_size` contiguous K. The emitted (codes, scales, zeros) feed
`Matmul.transform_weight(codes, scale=scales, zeros=zeros)` directly.

Algorithms are plain numpy on host — quantization is a one-shot offline
transform (like the reference's CPU repack chain), not a device kernel.
GPTQ follows Frantar et al. 2022: per-column quantization in Cholesky
order with the remaining columns updated to absorb each column's rounding
error through the inverse-Hessian factor.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

__all__ = [
    "QuantizedWeight",
    "HessianAccumulator",
    "rtn_quantize",
    "gptq_quantize",
]


@dataclass
class QuantizedWeight:
    """Grouped-quantized weight in kernel input convention.

    codes  [N, K] uint8 values in [0, 2^bits)
    scales [N, K // group_size] float32
    zeros  [N, K // group_size] float32 (integer zero points stored float,
           the zeros_mode="original" device format)
    """
    codes: np.ndarray
    scales: np.ndarray
    zeros: np.ndarray
    bits: int
    group_size: int

    def dequantize(self) -> np.ndarray:
        """[N, K] float32 reconstruction — the oracle the kernels match."""
        g = np.repeat(np.arange(self.scales.shape[1]), self.group_size)
        return ((self.codes.astype(np.float32) - self.zeros[:, g])
                * self.scales[:, g])


def _group_params(w: np.ndarray, maxq: int,
                  symmetric: bool) -> Tuple[np.ndarray, np.ndarray]:
    """Per-row (scale, zero) for one K-group `w` [N, g]."""
    if symmetric:
        amax = np.abs(w).max(axis=1)
        scale = np.where(amax > 0, 2.0 * amax / maxq, 1.0)
        zero = np.full_like(scale, (maxq + 1) // 2)
        return scale, zero
    wmax = np.maximum(w.max(axis=1), 0.0)
    wmin = np.minimum(w.min(axis=1), 0.0)
    rng = wmax - wmin
    scale = np.where(rng > 0, rng / maxq, 1.0)
    zero = np.clip(np.round(-wmin / scale), 0, maxq)
    return scale, zero


def _quantize_col(col: np.ndarray, scale: np.ndarray, zero: np.ndarray,
                  maxq: int) -> np.ndarray:
    """One weight column [N] -> integer codes [N] on the (scale, zero) grid."""
    return np.clip(np.round(col / scale) + zero, 0, maxq)


def _legalize(weight: np.ndarray, bits: int, group_size: int):
    # Always copy: gptq_quantize writes into w (dead-column zeroing, error
    # feedback) and must never mutate the caller's array in place.
    w = np.array(weight, dtype=np.float32)
    if w.ndim != 2:
        raise ValueError(f"weight must be [N, K], got shape {w.shape}")
    N, K = w.shape
    if group_size <= 0:
        group_size = K
    if K % group_size:
        raise ValueError(f"K={K} not divisible by group_size={group_size}")
    if not (1 <= bits <= 8):
        raise ValueError(f"bits={bits} outside the packed range [1, 8]")
    return w, N, K, group_size, (1 << bits) - 1


def rtn_quantize(weight, bits: int = 4, group_size: int = 128,
                 symmetric: bool = False) -> QuantizedWeight:
    """Round-to-nearest grouped quantization of `weight` [N(out), K(in)].

    The baseline the GPTQ path must beat; also the fast path for models
    whose checkpoints tolerate it (BitNet-style already-discrete weights
    round-trip exactly).
    """
    w, N, K, group_size, maxq = _legalize(weight, bits, group_size)
    G = K // group_size
    wg = w.reshape(N, G, group_size)
    scales = np.empty((N, G), np.float32)
    zeros = np.empty((N, G), np.float32)
    codes = np.empty((N, K), np.uint8)
    for g in range(G):
        s, z = _group_params(wg[:, g], maxq, symmetric)
        scales[:, g], zeros[:, g] = s, z
        cols = slice(g * group_size, (g + 1) * group_size)
        codes[:, cols] = _quantize_col(
            w[:, cols], s[:, None], z[:, None], maxq).astype(np.uint8)
    return QuantizedWeight(codes, scales, zeros, bits, group_size)


class HessianAccumulator:
    """Streaming H = E[x xᵀ] over calibration activations.

    Feed the *inputs* of a linear layer (any leading batch dims, last dim
    K); the accumulated Hessian drives `gptq_quantize` for that layer's
    weight. Matches GPTQ's 2XXᵀ up to a scalar, which the damping term
    (proportional to mean diag) makes irrelevant.
    """

    def __init__(self, k: int):
        self.h = np.zeros((k, k), np.float64)
        self.count = 0

    def update(self, x) -> None:
        x = np.asarray(x, dtype=np.float64).reshape(-1, self.h.shape[0])
        self.h += x.T @ x
        self.count += x.shape[0]

    @property
    def hessian(self) -> np.ndarray:
        return self.h / max(self.count, 1)


def gptq_quantize(weight, hessian, bits: int = 4, group_size: int = 128,
                  symmetric: bool = False, percdamp: float = 0.01,
                  blocksize: int = 128) -> QuantizedWeight:
    """GPTQ: quantize `weight` [N, K] against input Hessian `hessian` [K, K].

    Columns are quantized left-to-right; each column's rounding error is
    propagated into the not-yet-quantized columns through the upper
    Cholesky factor U of H⁻¹ (H = UᵀU after damping), minimizing
    tr((W - Ŵ) H (W - Ŵ)ᵀ) — the layer-output MSE over the calibration
    set. With hessian=I this degenerates to exactly `rtn_quantize`
    (verified in tests), so an identity Hessian is never worse than RTN.

    Group scales are computed when the sweep *enters* each group, from the
    error-updated residual weights — the standard GPTQ grouping (no
    act-order: the grouped-scale device layout requires sequential g_idx,
    see models/hf_import.py:78).
    """
    w, N, K, group_size, maxq = _legalize(weight, bits, group_size)
    H = np.array(hessian, dtype=np.float64)
    if H.shape != (K, K):
        raise ValueError(f"hessian shape {H.shape} != ({K}, {K})")

    dead = np.diag(H) == 0
    if dead.any():
        H[dead, dead] = 1.0
        w[:, dead] = 0.0
    damp = percdamp * float(np.mean(np.diag(H)))
    H[np.diag_indices(K)] += max(damp, 1e-12)

    # Upper factor of the inverse: Hinv = Uᵀ U with U upper-triangular.
    hinv = np.linalg.inv(H)
    hinv = (hinv + hinv.T) / 2.0
    U = np.linalg.cholesky(hinv).T

    w = w.astype(np.float64)
    G = K // group_size
    scales = np.empty((N, G), np.float32)
    zeros = np.empty((N, G), np.float32)
    codes = np.empty((N, K), np.uint8)

    for i1 in range(0, K, blocksize):
        i2 = min(i1 + blocksize, K)
        err = np.zeros((N, i2 - i1), np.float64)
        for j in range(i1, i2):
            if j % group_size == 0:
                g = j // group_size
                s, z = _group_params(
                    w[:, j:j + group_size].astype(np.float32), maxq,
                    symmetric)
                scales[:, g], zeros[:, g] = s, z
            g = j // group_size
            s = scales[:, g].astype(np.float64)
            z = zeros[:, g].astype(np.float64)
            q = _quantize_col(w[:, j], s, z, maxq)
            codes[:, j] = q.astype(np.uint8)
            dq = (q - z) * s
            e = (w[:, j] - dq) / U[j, j]
            err[:, j - i1] = e
            if j + 1 < i2:
                w[:, j + 1:i2] -= e[:, None] * U[j, j + 1:i2][None]
        if i2 < K:
            w[:, i2:] -= err @ U[i1:i2, i2:]

    return QuantizedWeight(codes, scales, zeros, bits, group_size)
