"""Testing utilities (counterpart of reference ``bitblas/testing/__init__.py``).

Provides:
  * `main()` — run the calling test file under pytest (reference :12-14).
  * `assert_close` — tolerance check with a bounded mismatch *ratio* instead
    of strict allclose, acknowledging low-bit rounding (reference
    `torch_assert_close`, :29-91).
  * `random_reference_operands` — generate reference-layout random operands
    for any MatmulConfig (the fixture generator used across kernel tests).
"""

from __future__ import annotations

import inspect
import sys
from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..ops.matmul_config import MatmulConfig
from ..quantization import packing
from ..quantization.formats import source_format_and_bits


def main():
    import pytest
    caller = inspect.getframeinfo(sys._getframe(1)).filename
    sys.exit(pytest.main([caller]))


def assert_close(actual, expected, *, rtol=1e-2, atol=1e-3,
                 max_mismatched_ratio=0.001, msg=""):
    """Allow up to `max_mismatched_ratio` of elements to violate tolerance."""
    actual = np.asarray(actual, dtype=np.float64)
    expected = np.asarray(expected, dtype=np.float64)
    assert actual.shape == expected.shape, (actual.shape, expected.shape)
    # Non-finite expectations (e5m2 ranges overflow f16 outputs) match iff
    # the kernel produced the identical inf/nan class — subtracting them
    # would emit RuntimeWarnings and hide real regressions behind nans.
    finite = np.isfinite(expected)
    nonfin_ok = (actual == expected) | (np.isnan(actual) & np.isnan(expected))
    tol = atol + rtol * np.abs(np.where(finite, expected, 0.0))
    diff = np.abs(np.where(finite, actual, 0.0) -
                  np.where(finite, expected, 0.0))
    # ~(diff <= tol), not diff > tol: a nan actual must count as a mismatch.
    mism = np.where(finite, ~(diff <= tol), ~nonfin_ok)
    n_mism = int(mism.sum())
    budget = int(np.ceil(actual.size * max_mismatched_ratio))
    if n_mism > budget:
        idx = np.argwhere(mism)[:10]
        details = "\n".join(
            f"  [{tuple(i)}] actual={actual[tuple(i)]} expected={expected[tuple(i)]}"
            for i in idx)
        raise AssertionError(
            f"{msg} mismatch {n_mism}/{actual.size} elements "
            f"(budget {budget}, rtol={rtol}, atol={atol}):\n{details}")


@dataclass
class ReferenceOperands:
    """Random operands in reference layouts (see ops/reference.py)."""
    A: np.ndarray
    qweight: np.ndarray
    scales: Optional[np.ndarray] = None
    zeros: Optional[np.ndarray] = None
    qzeros: Optional[np.ndarray] = None
    bias: Optional[np.ndarray] = None


def random_reference_operands(config: MatmulConfig, m: int,
                              seed: int = 0) -> ReferenceOperands:
    rng = np.random.default_rng(seed)
    N, K = config.N, config.K
    family, bits = source_format_and_bits(config.W_dtype)
    g = config.effective_group_size

    # Activations.
    if config.A_dtype in ("float16", "bfloat16", "float32"):
        A = rng.standard_normal((m, K)).astype(
            np.float32 if config.A_dtype == "float32" else np.float16)
        if config.A_dtype == "bfloat16":
            import ml_dtypes
            A = A.astype(ml_dtypes.bfloat16)
    elif config.A_dtype == "int8":
        A = rng.integers(-8, 8, (m, K), dtype=np.int64).astype(np.int8)
    elif config.A_dtype in ("int4", "uint4"):
        # int8 STORAGE for sub-byte activations: the axon TPU plugin
        # cannot device-put or operate on S4/U4 arrays at all (any op on
        # one wedges the process's backend client — 2026-08-20 support-
        # matrix sweep), and the int8-MXU path is exact for 4-bit values.
        lo, hi = (-8, 8) if config.A_dtype == "int4" else (0, 16)
        A = rng.integers(lo, hi, (m, K), dtype=np.int64).astype(np.int8)
    elif config.A_dtype in ("e4m3_float8", "e5m2_float8"):
        import ml_dtypes
        dt = (ml_dtypes.float8_e4m3fn if config.A_dtype == "e4m3_float8"
              else ml_dtypes.float8_e5m2)
        A = rng.standard_normal((m, K)).astype(dt)
    else:
        raise NotImplementedError(config.A_dtype)

    # Weight codes.
    if config.is_native_compute():
        if config.A_dtype == "int8":
            W = rng.integers(-8, 8, (N, K), dtype=np.int64).astype(np.int8)
        elif config.A_dtype in ("int4", "uint4"):
            W = rng.integers(0 if config.A_dtype == "uint4" else -8,
                             8 if config.A_dtype == "int4" else 16,
                             (N, K), dtype=np.int64).astype(A.dtype)
        else:
            W = rng.standard_normal((N, K)).astype(A.dtype)
        # Weight storage follows layout[1]: "*t" keeps [N, K], "*n" stores
        # the transpose [K, N]. A is ALWAYS generated [m, K] here — the
        # t*-layout [K, M] activation convention lives only at the
        # Matmul.forward boundary (which normalizes with A.T).
        qweight = W if config.layout[1] == "t" \
            else np.ascontiguousarray(W.T)
        return ReferenceOperands(A=A, qweight=qweight)

    if bits < 8:
        codes = rng.integers(0, 1 << bits, (N, K), dtype=np.int64).astype(np.uint8)
        qweight = packing.general_compress(codes, bits)
    elif family == "int" and bits > 8:
        # Wide ints: natural-width values. Magnitudes stay within f16's
        # exactly-representable integer range so the f16 oracle decode is
        # bit-exact against the kernel's f32 decode.
        dt = np.int16 if bits == 16 else np.int32
        qweight = rng.integers(-1024, 1024, (N, K), dtype=np.int64).astype(dt)
    elif family == "uint" and bits > 8:
        dt = np.uint16 if bits == 16 else np.uint32
        qweight = rng.integers(0, 2048, (N, K), dtype=np.int64).astype(dt)
    elif family == "int":
        qweight = rng.integers(-8, 8, (N, K), dtype=np.int64).astype(np.int8)
    elif family in ("fp_e4m3", "fp_e5m2"):
        qweight = rng.integers(0, 256, (N, K), dtype=np.int64).astype(np.uint8)
        # avoid inf/nan encodings for e5m2 (exponent all-ones)
        if family == "fp_e5m2":
            qweight = np.where((qweight & 0x7C) == 0x7C, qweight & 0x83 | 0x40,
                               qweight)
        qweight = qweight.view(np.int8)
    else:
        qweight = rng.integers(0, 256, (N, K), dtype=np.int64).astype(np.int8)

    out = ReferenceOperands(A=A, qweight=qweight)
    if config.with_scaling:
        out.scales = (rng.standard_normal((N, K // g)).astype(np.float16) * 0.1
                      + 0.5).astype(np.float16)
    if config.with_zeros:
        if config.zeros_mode == "quantized":
            zcodes = rng.integers(0, 1 << bits, (K // g, N),
                                  dtype=np.int64).astype(np.uint8)
            out.qzeros = packing.general_compress(zcodes, bits)
        else:
            out.zeros = rng.integers(0, 1 << bits, (N, K // g)).astype(np.float16)
    if config.with_bias:
        out.bias = rng.standard_normal((N,)).astype(np.float16)
    return out
