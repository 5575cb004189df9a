"""Weight/activation dtype registry.

The reference encodes every supported weight dtype as a ``(source_format,
bit)`` pair via ``Matmul.BITBLAS_TRICK_DTYPE_MAP``
(/root/reference/bitblas/ops/general_matmul/__init__.py:324-345) and decides
dense-vs-dequant compute with ``NATIVE_COMPUTE_PATTERNS`` (same file :33-47).
This module is the TPU-native equivalent: a small declarative registry that
also records the JAX dtype used on device.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class WFormat:
    """A weight storage format: logical family + bit width."""
    name: str
    family: str  # "fp" | "bf" | "int" | "uint" | "nf" | "fp_e4m3" | "fp_e5m2"
    bits: int
    jax_dtype: Optional[jnp.dtype] = None  # native dtype if one exists


# name -> (family, bits, native jax dtype or None)
_FORMATS = {
    "float64": ("fp", 64, jnp.float64),
    "float32": ("fp", 32, jnp.float32),
    "float16": ("fp", 16, jnp.float16),
    "bfloat16": ("bf", 16, jnp.bfloat16),
    "int32": ("int", 32, jnp.int32),
    "uint32": ("uint", 32, jnp.uint32),
    "int16": ("int", 16, jnp.int16),
    "uint16": ("uint", 16, jnp.uint16),
    "int8": ("int", 8, jnp.int8),
    "uint8": ("uint", 8, jnp.uint8),
    "int4": ("int", 4, jnp.int4),
    "uint4": ("uint", 4, jnp.uint4),
    "int2": ("int", 2, None),
    "uint2": ("uint", 2, None),
    "int1": ("int", 1, None),
    "uint1": ("uint", 1, None),
    "nf4": ("nf", 4, None),
    "fp4_e2m1": ("fp", 4, None),
    # Trick names kept verbatim for API parity with the reference:
    # "e4m3_float8" means float8_e4m3fn, "e5m2_float8" means float8_e5m2.
    "e4m3_float8": ("fp_e4m3", 8, jnp.float8_e4m3fn),
    "e5m2_float8": ("fp_e5m2", 8, jnp.float8_e5m2),
}

DTYPE_MAP = {name: (fam, bits) for name, (fam, bits, _) in _FORMATS.items()}

# (A_dtype, W_dtype) pairs computed densely without a dequantize stage
# (reference NATIVE_COMPUTE_PATTERNS).
NATIVE_COMPUTE_PATTERNS = frozenset([
    ("float64", "float64"),
    ("float32", "float32"),
    ("float16", "float16"),
    ("bfloat16", "bfloat16"),
    ("int8", "int8"),
    ("uint8", "uint8"),
    ("int4", "int4"),
    ("uint4", "uint4"),
    ("e4m3_float8", "e4m3_float8"),
    ("e4m3_float8", "e5m2_float8"),
    ("e5m2_float8", "e4m3_float8"),
    ("e5m2_float8", "e5m2_float8"),
])


def is_native_compute(A_dtype: str, W_dtype: str) -> bool:
    return (A_dtype, W_dtype) in NATIVE_COMPUTE_PATTERNS


def wformat(name: str) -> WFormat:
    if name not in _FORMATS:
        raise ValueError(f"Unsupported dtype: {name}")
    fam, bits, jdt = _FORMATS[name]
    return WFormat(name=name, family=fam, bits=bits, jax_dtype=jdt)


def source_format_and_bits(W_dtype: str) -> Tuple[str, int]:
    if W_dtype not in DTYPE_MAP:
        raise ValueError(f"Unsupported weight dtype: {W_dtype}")
    return DTYPE_MAP[W_dtype]


def as_jax_dtype(name: str):
    """Map a bitblas dtype string to the jnp dtype used for dense tensors."""
    fmt = wformat(name)
    if fmt.jax_dtype is None:
        raise ValueError(f"{name} has no native JAX dtype; it is always packed")
    return fmt.jax_dtype


# NF4 quantile table (QLoRA NormalFloat4). Values match the LUT the reference
# materializes at /root/reference/bitblas/ops/general_matmul/__init__.py:413-434.
NF4_TABLE = np.array(
    [
        -1.0,
        -0.6961928009986877,
        -0.5250730514526367,
        -0.39491748809814453,
        -0.28444138169288635,
        -0.18477343022823334,
        -0.09105003625154495,
        0.0,
        0.07958029955625534,
        0.16093020141124725,
        0.24611230194568634,
        0.33791524171829224,
        0.44070982933044434,
        0.5626170039176941,
        0.7229568362236023,
        1.0,
    ],
    dtype=np.float32,
)


def nf4_lut(dtype=jnp.float16) -> jnp.ndarray:
    return jnp.asarray(NF4_TABLE, dtype=dtype)


def storage_bits(storage_dtype: str) -> int:
    """Bit width of the storage container: the TRAILING digit group
    ("int8" -> 8, "uint16" -> 16, "e4m3_float8" -> 8 — naive digit
    concatenation read the latter as 438)."""
    import re
    m = re.search(r"(\d+)$", storage_dtype)
    if not m:
        raise ValueError(f"Bad storage dtype: {storage_dtype}")
    return int(m.group(1))


def storage_jax_dtype(storage_dtype: str):
    return {
        "int8": jnp.int8,
        "uint8": jnp.uint8,
        "int16": jnp.int16,
        "uint16": jnp.uint16,
        "int32": jnp.int32,
        "uint32": jnp.uint32,
    }[storage_dtype]
