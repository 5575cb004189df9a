"""Host-side weight packing / layout transforms (numpy).

Covers the reference's offline weight pipeline — ``general_compress`` /
``interleave_weight`` (/root/reference/bitblas/quantization/utils.py:55-112),
``Matmul.transform_weight`` integer biasing
(/root/reference/bitblas/ops/general_matmul/__init__.py:662-711), and GPTQ
qweight/qzeros unpacking (/root/reference/bitblas/module/__init__.py:24-75) —
plus the TPU-native device layout ("slot-strided" packing) that replaces the
reference's ladder/LOP3 interleave machinery.

Device layout design
--------------------
On GPU the reference interleaves nibbles so one LOP3 op yields register-order
f16 pairs. On TPU the analogous goal is a *shuffle-free* in-kernel unpack:
every vector op must stay element-aligned across 128-lane registers. We
achieve that by packing along the **N (output) dimension**: a packed storage
word at ``[k, j]`` holds ``e = storage_bits//bits`` weight elements for the
same ``k`` but *different output columns*. In the kernel, slot ``i`` of the
whole packed tile is extracted with one shift+mask (no lane movement) and fed
to its own MXU dot whose results land in output columns
``[i*BN/e : (i+1)*BN/e)`` of the tile. The slot->column map is fixed offline
here, so no runtime permutation of activations is ever needed (the reference
needs a runtime ladder permute of A, general_matmul/__init__.py:713-722).
"""

from __future__ import annotations

import numpy as np

_NATIVE_MIN_ELEMS = 1 << 20  # use the C++ library for checkpoint-scale arrays


def _native():
    """The compiled repack library (bitblas_tpu/native), or None."""
    try:
        from .. import native
        return native if native.available() else None
    except Exception:  # noqa: BLE001
        return None


# ---------------------------------------------------------------------------
# Reference-compatible K-major packing (checkpoint interchange format)
# ---------------------------------------------------------------------------

def general_compress(unpacked: np.ndarray, bits: int = 4,
                     storage_dtype=np.int8) -> np.ndarray:
    """Pack along the last axis, LSB-first; bit-identical to the reference's
    ``general_compress`` but vectorized (C++ path for large arrays)."""
    storage_bits = np.dtype(storage_dtype).itemsize * 8
    nat = _native()
    if (nat is not None and storage_bits == 8 and unpacked.ndim >= 2
            and unpacked.size >= _NATIVE_MIN_ELEMS
            and unpacked.dtype != np.float16):
        return nat.general_compress(unpacked, bits)
    elems = storage_bits // bits
    if unpacked.dtype == np.float16:
        unpacked = unpacked.astype(np.int8)
    u = unpacked.astype(np.uint32) & ((1 << bits) - 1)
    *lead, last = u.shape
    u = u.reshape(*lead, last // elems, elems)
    shifts = (np.arange(elems, dtype=np.uint32) * bits)
    packed = (u << shifts).sum(axis=-1, dtype=np.uint32)
    udt = np.dtype(f"uint{storage_bits}")
    return packed.astype(udt).view(storage_dtype)


def general_decompress(packed: np.ndarray, bits: int,
                       out_elems: int | None = None) -> np.ndarray:
    """Inverse of general_compress -> uint8 fields in [0, 2^bits)."""
    storage_bits = packed.dtype.itemsize * 8
    nat = _native()
    if (nat is not None and storage_bits == 8 and packed.ndim >= 2
            and packed.size >= _NATIVE_MIN_ELEMS // 8):
        out = nat.general_decompress(packed, bits)
        if out_elems is not None:
            out = out[..., :out_elems]
        return out
    elems = storage_bits // bits
    udt = np.dtype(f"uint{storage_bits}")
    u = packed.view(udt)
    shifts = np.arange(elems, dtype=udt) * bits
    fields = (u[..., None] >> shifts) & ((1 << bits) - 1)
    out = fields.reshape(*packed.shape[:-1], packed.shape[-1] * elems)
    if out_elems is not None:
        out = out[..., :out_elems]
    return out.astype(np.uint8)


def interleave_weight(qweight: np.ndarray, nbits: int = 4,
                      target_dtype: str = "float16") -> np.ndarray:
    """Reference ``interleave_weight`` (quantization/utils.py:73-112):
    rearranges fields inside each int32 word so the GPU LOP3 decode reads
    contiguous nibbles. Kept for checkpoint/test parity with BitBLAS; the TPU
    kernels do NOT use this layout.
    """
    assert target_dtype in ("float16", "int8")
    w = qweight.view(np.uint32)  # uint domain: numpy 2.x rejects wide int32 literals
    new = np.zeros_like(w)
    bits_stride = 8 if target_dtype == "int8" else 16
    mask = np.uint32((1 << nbits) - 1)
    num_groups = 32 // bits_stride
    elems_per_group = bits_stride // nbits
    for i in range(num_groups):
        for j in range(elems_per_group):
            offset = i * elems_per_group + j
            shift = (offset % num_groups) * bits_stride + (offset // num_groups) * nbits
            new |= ((w >> np.uint32(nbits * offset)) & mask) << np.uint32(shift)

    if nbits == 1 and target_dtype == "int8":
        n16 = new & np.uint32(0xF0F00F0F)
        n16 |= ((new & np.uint32(0x000000F0)) >> 4) << 16
        n16 |= ((new & np.uint32(0x0000F000)) >> 12) << 24
        n16 |= ((new & np.uint32(0x000F0000)) >> 16) << 4
        n16 |= ((new & np.uint32(0x0F000000)) >> 24) << 12
        return n16.view(np.int8)
    if nbits == 2 and target_dtype == "float16":
        n8 = new & np.uint32(0xFF0000FF)
        n8 |= ((new & np.uint32(0x0000FF00)) >> 8) << 16
        n8 |= ((new & np.uint32(0x00FF0000)) >> 16) << 8
        return n8.view(np.int8)
    if nbits == 1 and target_dtype == "float16":
        n8 = new & np.uint32(0xF000000F)
        n8 |= ((new & np.uint32(0x000000F0)) >> 4) << 8
        n8 |= ((new & np.uint32(0x00000F00)) >> 8) << 16
        n8 |= ((new & np.uint32(0x0000F000)) >> 12) << 24
        n8 |= ((new & np.uint32(0x000F0000)) >> 16) << 4
        n8 |= ((new & np.uint32(0x00F00000)) >> 20) << 12
        n8 |= ((new & np.uint32(0x0F000000)) >> 24) << 20
        return n8.view(np.int8)
    return new.view(np.int8)


# ---------------------------------------------------------------------------
# Integer biasing (transform_weight semantics)
# ---------------------------------------------------------------------------

def bias_signed_weight(weight: np.ndarray, bits: int) -> np.ndarray:
    """Clamp+bias a signed low-bit weight into unsigned storage fields.

    Reference ``Matmul.transform_weight`` for source_format "int"
    (general_matmul/__init__.py:684-690): clamp to [-2^(b-1), 2^(b-1)],
    cast int8, add 2^(b-1). Decode subtracts the same bias.
    """
    maxq = 1 << (bits - 1)
    return (np.clip(weight, -maxq, maxq).astype(np.int8) + maxq).astype(np.int8)


# ---------------------------------------------------------------------------
# GPTQ checkpoint unpacking (AutoGPTQ v1 / GPTQModel v2)
# ---------------------------------------------------------------------------

def unpack_qweight(qweight: np.ndarray, bits: int) -> np.ndarray:
    """Unpack GPTQ qweight stored as int8-packed fields along the last axis
    (reference module/__init__.py:62-75). Input [N, K*bits/8] int8 view."""
    return general_decompress(qweight.view(np.int8), bits).astype(np.int8)


def unpack_qzeros(qzeros: np.ndarray, bits: int) -> np.ndarray:
    """AutoGPTQ v1 qzeros: int32-packed, with the off-by-one (+1 then mask)
    quirk (reference module/__init__.py:24-39)."""
    z = qzeros.view(np.int32)
    elems = 32 // bits
    shifts = np.arange(elems, dtype=np.int32) * bits
    fields = (z[..., None] >> shifts).astype(np.int8)
    fields = fields.reshape(*z.shape[:-1], z.shape[-1] * elems)
    return np.bitwise_and(fields + 1, (1 << bits) - 1).astype(np.int8)


def unpack_qzeros_v2(qzeros: np.ndarray, bits: int) -> np.ndarray:
    """GPTQModel v2 qzeros: same, without the +1 (module/__init__.py:42-58)."""
    z = qzeros.view(np.int32)
    elems = 32 // bits
    shifts = np.arange(elems, dtype=np.int32) * bits
    fields = (z[..., None] >> shifts).astype(np.int8)
    fields = fields.reshape(*z.shape[:-1], z.shape[-1] * elems)
    return np.bitwise_and(fields, (1 << bits) - 1).astype(np.int8)


def pack_autogptq(intweight_kn: np.ndarray, zeros_gn: np.ndarray,
                  scales_gn: np.ndarray, bits: int = 4, *,
                  v2: bool = False):
    """Inverse of unpack_qweight/unpack_qzeros: produce AutoGPTQ
    CudaOldQuantLinear storage tensors from natural-layout fields.

    intweight_kn [K, N] uint codes, zeros/scales [K/g, N]. Returns
    (qweight int32 [K*bits/32, N], qzeros int32 [K/g, N*bits/32],
    scales f16 [K/g, N]) — the tensor conventions of
    /root/reference/integration/pytorch/bitblas_quant_linear.py. Used to
    synthesize checkpoint fixtures and to round-trip repack tests.
    """
    e32 = 32 // bits
    K, N = intweight_kn.shape
    assert K % e32 == 0 and N % e32 == 0
    iw = intweight_kn.astype(np.uint32).reshape(K // e32, e32, N)
    shifts = (np.arange(e32, dtype=np.uint32) * bits)[None, :, None]
    qweight = np.bitwise_or.reduce(iw << shifts, axis=1)
    z = zeros_gn.astype(np.int64) - (0 if v2 else 1)  # v1 stores zeros-1
    z = (z & ((1 << bits) - 1)).astype(np.uint32)
    z = z.reshape(z.shape[0], N // e32, e32)
    zshifts = (np.arange(e32, dtype=np.uint32) * bits)[None, None, :]
    qzeros = np.bitwise_or.reduce(z << zshifts, axis=2)
    return (qweight.astype(np.int32), qzeros.astype(np.int32),
            scales_gn.astype(np.float16))


# ---------------------------------------------------------------------------
# TPU device layout: slot-strided N packing
# ---------------------------------------------------------------------------

import os

# Output columns per slot segment. Wider segments mean fewer (but wider) MXU
# dot issues and fewer per-group scale-row extractions per kernel step; 128
# is the lane-minimum. Overridable for experiments via BITBLAS_TPU_PACK_SUB.
PACK_SUB = int(os.environ.get("BITBLAS_TPU_PACK_SUB", "128"))


def pack_tile_n(n: int, elems: int) -> int:
    """Canonical N-packing tile (PACK_SUB output columns per slot,
    lane-aligned), independent of kernel block sizes so the device layout
    never depends on tuning. Falls back to narrower tiles for small N."""
    for sub in (PACK_SUB, 128):
        t = sub * elems
        if n % t == 0:
            return t
    if n % elems:
        raise ValueError(f"N={n} not divisible by elems={elems}")
    return n

def pack_nslot(unpacked_kn: np.ndarray, bits: int, tile_n: int,
               storage_bits: int = 8) -> np.ndarray:
    """Pack unsigned fields [K, N] -> [K, N*bits/storage_bits] int.

    Within each N tile of ``tile_n`` columns, storage word ``j`` holds slots
    ``i`` = natural column ``i*(tile_n//e) + j``. Kernel-side, slot ``i`` of
    the packed tile is ``(word >> i*bits) & mask`` and corresponds to the
    contiguous output columns ``[i*tile_n//e, (i+1)*tile_n//e)``.
    """
    elems = storage_bits // bits
    K, N = unpacked_kn.shape
    if tile_n % elems != 0 or N % tile_n != 0:
        raise ValueError(f"tile_n={tile_n} must divide N={N} and be divisible "
                         f"by elems={elems}")
    nat = _native()
    if (nat is not None and storage_bits == 8
            and unpacked_kn.size >= _NATIVE_MIN_ELEMS):
        return nat.pack_nslot(unpacked_kn, bits, tile_n)
    sub = tile_n // elems
    u = unpacked_kn.astype(np.uint32) & ((1 << bits) - 1)
    # [K, T, e, sub]: tile t, slot i, in-tile packed column j
    u = u.reshape(K, N // tile_n, elems, sub)
    shifts = (np.arange(elems, dtype=np.uint32) * bits).reshape(1, 1, elems, 1)
    packed = (u << shifts).sum(axis=2, dtype=np.uint32)
    packed = packed.reshape(K, N // elems)
    udt = np.dtype(f"uint{storage_bits}")
    sdt = np.dtype(f"int{storage_bits}")
    return packed.astype(udt).view(sdt)


def unpack_nslot(packed: np.ndarray, bits: int, tile_n: int,
                 storage_bits: int = 8) -> np.ndarray:
    """Inverse of pack_nslot -> uint8 fields [K, N]."""
    elems = storage_bits // bits
    K, P = packed.shape
    N = P * elems
    sub = tile_n // elems
    udt = np.dtype(f"uint{storage_bits}")
    u = packed.view(udt).reshape(K, N // tile_n, sub)
    shifts = np.arange(elems, dtype=udt) * bits
    fields = (u[..., None, :] >> shifts[None, None, :, None]) & ((1 << bits) - 1)
    # fields: [K, T, e, sub] -> [K, N]
    return fields.reshape(K, N).astype(np.uint8)
