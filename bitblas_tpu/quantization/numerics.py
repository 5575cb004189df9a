"""Bit-exact decode/encode formulas, as vectorized JAX ops.

These reproduce, bit for bit, the TIR decode helpers of the reference
(/root/reference/bitblas/quantization/quantization.py) so that checkpoints
quantized for BitBLAS dequantize to identical values here. Unlike the
reference (scalar TIR expressions lowered to PTX LOP3), everything is a
vectorized jnp function that runs on host numpy-style, in XLA, and inside
Pallas TPU kernels (VPU integer lanes) unchanged.

Conventions:
  * "packed" arrays hold `elems = storage_bits // bits` sub-byte values per
    storage word, element ``i`` at bit offset ``bits * i`` (LSB first) —
    identical to the reference's ``general_compress`` layout
    (/root/reference/bitblas/quantization/utils.py:55-70).
  * decode_* functions take an *unpacked field* (the masked shifted value,
    dtype uint8/uint16/int32) and produce the target float dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .formats import nf4_lut


def _bitcast(x: jnp.ndarray, dtype) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(x, dtype)


# ---------------------------------------------------------------------------
# Field extraction from packed storage
# ---------------------------------------------------------------------------

def unpack_fields(packed: jnp.ndarray, bits: int, *, axis: int = -1,
                  storage_bits: Optional[int] = None) -> jnp.ndarray:
    """Unpack sub-word fields along `axis`, LSB-first.

    packed [..., P, ...] -> uint storage-wide [..., P*elems, ...] with element
    ``p*elems + i`` taken from bits ``[bits*i, bits*(i+1))`` of word ``p``.
    Matches reference `_tir_packed_to_unsigned_convert` indexing
    (quantization.py:208-216) with pos = k % elems, word = k // elems.
    """
    if storage_bits is None:
        storage_bits = packed.dtype.itemsize * 8
    elems = storage_bits // bits
    u = packed.astype(jnp.dtype(f"uint{storage_bits}"))
    if axis < 0:
        axis = u.ndim + axis
    mask = jnp.array((1 << bits) - 1, dtype=u.dtype)
    shifts = jnp.arange(elems, dtype=u.dtype) * bits
    # [..., P, 1, ...] >> [elems] -> [..., P, elems, ...]
    u = jnp.expand_dims(u, axis + 1)
    shape = [1] * u.ndim
    shape[axis + 1] = elems
    fields = (u >> shifts.reshape(shape)) & mask
    new_shape = list(packed.shape)
    new_shape[axis] = new_shape[axis] * elems
    return fields.reshape(new_shape)


def pack_fields(values: jnp.ndarray, bits: int, *, axis: int = -1,
                storage_bits: int = 8) -> jnp.ndarray:
    """Inverse of `unpack_fields`: pack low `bits` of each value, LSB-first.

    Vectorized equivalent of the reference's ``general_compress``
    (quantization/utils.py:55-70) generalized to any axis/storage width.
    """
    elems = storage_bits // bits
    if axis < 0:
        axis = values.ndim + axis
    if values.shape[axis] % elems != 0:
        raise ValueError(
            f"axis size {values.shape[axis]} not divisible by {elems}")
    udt = jnp.dtype(f"uint{storage_bits}")
    mask = jnp.array((1 << bits) - 1, dtype=udt)
    u = values.astype(udt) & mask
    new_shape = list(values.shape)
    new_shape[axis] //= elems
    new_shape.insert(axis + 1, elems)
    u = u.reshape(new_shape)
    shifts = jnp.arange(elems, dtype=udt) * bits
    bshape = [1] * u.ndim
    bshape[axis + 1] = elems
    # OR-reduce the shifted fields (sum is equivalent: fields are disjoint).
    out = jnp.sum((u << shifts.reshape(bshape)).astype(jnp.uint32),
                  axis=axis + 1).astype(udt)
    sdt = jnp.dtype(f"int{storage_bits}")
    return _bitcast(out, sdt)


# ---------------------------------------------------------------------------
# Field -> value decoders (bit-exact vs reference TIR helpers)
# ---------------------------------------------------------------------------

def decode_uint_field(field: jnp.ndarray, bits: int, dtype) -> jnp.ndarray:
    """uint field -> dtype. Reference `_tir_packed_to_unsigned_convert`."""
    del bits
    return field.astype(dtype)


def decode_int_field(field: jnp.ndarray, bits: int, dtype) -> jnp.ndarray:
    """int field -> dtype, stored biased by 2^(bits-1).

    Reference `_tir_packed_to_signed_convert` (quantization.py:196-206):
    value = field - 2^(bits-1). (`transform_weight` adds the same bias when
    packing, general_matmul/__init__.py:684-690.)
    """
    bias = 1 << (bits - 1)
    # Subtract in int32 FIRST: the biased field spans [0, 2^bits) which
    # does not fit a narrow signed target (int4 activations: casting 15 to
    # S4 wraps before the bias comes off — 2026-08-20 support-matrix bug).
    # The debiased value spans [-2^(bits-1), 2^(bits-1)) and fits exactly.
    return (field.astype(jnp.int32) - bias).astype(dtype)


def decode_uint_field_with_zeros(field: jnp.ndarray, zero: jnp.ndarray,
                                 dtype) -> jnp.ndarray:
    """(field - quantized_zero) -> dtype; zeros_mode="quantized" inner step.

    Reference `_tir_packed_to_unsigned_convert_with_zeros`
    (quantization.py:219-229): subtraction happens in storage integer domain
    before the cast.
    """
    return (field.astype(jnp.int32) - zero.astype(jnp.int32)).astype(dtype)


def decode_fp4_field(field: jnp.ndarray, dtype=jnp.float16) -> jnp.ndarray:
    """fp4_e2m1 4-bit field -> float16, reference `_tir_packed_to_fp4_to_f16`
    (quantization.py:139-155): low 3 bits are treated as an exponent payload
    ORed with 8, placed at f16 bit 10; zero payload means +-0.
    """
    f4 = field.astype(jnp.uint16)
    s = f4 >> 3
    e_f4 = f4 & jnp.uint16(7)
    bits16 = ((e_f4 | jnp.uint16(8)) | (s << jnp.uint16(5))) << jnp.uint16(10)
    val = _bitcast(bits16, jnp.float16)
    out = jnp.where(e_f4 == 0, jnp.float16(0.0), val)
    return out.astype(dtype)


def decode_f8e4m3_byte(byte: jnp.ndarray, dtype=jnp.float16) -> jnp.ndarray:
    """float8_e4m3 byte -> float16, reference `_tir_u8_to_f8_e4m3_to_f16`
    (quantization.py:170-177): exponent rebias via bit surgery
    (no NaN special-casing — we replicate the reference exactly).
    """
    v = byte.astype(jnp.uint16)
    s_f16 = (v >> jnp.uint16(7)) << jnp.uint16(15)
    e4 = v & jnp.uint16(0x40)
    e_f16 = ((v & jnp.uint16(63)) << jnp.uint16(7)) \
        | (e4 << jnp.uint16(8)) | (e4 << jnp.uint16(7))
    e_f16 = e_f16 ^ jnp.uint16(0x2000)
    out = _bitcast(s_f16 | e_f16, jnp.float16)
    return out.astype(dtype)


def decode_f8e5m2_byte(byte: jnp.ndarray, dtype=jnp.float16) -> jnp.ndarray:
    """float8_e5m2 byte -> f16 == pure bit widening (e5m2 is f16's top byte).

    Reference `_tir_u8_to_f8_e5m2_to_f16` reinterprets + casts; identical to
    placing the byte in the f16 high byte.
    """
    v = byte.astype(jnp.uint16) << jnp.uint16(8)
    return _bitcast(v, jnp.float16).astype(dtype)


def decode_nf4_field(field: jnp.ndarray, dtype=jnp.float16,
                     lut: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """NF4 4-bit field -> LUT gather (reference NF4 path,
    matmul_dequantize_impl.py:236-243)."""
    if lut is None:
        lut = nf4_lut(dtype)
    return jnp.take(lut.astype(dtype), field.astype(jnp.int32), axis=0)


def decode_field(field: jnp.ndarray, family: str, bits: int, dtype,
                 lut: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Dispatch on source format family (reference `_decode_func`,
    tirscript/matmul_dequantize_impl.py:192-260)."""
    if family == "uint":
        return decode_uint_field(field, bits, dtype)
    if family == "int":
        return decode_int_field(field, bits, dtype)
    if family == "fp" and bits == 4:
        return decode_fp4_field(field, dtype)
    if family == "fp_e4m3":
        return decode_f8e4m3_byte(field, dtype)
    if family == "fp_e5m2":
        return decode_f8e5m2_byte(field, dtype)
    if family == "nf":
        return decode_nf4_field(field, dtype, lut)
    raise ValueError(f"Unsupported source format {family}{bits}")


# ---------------------------------------------------------------------------
# Direct-to-f32 decoders (Mosaic kernels cannot touch f16 at all, so the TPU
# kernel path builds the f32 bit pattern directly; values are identical to
# the f16 reference decoders above for all non-inf/nan codes).
# ---------------------------------------------------------------------------

def decode_fp4_field_f32(field: jnp.ndarray) -> jnp.ndarray:
    """fp4_e2m1 field -> f32; equals decode_fp4_field exactly (both produce
    2^(payload-7) with zero mantissa). Mirrors reference
    `_tir_u32_to_f4_to_f32` (quantization.py:122-136)."""
    f4 = field.astype(jnp.uint32)
    s = f4 >> 3
    e_f4 = f4 & jnp.uint32(7)
    bits32 = ((e_f4 | jnp.uint32(120)) | (s << jnp.uint32(8))) << jnp.uint32(23)
    val = _bitcast(bits32, jnp.float32)
    return jnp.where(e_f4 == 0, jnp.float32(0.0), val)


def decode_f8e4m3_to_f32(byte: jnp.ndarray) -> jnp.ndarray:
    """float8_e4m3 byte -> f32, value-identical to decode_f8e4m3_byte.

    The reference's f16 bit surgery always yields a normal f16 (its exponent
    lands in [8, 23]), so the f32 pattern is a plain rebias:
    exp32 = low3exp + 8 + 8*e4msb + 112, mantissa <<20.
    """
    v = byte.astype(jnp.uint32)
    s = v >> 7
    e5 = ((v >> 3) & jnp.uint32(7)) + jnp.uint32(8) \
        + ((v >> 6) & jnp.uint32(1)) * jnp.uint32(8)
    bits32 = (s << jnp.uint32(31)) | ((e5 + jnp.uint32(112)) << jnp.uint32(23)) \
        | ((v & jnp.uint32(7)) << jnp.uint32(20))
    return _bitcast(bits32, jnp.float32)


def decode_f8e4m3_to_f32_fast(byte: jnp.ndarray) -> jnp.ndarray:
    """float8_e4m3 byte -> f32, branchless 5-op bit surgery; value-identical
    to decode_f8e4m3_to_f32 for all 256 codes (tests/test_numerics.py).

    The reference decode is uniformly exp32 = e4 + 120 (no subnormal case:
    e4=0 still means 2^-7*(1+m/8) in the reference's quirky semantics), so
    the payload (v & 0x7f) << 20 lands e4 at the exponent field and m at
    mantissa bits 20-22, and a single integer ADD of 120<<23 performs the
    rebias with carry-free mantissa bits. Reference formula:
    gpu/intrin/lop3.py `_tir_u8_to_f8_e4m3_to_f16` semantics.
    """
    v = byte.astype(jnp.uint32)
    bits32 = (((v & jnp.uint32(0x7F)) << jnp.uint32(20))
              + jnp.uint32(120 << 23)) | ((v >> jnp.uint32(7)) << jnp.uint32(31))
    return _bitcast(bits32, jnp.float32)


def decode_f8e5m2_to_f32_fast(byte: jnp.ndarray) -> jnp.ndarray:
    """float8_e5m2 byte -> f32, value-identical to decode_f8e5m2_to_f32 but
    cheaper: normals ride a raw-exponent bitcast plus ONE float multiply by
    2^112 (exponent rebias e5-127+112 = e5-15, exact), so no exponent add
    or zero-detection dance; only the e5=0 subnormal codes (payload < 4)
    take a select, and their magnitude reuses the already-masked payload
    (== m there) via a single int->f32 cast. A pure subnormal-multiply
    version (no select) exists but XLA/TPU flush f32 subnormal inputs, so
    the e5=0 intermediate m*2^-128 would decode to 0 — measured, not
    assumed (tests/test_numerics.py would catch it on CPU too).
    """
    v = byte.astype(jnp.uint32)
    payload = v & jnp.uint32(0x7F)
    sbit = (v >> jnp.uint32(7)) << jnp.uint32(31)
    normal = _bitcast((payload << jnp.uint32(21)) | sbit,
                      jnp.float32) * jnp.float32(2.0 ** 112)
    m_f = payload.astype(jnp.int32).astype(jnp.float32)  # == m when e5 == 0
    sub = _bitcast(_bitcast(m_f * jnp.float32(2.0 ** -16), jnp.uint32)
                   | sbit, jnp.float32)
    return jnp.where(payload < 4, sub, normal)


def decode_f8e4m3_to_bf16_fast(byte: jnp.ndarray) -> jnp.ndarray:
    """float8_e4m3 byte -> bf16 bit pattern built in i32 lanes, emitted via
    a 16-bit cast + bitcast (no f32->bf16 rounding op at the end). Mosaic
    bans 16-bit shifts (like int8 shifts), so all shifting stays in i32 —
    measured: the u16-shift formulation HTTP-500s (tpu_decode_probe
    2026-08-20). e4m3's 3 mantissa bits fit bf16 exactly."""
    v = byte.astype(jnp.int32)
    t = (((v & 0x7F) << 4) + (120 << 7)) | ((v >> 7) << 15)
    return _bitcast(t.astype(jnp.uint16), jnp.bfloat16)


def decode_f8e5m2_to_bf16_fast(byte: jnp.ndarray) -> jnp.ndarray:
    """float8_e5m2 byte -> bf16; FTZ-safe structure of the f32 fast path
    (raw-exponent bitcast * 2^112 for normals, selected subnormal fix-up),
    with the bit pattern built in i32 lanes (no 16-bit shifts — Mosaic
    bans them) and the rebias multiply running at bf16 width."""
    v = byte.astype(jnp.int32)
    payload = v & 0x7F
    sbit = (v >> 7) << 15
    normal = _bitcast(((payload << 5) | sbit).astype(jnp.uint16),
                      jnp.bfloat16) * jnp.bfloat16(2.0 ** 112)
    m_f = payload.astype(jnp.bfloat16)  # == m when e5 == 0
    subm = _bitcast(m_f * jnp.bfloat16(2.0 ** -16), jnp.uint16)
    sub = _bitcast(subm | sbit.astype(jnp.uint16), jnp.bfloat16)
    return jnp.where(payload < 4, sub, normal)


def decode_fp4_field_f32_fast(field: jnp.ndarray) -> jnp.ndarray:
    """fp4_e2m1 field -> f32 with NO select: bitcast(p << 23 | s << 31)
    is ±2^(p-127) for p >= 1 and ±0 for p == 0 automatically, so one
    multiply by 2^120 rebiases to ±2^(p-7) and zero stays zero (no
    subnormal intermediates — p >= 1 is already a normal f32). 5 ops vs
    the legacy path's ~9 (mask, or-120, sign build, shift, compare,
    select). Value-identical to decode_fp4_field_f32 except the p == 0
    negative codes decode to -0.0 instead of +0.0 (same real number,
    identical dot products)."""
    f4 = field.astype(jnp.int32)
    bits = ((f4 & 7) << 23) | ((f4 >> 3) << 31)
    return _bitcast(bits, jnp.float32) * jnp.float32(2.0 ** 120)


def decode_fp4_field_bf16_fast(field: jnp.ndarray) -> jnp.ndarray:
    """fp4_e2m1 field -> bf16; same select-free rebias-multiply trick as
    decode_fp4_field_f32_fast, with the pattern built in i32 lanes
    (Mosaic bans 16-bit shifts) and emitted via a 16-bit cast."""
    f4 = field.astype(jnp.int32)
    bits = ((f4 & 7) << 7) | ((f4 >> 3) << 15)
    return _bitcast(bits.astype(jnp.uint16),
                    jnp.bfloat16) * jnp.bfloat16(2.0 ** 120)


def decode_f8e5m2_to_f32(byte: jnp.ndarray) -> jnp.ndarray:
    """float8_e5m2 byte -> f32 (finite codes; inf/nan not special-cased)."""
    v = byte.astype(jnp.uint32)
    s = v >> 7
    e5 = (v >> 2) & jnp.uint32(31)
    m = v & jnp.uint32(3)
    normal = _bitcast(
        (s << jnp.uint32(31)) | ((e5 + jnp.uint32(112)) << jnp.uint32(23))
        | (m << jnp.uint32(21)), jnp.float32)
    # Mosaic has no uint32->f32 cast — route the tiny subnormal factors
    # through int32 (values are 0..3, exact either way).
    s_f = s.astype(jnp.int32).astype(jnp.float32)
    m_f = m.astype(jnp.int32).astype(jnp.float32)
    sub = (jnp.float32(1.0) - 2.0 * s_f) * m_f * jnp.float32(2.0**-16)
    return jnp.where(e5 == 0, sub, normal)


# ---------------------------------------------------------------------------
# Scale / zero-point application (the three zeros modes)
# ---------------------------------------------------------------------------

def apply_scaling(w: jnp.ndarray, scale: Optional[jnp.ndarray],
                  zeros: Optional[jnp.ndarray], zeros_mode: str) -> jnp.ndarray:
    """Reference semantics (general_matmul/__init__.py:74-78):
      original:  (w - zeros) * scale
      rescale:    w * scale - zeros
      quantized:  w * scale   (zero already subtracted pre-cast in the decoder)
    `scale`/`zeros` must be broadcast to w's shape by the caller.
    """
    if scale is None:
        return w
    if zeros is None or zeros_mode == "quantized":
        return w * scale
    if zeros_mode == "original":
        return (w - zeros) * scale
    if zeros_mode == "rescale":
        return w * scale - zeros
    raise ValueError(f"Unsupported zeros_mode: {zeros_mode}")


# ---------------------------------------------------------------------------
# Fast-decoding variants (TPU analog of the LOP3 magic-number trick)
# ---------------------------------------------------------------------------

def fast_decode_uint_to_f16(field: jnp.ndarray, bits: int) -> jnp.ndarray:
    """uint{1,2,4} field -> f16 without an int->float convert.

    The reference's LOP3 kernels OR nibbles into an f16 with exponent bias
    0x6400 (1024.0) and subtract the magic (gpu/intrin/lop3.py:20-33). Same
    trick here on VPU lanes: 0x6400 | field bitcasts to 1024 + field, so
    subtracting 1024.0 yields the field value exactly for field < 1024.
    """
    bits16 = jnp.uint16(0x6400) | field.astype(jnp.uint16)
    return _bitcast(bits16, jnp.float16) - jnp.float16(1024.0)


def fast_decode_uint_to_bf16(field: jnp.ndarray, bits: int) -> jnp.ndarray:
    """uint{1,2,4} field -> bf16 via exponent-bias bitcast.

    bf16 has 7 mantissa bits: 0x4300 | field represents 128 + field exactly
    for field <= 127, so subtracting 128.0 recovers the field.
    """
    bits16 = jnp.uint16(0x4300) | field.astype(jnp.uint16)
    return _bitcast(bits16, jnp.bfloat16) - jnp.bfloat16(128.0)


def saturate(x: jnp.ndarray, out_dtype) -> jnp.ndarray:
    """Round+clamp an accumulator for a narrow-int output dtype (round-to-
    nearest for float accumulators, clamp to the dtype range); identity for
    everything else. Single home for the saturating-epilogue semantics
    shared by the fused kernel, the asplit / materialize plans, and the
    reference oracle. Does NOT cast — Pallas kernels route the final cast
    through their Mosaic-safe helper."""
    odt = jnp.dtype(out_dtype)
    if jnp.issubdtype(odt, jnp.integer) and odt.itemsize < 4:
        info = jnp.iinfo(odt)
        if not jnp.issubdtype(x.dtype, jnp.integer):
            x = jnp.round(x)
        x = jnp.clip(x, info.min, info.max)
    return x


def saturate_cast(x: jnp.ndarray, out_dtype) -> jnp.ndarray:
    """saturate() then cast to the output dtype."""
    return saturate(x, out_dtype).astype(jnp.dtype(out_dtype))
