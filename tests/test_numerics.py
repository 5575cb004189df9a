"""Bit-exactness tests for the quantization core.

Golden values are computed with independent scalar numpy implementations of
the reference TIR formulas (/root/reference/bitblas/quantization/quantization.py)
so the vectorized jnp versions are checked formula-by-formula.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from bitblas_tpu.quantization import (
    apply_scaling,
    decode_f8e4m3_byte,
    decode_f8e5m2_byte,
    decode_fp4_field,
    decode_int_field,
    decode_nf4_field,
    decode_uint_field,
    fast_decode_uint_to_bf16,
    fast_decode_uint_to_f16,
    general_compress,
    general_decompress,
    interleave_weight,
    pack_fields,
    pack_nslot,
    unpack_fields,
    unpack_nslot,
    unpack_qzeros,
    unpack_qzeros_v2,
    NF4_TABLE,
)


def scalar_fp4_to_f16(f4: int) -> np.float16:
    # Literal transcription of _tir_packed_to_fp4_to_f16 (quantization.py:139).
    s = f4 >> 3
    e_f4 = f4 & 7
    e_f16 = e_f4 | 8
    bits = np.uint16(((e_f16 | (s << 5)) << 10) & 0xFFFF)
    val = bits.view(np.float16) if hasattr(bits, "view") else None
    val = np.array([bits], dtype=np.uint16).view(np.float16)[0]
    return np.float16(0.0) if e_f4 == 0 else val


def scalar_e4m3_to_f16(v: int) -> np.float16:
    # Literal transcription of _tir_u8_to_f8_e4m3_to_f16 (quantization.py:170).
    s_f16 = (v >> 7) << 15
    e4 = v & 0x40
    e_f16 = ((v & 63) << 7) | (e4 << 8) | (e4 << 7)
    e_f16 ^= 0x2000
    return np.array([(s_f16 | e_f16) & 0xFFFF], dtype=np.uint16).view(np.float16)[0]


class TestFieldPacking:

    @pytest.mark.parametrize("bits", [1, 2, 4])
    def test_pack_unpack_roundtrip(self, bits):
        rng = np.random.default_rng(0)
        vals = rng.integers(0, 1 << bits, size=(16, 64), dtype=np.uint8)
        packed = pack_fields(jnp.asarray(vals), bits)
        unpacked = unpack_fields(packed, bits)
        np.testing.assert_array_equal(np.asarray(unpacked), vals)

    @pytest.mark.parametrize("bits", [1, 2, 4])
    def test_matches_general_compress(self, bits):
        rng = np.random.default_rng(1)
        vals = rng.integers(0, 1 << bits, size=(8, 32), dtype=np.int8)
        ours = np.asarray(pack_fields(jnp.asarray(vals), bits))
        ref = general_compress(vals, bits)
        np.testing.assert_array_equal(ours, ref)

    @pytest.mark.parametrize("bits", [1, 2, 4])
    def test_general_decompress_roundtrip(self, bits):
        rng = np.random.default_rng(2)
        vals = rng.integers(0, 1 << bits, size=(8, 64), dtype=np.int8)
        packed = general_compress(vals, bits)
        np.testing.assert_array_equal(general_decompress(packed, bits), vals)

    @pytest.mark.parametrize("bits", [1, 2, 4])
    @pytest.mark.parametrize("tile_n", [256, 512])
    def test_nslot_roundtrip(self, bits, tile_n):
        rng = np.random.default_rng(3)
        K, N = 32, 1024
        vals = rng.integers(0, 1 << bits, size=(K, N), dtype=np.uint8)
        packed = pack_nslot(vals, bits, tile_n)
        assert packed.shape == (K, N * bits // 8)
        np.testing.assert_array_equal(unpack_nslot(packed, bits, tile_n), vals)

    def test_nslot_slot_semantics(self):
        # Kernel contract: slot i of packed word j in tile t = natural column
        # t*tile_n + i*(tile_n//e) + j.
        bits, tile_n = 4, 256
        e = 8 // bits
        K, N = 4, 512
        vals = np.arange(K * N, dtype=np.uint32).reshape(K, N) % 16
        packed = pack_nslot(vals.astype(np.uint8), bits, tile_n).view(np.uint8)
        sub = tile_n // e
        for t in range(N // tile_n):
            block = packed[:, t * sub:(t + 1) * sub]
            for i in range(e):
                slot = (block >> (i * bits)) & 0xF
                nat = vals[:, t * tile_n + i * sub: t * tile_n + (i + 1) * sub]
                np.testing.assert_array_equal(slot, nat)


class TestDecoders:

    def test_uint_decode(self):
        f = jnp.arange(16, dtype=jnp.uint8)
        out = decode_uint_field(f, 4, jnp.float16)
        np.testing.assert_array_equal(np.asarray(out), np.arange(16, dtype=np.float16))

    @pytest.mark.parametrize("bits", [1, 2, 4])
    def test_int_decode(self, bits):
        f = jnp.arange(1 << bits, dtype=jnp.uint8)
        out = decode_int_field(f, bits, jnp.float16)
        expected = np.arange(1 << bits, dtype=np.float16) - (1 << (bits - 1))
        np.testing.assert_array_equal(np.asarray(out), expected)

    def test_fp4_decode_all_codes(self):
        f = jnp.arange(16, dtype=jnp.uint8)
        out = np.asarray(decode_fp4_field(f, jnp.float16))
        expected = np.array([scalar_fp4_to_f16(v) for v in range(16)],
                            dtype=np.float16)
        np.testing.assert_array_equal(out.view(np.uint16), expected.view(np.uint16))

    def test_e4m3_decode_all_codes(self):
        v = jnp.arange(256, dtype=jnp.uint8)
        out = np.asarray(decode_f8e4m3_byte(v, jnp.float16))
        expected = np.array([scalar_e4m3_to_f16(i) for i in range(256)],
                            dtype=np.float16)
        np.testing.assert_array_equal(out.view(np.uint16), expected.view(np.uint16))

    def test_e4m3_matches_ml_dtypes_on_normals(self):
        # Cross-check the bit surgery against the real e4m3fn dtype for
        # normal, non-nan codes.
        import ml_dtypes
        v = np.arange(256, dtype=np.uint8)
        real = v.view(ml_dtypes.float8_e4m3fn).astype(np.float32)
        ours = np.asarray(decode_f8e4m3_byte(jnp.asarray(v), jnp.float16)).astype(np.float32)
        finite = np.isfinite(real)
        normal = np.abs(real) >= 2.0**-6  # exclude subnormals (ref formula diverges)
        m = finite & normal
        np.testing.assert_array_equal(ours[m], real[m])

    def test_e5m2_decode(self):
        import ml_dtypes
        v = np.arange(256, dtype=np.uint8)
        real = v.view(ml_dtypes.float8_e5m2).astype(np.float32)
        ours = np.asarray(decode_f8e5m2_byte(jnp.asarray(v), jnp.float16)).astype(np.float32)
        m = np.isfinite(real)
        np.testing.assert_array_equal(ours[m], real[m])

    def test_nf4_decode(self):
        f = jnp.arange(16, dtype=jnp.uint8)
        out = np.asarray(decode_nf4_field(f, jnp.float16))
        np.testing.assert_array_equal(out, NF4_TABLE.astype(np.float16))

    @pytest.mark.parametrize("bits", [1, 2, 4])
    def test_fast_decode_matches_plain(self, bits):
        f = jnp.arange(1 << bits, dtype=jnp.uint8)
        plain = decode_uint_field(f, bits, jnp.float16)
        fast = fast_decode_uint_to_f16(f, bits)
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(fast))
        plain_bf = decode_uint_field(f, bits, jnp.bfloat16)
        fast_bf = fast_decode_uint_to_bf16(f, bits)
        np.testing.assert_array_equal(
            np.asarray(plain_bf).astype(np.float32),
            np.asarray(fast_bf).astype(np.float32))


class TestScaling:

    def _wsz(self):
        rng = np.random.default_rng(7)
        w = jnp.asarray(rng.integers(0, 16, (8, 16)).astype(np.float32))
        s = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
        z = jnp.asarray(rng.integers(0, 16, (8, 16)).astype(np.float32))
        return w, s, z

    def test_original(self):
        w, s, z = self._wsz()
        out = apply_scaling(w, s, z, "original")
        np.testing.assert_allclose(np.asarray(out), np.asarray((w - z) * s))

    def test_rescale(self):
        w, s, z = self._wsz()
        out = apply_scaling(w, s, z, "rescale")
        np.testing.assert_allclose(np.asarray(out), np.asarray(w * s - z))

    def test_quantized_mode_only_scales(self):
        w, s, z = self._wsz()
        out = apply_scaling(w, s, z, "quantized")
        np.testing.assert_allclose(np.asarray(out), np.asarray(w * s))


class TestGPTQUnpack:

    def test_unpack_qzeros_v1_offbyone(self):
        # v1 stores z-1; unpack must add 1 then mask (AutoGPTQ quirk).
        bits = 4
        z = np.array([[5, 3, 0, 15, 7, 2, 1, 8]], dtype=np.int32)
        packed = np.zeros((1, 1), dtype=np.int32)
        for i, v in enumerate(z[0]):
            packed[0, 0] |= ((v - 1) & 0xF) << (bits * i)
        out = unpack_qzeros(packed, bits)
        np.testing.assert_array_equal(out[0], z[0])

    def test_unpack_qzeros_v2_direct(self):
        bits = 4
        z = np.array([[5, 3, 0, 15, 7, 2, 1, 8]], dtype=np.int32)
        packed = np.zeros((1, 1), dtype=np.int32)
        for i, v in enumerate(z[0]):
            packed[0, 0] |= (v & 0xF) << (bits * i)
        out = unpack_qzeros_v2(packed, bits)
        np.testing.assert_array_equal(out[0], z[0])


class TestInterleave:

    @pytest.mark.parametrize("nbits,target", [(4, "float16"), (2, "float16"),
                                              (1, "float16"), (4, "int8"),
                                              (2, "int8"), (1, "int8")])
    def test_interleave_is_permutation(self, nbits, target):
        # The interleave must be a pure bit permutation within each 32-bit
        # word: popcount preserved, roundtrippable by brute force per field.
        rng = np.random.default_rng(11)
        w = rng.integers(-2**31, 2**31 - 1, size=(4, 8), dtype=np.int64).astype(np.int32)
        out = interleave_weight(w.view(np.int8), nbits, target).view(np.int32)
        pop_in = np.unpackbits(w.view(np.uint8)).sum()
        pop_out = np.unpackbits(out.view(np.uint8)).sum()
        assert pop_in == pop_out


class TestFastFpDecoders:
    """Branchless fast fp8/fp4 decoders must be value-identical to the
    established decoders for every code (r5 decode-floor campaign)."""

    def test_e4m3_fast32_all_codes(self):
        from bitblas_tpu.quantization.numerics import (
            decode_f8e4m3_to_f32, decode_f8e4m3_to_f32_fast)
        codes = jnp.arange(256, dtype=jnp.int32)
        a = np.asarray(decode_f8e4m3_to_f32(codes))
        b = np.asarray(decode_f8e4m3_to_f32_fast(codes))
        np.testing.assert_array_equal(a.view(np.uint32), b.view(np.uint32))

    def test_e5m2_fast32_all_codes(self):
        from bitblas_tpu.quantization.numerics import (
            decode_f8e5m2_to_f32, decode_f8e5m2_to_f32_fast)
        codes = jnp.arange(256, dtype=jnp.int32)
        a = np.asarray(decode_f8e5m2_to_f32(codes))
        b = np.asarray(decode_f8e5m2_to_f32_fast(codes))
        # inf/nan codes (e5=31) decode to the same finite 2^16 family in
        # both (documented: finite-code semantics)
        np.testing.assert_array_equal(a.view(np.uint32), b.view(np.uint32))

    def test_e4m3_fast16_all_codes(self):
        from bitblas_tpu.quantization.numerics import (
            decode_f8e4m3_to_bf16_fast, decode_f8e4m3_to_f32)
        codes = jnp.arange(256, dtype=jnp.int32)
        a = np.asarray(decode_f8e4m3_to_f32(codes)).astype(np.float32)
        b = np.asarray(decode_f8e4m3_to_bf16_fast(codes)).astype(np.float32)
        # e4m3 has 3 mantissa bits: bf16 holds every value exactly
        np.testing.assert_array_equal(a, b)

    def test_e5m2_fast16_all_codes(self):
        from bitblas_tpu.quantization.numerics import (
            decode_f8e5m2_to_bf16_fast, decode_f8e5m2_to_f32)
        codes = jnp.arange(256, dtype=jnp.int32)
        a = np.asarray(decode_f8e5m2_to_f32(codes)).astype(np.float32)
        b = np.asarray(decode_f8e5m2_to_bf16_fast(codes)).astype(np.float32)
        np.testing.assert_array_equal(a, b)

    def test_fp4_fast16_all_codes(self):
        from bitblas_tpu.quantization.numerics import (
            decode_fp4_field_bf16_fast, decode_fp4_field_f32)
        codes = jnp.arange(16, dtype=jnp.int32)
        a = np.asarray(decode_fp4_field_f32(codes)).astype(np.float32)
        b = np.asarray(decode_fp4_field_bf16_fast(codes)).astype(np.float32)
        np.testing.assert_array_equal(a, b)

    def test_fp4_fast32_all_codes(self):
        from bitblas_tpu.quantization.numerics import (
            decode_fp4_field_f32, decode_fp4_field_f32_fast)
        codes = jnp.arange(16, dtype=jnp.int32)
        a = np.asarray(decode_fp4_field_f32(codes))
        b = np.asarray(decode_fp4_field_f32_fast(codes))
        # -0.0 vs +0.0 at the p==0 negative code is the documented delta
        np.testing.assert_array_equal(a, b)
