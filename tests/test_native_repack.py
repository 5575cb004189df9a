"""Native C++ repack library vs the numpy reference implementations."""

import numpy as np
import pytest

from bitblas_tpu import native
from bitblas_tpu.quantization import packing

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native repack lib unavailable")

RNG = np.random.default_rng(0)


@pytest.mark.parametrize("bits", [1, 2, 4])
def test_general_compress_decompress(bits):
    vals = RNG.integers(0, 1 << bits, (128, 256), dtype=np.int64).astype(np.int8)
    # force-compare against pure numpy (below the native size threshold the
    # python path is used; call native explicitly)
    ref_packed = packing.general_compress(vals, bits)
    nat_packed = native.general_compress(vals, bits)
    np.testing.assert_array_equal(ref_packed, nat_packed)
    np.testing.assert_array_equal(native.general_decompress(nat_packed, bits),
                                  packing.general_decompress(ref_packed, bits))


@pytest.mark.parametrize("bits,tile_n", [(4, 256), (2, 512), (1, 1024)])
def test_pack_nslot(bits, tile_n):
    K, N = 64, 2048
    vals = RNG.integers(0, 1 << bits, (K, N), dtype=np.int64).astype(np.uint8)
    ref = packing.pack_nslot(vals, bits, tile_n)
    nat = native.pack_nslot(vals, bits, tile_n)
    np.testing.assert_array_equal(ref, nat)
    np.testing.assert_array_equal(native.unpack_nslot(nat, bits, tile_n), vals)


@pytest.mark.parametrize("add_one", [True, False])
def test_unpack_qzeros(add_one):
    bits = 4
    z = RNG.integers(-2**31, 2**31 - 1, (16, 32), dtype=np.int64).astype(np.int32)
    ref = (packing.unpack_qzeros(z, bits) if add_one
           else packing.unpack_qzeros_v2(z, bits))
    nat = native.unpack_qzeros(z, bits, add_one)
    np.testing.assert_array_equal(ref, nat)


def test_transpose_and_bias():
    a = RNG.integers(0, 256, (100, 200), dtype=np.int64).astype(np.uint8)
    np.testing.assert_array_equal(native.transpose_u8(a), a.T)
    w = RNG.integers(-10, 10, (64, 64), dtype=np.int64).astype(np.int8)
    ref = packing.bias_signed_weight(w, 4)
    np.testing.assert_array_equal(native.bias_signed(w, 4), ref)
