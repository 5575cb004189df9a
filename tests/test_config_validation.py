"""Config legalization / error-path coverage (reference __post_init__ rules)."""

import pytest

from bitblas_tpu import (FlashAttenConfig, MatmulConfig,
                         MatmulConfigWithSplitK, TransformKind)


def test_requires_n_k():
    with pytest.raises(ValueError):
        MatmulConfig(M=16, N=None, K=256)
    with pytest.raises(ValueError):
        MatmulConfig(M=16, N=256, K=None)


def test_w_dtype_defaults_to_a_dtype():
    c = MatmulConfig(M=16, N=256, K=256, A_dtype="bfloat16")
    assert c.W_dtype == "bfloat16"
    assert c.is_native_compute()


def test_default_dynamic_buckets():
    c = MatmulConfig(N=256, K=256)
    assert c.M == (1, 16, 32, 64, 128, 256, 512, 1024)
    assert c.is_dynamic_m


def test_contiguous_batching_buckets():
    from bitblas_tpu import OptimizeStrategy
    c = MatmulConfig(N=256, K=256,
                     optimize_stratety=OptimizeStrategy.ContigousBatching)
    assert 1 not in c.M


def test_unsupported_dtype_rejected():
    with pytest.raises(ValueError):
        MatmulConfig(M=16, N=256, K=256, W_dtype="int3")


def test_int_weights_reject_zeros():
    with pytest.raises(ValueError):
        MatmulConfig(M=16, N=256, K=256, A_dtype="float16", W_dtype="int4",
                     with_zeros=True)


def test_fast_decoding_default_rule():
    # enabled for sub-byte uint with fp16 activations
    assert MatmulConfig(M=16, N=256, K=256, A_dtype="float16",
                        W_dtype="uint4").fast_decoding
    # disabled for same-dtype, 8-bit, and int8 activations
    assert not MatmulConfig(M=16, N=256, K=256, A_dtype="float16",
                            W_dtype="float16").fast_decoding
    assert not MatmulConfig(M=16, N=256, K=256, A_dtype="int8",
                            W_dtype="int8").fast_decoding


def test_propagate_legalization():
    c = MatmulConfig(M=16, N=256, K=256, A_dtype="float16", W_dtype="uint4",
                     propagate_a=True, propagate_b=True)
    assert c.propagate_a == TransformKind.NonTransform  # never on TPU
    assert c.propagate_b == TransformKind.LDMatrixTransform


def test_storage_dtype_native_override():
    c = MatmulConfig(M=16, N=256, K=256, A_dtype="float16", W_dtype="float16")
    assert c.storage_dtype == "float16"


def test_splitk_group_alignment():
    with pytest.raises(ValueError):
        MatmulConfigWithSplitK(M=16, N=256, K=256, A_dtype="float16",
                               W_dtype="uint4", with_scaling=True,
                               group_size=128, k_split=4)  # K/4=64 < g


def test_flash_config_validation():
    with pytest.raises(ValueError):
        FlashAttenConfig(batch=1, heads=4, seq_len=None, dim=64)
    with pytest.raises(ValueError):
        FlashAttenConfig(batch=1, heads=3, kv_heads=2, seq_len=128, dim=64)
    c = FlashAttenConfig(batch=1, heads=4, seq_len=128, dim=64)
    assert c.kv_heads == 4 and c.K_dtype == "float16"
