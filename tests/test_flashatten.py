"""FlashAtten vs XLA softmax oracle (reference
testing/python/tilelang/test_tilelang_flash_atten.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bitblas_tpu import FlashAtten, FlashAttenConfig
from bitblas_tpu.testing import assert_close


def run_case(cfg: FlashAttenConfig, seed=0, rtol=2e-2, atol=2e-2):
    op = FlashAtten(cfg, enable_tuning=False)
    Q, K, V = op._example_args()
    got = op.forward(Q, K, V)
    expected = op.ref_program(Q, K, V)
    assert got.shape == expected.shape
    assert_close(got, expected, rtol=rtol, atol=atol)


@pytest.mark.parametrize("causal", [False, True])
def test_basic(causal):
    cfg = FlashAttenConfig(batch=2, heads=4, seq_len=256, dim=64,
                           is_causal=causal)
    run_case(cfg)


def test_gqa():
    cfg = FlashAttenConfig(batch=1, heads=8, kv_heads=2, seq_len=256, dim=64,
                           is_causal=True)
    run_case(cfg)


def test_ntn_layout():
    cfg = FlashAttenConfig(batch=1, heads=2, seq_len=256, dim=64,
                           layout="ntn")
    run_case(cfg)


def test_uneven_blocks():
    cfg = FlashAttenConfig(batch=1, heads=2, seq_len=384, dim=64,
                           is_causal=True)
    run_case(cfg)
