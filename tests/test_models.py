"""Model-family tests: BitNet QAT/inference parity, quantized Llama layer."""

import jax
import jax.numpy as jnp
import numpy as np

from bitblas_tpu.models import (BitLinearInference, LlamaConfig, QuantLlama,
                                activation_quant, bitlinear_train_forward,
                                weight_quant, weight_quant_codes)
from bitblas_tpu.testing import assert_close


def test_weight_quant_matches_reference_formula():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 64)).astype(np.float32)
    got = np.asarray(weight_quant(jnp.asarray(w)))
    s = 1.0 / max(np.abs(w).mean(), 1e-5)
    expected = np.clip(np.round(w * s), -1, 1) / s
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_activation_quant_matches_reference_formula():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 64)).astype(np.float32)
    got = np.asarray(activation_quant(jnp.asarray(x)))
    s = 127.0 / np.clip(np.abs(x).max(axis=-1, keepdims=True), 1e-5, None)
    expected = np.clip(np.round(x * s), -128, 127) / s
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_bitlinear_inference_matches_fakequant():
    """The INT2xINT8 kernel path must equal the fake-quant math exactly
    (integer-exact accumulation)."""
    rng = np.random.default_rng(2)
    K, N = 512, 512
    w = (rng.standard_normal((N, K)) * 0.02).astype(np.float32)
    x = rng.standard_normal((4, K)).astype(np.float32)

    layer = BitLinearInference.from_weight(w, opt_m=(16,))
    out = np.asarray(layer(jnp.asarray(x)))

    # fake-quant ground truth with the same scales
    codes, sw = weight_quant_codes(w)
    s_a = 127.0 / np.clip(np.abs(x).max(axis=-1, keepdims=True), 1e-5, None)
    q = np.clip(np.round(x * s_a), -128, 127)
    expected = (q @ codes.T.astype(np.float64)) / (sw * s_a)
    assert_close(out, expected, rtol=1e-5, atol=1e-5)


def test_bitlinear_training_grads():
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal((32, 64)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))

    def loss(w):
        return jnp.sum(bitlinear_train_forward(x, w) ** 2)

    g = jax.grad(loss)(w)
    assert g.shape == w.shape
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).sum()) > 0


def test_quant_llama_layer_forward():
    cfg = LlamaConfig(hidden_size=256, intermediate_size=512, num_heads=4,
                      num_kv_heads=2, num_layers=1, group_size=128)
    model = QuantLlama(cfg, opt_m=(16,))
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 8, 256)).astype(np.float16))
    pos = jnp.broadcast_to(jnp.arange(8)[None, :], (2, 8))
    out = model(x, pos)
    assert out.shape == (2, 8, 256)
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))


def test_bitnet_llama_forward():
    cfg = LlamaConfig(hidden_size=256, intermediate_size=512, num_heads=4,
                      num_kv_heads=4, num_layers=1)
    from bitblas_tpu.models import BitNetLlama
    model = BitNetLlama(cfg, opt_m=(8, 16))
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 8, 256)).astype(np.float16))
    pos = jnp.broadcast_to(jnp.arange(8)[None, :], (2, 8))
    out = model(x, pos)
    assert out.shape == (2, 8, 256)
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))


def test_flash_prefill_matches_naive():
    """Long-prompt prefill routes through the flash kernel and matches the
    naive attention path."""
    import jax.numpy as jnp
    from bitblas_tpu.models.quant_llama import (LlamaConfig, QuantLlama,
                                                layer_forward)
    cfg = LlamaConfig(hidden_size=256, intermediate_size=512, num_heads=4,
                      num_kv_heads=2, num_layers=2, group_size=64)
    m = QuantLlama(cfg, opt_m=(8,))
    rng = np.random.default_rng(0)
    S = 256
    x = jnp.asarray(rng.standard_normal((1, S, 256)).astype(np.float16))
    pos = jnp.arange(S)[None, :]
    h_flash, ks_f, _ = m.make_prefill(S)(x, pos)

    xx = x
    for layer in m.layers:
        xx, k, v = layer_forward(layer, xx, pos, return_kv=True)
    np.testing.assert_allclose(np.asarray(h_flash, np.float32),
                               np.asarray(xx, np.float32),
                               rtol=2e-2, atol=2e-2)
