"""Llama-3.1 rope scaling: golden comparison against HF transformers.

The BASELINE parity model family is Llama-3; 3.1+ checkpoints carry a
rope_scaling dict that must reproduce transformers' frequency table or
long-context logits drift from the source model.
"""

import numpy as np
import pytest

from bitblas_tpu.models.quant_llama import (LlamaConfig, llama3_scaled_freqs,
                                            rope)

SCALING = {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
           "high_freq_factor": 4.0,
           "original_max_position_embeddings": 8192}


def test_llama3_freqs_match_transformers():
    transformers = pytest.importorskip("transformers")
    try:
        from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS
        import torch
    except ImportError:
        pytest.skip("transformers rope utils unavailable")
    from transformers import LlamaConfig as HFLlamaConfig

    hf_cfg = HFLlamaConfig(hidden_size=1024, num_attention_heads=8,
                           rope_theta=500000.0, rope_scaling=dict(SCALING),
                           max_position_embeddings=131072)
    inv, att = ROPE_INIT_FUNCTIONS["llama3"](hf_cfg, device="cpu")
    ours = llama3_scaled_freqs(500000.0, 128, SCALING)
    np.testing.assert_allclose(ours, inv.numpy().astype(np.float32),
                               rtol=1e-6)
    assert att == 1.0  # llama3 scaling has no attention factor


def test_rope_accepts_freq_table():
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, 2, 128)), jnp.float32)
    pos = jnp.arange(4)[None]
    # unscaled table == plain theta path
    plain = rope(x, pos, 10000.0)
    table = 10000.0 ** (-np.arange(64, dtype=np.float64) / 64)
    via_table = rope(x, pos, table.astype(np.float32))
    np.testing.assert_allclose(np.asarray(via_table), np.asarray(plain),
                               rtol=1e-5, atol=1e-6)
    # scaled table changes low-frequency rotations only
    scaled = rope(x, pos, llama3_scaled_freqs(10000.0, 128, SCALING))
    assert not np.allclose(np.asarray(scaled), np.asarray(plain))


def test_config_from_hf_plumbs_scaling():
    from bitblas_tpu.models import llama_config_from_hf
    cfg = llama_config_from_hf(dict(
        hidden_size=256, intermediate_size=512, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=1, vocab_size=64,
        rope_theta=500000.0, rope_scaling=dict(SCALING)))
    assert cfg.rope_scaling == SCALING
    freqs = cfg.rope_arg
    assert isinstance(freqs, np.ndarray) and freqs.shape == (32,)

    with pytest.raises(ValueError, match="rope_scaling"):
        llama_config_from_hf(dict(
            hidden_size=256, intermediate_size=512, num_attention_heads=4,
            num_key_value_heads=2, num_hidden_layers=1, vocab_size=64,
            rope_scaling={"rope_type": "linear", "factor": 2.0}))


def test_scaled_model_decode_parity():
    """generate()'s KV decode matches the full forward under scaling —
    position handling must be consistent across prefill/decode paths."""
    import jax.numpy as jnp
    from bitblas_tpu.models import QuantLlama, QuantLlamaLM
    from bitblas_tpu.models.hf_import import LMHead

    cfg = LlamaConfig(hidden_size=256, intermediate_size=512, num_heads=4,
                      num_kv_heads=2, num_layers=1, vocab_size=64,
                      group_size=128, rope_theta=500000.0,
                      rope_scaling=dict(SCALING))
    model = QuantLlama(cfg, opt_m=(1, 16))
    rng = np.random.default_rng(0)
    head = LMHead(
        embed=jnp.asarray(rng.standard_normal((64, 256)) * 0.05,
                          jnp.float16),
        final_norm=jnp.ones((256,), jnp.float32),
        lm_head=jnp.asarray(rng.standard_normal((64, 256)) * 0.05,
                            jnp.float32),
    )
    lm = QuantLlamaLM(model, head)
    out = lm.generate(np.arange(6), max_new_tokens=4, temperature=0.0)
    for t in range(6, 10):
        logits = np.asarray(lm(jnp.asarray(out[:t])[None]))[0, -1]
        assert int(np.argmax(logits)) == out[t], t
