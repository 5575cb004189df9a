"""BitNet through the full serving surface (DecoderServingMixin).

The reference's BitNet e2e is a bespoke torch generation loop
(integration/BitNet); here BitNetLlama inherits the same serving hooks as
QuantLlama, so engines, generate, and speculation (BitNet draft for a
uint4 target) run unchanged.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from bitblas_tpu.models import (BitNetLlama, LlamaConfig, QuantLlama,
                                QuantLlamaLM)
from bitblas_tpu.models.hf_import import LMHead
from bitblas_tpu.models.speculative import speculative_generate_cached
from bitblas_tpu.serving import TokenContinuousBatchingEngine

V, H = 64, 256
CFG = LlamaConfig(hidden_size=H, intermediate_size=512, num_heads=4,
                  num_kv_heads=2, num_layers=2, vocab_size=V,
                  group_size=128)


@pytest.fixture(scope="module")
def head():
    rng = np.random.default_rng(0)
    return LMHead(
        embed=jnp.asarray(rng.standard_normal((V, H)) * 0.05, jnp.float16),
        final_norm=jnp.ones((H,), jnp.float32),
        lm_head=jnp.asarray(rng.standard_normal((V, H)) * 0.05, jnp.float32),
    )


@pytest.fixture(scope="module")
def bitnet():
    return BitNetLlama(CFG, opt_m=(1, 4, 8, 16))


def test_bitnet_generate_matches_kv_decode(bitnet, head):
    lm = QuantLlamaLM(bitnet, head)
    prompt = np.arange(6, dtype=np.int32)
    out = lm.generate(prompt, max_new_tokens=5, temperature=0.0)
    assert out.shape == (11,)
    # teacher-force through the full forward: KV decode == recompute
    for t in range(6, 11):
        logits = np.asarray(lm(jnp.asarray(out[:t])[None]))[0, -1]
        assert int(np.argmax(logits)) == out[t], t


def test_bitnet_token_engine(bitnet, head):
    lm = QuantLlamaLM(bitnet, head)
    solo = lm.generate(np.arange(5), max_new_tokens=4, temperature=0.0)
    eng = TokenContinuousBatchingEngine(bitnet, head, num_slots=2,
                                        max_seq_len=32)
    req = eng.submit_tokens(uid=0, tokens=np.arange(5), max_new=4)
    eng.run_to_completion()
    assert req.done
    assert np.array_equal(np.asarray(req.out_tokens), solo[5:])


def test_bitnet_drafts_for_uint4_target(bitnet, head):
    """The advertised pairing: a W2A8 BitNet draft speculating for a
    W4A16 target — greedy output must equal target-only greedy."""
    target = QuantLlamaLM(QuantLlama(CFG, opt_m=(1, 4, 8, 16)), head)
    draft = QuantLlamaLM(bitnet, head)
    prompt = np.arange(5, dtype=np.int32)
    ref = target.generate(prompt, max_new_tokens=6, temperature=0.0)
    out, stats = speculative_generate_cached(
        target, draft, prompt, max_new_tokens=6, gamma=3,
        return_stats=True)
    assert np.array_equal(out, ref)
    assert stats.tokens == 6


def test_bitnet_checkpoint_module_roundtrip(bitnet, head, tmp_path):
    from bitblas_tpu.module.checkpoint import (load_quant_state,
                                               save_quant_state)
    save_quant_state(str(tmp_path / "bn"), bitnet.state_dict())
    from bitblas_tpu.models import BitNetLlama
    other = BitNetLlama(CFG, opt_m=(1, 4, 8, 16))
    other.load_state_dict(load_quant_state(str(tmp_path / "bn")))
    rng = np.random.default_rng(22)
    x = jnp.asarray(rng.standard_normal((1, 8, H)) * 0.1, jnp.float16)
    pos = jnp.arange(8)[None]
    np.testing.assert_array_equal(np.asarray(bitnet(x, pos)),
                                  np.asarray(other(x, pos)))
