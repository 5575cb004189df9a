"""QuantLlamaLM.generate: KV-cache decode loop vs full-forward parity.

The single-stream generation loop the reference delegates to HF
`model.generate`; here it drives make_prefill + decode_step — the same
paths the serving engines use — so teacher-forcing the generated sequence
through the full forward must reproduce each step's logits.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from bitblas_tpu.models import LlamaConfig, QuantLlama, QuantLlamaLM
from bitblas_tpu.models.hf_import import LMHead

V, H = 64, 256


@pytest.fixture(scope="module")
def lm():
    cfg = LlamaConfig(hidden_size=H, intermediate_size=512, num_heads=4,
                      num_kv_heads=2, num_layers=2, vocab_size=V,
                      group_size=128)
    model = QuantLlama(cfg, opt_m=(1, 16))
    rng = np.random.default_rng(0)
    head = LMHead(
        embed=jnp.asarray(rng.standard_normal((V, H)) * 0.05, jnp.float16),
        final_norm=jnp.ones((H,), jnp.float32),
        lm_head=jnp.asarray(rng.standard_normal((V, H)) * 0.05, jnp.float32),
    )
    return QuantLlamaLM(model, head)


def test_generate_greedy_matches_full_forward(lm):
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, V, 7).astype(np.int32)
    out = lm.generate(prompt, max_new_tokens=5, temperature=0.0)
    assert out.shape == (12,)
    assert np.array_equal(out[:7], prompt)
    assert out.min() >= 0 and out.max() < V
    # Teacher-force: each generated token is the argmax of the FULL
    # forward's logits over the prefix (KV-cache decode == recompute).
    for t in range(7, 12):
        logits = np.asarray(lm(jnp.asarray(out[:t])[None]))[0, -1]
        assert int(np.argmax(logits)) == out[t], t


def test_generate_eos_stops_early(lm):
    prompt = np.arange(4, dtype=np.int32)
    full = lm.generate(prompt, max_new_tokens=8, temperature=0.0)
    eos = int(full[4])  # first generated token
    out = lm.generate(prompt, max_new_tokens=8, temperature=0.0,
                      eos_token_id=eos)
    assert out.shape == (5,) and out[-1] == eos


def test_generate_sampling_seeded_and_in_vocab(lm):
    prompt = np.arange(3, dtype=np.int32)
    a = lm.generate(prompt, max_new_tokens=6, temperature=0.8, top_k=8,
                    seed=42)
    b = lm.generate(prompt, max_new_tokens=6, temperature=0.8, top_k=8,
                    seed=42)
    c = lm.generate(prompt, max_new_tokens=6, temperature=0.8, top_k=8,
                    seed=43)
    assert np.array_equal(a, b)
    assert a.min() >= 0 and a.max() < V
    # different seeds are allowed to agree by chance on any prefix, but a
    # full 6-token tie at temperature 0.8 over top-8 is ~(1/8)^6 — treat
    # as failure.
    assert not np.array_equal(a, c)


def test_generate_validates_budget(lm):
    with pytest.raises(ValueError, match="max_seq_len"):
        lm.generate(np.arange(4), max_new_tokens=8, max_seq_len=8)
