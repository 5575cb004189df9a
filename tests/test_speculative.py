"""Speculative decoding: greedy equivalence invariant + telemetry.

Greedy speculation must produce EXACTLY the target-only greedy stream for
any draft (Leviathan et al. property) — with a perfect draft it does so in
~tokens/gamma target passes, with an adversarial draft it degrades to
one-token rounds but never changes the output.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from bitblas_tpu.models import LlamaConfig, QuantLlama, QuantLlamaLM
from bitblas_tpu.models.hf_import import LMHead
from bitblas_tpu.models.speculative import speculative_generate

V, H = 64, 256


def _lm(seed):
    cfg = LlamaConfig(hidden_size=H, intermediate_size=512, num_heads=4,
                      num_kv_heads=2, num_layers=2, vocab_size=V,
                      group_size=128)
    model = QuantLlama(cfg, opt_m=(1, 16))
    # same trunk, different lm_head: enough for a draft that disagrees
    rng = np.random.default_rng(seed)
    head = LMHead(
        embed=jnp.asarray(np.random.default_rng(0).standard_normal(
            (V, H)) * 0.05, jnp.float16),  # shared embedding
        final_norm=jnp.ones((H,), jnp.float32),
        lm_head=jnp.asarray(rng.standard_normal((V, H)) * 0.05, jnp.float32),
    )
    return QuantLlamaLM(model, head)


@pytest.fixture(scope="module")
def target():
    return _lm(0)


@pytest.fixture(scope="module")
def draft():
    return _lm(5)


def test_perfect_draft_accepts_everything(target):
    prompt = np.arange(6, dtype=np.int32)
    ref = target.generate(prompt, max_new_tokens=8, temperature=0.0)
    out, stats = speculative_generate(target, target, prompt,
                                      max_new_tokens=8, gamma=4,
                                      return_stats=True)
    assert np.array_equal(out, ref)
    assert stats.acceptance_rate == 1.0
    # 8 tokens in 2 bursts of (4 accepted + 1 bonus... capped by budget)
    assert stats.target_calls <= 3


def test_greedy_output_independent_of_draft(target, draft):
    prompt = np.arange(5, dtype=np.int32)
    ref = target.generate(prompt, max_new_tokens=7, temperature=0.0)
    out, stats = speculative_generate(target, draft, prompt,
                                      max_new_tokens=7, gamma=3,
                                      return_stats=True)
    assert np.array_equal(out, ref)
    assert stats.tokens == 7
    # a disagreeing draft costs more target calls but never correctness
    assert stats.target_calls >= 2


def test_stochastic_runs_seeded_and_in_vocab(target, draft):
    prompt = np.arange(4, dtype=np.int32)
    a, sa = speculative_generate(target, draft, prompt, max_new_tokens=6,
                                 gamma=3, temperature=0.8, seed=3,
                                 return_stats=True)
    b, _ = speculative_generate(target, draft, prompt, max_new_tokens=6,
                                gamma=3, temperature=0.8, seed=3,
                                return_stats=True)
    assert np.array_equal(a, b)
    assert a.min() >= 0 and a.max() < V and a.shape == (10,)
    assert 0.0 <= sa.acceptance_rate <= 1.0


def test_eos_stops_burst(target):
    prompt = np.arange(6, dtype=np.int32)
    full = speculative_generate(target, target, prompt, max_new_tokens=8)
    eos = int(full[7])  # second generated token (may also appear earlier)
    out = speculative_generate(target, target, prompt, max_new_tokens=8,
                               eos_token_id=eos)
    stop = 6 + list(full[6:]).index(eos) + 1  # greedy stream cut at 1st eos
    assert np.array_equal(out, full[:stop])
    assert out[-1] == eos


def test_gamma_validation(target):
    with pytest.raises(ValueError):
        speculative_generate(target, target, np.arange(3), gamma=0)


def test_cached_variant_matches_uncached_greedy(target, draft):
    """KV-cached speculation (decode_chunk verify + cached draft) must
    reproduce the target-only greedy stream exactly, like the uncached
    path — and spend the same number of target passes."""
    from bitblas_tpu.models.speculative import speculative_generate_cached
    prompt = np.arange(5, dtype=np.int32)
    ref = target.generate(prompt, max_new_tokens=7, temperature=0.0)
    out, stats = speculative_generate_cached(
        target, draft, prompt, max_new_tokens=7, gamma=3,
        return_stats=True)
    assert np.array_equal(out, ref)
    assert stats.tokens == 7


def test_cached_perfect_draft_bursts(target):
    from bitblas_tpu.models.speculative import speculative_generate_cached
    prompt = np.arange(6, dtype=np.int32)
    ref = target.generate(prompt, max_new_tokens=8, temperature=0.0)
    out, stats = speculative_generate_cached(
        target, target, prompt, max_new_tokens=8, gamma=4,
        return_stats=True)
    assert np.array_equal(out, ref)
    assert stats.acceptance_rate == 1.0
    assert stats.target_calls <= 3


def test_cached_stochastic_seeded(target, draft):
    from bitblas_tpu.models.speculative import speculative_generate_cached
    prompt = np.arange(4, dtype=np.int32)
    a = speculative_generate_cached(target, draft, prompt,
                                    max_new_tokens=6, gamma=3,
                                    temperature=0.8, seed=9)
    b = speculative_generate_cached(target, draft, prompt,
                                    max_new_tokens=6, gamma=3,
                                    temperature=0.8, seed=9)
    assert np.array_equal(a, b)
    assert a.min() >= 0 and a.max() < V


def test_rounds_telemetry_sums_to_tokens(target):
    prompt = np.arange(6, dtype=np.int32)
    full = speculative_generate(target, target, prompt, max_new_tokens=8)
    eos = int(full[6])  # likely mid-burst stop
    _, stats = speculative_generate(target, target, prompt,
                                    max_new_tokens=8, eos_token_id=eos,
                                    return_stats=True)
    assert sum(stats.rounds) == stats.tokens
