"""Serving layer: KV-cache decode equivalence + continuous batching."""

import jax
import jax.numpy as jnp
import numpy as np

from bitblas_tpu.models import LlamaConfig, QuantLlama
from bitblas_tpu.serving import ContinuousBatchingEngine, Request
from bitblas_tpu.testing import assert_close

CFG = LlamaConfig(hidden_size=256, intermediate_size=512, num_heads=4,
                  num_kv_heads=2, num_layers=2, group_size=128)


def test_decode_step_matches_full_forward():
    """Cache-based decode of token S must equal the full causal forward over
    positions 0..S at the last position."""
    model = QuantLlama(CFG, opt_m=(1, 8, 16))
    rng = np.random.default_rng(0)
    S = 8
    prompt = rng.standard_normal((S, CFG.hidden_size)).astype(np.float16)
    x_new = rng.standard_normal((1, CFG.hidden_size)).astype(np.float16)

    # full forward over S+1 positions
    full_in = jnp.asarray(np.concatenate([prompt, x_new])[None])
    pos = jnp.arange(S + 1)[None, :]
    full_out = model(full_in, pos)

    # prefill S, then one cached decode step
    prefill = model.make_prefill(S)
    _, ks, vs = prefill(jnp.asarray(prompt[None]), jnp.arange(S)[None, :])
    Lmax = 32
    ck = jnp.zeros((CFG.num_layers, 2, Lmax, CFG.num_kv_heads, CFG.head_dim),
                   jnp.float32)
    cv = jnp.zeros_like(ck)
    slot = 1
    for li in range(CFG.num_layers):
        ck = ck.at[li, slot, :S].set(ks[li].astype(ck.dtype))
        cv = cv.at[li, slot, :S].set(vs[li].astype(cv.dtype))
    out, ck, cv = model.decode_step(
        jnp.asarray(x_new[None]), ck, cv,
        jnp.asarray([slot], jnp.int32), jnp.asarray([S], jnp.int32))
    assert_close(out[0, 0], full_out[0, -1], rtol=2e-2, atol=0.1)


def test_continuous_batching_engine():
    model = QuantLlama(CFG, opt_m=(1, 4, 8, 16))
    engine = ContinuousBatchingEngine(model, num_slots=3, max_seq_len=32)
    rng = np.random.default_rng(1)
    for i in range(5):
        S = int(rng.integers(2, 9))
        engine.submit(Request(
            uid=i,
            prompt=rng.standard_normal((S, CFG.hidden_size)).astype(np.float16),
            max_new=int(rng.integers(2, 5))))
    finished = engine.run_to_completion(max_steps=100)
    assert len(finished) == 5
    assert all(r.done for r in finished)
    assert engine.active == {}
    # slot pool fully recycled
    assert len(engine.alloc.free) == 3
