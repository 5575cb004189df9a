"""Token-level continuous batching: LM head + sampling in the serving loop.

Pins: single-request greedy output equals QuantLlamaLM.generate (same
decode path, batched vs solo), multi-request isolation, eos early-exit,
1-token budgets finishing at prefill, and the kv_quant variant.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from bitblas_tpu.models import LlamaConfig, QuantLlama, QuantLlamaLM
from bitblas_tpu.models.hf_import import LMHead
from bitblas_tpu.serving import TokenContinuousBatchingEngine

V, H = 64, 256


@pytest.fixture(scope="module")
def lm():
    cfg = LlamaConfig(hidden_size=H, intermediate_size=512, num_heads=4,
                      num_kv_heads=2, num_layers=2, vocab_size=V,
                      group_size=128)
    model = QuantLlama(cfg, opt_m=(1, 4, 16))
    rng = np.random.default_rng(0)
    head = LMHead(
        embed=jnp.asarray(rng.standard_normal((V, H)) * 0.05, jnp.float16),
        final_norm=jnp.ones((H,), jnp.float32),
        lm_head=jnp.asarray(rng.standard_normal((V, H)) * 0.05, jnp.float32),
    )
    return QuantLlamaLM(model, head)


def _engine(lm, **kw):
    return TokenContinuousBatchingEngine(lm.model, lm.head, num_slots=4,
                                         max_seq_len=64, **kw)


def test_single_request_matches_generate(lm):
    prompt = np.arange(6, dtype=np.int32)
    solo = lm.generate(prompt, max_new_tokens=5, temperature=0.0)
    eng = _engine(lm)
    req = eng.submit_tokens(uid=0, tokens=prompt, max_new=5)
    eng.run_to_completion()
    assert req.done
    assert np.array_equal(np.asarray(req.out_tokens), solo[6:])


def test_concurrent_requests_are_isolated(lm):
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, V, n).astype(np.int32) for n in (3, 5, 8, 4)]
    solos = [lm.generate(p, max_new_tokens=4, temperature=0.0)[len(p):]
             for p in prompts]
    eng = _engine(lm)
    reqs = [eng.submit_tokens(uid=i, tokens=p, max_new=4)
            for i, p in enumerate(prompts)]
    eng.run_to_completion()
    for req, solo in zip(reqs, solos):
        assert req.done
        assert np.array_equal(np.asarray(req.out_tokens), solo), req.uid


def test_eos_and_one_token_budget(lm):
    prompt = np.arange(5, dtype=np.int32)
    full = lm.generate(prompt, max_new_tokens=6, temperature=0.0)
    first, second = int(full[5]), int(full[6])
    eng = _engine(lm)
    # budget of exactly one token: finishes at admission (prefill-sample),
    # never joins the decode batch
    r1 = eng.submit_tokens(uid=1, tokens=prompt, max_new=1)
    assert eng.step() == 0
    assert r1.done and r1.out_tokens == [first]
    assert not eng.active and not eng.pending
    # eos on the second sampled token stops a larger budget early
    r2 = eng.submit_tokens(uid=2, tokens=prompt, max_new=6,
                           eos_token_id=second)
    eng.run_to_completion()
    assert r2.done and r2.out_tokens == [first, second]


def test_sampling_is_seeded_per_request(lm):
    prompt = np.arange(4, dtype=np.int32)
    outs = []
    for _ in range(2):
        eng = _engine(lm)
        req = eng.submit_tokens(uid=7, tokens=prompt, max_new=5,
                                temperature=0.9, top_k=8, seed=11)
        eng.run_to_completion()
        outs.append(list(req.out_tokens))
    assert outs[0] == outs[1]
    assert all(0 <= t < V for t in outs[0])


def test_kv_quant_token_engine_runs(lm):
    eng = _engine(lm, kv_quant=True)
    req = eng.submit_tokens(uid=0, tokens=np.arange(6), max_new=4)
    eng.run_to_completion()
    assert req.done and len(req.out_tokens) == 4
    assert all(0 <= t < V for t in req.out_tokens)


def test_token_engine_over_tp_mesh_matches_single_device(lm):
    """The token engine runs unchanged over a TP-sharded model + KV cache
    (TPQuantLlama duck-types decode_step/make_prefill) and reproduces the
    single-device token stream."""
    import jax
    from jax.sharding import Mesh
    from bitblas_tpu.parallel.serving import TPQuantLlama

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs 2 devices")
    mesh = Mesh(np.array(devs[:2]).reshape(2), ("tp",))
    tpm = TPQuantLlama(lm.model, mesh)

    prompts = [np.arange(5, dtype=np.int32),
               (np.arange(4, dtype=np.int32) + 9)]
    ref = _engine(lm)
    ref_reqs = [ref.submit_tokens(uid=i, tokens=p, max_new=4)
                for i, p in enumerate(prompts)]
    ref.run_to_completion()

    eng = TokenContinuousBatchingEngine(
        tpm, lm.head, num_slots=2, max_seq_len=64,
        cache_sharding=tpm.kv_cache_sharding())
    reqs = [eng.submit_tokens(uid=i, tokens=p, max_new=4)
            for i, p in enumerate(prompts)]
    eng.run_to_completion()
    for r, rr in zip(reqs, ref_reqs):
        assert r.done
        assert r.out_tokens == rr.out_tokens, r.uid


def test_token_engine_over_cp_mesh_matches_single_device():
    """Token-for-token parity with the context-parallel cache (tp=4 >
    kv_heads=2: sequence-sharded source-head KV, LSE-merged decode).
    Own model: row-sharded scale planes need K/group_size % tp == 0,
    so group_size=64 (the shared fixture's 128 leaves only 2 groups)."""
    import jax
    from jax.sharding import Mesh
    from bitblas_tpu.parallel.serving import TPQuantLlama

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 devices")
    cfg = LlamaConfig(hidden_size=H, intermediate_size=512, num_heads=4,
                      num_kv_heads=2, num_layers=2, vocab_size=V,
                      group_size=64)
    model = QuantLlama(cfg, opt_m=(1, 4, 16))
    rng = np.random.default_rng(0)
    head = LMHead(
        embed=jnp.asarray(rng.standard_normal((V, H)) * 0.05, jnp.float16),
        final_norm=jnp.ones((H,), jnp.float32),
        lm_head=jnp.asarray(rng.standard_normal((V, H)) * 0.05,
                            jnp.float32),
    )
    lm2 = QuantLlamaLM(model, head)
    mesh = Mesh(np.array(devs[:4]).reshape(4), ("tp",))
    tpm = TPQuantLlama(model, mesh, context_parallel=True)
    assert tpm.context_parallel and tpm.cfg.num_kv_heads == 2

    prompts = [np.arange(5, dtype=np.int32),
               (np.arange(4, dtype=np.int32) + 9)]
    ref = _engine(lm2)
    ref_reqs = [ref.submit_tokens(uid=i, tokens=p, max_new=4)
                for i, p in enumerate(prompts)]
    ref.run_to_completion()

    eng = TokenContinuousBatchingEngine(
        tpm, head, num_slots=2, max_seq_len=64,
        cache_sharding=tpm.kv_cache_sharding())
    reqs = [eng.submit_tokens(uid=i, tokens=p, max_new=4)
            for i, p in enumerate(prompts)]
    eng.run_to_completion()
    for r, rr in zip(reqs, ref_reqs):
        assert r.done
        assert r.out_tokens == rr.out_tokens, r.uid


def test_plain_requests_coexist_with_token_requests(lm):
    """The token engine still honors the base hidden-state Request API:
    plain requests decode with hidden feedback, token requests sample."""
    from bitblas_tpu.serving import Request
    eng = _engine(lm)
    hidden_prompt = np.asarray(
        lm.head.embed_tokens(jnp.asarray(np.arange(4))), np.float16)
    plain = Request(uid=0, prompt=hidden_prompt, max_new=3)
    eng.submit(plain)
    tok = eng.submit_tokens(uid=1, tokens=np.arange(5), max_new=3)
    eng.run_to_completion()
    assert plain.done and plain.final_hidden is not None
    assert tok.done and len(tok.out_tokens) == 3


def test_chunked_prefill_engine_matches_bucketed(lm):
    """prefill_chunk=4 (fixed-shape decode_chunk admission, padded tail)
    reproduces the bucketed-prefill engine's token stream exactly."""
    rng = np.random.default_rng(6)
    prompts = [rng.integers(0, V, n).astype(np.int32) for n in (3, 8, 10)]
    ref = _engine(lm)
    ref_reqs = [ref.submit_tokens(uid=i, tokens=p, max_new=4)
                for i, p in enumerate(prompts)]
    ref.run_to_completion()

    eng = TokenContinuousBatchingEngine(lm.model, lm.head, num_slots=4,
                                        max_seq_len=64, prefill_chunk=4)
    reqs = [eng.submit_tokens(uid=i, tokens=p, max_new=4)
            for i, p in enumerate(prompts)]
    eng.run_to_completion()
    for r, rr in zip(reqs, ref_reqs):
        assert r.done
        assert r.out_tokens == rr.out_tokens, r.uid


def test_chunked_prefill_kv_quant_matches_bucketed(lm):
    """Chunked admission over the int8 KV cache (decode_chunk_quant)
    reproduces the bucketed kv_quant engine's token stream."""
    p = (np.arange(9, dtype=np.int32) * 5) % V
    res = []
    for pc in (0, 4):
        eng = _engine(lm, kv_quant=True, prefill_chunk=pc)
        r = eng.submit_tokens(uid=0, tokens=p, max_new=4)
        eng.run_to_completion()
        res.append(list(r.out_tokens))
    assert res[0] == res[1]


def test_dp_group_of_token_engines(lm):
    """DataParallelEngineGroup routes token requests across replicas; each
    request's stream matches its solo generation."""
    from bitblas_tpu.serving import DataParallelEngineGroup
    group = DataParallelEngineGroup([_engine(lm), _engine(lm)])
    rng = np.random.default_rng(15)
    prompts = [rng.integers(0, V, n).astype(np.int32) for n in (4, 6, 5, 7)]
    solos = [lm.generate(p, max_new_tokens=3, temperature=0.0)[len(p):]
             for p in prompts]
    reqs = [group.submit_tokens(uid=i, tokens=p, max_new=3)
            for i, p in enumerate(prompts)]
    group.run_to_completion()
    for req, solo in zip(reqs, solos):
        assert req.done
        assert np.array_equal(np.asarray(req.out_tokens), solo), req.uid
