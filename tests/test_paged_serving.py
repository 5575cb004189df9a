"""Paged KV cache: equivalence with the static slot cache + block-pool
behavior under memory pressure."""

import numpy as np

import jax.numpy as jnp

from bitblas_tpu.testing import assert_close

from bitblas_tpu.models.quant_llama import LlamaConfig, QuantLlama
from bitblas_tpu.serving.engine import (ContinuousBatchingEngine,
                                        PagedContinuousBatchingEngine,
                                        Request)

CFG = LlamaConfig(hidden_size=256, intermediate_size=512, num_heads=4,
                  num_kv_heads=2, num_layers=2, group_size=64)


def _prompts(n, rng):
    return [rng.standard_normal((int(rng.integers(2, 7)), CFG.hidden_size))
            .astype(np.float16) for _ in range(n)]


def _finals(done):
    out = {r.uid: r.final_hidden for r in done}
    assert all(v is not None and np.isfinite(v).all() for v in out.values())
    return out


def test_paged_matches_static():
    model = QuantLlama(CFG, opt_m=(4,))
    rng = np.random.default_rng(0)
    prompts = _prompts(3, rng)

    static = ContinuousBatchingEngine(model, num_slots=4, max_seq_len=32)
    paged = PagedContinuousBatchingEngine(model, num_slots=4, num_blocks=32,
                                          block_size=4)
    finals = []
    for eng in (static, paged):
        for i, p in enumerate(prompts):
            eng.submit(Request(uid=i, prompt=p.copy(), max_new=5))
        done = eng.run_to_completion()
        assert len(done) == len(prompts)
        finals.append(_finals(done))
    for uid in range(len(prompts)):
        # XLA:CPU reductions are not bit-deterministic run-to-run; allow a
        # small mismatch budget like the reference's torch_assert_close.
        assert_close(finals[1][uid], finals[0][uid], rtol=2e-2, atol=2e-2,
                     max_mismatched_ratio=0.02)


def test_paged_generates_under_memory_pressure():
    """Pool far smaller than num_slots*max_seq: requests queue on block
    availability and all complete (with the same results as an
    unconstrained pool)."""
    model = QuantLlama(CFG, opt_m=(4,))
    rng = np.random.default_rng(1)
    prompts = _prompts(6, rng)

    big = PagedContinuousBatchingEngine(model, num_slots=4, num_blocks=64,
                                        block_size=4)
    small = PagedContinuousBatchingEngine(model, num_slots=4, num_blocks=9,
                                          block_size=4)
    finals = []
    for eng in (big, small):
        for i, p in enumerate(prompts):
            eng.submit(Request(uid=i, prompt=p.copy(), max_new=4))
        done = eng.run_to_completion()
        assert sorted(r.uid for r in done) == list(range(6))
        finals.append(_finals(done))
    # every block returned to the pool (block 0 stays reserved)
    assert small.block_alloc.available == 8
    for uid in range(6):
        assert_close(finals[1][uid], finals[0][uid], rtol=2e-2, atol=2e-2,
                     max_mismatched_ratio=0.02)


def test_prefix_caching_shares_blocks():
    """Identical prompts share full prefix blocks (refcounted); results
    match a prefix-caching-disabled engine."""
    model = QuantLlama(CFG, opt_m=(4,))
    rng = np.random.default_rng(3)
    shared_prompt = rng.standard_normal((8, CFG.hidden_size)).astype(np.float16)

    def run(prefix_caching):
        eng = PagedContinuousBatchingEngine(
            model, num_slots=4, num_blocks=32, block_size=4,
            prefix_caching=prefix_caching)
        for i in range(3):
            eng.submit(Request(uid=i, prompt=shared_prompt.copy(), max_new=3))
        done = eng.run_to_completion()
        return eng, _finals(done)

    eng_on, f_on = run(True)
    eng_off, f_off = run(False)
    # 8-token prompt = 2 full blocks; requests 2 and 3 share both
    assert eng_on.prefix_hits == 4
    assert eng_off.prefix_hits == 0
    for uid in range(3):
        np.testing.assert_allclose(f_on[uid], f_off[uid],
                                   rtol=2e-2, atol=2e-2)
    # all blocks reclaimed either way
    assert eng_on.block_alloc.available == 31
    assert not eng_on.block_ref and not eng_on.prefix_index


def test_prefix_caching_distinct_prompts_no_false_sharing():
    """Prompts differing only in later tokens share only the common prefix."""
    model = QuantLlama(CFG, opt_m=(4,))
    rng = np.random.default_rng(4)
    base = rng.standard_normal((8, CFG.hidden_size)).astype(np.float16)
    variant = base.copy()
    variant[6] += 1.0   # differs in the second block only
    eng = PagedContinuousBatchingEngine(model, num_slots=4, num_blocks=32,
                                        block_size=4)
    eng.submit(Request(uid=0, prompt=base.copy(), max_new=2))
    eng.submit(Request(uid=1, prompt=variant.copy(), max_new=2))
    done = eng.run_to_completion()
    assert len(done) == 2
    assert eng.prefix_hits == 1  # only the first block is shared


def test_paged_block_reuse_is_clean():
    """A request that reuses blocks released by an earlier one must not see
    stale K/V: same prompt gives the same final hidden either way."""
    model = QuantLlama(CFG, opt_m=(4,))
    rng = np.random.default_rng(2)
    p1, p2 = _prompts(2, rng)

    fresh = PagedContinuousBatchingEngine(model, num_slots=2, num_blocks=16,
                                          block_size=4)
    fresh.submit(Request(uid=0, prompt=p2.copy(), max_new=3))
    h_fresh = _finals(fresh.run_to_completion())[0]

    reused = PagedContinuousBatchingEngine(model, num_slots=2, num_blocks=16,
                                           block_size=4)
    reused.submit(Request(uid=0, prompt=p1.copy(), max_new=3))
    reused.run_to_completion()          # p1's blocks released
    reused.submit(Request(uid=1, prompt=p2.copy(), max_new=3))
    h_reused = _finals(reused.run_to_completion())[1]
    assert_close(h_reused, h_fresh, rtol=2e-2, atol=2e-2,
                 max_mismatched_ratio=0.02)
