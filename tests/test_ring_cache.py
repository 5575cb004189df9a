"""Ring (rolling-buffer) KV cache for sliding-window attention.

The ring stores capacity R ~= window rows and writes absolute position p
into row p % R — KV memory scales with the WINDOW, not max_seq_len
(kv_cache.py ring section; the masked full-length cache is the oracle).

Mask-parity tests use AMPLIFIED K (x20) — under random weights softmax is
near-uniform and an attended-set bug is invisible (the round-3 cp LSE
lesson, CLAUDE.md).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from bitblas_tpu.models import LlamaConfig, QuantLlama
from bitblas_tpu.serving.kv_cache import (
    append_chunk, append_chunk_ring, append_token, append_token_ring,
    append_token_quant, append_token_ring_quant, chunk_attention,
    decode_attention, decode_attention_quant, ring_abs_positions,
    ring_capacity, ring_chunk_attention, ring_decode_attention,
    ring_decode_attention_quant)

WINDOW = 6
LMAX = 64          # full-cache capacity (the memory the ring saves)
R = 8              # ring capacity >= WINDOW
Hkv, H, D = 2, 4, 8


def test_ring_capacity_formula():
    assert ring_capacity(4096, 1) == 4096
    assert ring_capacity(4096, 256) == ring_capacity(4096 + 255, 1) == 4352
    assert ring_capacity(5, 1, align=1) == 5


def test_ring_abs_positions_matches_reference():
    for length in [0, 1, 5, 8, 9, 23]:
        got = np.asarray(ring_abs_positions(
            jnp.asarray([length], jnp.int32), R))[0]
        want = np.full(R, -1)
        for p in range(length):          # increasing: newest write wins
            want[p % R] = p
        np.testing.assert_array_equal(got, want, err_msg=f"len={length}")


def _fill(rng, lengths):
    """Write the same token stream into a full cache and a ring cache."""
    B = len(lengths)
    full_k = jnp.zeros((B, LMAX, Hkv, D), jnp.float32)
    full_v = jnp.zeros_like(full_k)
    ring_k = jnp.zeros((B, R, Hkv, D), jnp.float32)
    ring_v = jnp.zeros_like(ring_k)
    slots = jnp.arange(B, dtype=jnp.int32)
    keys = {}
    for p in range(max(lengths)):
        # amplified K: peaked softmax makes attended-set bugs visible
        k = jnp.asarray(rng.standard_normal((B, Hkv, D)) * 20, jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
        active = jnp.asarray([p < l for l in lengths])
        pos = jnp.full((B,), p, jnp.int32)
        nk, nv = append_token(full_k, full_v, slots, pos, k, v)
        full_k = jnp.where(active[:, None, None, None], nk[slots], full_k)
        full_v = jnp.where(active[:, None, None, None], nv[slots], full_v)
        nk, nv = append_token_ring(ring_k, ring_v, slots, pos, k, v)
        ring_k = jnp.where(active[:, None, None, None], nk[slots], ring_k)
        ring_v = jnp.where(active[:, None, None, None], nv[slots], ring_v)
        keys[p] = (k, v)
    return full_k, full_v, ring_k, ring_v, slots, keys


@pytest.mark.parametrize("lengths", [(3, 2), (7, 5), (9, 8), (23, 17)])
def test_ring_decode_matches_masked_full(lengths):
    """Same attended set below, at, and well past the wrap point."""
    rng = np.random.default_rng(0)
    fk, fv, rk, rv, slots, _ = _fill(rng, lengths)
    q = jnp.asarray(rng.standard_normal((len(lengths), H, D)), jnp.float32)
    lens = jnp.asarray(lengths, jnp.int32)
    want = decode_attention(q, fk, fv, slots, lens, num_heads=H,
                            use_flash=False, window=WINDOW)
    got = ring_decode_attention(q, rk, rv, slots, lens, num_heads=H,
                                window=WINDOW)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-5, atol=1e-5)


def test_ring_chunk_matches_masked_full():
    """Chunked append + attention vs the full-cache windowed chunk path,
    chunk straddling the wrap point."""
    rng = np.random.default_rng(1)
    T = 3                                # R=8 >= WINDOW + T - 1 = 8
    B = 2
    starts = (6, 10)
    fk, fv, rk, rv, slots, _ = _fill(rng, starts)
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, D)) * 20, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    st = jnp.asarray(starts, jnp.int32)
    fk, fv = append_chunk(fk, fv, slots, st, k, v)
    rk, rv = append_chunk_ring(rk, rv, slots, st, k, v)
    want = chunk_attention(q, fk, fv, slots, st, num_heads=H, window=WINDOW)
    got = ring_chunk_attention(q, rk, rv, slots, st, num_heads=H,
                               window=WINDOW)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-5, atol=1e-5)


def test_ring_chunk_quant_matches_masked_full():
    """int8 ring chunk append + attention vs the full-cache quant chunk
    path (the path every kv_quant+kv_ring chunked prefill runs)."""
    from bitblas_tpu.serving.kv_cache import (
        append_chunk_quant, append_chunk_ring_quant, chunk_attention_quant,
        ring_chunk_attention_quant)

    rng = np.random.default_rng(12)
    T, B = 3, 2
    starts = (6, 10)
    slots = jnp.arange(B, dtype=jnp.int32)
    fk = jnp.zeros((B, LMAX, Hkv, D), jnp.int8)
    fv = jnp.zeros_like(fk)
    fks = jnp.zeros((B, LMAX, Hkv), jnp.float32)
    fvs = jnp.zeros_like(fks)
    rk = jnp.zeros((B, R, Hkv, D), jnp.int8)
    rv = jnp.zeros_like(rk)
    rks = jnp.zeros((B, R, Hkv), jnp.float32)
    rvs = jnp.zeros_like(rks)
    for p in range(max(starts)):         # identical token-by-token history
        k = jnp.asarray(rng.standard_normal((B, Hkv, D)) * 20, jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
        pos = jnp.full((B,), p, jnp.int32)
        act = jnp.asarray([p < s for s in starts])
        a3, a4 = act[:, None, None], act[:, None, None, None]
        nk, nv, nks, nvs = append_token_quant(fk, fv, fks, fvs, slots,
                                              pos, k, v)
        fk, fv = jnp.where(a4, nk, fk), jnp.where(a4, nv, fv)
        fks, fvs = jnp.where(a3, nks, fks), jnp.where(a3, nvs, fvs)
        nk, nv, nks, nvs = append_token_ring_quant(rk, rv, rks, rvs,
                                                   slots, pos, k, v)
        rk, rv = jnp.where(a4, nk, rk), jnp.where(a4, nv, rv)
        rks, rvs = jnp.where(a3, nks, rks), jnp.where(a3, nvs, rvs)
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, D)) * 20, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    st = jnp.asarray(starts, jnp.int32)
    fk, fv, fks, fvs = append_chunk_quant(fk, fv, fks, fvs, slots, st, k, v)
    rk, rv, rks, rvs = append_chunk_ring_quant(rk, rv, rks, rvs, slots,
                                               st, k, v)
    want = chunk_attention_quant(q, fk, fv, fks, fvs, slots, st,
                                 num_heads=H, window=WINDOW)
    got = ring_chunk_attention_quant(q, rk, rv, rks, rvs, slots, st,
                                     num_heads=H, window=WINDOW)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-5, atol=1e-5)


def test_ring_chunk_eviction_guard():
    rng = np.random.default_rng(2)
    T = 4                                # WINDOW + T - 1 = 9 > R = 8
    rk = jnp.zeros((1, R, Hkv, D), jnp.float32)
    rv = jnp.zeros_like(rk)
    q = jnp.asarray(rng.standard_normal((1, T, H, D)), jnp.float32)
    with pytest.raises(ValueError, match="evict"):
        ring_chunk_attention(q, rk, rv, jnp.zeros((1,), jnp.int32),
                             jnp.zeros((1,), jnp.int32), num_heads=H,
                             window=WINDOW)


def test_ring_decode_quant_matches_masked_full():
    rng = np.random.default_rng(3)
    lengths = (19, 11)
    B = len(lengths)
    fk = jnp.zeros((B, LMAX, Hkv, D), jnp.int8)
    fv = jnp.zeros_like(fk)
    fks = jnp.zeros((B, LMAX, Hkv), jnp.float32)
    fvs = jnp.zeros_like(fks)
    rk = jnp.zeros((B, R, Hkv, D), jnp.int8)
    rv = jnp.zeros_like(rk)
    rks = jnp.zeros((B, R, Hkv), jnp.float32)
    rvs = jnp.zeros_like(rks)
    slots = jnp.arange(B, dtype=jnp.int32)
    for p in range(max(lengths)):
        k = jnp.asarray(rng.standard_normal((B, Hkv, D)) * 20, jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
        pos = jnp.full((B,), p, jnp.int32)
        act = jnp.asarray([p < l for l in lengths])
        a3, a4 = act[:, None, None], act[:, None, None, None]
        nk, nv, nks, nvs = append_token_quant(fk, fv, fks, fvs, slots,
                                              pos, k, v)
        fk = jnp.where(a4, nk[slots], fk)
        fv = jnp.where(a4, nv[slots], fv)
        fks = jnp.where(a3, nks[slots], fks)
        fvs = jnp.where(a3, nvs[slots], fvs)
        nk, nv, nks, nvs = append_token_ring_quant(rk, rv, rks, rvs, slots,
                                                   pos, k, v)
        rk = jnp.where(a4, nk[slots], rk)
        rv = jnp.where(a4, nv[slots], rv)
        rks = jnp.where(a3, nks[slots], rks)
        rvs = jnp.where(a3, nvs[slots], rvs)
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    lens = jnp.asarray(lengths, jnp.int32)
    want = decode_attention_quant(q, fk, fv, fks, fvs, slots, lens,
                                  num_heads=H, use_flash=False,
                                  window=WINDOW)
    got = ring_decode_attention_quant(q, rk, rv, rks, rvs, slots, lens,
                                      num_heads=H, window=WINDOW)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-5, atol=1e-5)


# -- model-level ---------------------------------------------------------------

CFG = LlamaConfig(hidden_size=256, intermediate_size=512, num_heads=4,
                  num_kv_heads=2, num_layers=2, vocab_size=64,
                  group_size=128, sliding_window=WINDOW)


@pytest.fixture(scope="module")
def model():
    return QuantLlama(CFG, opt_m=(1, 4, 8, 16))


def test_model_ring_decode_matches_full(model):
    """decode_step chain on the window-sized ring equals the masked
    full-length cache, through several wraps."""
    rng = np.random.default_rng(4)
    B, steps = 2, 2 * R + 3
    shape_f = (CFG.num_layers, B, LMAX, CFG.num_kv_heads, CFG.head_dim)
    shape_r = (CFG.num_layers, B, R, CFG.num_kv_heads, CFG.head_dim)
    fk = jnp.zeros(shape_f, jnp.bfloat16)
    fv = jnp.zeros_like(fk)
    rk = jnp.zeros(shape_r, jnp.bfloat16)
    rv = jnp.zeros_like(rk)
    slots = jnp.arange(B, dtype=jnp.int32)
    for i in range(steps):
        x = jnp.asarray(rng.standard_normal((B, 1, CFG.hidden_size)) * 0.5,
                        jnp.float16)
        lens = jnp.full((B,), i, jnp.int32)
        yf, fk, fv = model.decode_step(x, fk, fv, slots, lens)
        yr, rk, rv = model.decode_step(x, rk, rv, slots, lens, ring=True)
        np.testing.assert_allclose(np.asarray(yr, np.float32),
                                   np.asarray(yf, np.float32),
                                   rtol=2e-2, atol=2e-2,
                                   err_msg=f"step {i}")


def test_model_ring_chunk_matches_full(model):
    rng = np.random.default_rng(5)
    B, T, start = 1, 3, R + 1            # chunk after one wrap
    shape_f = (CFG.num_layers, B, LMAX, CFG.num_kv_heads, CFG.head_dim)
    shape_r = (CFG.num_layers, B, R, CFG.num_kv_heads, CFG.head_dim)
    fk = jnp.zeros(shape_f, jnp.bfloat16)
    fv = jnp.zeros_like(fk)
    rk = jnp.zeros(shape_r, jnp.bfloat16)
    rv = jnp.zeros_like(rk)
    slots = jnp.zeros((B,), jnp.int32)
    for i in range(start):               # identical decode_step warmup
        x = jnp.asarray(rng.standard_normal((B, 1, CFG.hidden_size)) * 0.5,
                        jnp.float16)
        lens = jnp.full((B,), i, jnp.int32)
        _, fk, fv = model.decode_step(x, fk, fv, slots, lens)
        _, rk, rv = model.decode_step(x, rk, rv, slots, lens, ring=True)
    x = jnp.asarray(rng.standard_normal((B, T, CFG.hidden_size)) * 0.5,
                    jnp.float16)
    lens = jnp.full((B,), start, jnp.int32)
    yf, fk, fv = model.decode_chunk(x, fk, fv, slots, lens)
    yr, rk, rv = model.decode_chunk(x, rk, rv, slots, lens, ring=True)
    np.testing.assert_allclose(np.asarray(yr, np.float32),
                               np.asarray(yf, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_model_ring_decode_quant_matches_full(model):
    rng = np.random.default_rng(6)
    B, steps = 1, R + 4
    shape_f = (CFG.num_layers, B, LMAX, CFG.num_kv_heads, CFG.head_dim)
    shape_r = (CFG.num_layers, B, R, CFG.num_kv_heads, CFG.head_dim)
    fk = jnp.zeros(shape_f, jnp.int8)
    fv = jnp.zeros_like(fk)
    fks = jnp.zeros(shape_f[:-1], jnp.float32)
    fvs = jnp.zeros_like(fks)
    rk = jnp.zeros(shape_r, jnp.int8)
    rv = jnp.zeros_like(rk)
    rks = jnp.zeros(shape_r[:-1], jnp.float32)
    rvs = jnp.zeros_like(rks)
    slots = jnp.zeros((B,), jnp.int32)
    for i in range(steps):
        x = jnp.asarray(rng.standard_normal((B, 1, CFG.hidden_size)) * 0.5,
                        jnp.float16)
        lens = jnp.full((B,), i, jnp.int32)
        yf, fk, fv, fks, fvs = model.decode_step_quant(
            x, fk, fv, fks, fvs, slots, lens)
        yr, rk, rv, rks, rvs = model.decode_step_quant(
            x, rk, rv, rks, rvs, slots, lens, ring=True)
        np.testing.assert_allclose(np.asarray(yr, np.float32),
                                   np.asarray(yf, np.float32),
                                   rtol=2e-2, atol=2e-2,
                                   err_msg=f"step {i}")


def test_engine_kv_ring_tracks_plain(model):
    """Continuous-batching engine with the window-sized ring cache matches
    the full-length masked engine on identical request streams — through
    ring wraps AND slot reuse (4 requests over 2 slots: released slots
    leave stale ring rows that the derived-position mask must hide)."""
    from bitblas_tpu.serving import ContinuousBatchingEngine, Request

    RING_R = 16
    outs, shapes = {}, {}
    for use_ring in (False, True):
        engine = ContinuousBatchingEngine(
            model, num_slots=2, max_seq_len=64, prefill_chunk=3,
            kv_ring=use_ring, kv_ring_capacity=RING_R if use_ring else None)
        rng = np.random.default_rng(8)
        for i in range(4):
            S = int(rng.integers(2, 9))
            engine.submit(Request(
                uid=i,
                prompt=rng.standard_normal(
                    (S, CFG.hidden_size)).astype(np.float16),
                max_new=int(rng.integers(12, 20))))   # wraps the 16-ring
        finished = engine.run_to_completion(max_steps=200)
        assert len(finished) == 4 and all(r.done for r in finished)
        outs[use_ring] = {r.uid: r.final_hidden for r in finished}
        shapes[use_ring] = engine.caches_k.shape
    assert shapes[True][2] == RING_R and shapes[False][2] == 64
    # tolerance sized for ~19 bf16 decode steps of softmax-order drift
    # (XLA:CPU reduction partitioning varies run to run — 2e-2/0.1 was
    # measured flaky on identical seeds); an attended-SET bug diverges
    # grossly, not marginally, so this still catches the real bug class
    for uid in outs[False]:
        np.testing.assert_allclose(
            np.asarray(outs[True][uid], np.float32),
            np.asarray(outs[False][uid], np.float32),
            rtol=5e-2, atol=0.3, err_msg=f"uid {uid}")


def test_engine_kv_ring_quant_runs(model):
    """kv_ring composes with kv_quant (int8 ring — the smallest KV)."""
    from bitblas_tpu.serving import ContinuousBatchingEngine, Request
    import jax.numpy as jnp

    engine = ContinuousBatchingEngine(
        model, num_slots=2, max_seq_len=64, prefill_chunk=3,
        kv_quant=True, kv_ring=True, kv_ring_capacity=16)
    assert engine.caches_k.dtype == jnp.int8
    assert engine.caches_k.shape[2] == 16
    rng = np.random.default_rng(9)
    engine.submit(Request(
        uid=0, prompt=rng.standard_normal((5, CFG.hidden_size))
        .astype(np.float16), max_new=20))
    finished = engine.run_to_completion(max_steps=60)
    assert len(finished) == 1 and finished[0].done


def test_engine_kv_ring_guards():
    from bitblas_tpu.serving import ContinuousBatchingEngine

    m = QuantLlama(CFG, opt_m=(1,))
    with pytest.raises(ValueError, match="prefill_chunk"):
        ContinuousBatchingEngine(m, num_slots=1, max_seq_len=64,
                                 kv_ring=True)
    cfg_nw = LlamaConfig(hidden_size=256, intermediate_size=512,
                         num_heads=4, num_kv_heads=2, num_layers=1,
                         vocab_size=64, group_size=128)
    with pytest.raises(ValueError, match="sliding_window"):
        ContinuousBatchingEngine(QuantLlama(cfg_nw, opt_m=(1,)),
                                 num_slots=1, max_seq_len=64,
                                 prefill_chunk=3, kv_ring=True)


def test_model_ring_requires_window():
    cfg = LlamaConfig(hidden_size=256, intermediate_size=512, num_heads=4,
                      num_kv_heads=2, num_layers=1, vocab_size=64,
                      group_size=128)
    m = QuantLlama(cfg, opt_m=(1,))
    shape = (1, 1, R, cfg.num_kv_heads, cfg.head_dim)
    ck = jnp.zeros(shape, jnp.bfloat16)
    x = jnp.zeros((1, 1, cfg.hidden_size), jnp.float16)
    with pytest.raises(ValueError, match="sliding_window"):
        m.decode_step(x, ck, jnp.zeros_like(ck), jnp.zeros((1,), jnp.int32),
                      jnp.zeros((1,), jnp.int32), ring=True)
