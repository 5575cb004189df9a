"""Quantized (int8 + per-token/head scale) KV cache vs the bf16/f32 paths.

Decode attention is KV-bandwidth-bound; the int8 cache halves traffic and
footprint (serving/kv_cache.py quantized section). These tests pin the
numerics: attention over the quantized cache must track the float cache
within int8 symmetric-quantization tolerance, and the model-level
decode_step_quant must track decode_step.
"""

import jax.numpy as jnp
import numpy as np

from bitblas_tpu.models import LlamaConfig, QuantLlama
from bitblas_tpu.serving.kv_cache import (KVCacheConfig, append_token,
                                          append_token_quant,
                                          decode_attention,
                                          decode_attention_quant,
                                          init_quant_kv_cache, quantize_kv)
from bitblas_tpu.testing import assert_close

CFG = LlamaConfig(hidden_size=256, intermediate_size=512, num_heads=4,
                  num_kv_heads=2, num_layers=2, group_size=128)


def test_quantize_kv_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 5, 2, 64)).astype(np.float32)
    codes, scale = quantize_kv(jnp.asarray(x))
    rec = np.asarray(codes, np.float32) * np.asarray(scale)[..., None]
    # symmetric int8: error <= scale/2 = amax/254 per element
    amax = np.abs(x).max(-1, keepdims=True)
    assert (np.abs(rec - x) <= amax / 254 + 1e-7).all()
    # zero rows exact
    codes0, scale0 = quantize_kv(jnp.zeros((2, 4)))
    assert np.asarray(scale0).max() == 0 and np.asarray(codes0).max() == 0


def test_decode_attention_quant_matches_float():
    rng = np.random.default_rng(1)
    B, L, Hkv, H, D = 3, 16, 2, 4, 64
    slots = jnp.asarray([0, 1, 2], jnp.int32)
    lengths = jnp.asarray([5, 16, 9], jnp.int32)
    ck = rng.standard_normal((4, L, Hkv, D)).astype(np.float32)
    cv = rng.standard_normal((4, L, Hkv, D)).astype(np.float32)
    q = rng.standard_normal((B, H, D)).astype(np.float32)

    ref = decode_attention(jnp.asarray(q), jnp.asarray(ck), jnp.asarray(cv),
                           slots, lengths, num_heads=H, use_flash=False)

    kq, ks = quantize_kv(jnp.asarray(ck))
    vq, vs = quantize_kv(jnp.asarray(cv))
    out = decode_attention_quant(jnp.asarray(q), kq, vq, ks, vs, slots,
                                 lengths, num_heads=H)
    assert_close(out, ref, rtol=2e-2, atol=0.05)


def test_flash_decode_quant_matches_xla_path():
    """The int8 flash-decode kernel (lane-aligned D) must match the XLA
    quantized-attention path bit-for-tolerance, including slot indirection
    and per-sequence length masking."""
    rng = np.random.default_rng(6)
    B, rows, L, Hkv, H, D = 3, 5, 64, 2, 4, 128
    ck = rng.standard_normal((rows, L, Hkv, D)).astype(np.float32)
    cv = rng.standard_normal((rows, L, Hkv, D)).astype(np.float32)
    q = rng.standard_normal((B, H, D)).astype(np.float32)
    slots = jnp.asarray([4, 0, 2], jnp.int32)
    lengths = jnp.asarray([3, 64, 17], jnp.int32)
    kq, ks = quantize_kv(jnp.asarray(ck))
    vq, vs = quantize_kv(jnp.asarray(cv))
    ref = decode_attention_quant(jnp.asarray(q), kq, vq, ks, vs, slots,
                                 lengths, num_heads=H, use_flash=False)
    out = decode_attention_quant(jnp.asarray(q), kq, vq, ks, vs, slots,
                                 lengths, num_heads=H, use_flash=True)
    assert_close(out, ref, rtol=2e-3, atol=1e-3)


def test_append_token_quant_layout():
    cache = init_quant_kv_cache(KVCacheConfig(
        num_slots=4, max_seq_len=8, num_kv_heads=2, head_dim=64,
        num_layers=1))
    assert cache["k"].dtype == jnp.int8 and cache["v"].dtype == jnp.int8
    rng = np.random.default_rng(2)
    k_new = rng.standard_normal((2, 2, 64)).astype(np.float32)
    v_new = rng.standard_normal((2, 2, 64)).astype(np.float32)
    slots = jnp.asarray([1, 3], jnp.int32)
    pos = jnp.asarray([0, 2], jnp.int32)
    ck, cv, sk, sv = append_token_quant(
        cache["k"][0], cache["v"][0], cache["k_scale"][0],
        cache["v_scale"][0], slots, pos, jnp.asarray(k_new),
        jnp.asarray(v_new))
    rec = np.asarray(ck, np.float32)[1, 0] * np.asarray(sk)[1, 0][:, None]
    assert_close(rec, k_new[0], rtol=2e-2, atol=0.02)
    # untouched slots stay zero
    assert np.asarray(ck)[0].max() == 0 and np.asarray(sv)[2].max() == 0


def test_decode_attention_paged_quant_matches_float():
    from bitblas_tpu.serving.kv_cache import (decode_attention_paged,
                                              decode_attention_paged_quant)
    rng = np.random.default_rng(4)
    B, blocks, bs, Hkv, H, D = 2, 6, 4, 2, 4, 64
    ck = rng.standard_normal((blocks, bs, Hkv, D)).astype(np.float32)
    cv = rng.standard_normal((blocks, bs, Hkv, D)).astype(np.float32)
    q = rng.standard_normal((B, H, D)).astype(np.float32)
    tables = jnp.asarray([[0, 2, 4], [1, 3, 5]], jnp.int32)
    lengths = jnp.asarray([7, 12], jnp.int32)
    ref = decode_attention_paged(jnp.asarray(q), jnp.asarray(ck),
                                 jnp.asarray(cv), tables, lengths,
                                 num_heads=H)
    kq, ks = quantize_kv(jnp.asarray(ck))
    vq, vs = quantize_kv(jnp.asarray(cv))
    out = decode_attention_paged_quant(jnp.asarray(q), kq, vq, ks, vs,
                                       tables, lengths, num_heads=H)
    assert_close(out, ref, rtol=2e-2, atol=0.05)


def test_engine_kv_quant_tracks_float_engine():
    """The continuous-batching engine with kv_quant=True produces final
    hiddens close to the float-cache engine on identical request streams."""
    from bitblas_tpu.serving import ContinuousBatchingEngine, Request

    model = QuantLlama(CFG, opt_m=(1, 4, 8, 16))
    outs = {}
    for quant in (False, True):
        engine = ContinuousBatchingEngine(model, num_slots=3, max_seq_len=32,
                                          kv_quant=quant)
        rng = np.random.default_rng(7)
        for i in range(4):
            S = int(rng.integers(2, 9))
            engine.submit(Request(
                uid=i,
                prompt=rng.standard_normal(
                    (S, CFG.hidden_size)).astype(np.float16),
                max_new=int(rng.integers(2, 4))))
        finished = engine.run_to_completion(max_steps=100)
        assert len(finished) == 4 and all(r.done for r in finished)
        if quant:
            assert engine.caches_k.dtype == jnp.int8
        outs[quant] = {r.uid: r.final_hidden for r in finished}
    for uid in outs[False]:
        assert_close(outs[True][uid], outs[False][uid], rtol=5e-2, atol=0.3)


def test_paged_engine_kv_quant_tracks_float_engine():
    """The paged engine with kv_quant=True (int8 block pool + scale planes)
    tracks the float paged engine, including prefix-cache block sharing."""
    from bitblas_tpu.serving.engine import (PagedContinuousBatchingEngine,
                                            Request)

    model = QuantLlama(CFG, opt_m=(1, 4, 8, 16))
    outs = {}
    for quant in (False, True):
        eng = PagedContinuousBatchingEngine(model, num_slots=3,
                                            num_blocks=32, block_size=4,
                                            kv_quant=quant)
        rng = np.random.default_rng(8)
        shared_prefix = rng.standard_normal(
            (4, CFG.hidden_size)).astype(np.float16)
        for i in range(4):
            tail = rng.standard_normal(
                (int(rng.integers(1, 5)), CFG.hidden_size)).astype(np.float16)
            eng.submit(Request(uid=i,
                               prompt=np.concatenate([shared_prefix, tail]),
                               max_new=int(rng.integers(2, 4))))
        finished = eng.run_to_completion(max_steps=100)
        assert len(finished) == 4 and all(r.done for r in finished)
        if quant:
            assert eng.caches_k.dtype == jnp.int8
        outs[quant] = {r.uid: r.final_hidden for r in finished}
    for uid in outs[False]:
        assert_close(outs[True][uid], outs[False][uid], rtol=5e-2, atol=0.3)


def test_data_parallel_engine_group():
    """Router tier: requests balanced over replica engines (mixed float and
    kv_quant replicas — the group is engine-agnostic), all complete."""
    from bitblas_tpu.serving import (ContinuousBatchingEngine,
                                     DataParallelEngineGroup, Request)

    model = QuantLlama(CFG, opt_m=(1, 4, 8, 16))
    group = DataParallelEngineGroup([
        ContinuousBatchingEngine(model, num_slots=2, max_seq_len=32),
        ContinuousBatchingEngine(model, num_slots=2, max_seq_len=32,
                                 kv_quant=True),
    ])
    rng = np.random.default_rng(10)
    for i in range(6):
        group.submit(Request(
            uid=i,
            prompt=rng.standard_normal(
                (int(rng.integers(2, 7)), CFG.hidden_size)).astype(np.float16),
            max_new=2))
    fin = group.run_to_completion(max_steps=100)
    assert len(fin) == 6 and all(r.done for r in fin)
    # both replicas took work
    assert all(len(e.finished) >= 1 for e in group.engines)


def test_decode_step_quant_matches_decode_step():
    model = QuantLlama(CFG, opt_m=(1, 8, 16))
    rng = np.random.default_rng(3)
    S, Lmax, B = 6, 16, 2
    D, Hkv, Ly = CFG.head_dim, CFG.num_kv_heads, CFG.num_layers
    x_new = rng.standard_normal((B, 1, CFG.hidden_size)).astype(np.float16)

    # seed both caches with the same random (realistic-scale) history
    hist_k = rng.standard_normal((Ly, B, S, Hkv, D)).astype(np.float32)
    hist_v = rng.standard_normal((Ly, B, S, Hkv, D)).astype(np.float32)
    ck = jnp.zeros((Ly, B, Lmax, Hkv, D), jnp.float32)
    cv = jnp.zeros_like(ck)
    ck = ck.at[:, :, :S].set(hist_k)
    cv = cv.at[:, :, :S].set(hist_v)
    slots = jnp.asarray([0, 1], jnp.int32)
    lengths = jnp.asarray([S, S], jnp.int32)
    ref, _, _ = model.decode_step(jnp.asarray(x_new), ck, cv, slots, lengths)

    kq, ks = quantize_kv(jnp.asarray(hist_k))
    vq, vs = quantize_kv(jnp.asarray(hist_v))
    cq_k = jnp.zeros((Ly, B, Lmax, Hkv, D), jnp.int8).at[:, :, :S].set(kq)
    cq_v = jnp.zeros((Ly, B, Lmax, Hkv, D), jnp.int8).at[:, :, :S].set(vq)
    sq_k = jnp.zeros((Ly, B, Lmax, Hkv), jnp.float32).at[:, :, :S].set(ks)
    sq_v = jnp.zeros((Ly, B, Lmax, Hkv), jnp.float32).at[:, :, :S].set(vs)
    out, cq_k, cq_v, sq_k, sq_v = model.decode_step_quant(
        jnp.asarray(x_new), cq_k, cq_v, sq_k, sq_v, slots, lengths)
    assert cq_k.dtype == jnp.int8
    # int8 KV error propagates through 2 layers of attention + MLP
    assert_close(out, ref, rtol=5e-2, atol=0.25)


def test_flash_decode_quant_partial_tail_block():
    """max_seq_len not a multiple of block_kv: the partial tail scale
    block's pad lanes are unspecified (NaN in interpret mode) and must not
    poison the PV dot (0 * NaN = NaN) for sequences reaching the tail."""
    from bitblas_tpu.kernels.flash import make_flash_decode_quant

    rng = np.random.default_rng(9)
    B, rows, L, Hkv, H, D = 2, 3, 320, 2, 4, 128
    ck = rng.standard_normal((rows, L, Hkv, D)).astype(np.float32)
    cv = rng.standard_normal((rows, L, Hkv, D)).astype(np.float32)
    q = rng.standard_normal((B, H, D)).astype(np.float32)
    slots = jnp.asarray([2, 0], jnp.int32)
    lengths = jnp.asarray([320, 5], jnp.int32)  # seq 0 reaches the tail
    kq, ks = quantize_kv(jnp.asarray(ck))
    vq, vs = quantize_kv(jnp.asarray(cv))
    ref = decode_attention_quant(jnp.asarray(q), kq, vq, ks, vs, slots,
                                 lengths, num_heads=H, use_flash=False)
    fn = make_flash_decode_quant(batch=B, heads=H, max_seq_len=L, dim=D,
                                 kv_heads=Hkv, block_kv=128,
                                 out_dtype=jnp.float32, interpret=True)
    out = fn(jnp.asarray(q), kq, vq, ks, vs, lengths, slots=slots)
    assert np.isfinite(np.asarray(out)).all(), "NaN leaked from pad lanes"
    assert_close(out, ref, rtol=2e-3, atol=1e-3)
