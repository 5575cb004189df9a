"""decode_chunk: T tokens appended to the KV cache in one batched pass.

Pins (1) T=1 equivalence with decode_step, (2) chunked prefill — a prompt
split into prefill + decode_chunk reproduces the one-shot prefill's hidden
states and cache, (3) per-slot independent starts.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from bitblas_tpu.models import LlamaConfig, QuantLlama

CFG = LlamaConfig(hidden_size=256, intermediate_size=512, num_heads=4,
                  num_kv_heads=2, num_layers=2, vocab_size=64,
                  group_size=128)


@pytest.fixture(scope="module")
def model():
    return QuantLlama(CFG, opt_m=(1, 4, 8, 16))


def _caches(num_slots=2, lmax=16):
    shape = (CFG.num_layers, num_slots, lmax, CFG.num_kv_heads,
             CFG.head_dim)
    return jnp.zeros(shape, jnp.bfloat16), jnp.zeros(shape, jnp.bfloat16)


def test_chunk_of_one_matches_decode_step(model):
    rng = np.random.default_rng(0)
    ck, cv = _caches()
    pre = rng.standard_normal(
        (CFG.num_layers, 2, 5, CFG.num_kv_heads, CFG.head_dim)) * 0.1
    ck = ck.at[:, :, :5].set(jnp.asarray(pre, jnp.bfloat16))
    cv = cv.at[:, :, :5].set(jnp.asarray(pre[::-1], jnp.bfloat16))
    x = jnp.asarray(rng.standard_normal((2, 1, CFG.hidden_size)) * 0.1,
                    jnp.float16)
    slots = jnp.arange(2, dtype=jnp.int32)
    lengths = jnp.asarray([5, 3], jnp.int32)

    y1, ck1, cv1 = model.decode_step(x, ck, cv, slots, lengths)
    y2, ck2, cv2 = model.decode_chunk(x, ck, cv, slots, lengths)
    np.testing.assert_allclose(np.asarray(y2, np.float32),
                               np.asarray(y1, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(ck2, np.float32),
                               np.asarray(ck1, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(cv2, np.float32),
                               np.asarray(cv1, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_chunked_prefill_matches_one_shot(model):
    rng = np.random.default_rng(1)
    x_full = jnp.asarray(rng.standard_normal((1, 8, CFG.hidden_size)) * 0.1,
                         jnp.float16)
    positions = jnp.arange(8)[None]

    h_full, ks_full, vs_full = model.make_prefill(8)(x_full, positions)

    h1, ks1, vs1 = model.make_prefill(4)(x_full[:, :4], positions[:, :4])
    ck, cv = _caches()
    for li in range(CFG.num_layers):
        ck = ck.at[li, 0, :4].set(ks1[li].astype(jnp.bfloat16))
        cv = cv.at[li, 0, :4].set(vs1[li].astype(jnp.bfloat16))
    h2, ck, cv = model.decode_chunk(
        x_full[:, 4:], ck, cv, jnp.zeros((1,), jnp.int32),
        jnp.asarray([4], jnp.int32))

    np.testing.assert_allclose(np.asarray(h2[0], np.float32),
                               np.asarray(h_full[0, 4:], np.float32),
                               rtol=3e-2, atol=3e-2)
    for li in range(CFG.num_layers):
        np.testing.assert_allclose(
            np.asarray(ck[li, 0, :8], np.float32),
            np.asarray(ks_full[li].astype(jnp.bfloat16), np.float32),
            rtol=3e-2, atol=3e-2)


def test_chunk_respects_per_slot_starts(model):
    """Two slots with different prefix lengths write to their own offsets
    and never read each other's tokens."""
    rng = np.random.default_rng(2)
    ck, cv = _caches()
    x = jnp.asarray(rng.standard_normal((2, 2, CFG.hidden_size)) * 0.1,
                    jnp.float16)
    slots = jnp.arange(2, dtype=jnp.int32)
    lengths = jnp.asarray([3, 6], jnp.int32)
    _, ck2, _ = model.decode_chunk(x, ck, cv, slots, lengths)
    w = np.asarray(ck2, np.float32)
    # slot 0: rows 3..4 written, rows 5+ untouched (zero)
    assert np.abs(w[:, 0, 3:5]).max() > 0
    assert np.abs(w[:, 0, 5:]).max() == 0
    # slot 1: rows 6..7 written, rows 0..5 untouched
    assert np.abs(w[:, 1, 6:8]).max() > 0
    assert np.abs(w[:, 1, :6]).max() == 0


def test_tp_decode_chunk_matches_single_device(model):
    """TPQuantLlama.decode_chunk over a 2-device mesh reproduces the
    single-device chunk (same contract as test_tp_decode_matches...)."""
    import jax
    from jax.sharding import Mesh
    from bitblas_tpu.parallel.serving import TPQuantLlama

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs 2 devices")
    mesh = Mesh(np.array(devs[:2]).reshape(2), ("tp",))
    tpm = TPQuantLlama(model, mesh)

    rng = np.random.default_rng(3)
    ck, cv = _caches()
    pre = rng.standard_normal(
        (CFG.num_layers, 2, 5, CFG.num_kv_heads, CFG.head_dim)) * 0.1
    ck = ck.at[:, :, :5].set(jnp.asarray(pre, jnp.bfloat16))
    cv = cv.at[:, :, :5].set(jnp.asarray(pre[::-1], jnp.bfloat16))
    x = jnp.asarray(rng.standard_normal((2, 3, CFG.hidden_size)) * 0.1,
                    jnp.float16)
    slots = jnp.arange(2, dtype=jnp.int32)
    lengths = jnp.asarray([5, 2], jnp.int32)

    y_ref, ck_ref, cv_ref = model.decode_chunk(x, ck, cv, slots, lengths)
    ck_tp = jax.device_put(ck, tpm.kv_cache_sharding())
    cv_tp = jax.device_put(cv, tpm.kv_cache_sharding())
    y_tp, ck_out, cv_out = tpm.decode_chunk(x, ck_tp, cv_tp, slots, lengths)

    np.testing.assert_allclose(np.asarray(y_tp, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(ck_out, np.float32),
                               np.asarray(ck_ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_cached_speculation_over_tp(model):
    """speculative_generate_cached drives a TP-sharded target end to end
    (make_prefill + decode_chunk duck-typing) and matches single-device
    greedy output."""
    import jax
    from jax.sharding import Mesh
    from bitblas_tpu.models import QuantLlamaLM
    from bitblas_tpu.models.hf_import import LMHead
    from bitblas_tpu.models.speculative import speculative_generate_cached
    from bitblas_tpu.parallel.serving import TPQuantLlama

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs 2 devices")
    mesh = Mesh(np.array(devs[:2]).reshape(2), ("tp",))
    rng = np.random.default_rng(4)
    head = LMHead(
        embed=jnp.asarray(rng.standard_normal(
            (CFG.vocab_size, CFG.hidden_size)) * 0.05, jnp.float16),
        final_norm=jnp.ones((CFG.hidden_size,), jnp.float32),
        lm_head=jnp.asarray(rng.standard_normal(
            (CFG.vocab_size, CFG.hidden_size)) * 0.05, jnp.float32),
    )
    lm = QuantLlamaLM(model, head)
    tplm = QuantLlamaLM(TPQuantLlama(model, mesh), head)
    prompt = np.arange(5, dtype=np.int32)
    ref = lm.generate(prompt, max_new_tokens=6, temperature=0.0)
    out = speculative_generate_cached(tplm, lm, prompt, max_new_tokens=6,
                                      gamma=3)
    assert np.array_equal(out, ref)


def test_chunk_quant_of_one_matches_decode_step_quant(model):
    from bitblas_tpu.serving.kv_cache import quantize_kv
    rng = np.random.default_rng(5)
    shape = (CFG.num_layers, 2, 16, CFG.num_kv_heads, CFG.head_dim)
    ck = jnp.zeros(shape, jnp.int8)
    cv = jnp.zeros(shape, jnp.int8)
    sk = jnp.zeros(shape[:-1], jnp.float32)
    sv = jnp.zeros(shape[:-1], jnp.float32)
    pre = jnp.asarray(rng.standard_normal(
        (CFG.num_layers, 2, 5, CFG.num_kv_heads, CFG.head_dim)) * 0.1,
        jnp.float32)
    kq, ks = quantize_kv(pre)
    ck = ck.at[:, :, :5].set(kq)
    sk = sk.at[:, :, :5].set(ks)
    vq, vs = quantize_kv(pre[::-1])
    cv = cv.at[:, :, :5].set(vq)
    sv = sv.at[:, :, :5].set(vs)
    x = jnp.asarray(rng.standard_normal((2, 1, CFG.hidden_size)) * 0.1,
                    jnp.float16)
    slots = jnp.arange(2, dtype=jnp.int32)
    lengths = jnp.asarray([5, 3], jnp.int32)

    y1, ck1, cv1, sk1, sv1 = model.decode_step_quant(
        x, ck, cv, sk, sv, slots, lengths)
    y2, ck2, cv2, sk2, sv2 = model.decode_chunk_quant(
        x, ck, cv, sk, sv, slots, lengths)
    np.testing.assert_allclose(np.asarray(y2, np.float32),
                               np.asarray(y1, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(np.asarray(ck2), np.asarray(ck1))
    np.testing.assert_allclose(np.asarray(sk2), np.asarray(sk1),
                               rtol=1e-5, atol=1e-7)


def test_tp_decode_chunk_quant_matches_single_device(model):
    """TP int8-KV chunk twin reproduces the single-device
    decode_chunk_quant (codes bit-identical, hidden allclose)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from bitblas_tpu.parallel.serving import TPQuantLlama
    from bitblas_tpu.serving.kv_cache import quantize_kv

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs 2 devices")
    mesh = Mesh(np.array(devs[:2]).reshape(2), ("tp",))
    tpm = TPQuantLlama(model, mesh)

    rng = np.random.default_rng(8)
    shape = (CFG.num_layers, 2, 16, CFG.num_kv_heads, CFG.head_dim)
    ck = jnp.zeros(shape, jnp.int8)
    cv = jnp.zeros(shape, jnp.int8)
    sk = jnp.zeros(shape[:-1], jnp.float32)
    sv = jnp.zeros(shape[:-1], jnp.float32)
    pre = jnp.asarray(rng.standard_normal(
        (CFG.num_layers, 2, 5, CFG.num_kv_heads, CFG.head_dim)) * 0.1,
        jnp.float32)
    kq, ks = quantize_kv(pre)
    ck = ck.at[:, :, :5].set(kq)
    sk = sk.at[:, :, :5].set(ks)
    vq, vs = quantize_kv(pre[::-1])
    cv = cv.at[:, :, :5].set(vq)
    sv = sv.at[:, :, :5].set(vs)
    x = jnp.asarray(rng.standard_normal((2, 3, CFG.hidden_size)) * 0.1,
                    jnp.float16)
    slots = jnp.arange(2, dtype=jnp.int32)
    lengths = jnp.asarray([5, 2], jnp.int32)

    y1, ck1, _, sk1, _ = model.decode_chunk_quant(x, ck, cv, sk, sv,
                                                  slots, lengths)
    kv_sh = tpm.kv_cache_sharding()
    sc_sh = NamedSharding(mesh, P(None, None, None, "tp"))
    y2, ck2, _, sk2, _ = tpm.decode_chunk_quant(
        x, jax.device_put(ck, kv_sh), jax.device_put(cv, kv_sh),
        jax.device_put(sk, sc_sh), jax.device_put(sv, sc_sh),
        slots, lengths)
    np.testing.assert_allclose(np.asarray(y2, np.float32),
                               np.asarray(y1, np.float32),
                               rtol=2e-2, atol=2e-2)
    # TP partitions the qkv matmul differently, so K values near an int8
    # rounding boundary may flip a code by +-1 (observed 4/8192).
    dc = np.abs(np.asarray(ck2, np.int32) - np.asarray(ck1, np.int32))
    assert dc.max() <= 1 and (dc > 0).mean() < 0.01, (dc.max(),
                                                      (dc > 0).mean())
    np.testing.assert_allclose(np.asarray(sk2), np.asarray(sk1),
                               rtol=1e-3, atol=1e-6)
