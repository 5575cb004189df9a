"""RTN / GPTQ quantization algorithms + fp16-llama quantization driver.

The reference only *consumes* externally-quantized checkpoints; these tests
pin the in-repo quantizer's contract: codes on the kernel dequant grid
(zeros_mode="original"), GPTQ == RTN at identity Hessian, GPTQ beats RTN on
the calibration objective with a correlated Hessian, and the model driver
produces a QuantLlama whose kernel forward matches the dequantized oracle.
"""

import numpy as np
import pytest

from bitblas_tpu.quantization.gptq import (HessianAccumulator, gptq_quantize,
                                           rtn_quantize)


def _rand_w(n=32, k=256, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((n, k)) * 0.02).astype(np.float32)


def test_rtn_grid_and_error_bound():
    w = _rand_w()
    qw = rtn_quantize(w, bits=4, group_size=128)
    assert qw.codes.dtype == np.uint8
    assert qw.codes.min() >= 0 and qw.codes.max() <= 15
    assert qw.scales.shape == (32, 2) and qw.zeros.shape == (32, 2)
    dq = qw.dequantize()
    # RTN error is at most half a grid step wherever the grid covers the
    # value (asymmetric grid covers [min, max] by construction).
    g = np.repeat(np.arange(2), 128)
    assert np.all(np.abs(dq - w) <= 0.5 * qw.scales[:, g] + 1e-7)


def test_rtn_symmetric_centers_zero():
    w = _rand_w(seed=1)
    qw = rtn_quantize(w, bits=4, group_size=128, symmetric=True)
    assert np.all(qw.zeros == 8.0)


def test_rtn_roundtrips_discrete_weights():
    # Weights already on a 16-level grid round-trip exactly.
    rng = np.random.default_rng(2)
    codes = rng.integers(0, 16, (8, 128))
    w = (codes - 5).astype(np.float32) * 0.01
    qw = rtn_quantize(w, bits=4, group_size=128)
    np.testing.assert_allclose(qw.dequantize(), w, atol=1e-6)


def test_gptq_identity_hessian_equals_rtn():
    w = _rand_w(seed=3)
    rtn = rtn_quantize(w, bits=4, group_size=128)
    gptq = gptq_quantize(w, np.eye(256), bits=4, group_size=128,
                         percdamp=0.0)
    np.testing.assert_array_equal(gptq.codes, rtn.codes)
    np.testing.assert_allclose(gptq.scales, rtn.scales)
    np.testing.assert_allclose(gptq.zeros, rtn.zeros)


def test_gptq_beats_rtn_on_calibration_objective():
    # Correlated inputs: GPTQ's error feedback must reduce the layer-output
    # MSE tr(E H Eᵀ) vs plain rounding.
    rng = np.random.default_rng(4)
    k, n, m = 256, 64, 2048
    mix = rng.standard_normal((k, k)) * 0.3 + np.eye(k)
    x = rng.standard_normal((m, k)).astype(np.float32) @ mix.astype(
        np.float32)
    w = _rand_w(n, k, seed=5)
    acc = HessianAccumulator(k)
    acc.update(x)
    h = acc.hessian

    def obj(dq):
        e = (w - dq).astype(np.float64)
        return float(np.einsum("nk,kl,nl->", e, h, e))

    loss_rtn = obj(rtn_quantize(w, bits=4, group_size=128).dequantize())
    loss_gptq = obj(gptq_quantize(w, h, bits=4,
                                  group_size=128).dequantize())
    assert loss_gptq < 0.9 * loss_rtn, (loss_gptq, loss_rtn)


def test_gptq_group_size_validation():
    w = _rand_w(8, 200)
    with pytest.raises(ValueError):
        rtn_quantize(w, bits=4, group_size=128)
    with pytest.raises(ValueError):
        gptq_quantize(_rand_w(8, 256), np.eye(8), bits=4, group_size=128)


def _tiny_fp16_llama_state(cfg_dict, seed=0):
    rng = np.random.default_rng(seed)
    H = cfg_dict["hidden_size"]
    I = cfg_dict["intermediate_size"]
    kv = cfg_dict["num_key_value_heads"]
    hd = H // cfg_dict["num_attention_heads"]
    V = cfg_dict["vocab_size"]

    def w(n, k, scale=0.02):
        return (rng.standard_normal((n, k)) * scale).astype(np.float16)

    state = {
        "model.embed_tokens.weight": w(V, H, 0.05),
        "model.norm.weight": np.ones(H, np.float16),
        "lm_head.weight": w(V, H, 0.05),
    }
    for i in range(cfg_dict["num_hidden_layers"]):
        b = f"model.layers.{i}"
        state[f"{b}.self_attn.q_proj.weight"] = w(H, H)
        state[f"{b}.self_attn.k_proj.weight"] = w(kv * hd, H)
        state[f"{b}.self_attn.v_proj.weight"] = w(kv * hd, H)
        state[f"{b}.self_attn.o_proj.weight"] = w(H, H)
        state[f"{b}.mlp.gate_proj.weight"] = w(I, H)
        state[f"{b}.mlp.up_proj.weight"] = w(I, H)
        state[f"{b}.mlp.down_proj.weight"] = w(H, I)
        state[f"{b}.input_layernorm.weight"] = np.ones(H, np.float16)
        state[f"{b}.post_attention_layernorm.weight"] = np.ones(
            H, np.float16)
    return state


_TINY = dict(hidden_size=256, intermediate_size=512, num_attention_heads=4,
             num_key_value_heads=2, num_hidden_layers=2, vocab_size=128)


def test_quantize_llama_rtn_wiring_bit_exact():
    """Identity probe through the packed kernel reproduces the RTN
    dequantized weights (pattern: tests/test_gptq_golden.py) — proves the
    driver wires codes/scales/zeros into the device layout correctly."""
    from bitblas_tpu.models.quantize_hf import quantize_llama_from_hf_fp16
    import jax.numpy as jnp

    state = _tiny_fp16_llama_state(_TINY)
    model, _ = quantize_llama_from_hf_fp16(state, _TINY, method="rtn")
    layer = model.layers[0]
    w_fp = state["model.layers.0.self_attn.q_proj.weight"].astype(
        np.float32)
    qw = rtn_quantize(w_fp, bits=4, group_size=128)
    # f16 device scales: the oracle must round the same way.
    g = np.repeat(np.arange(qw.scales.shape[1]), qw.group_size)
    exp = ((qw.codes.astype(np.float32) - qw.zeros[:, g])
           * qw.scales.astype(np.float16).astype(np.float32)[:, g])
    K = w_fp.shape[1]
    eye = np.eye(K, dtype=np.float16)
    rows = [np.asarray(layer.proj("q", jnp.asarray(eye[o:o + 16])))
            for o in range(0, K, 16)]
    got = np.concatenate(rows, axis=0).astype(np.float32)  # [K, N]
    np.testing.assert_array_equal(
        got, exp.T.astype(np.float16).astype(np.float32))


@pytest.mark.parametrize("method", ["rtn", "gptq"])
def test_quantize_llama_from_fp16_finite_logits(method):
    from bitblas_tpu.models import QuantLlamaLM
    from bitblas_tpu.models.quantize_hf import quantize_llama_from_hf_fp16
    import jax.numpy as jnp

    state = _tiny_fp16_llama_state(_TINY)
    rng = np.random.default_rng(7)
    calib = rng.integers(0, _TINY["vocab_size"], (2, 32))
    model, head = quantize_llama_from_hf_fp16(
        state, _TINY, method=method,
        calib_tokens=calib if method == "gptq" else None)
    lm = QuantLlamaLM(model, head)
    toks = rng.integers(0, _TINY["vocab_size"], (1, 16))
    logits = np.asarray(lm(jnp.asarray(toks)))
    assert np.all(np.isfinite(logits))


def test_quantize_llama_gptq_requires_calibration():
    from bitblas_tpu.models.quantize_hf import quantize_llama_from_hf_fp16
    state = _tiny_fp16_llama_state(_TINY)
    with pytest.raises(ValueError, match="calib_tokens"):
        quantize_llama_from_hf_fp16(state, _TINY, method="gptq")


def test_quantize_llama_tracks_fp16_model():
    # The quantized model's logits stay close to the ORIGINAL fp16 model's
    # (small random weights, 4-bit grouped: expect a few % relative error).
    from bitblas_tpu.models import QuantLlamaLM
    from bitblas_tpu.models.quantize_hf import (_attention,
                                                quantize_llama_from_hf_fp16)
    from bitblas_tpu.models.quant_llama import rmsnorm, rope
    import jax
    import jax.numpy as jnp

    state = _tiny_fp16_llama_state(_TINY, seed=11)
    model, head = quantize_llama_from_hf_fp16(state, _TINY, method="rtn")
    lm = QuantLlamaLM(model, head)
    rng = np.random.default_rng(13)
    toks = rng.integers(0, _TINY["vocab_size"], (1, 16))
    logits_q = np.asarray(lm(jnp.asarray(toks)))

    # fp16 reference forward straight from the state dict.
    cfg = model.cfg
    positions = jnp.broadcast_to(jnp.arange(16)[None], (1, 16))
    xj = head.embed_tokens(jnp.asarray(toks)).astype(jnp.float32)
    for i in range(cfg.num_layers):
        b = f"model.layers.{i}"
        W = {name: jnp.asarray(state[f"{b}.{hf}.weight"], jnp.float32)
             for hf, name in (("self_attn.q_proj", "q"),
                              ("self_attn.k_proj", "k"),
                              ("self_attn.v_proj", "v"),
                              ("self_attn.o_proj", "o"),
                              ("mlp.gate_proj", "gate"),
                              ("mlp.up_proj", "up"),
                              ("mlp.down_proj", "down"))}
        h = rmsnorm(xj, jnp.asarray(state[f"{b}.input_layernorm.weight"],
                                    jnp.float32))
        q = (h @ W["q"].T).reshape(1, 16, cfg.num_heads, cfg.head_dim)
        k = (h @ W["k"].T).reshape(1, 16, cfg.num_kv_heads, cfg.head_dim)
        v = (h @ W["v"].T).reshape(1, 16, cfg.num_kv_heads, cfg.head_dim)
        q = rope(q, positions, cfg.rope_theta)
        k = rope(k, positions, cfg.rope_theta)
        attn = _attention(cfg, q, k, v)
        xj = xj + attn @ W["o"].T
        h2 = rmsnorm(xj, jnp.asarray(
            state[f"{b}.post_attention_layernorm.weight"], jnp.float32))
        act = jax.nn.silu(h2 @ W["gate"].T) * (h2 @ W["up"].T)
        xj = xj + act @ W["down"].T
    logits_fp = np.asarray(head.logits(xj))
    rel = (np.linalg.norm(logits_q - logits_fp)
           / max(np.linalg.norm(logits_fp), 1e-6))
    # Random (trained-structure-free) weights are the RTN worst case: every
    # weight sits a half-step off the 16-level grid. Measured ~0.17 rel on
    # this fixture; wiring exactness is pinned separately by
    # test_quantize_llama_rtn_wiring_bit_exact.
    assert rel < 0.25, rel


def test_gptq_does_not_mutate_caller_weights():
    w = _rand_w(8, 256, seed=9)
    h = np.eye(256)
    h[3, 3] = 0.0  # dead column triggers the in-place zeroing path
    before = w.copy()
    gptq_quantize(w, h, bits=4, group_size=128)
    np.testing.assert_array_equal(w, before)


_TINY_MIX = dict(hidden_size=256, intermediate_size=512,
                 num_attention_heads=4, num_key_value_heads=2,
                 num_hidden_layers=1, vocab_size=128,
                 num_local_experts=4, num_experts_per_tok=2)


def _tiny_fp16_mixtral_state(cfg_dict, seed=0):
    rng = np.random.default_rng(seed)
    H, I = cfg_dict["hidden_size"], cfg_dict["intermediate_size"]
    kv = cfg_dict["num_key_value_heads"]
    hd = H // cfg_dict["num_attention_heads"]
    V, E = cfg_dict["vocab_size"], cfg_dict["num_local_experts"]

    def w(n, k, scale=0.02):
        return (rng.standard_normal((n, k)) * scale).astype(np.float16)

    state = {"model.embed_tokens.weight": w(V, H, 0.05),
             "model.norm.weight": np.ones(H, np.float16),
             "lm_head.weight": w(V, H, 0.05)}
    for i in range(cfg_dict["num_hidden_layers"]):
        b = f"model.layers.{i}"
        state[f"{b}.self_attn.q_proj.weight"] = w(H, H)
        state[f"{b}.self_attn.k_proj.weight"] = w(kv * hd, H)
        state[f"{b}.self_attn.v_proj.weight"] = w(kv * hd, H)
        state[f"{b}.self_attn.o_proj.weight"] = w(H, H)
        state[f"{b}.block_sparse_moe.gate.weight"] = w(E, H, 0.05)
        for e in range(E):
            base = f"{b}.block_sparse_moe.experts.{e}"
            state[f"{base}.w1.weight"] = w(I, H)
            state[f"{base}.w3.weight"] = w(I, H)
            state[f"{base}.w2.weight"] = w(H, I)
        state[f"{b}.input_layernorm.weight"] = np.ones(H, np.float16)
        state[f"{b}.post_attention_layernorm.weight"] = np.ones(
            H, np.float16)
    return state


@pytest.mark.parametrize("method", ["rtn", "gptq"])
def test_quantize_mixtral_from_fp16(method):
    from bitblas_tpu.models import QuantLlamaLM, quantize_mixtral_from_hf_fp16
    import jax.numpy as jnp

    state = _tiny_fp16_mixtral_state(_TINY_MIX)
    rng = np.random.default_rng(3)
    calib = rng.integers(0, _TINY_MIX["vocab_size"], (2, 32))
    model, head = quantize_mixtral_from_hf_fp16(
        state, _TINY_MIX, method=method, opt_m=(1, 8, 16), moe_tokens=16,
        calib_tokens=calib if method == "gptq" else None)
    lm = QuantLlamaLM(model, head)
    toks = rng.integers(0, _TINY_MIX["vocab_size"], (1, 16))
    logits = np.asarray(lm(jnp.asarray(toks)))
    assert np.all(np.isfinite(logits))
    # router carried over in our [H, E] orientation
    hf_router = state["model.layers.0.block_sparse_moe.gate.weight"]
    np.testing.assert_allclose(
        np.asarray(model.layers[0].moe.router),
        np.asarray(hf_router, np.float32).T, rtol=1e-3)
    out = lm.generate(np.arange(5), max_new_tokens=4, temperature=0.0)
    assert out.shape == (9,)


def test_quantize_mixtral_zero_traffic_expert_falls_back_to_rtn():
    """An expert the calibration stream never reaches must NOT have its
    weights zeroed by GPTQ's dead-column path (r2 self-review finding);
    it falls back to RTN."""
    from bitblas_tpu.models import quantize_mixtral_from_hf_fp16

    state = _tiny_fp16_mixtral_state(_TINY_MIX, seed=5)
    # Bias the router so expert 3 is never in anyone's top-2: make its
    # router row hugely negative.
    for i in range(_TINY_MIX["num_hidden_layers"]):
        r = state[f"model.layers.{i}.block_sparse_moe.gate.weight"].copy()
        r[3] = -10.0
        state[f"model.layers.{i}.block_sparse_moe.gate.weight"] = r
    rng = np.random.default_rng(6)
    calib = rng.integers(0, _TINY_MIX["vocab_size"], (1, 16))
    model, _ = quantize_mixtral_from_hf_fp16(
        state, _TINY_MIX, method="gptq", calib_tokens=calib,
        opt_m=(1, 8, 16), moe_tokens=16)
    # expert 3's codes must match plain RTN of its fp weights, not zeros
    w_fp = state["model.layers.0.block_sparse_moe.experts.3.w1.weight"]
    exp = rtn_quantize(np.asarray(w_fp, np.float32), bits=4,
                       group_size=128)
    got_codes = None
    # reconstruct codes via identity probe is heavy; instead check the
    # packed scales are NOT the all-defaults a zero weight would give:
    # a zeroed weight quantizes to scale==1.0 rows everywhere.
    W, S, Z = model.layers[0].moe.weights["gate"][3]
    s = np.asarray(S, np.float32)
    assert np.any(np.abs(s[s != 0] - 1.0) > 1e-3), "expert-3 looks zeroed"
    np.testing.assert_allclose(
        np.sort(np.unique(np.round(exp.scales, 4)))[:4],
        np.sort(np.unique(np.round(s[:, :, :512][s[:, :, :512] != 0], 4)))[:4],
        rtol=5e-2)
