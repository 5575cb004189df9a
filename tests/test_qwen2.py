"""Qwen2-family support: llama topology + q/k/v projection biases +
tied embeddings, golden-matched against live transformers Qwen2 at the
same RTN-dequantized grid (the test pattern of test_transformers_golden /
test_sliding_window)."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

_PROJS = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj",
          "down_proj")
_CFG = dict(hidden_size=128, intermediate_size=256, num_attention_heads=4,
            num_key_value_heads=2, num_hidden_layers=2, vocab_size=64,
            max_position_embeddings=128)


def _fresh_hf():
    from transformers import Qwen2Config, Qwen2ForCausalLM
    torch.manual_seed(21)
    return Qwen2ForCausalLM(Qwen2Config(**_CFG, tie_word_embeddings=False))


@pytest.fixture(scope="module")
def state():
    m = _fresh_hf()
    # biases are zero-init at random init — make them REAL so a dropped
    # bias is visible (the silent-drop failure this feature closes)
    sd = m.state_dict()
    g = torch.Generator().manual_seed(3)
    for k in list(sd):
        if k.endswith(".bias"):
            sd[k] = torch.randn(sd[k].shape, generator=g) * 0.5
    m.load_state_dict(sd)
    return {k: v.detach().numpy().astype(np.float16)
            for k, v in m.state_dict().items()}


@pytest.fixture(scope="module")
def hf_dequant_twin(state):
    from bitblas_tpu.quantization.gptq import rtn_quantize
    sd = {k: torch.from_numpy(np.asarray(v, np.float32))
          for k, v in state.items()}
    for k in list(sd):
        if any(p in k for p in _PROJS) and k.endswith(".weight"):
            dq = rtn_quantize(state[k].astype(np.float32), bits=4,
                              group_size=64).dequantize()
            sd[k] = torch.from_numpy(np.asarray(dq, np.float32))
    model = _fresh_hf()
    model.load_state_dict(sd)
    model.eval()
    return model


@pytest.fixture(scope="module")
def quant_lm(state):
    from bitblas_tpu.models import QuantLlamaLM
    from bitblas_tpu.models.quantize_hf import quantize_llama_from_hf_fp16
    cfg = dict(_CFG, model_type="qwen2")
    model, head = quantize_llama_from_hf_fp16(state, cfg, method="rtn",
                                              group_size=64)
    assert model.cfg.attention_bias, "qwen2 model_type must imply biases"
    assert model.layers[0].biases.get("q") is not None
    return QuantLlamaLM(model, head)


def test_qwen2_matches_transformers(quant_lm, hf_dequant_twin):
    toks = np.random.default_rng(27).integers(0, 64, (1, 32))
    ours = np.asarray(quant_lm(jnp.asarray(toks)), np.float32)
    with torch.no_grad():
        golden = hf_dequant_twin(torch.from_numpy(toks)).logits.numpy()
    rel = np.linalg.norm(ours - golden) / np.linalg.norm(golden)
    assert rel < 0.03, f"qwen2 bias/convention drift: rel {rel:.4f}"
    agree = np.mean(np.argmax(ours, -1) == np.argmax(golden, -1))
    assert agree >= 0.95, f"argmax disagreement: {agree:.2f}"


def test_qwen2_biases_actually_applied(quant_lm, state):
    """Zeroing the imported biases must CHANGE the logits (a silently
    dropped bias would make these equal — the original failure mode)."""
    import copy
    from bitblas_tpu.models import QuantLlamaLM
    from bitblas_tpu.models.quantize_hf import quantize_llama_from_hf_fp16
    cfg = dict(_CFG, model_type="qwen2")
    model2, head2 = quantize_llama_from_hf_fp16(state, cfg, method="rtn",
                                                group_size=64)
    for layer in model2.layers:
        for k in list(layer.biases):
            layer.biases[k] = jnp.zeros_like(layer.biases[k])
    lm0 = QuantLlamaLM(model2, head2)
    toks = np.random.default_rng(29).integers(0, 64, (1, 16))
    a = np.asarray(quant_lm(jnp.asarray(toks)), np.float32)
    b = np.asarray(lm0(jnp.asarray(toks)), np.float32)
    assert np.abs(a - b).max() > 1e-2


def test_qwen2_decode_chain_consistency(quant_lm):
    """prefill + decode_step chain equals one-shot forward — the bias
    rides proj(), so every serving path must carry it."""
    model, head = quant_lm.model, quant_lm.head
    cfg = model.cfg
    rng = np.random.default_rng(31)
    toks = rng.integers(0, 64, (1, 12))
    full = np.asarray(quant_lm(jnp.asarray(toks)), np.float32)
    P = 9
    x = head.embed_tokens(jnp.asarray(toks[:, :P]))
    h, ks, vs = model.make_prefill(P)(x, jnp.arange(P)[None])
    L, Lmax = cfg.num_layers, 16
    ck = jnp.zeros((L, 1, Lmax, cfg.num_kv_heads, cfg.head_dim),
                   jnp.float16)
    cv = jnp.zeros_like(ck)
    for li in range(L):
        ck = ck.at[li, 0, :P].set(ks[li].astype(jnp.float16))
        cv = cv.at[li, 0, :P].set(vs[li].astype(jnp.float16))
    slots = jnp.zeros((1,), jnp.int32)
    outs = []
    for i in range(P, 12):
        xt = head.embed_tokens(jnp.asarray(toks[:, i:i + 1]))
        h1, ck, cv = model.decode_step(xt, ck, cv, slots,
                                       jnp.full((1,), i, jnp.int32))
        outs.append(np.asarray(head.logits(h1), np.float32)[:, 0])
    chain = np.stack(outs, axis=1)
    np.testing.assert_allclose(chain, full[:, P:12], rtol=0.05, atol=0.2)


def test_tp_rejects_biases(state):
    from bitblas_tpu.models.quantize_hf import quantize_llama_from_hf_fp16
    from bitblas_tpu.parallel.serving import TPQuantLlama
    import jax
    from jax.sharding import Mesh
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs 2 devices")
    cfg = dict(_CFG, model_type="qwen2")
    model, _ = quantize_llama_from_hf_fp16(state, cfg, method="rtn",
                                           group_size=64)
    mesh = Mesh(np.array(devs[:2]).reshape(2), ("tp",))
    with pytest.raises(NotImplementedError, match="bias"):
        TPQuantLlama(model, mesh)


def test_tied_embeddings_fallback(state):
    """A state dict without lm_head.weight (tied embeddings) must fall
    back to the embedding matrix as the output projection."""
    from bitblas_tpu.models import QuantLlamaLM
    from bitblas_tpu.models.quantize_hf import quantize_llama_from_hf_fp16
    cfg = dict(_CFG, model_type="qwen2")
    tied = {k: v for k, v in state.items() if k != "lm_head.weight"}
    model, head = quantize_llama_from_hf_fp16(tied, cfg, method="rtn",
                                              group_size=64)
    np.testing.assert_array_equal(
        np.asarray(head.lm_head, np.float32),
        np.asarray(state["model.embed_tokens.weight"], np.float32))
    lm = QuantLlamaLM(model, head)
    toks = np.random.default_rng(33).integers(0, 64, (1, 8))
    out = np.asarray(lm(jnp.asarray(toks)), np.float32)
    assert np.isfinite(out).all()


def test_max_window_layers_guard():
    from bitblas_tpu.models.hf_import import llama_config_from_hf
    import pytest as _pytest
    cfg = dict(_CFG, model_type="qwen2", sliding_window=8,
               use_sliding_window=True, max_window_layers=1)
    with _pytest.raises(NotImplementedError, match="max_window_layers"):
        llama_config_from_hf(cfg, group_size=64)
    # gate off -> no window, no raise
    cfg2 = dict(cfg, use_sliding_window=False)
    assert llama_config_from_hf(cfg2, group_size=64).sliding_window is None


def test_load_state_dict_clears_stale_biases(quant_lm):
    layer = quant_lm.model.layers[0]
    assert layer.biases.get("q") is not None
    sd = layer.state_dict()
    for k in list(sd):
        if k.endswith(".bias"):
            del sd[k]
    import copy
    layer2 = copy.copy(layer)
    layer2.biases = dict(layer.biases)
    layer2.load_state_dict(sd)
    assert layer2.biases == {}, "stale biases must be cleared"
    # restore-safe: original layer untouched
    assert layer.biases.get("q") is not None
